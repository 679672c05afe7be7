package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.3 — property layer. Window-assignment invariants are checked
  * against pure reference models of the semantics the engine relies on
  * (epoch bucketing, hop enumeration, session merging); engine-side
  * invariants (minhash collisions, cosine identity, dedup idempotence on
  * real Spark) live in MiniOpsSpec. Raw scalacheck generators driven by a
  * deterministic seed (scalatestplus isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def forAllN[T](gen: Gen[T], n: Int = 300)(check: T => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val tsGen = Gen.chooseNum(0L, 4102444800L) // 1970..2100, seconds

  test("tumbling windows: every event in exactly one bucket, which contains it") {
    forAllN(Gen.zip(tsGen, Gen.chooseNum(1L, 86400L))) { case (t, w) =>
      val start = math.floorDiv(t, w) * w
      assert(start <= t && t < start + w)
      assert(t >= start && t < start + w && !(start + w <= t))
    }
  }

  test("hopping windows (size=2*slide): every event in exactly two windows") {
    forAllN(Gen.zip(tsGen, Gen.chooseNum(1L, 43200L))) { case (t, slide) =>
      val size = slide * 2
      val k = math.floorDiv(t, slide)
      val starts = Seq((k - 1) * slide, k * slide)
      starts.foreach(s => assert(s <= t && t < s + size))
      assert(!((k - 2) * slide <= t && t < (k - 2) * slide + size))
      assert(!((k + 1) * slide <= t))
    }
  }

  test("session windows: gap<G chains merge, gaps>=G split (reference model)") {
    def sessions(sorted: Seq[Long], gap: Long): Seq[Seq[Long]] =
      sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last < gap) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
    val gen = Gen.zip(Gen.listOfN(30, Gen.chooseNum(0L, 100000L)), Gen.chooseNum(1L, 5000L))
    forAllN(gen, 150) { case (ts, gap) =>
      val sorted = ts.sorted
      val ss = sessions(sorted, gap)
      assert(ss.flatten === sorted)
      ss.foreach(sess => sess.sliding(2).foreach {
        case Seq(a, b) => assert(b - a < gap)
        case _ => ()
      })
      ss.sliding(2).foreach {
        case Seq(s1, s2) => assert(s2.head - s1.last >= gap)
        case _ => ()
      }
    }
  }

  test("dedup keep-first is idempotent and keeps the minimum-(ts,id) row (model)") {
    case class E(k: Int, t: Long, id: Long)
    def dedup(xs: Seq[E]): Seq[E] =
      xs.groupBy(_.k).view.mapValues(_.minBy(e => (e.t, e.id))).values.toSeq
    val eGen = for {
      k <- Gen.chooseNum(0, 5); t <- Gen.chooseNum(0L, 100L); id <- Gen.chooseNum(0L, 1000L)
    } yield E(k, t, id)
    forAllN(Gen.listOfN(40, eGen), 150) { xs =>
      val once = dedup(xs)
      assert(dedup(once).toSet === once.toSet)
      once.foreach { e =>
        val grp = xs.filter(_.k == e.k)
        assert(grp.forall(g => implicitly[Ordering[(Long, Long)]].lteq((e.t, e.id), (g.t, g.id))))
      }
    }
  }

  test("rabin-karp fingerprint: deterministic, order-sensitive") {
    val p = 2147483647L
    def fp(tokens: Seq[String]): Long =
      tokens.foldLeft(0L)((h, t) => math.floorMod(h * 31 + math.floorMod(t.hashCode.toLong, p), p))
    forAllN(Gen.listOfN(20, Gen.alphaStr), 150) { ts =>
      assert(fp(ts) === fp(ts))
      if (ts.toSet.size > 1 && ts != ts.reverse) assert(fp(ts) !== fp(ts.reverse))
    }
  }

  test("set-op algebra matches Scala Set semantics (model for intersect/except/union)") {
    val g = Gen.zip(Gen.listOf(Gen.chooseNum(0, 20)), Gen.listOf(Gen.chooseNum(0, 20)))
    forAllN(g, 150) { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      assert((sa intersect sb) === (sa & sb))
      assert((sa diff sb).forall(x => sa(x) && !sb(x)))
      assert((sa union sb) === (a ++ b).toSet)
    }
  }

  test("TopKKeys: reduce/merge equal the reference model under any split") {
    val agg = new graft.functions.TopKKeys(3)
    val pairGen = Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L))
    val caseGen = Gen.zip(Gen.listOfN(12, pairGen), Gen.chooseNum(0, 12))
    forAllN(caseGen, n = 300) { case (pairs, cut) =>
      // reference: full sort by (-score, id), take 3, join ids
      val expect = pairs.sortBy { case (v, id) => (-v, id) }.take(3).map(_._2).mkString("/")
      // aggregate path: arbitrary split into two partial buffers, merged
      val (l, r) = pairs.splitAt(cut.min(pairs.length))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufL, bufR)) === expect)
      assert(agg.finish(agg.merge(bufR, bufL)) === expect, "merge must commute")
    }
  }

  test("quantization buckets: floor((x-mn)/scale) stays in [0,255] for any vector") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0)).map(_.take(64))
    forAllN(vecGen, n = 300) { xs =>
      val mn = xs.min; val mx = xs.max
      if (mx > mn) {
        val scale = (mx - mn) / 255.0
        xs.foreach { x =>
          val q = math.min(math.floor((x - mn) / scale), 255.0).toLong
          assert(q >= 0L && q <= 255L)
        }
      }
    }
  }

  test("CEP sealing: incremental matching at any watermark schedule == one-shot matching") {
    import graft.streaming.{BufEv, Event, PatternMatcher}
    // random stream: ids unique, times in a small range (dense collisions),
    // types drawn from {A,B,C,D}; random 2-3 stage pattern; random horizon;
    // random monotone watermark schedule with random arrival assignment
    val evGen = for {
      n <- Gen.chooseNum(0, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", "D"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    val patGen = Gen.oneOf(Seq("A", "B"), Seq("A", "B", "C"), Seq("B", "A"), Seq("A", "A"))
    val caseGen = for {
      evs <- evGen
      pat <- patGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      // arrival batch of each event: any batch whose seal HASN'T passed its
      // ts yet (watermark contract: events never arrive later than that)
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, pat, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 400) { case (evs, pat, within, seals, arrivals) =>
      val stages: Seq[Event => Boolean] = pat.map(t => (e: Event) => e.event_type == t)
      val fin = seals.last + 5000 // final seal covers everything
      // one-shot: everything buffered, one seal past every window
      val (oneShot, rest) = PatternMatcher.seal(1L, evs, stages, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      // incremental: each event arrives EXACTLY ONCE, in its assigned batch
      // — pulled earlier if a preceding seal would pass its timestamp first
      // (the watermark contract: an event never arrives after a seal whose
      // watermark covers it). Batch i delivers, then seals at seals(i), so
      // arriving in the batch of the first covering seal is still in time.
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.seal(1L, buffer ++ due, stages, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot for pat=$pat within=$within seals=$seals")
    }
  }

  test("CEP sealing with optional/negated stages: incremental == one-shot at any schedule") {
    import graft.streaming.{BufEv, Event, PatternMatcher, PosStage}
    def tp(t: String): Event => Boolean = (e: Event) => e.event_type == t
    val evGen = for {
      n <- Gen.chooseNum(0, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", "D", "X"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    // every builder-legal modifier shape over 2-4 positive stages: head and
    // last required, middles optional, guards between required neighbors
    val patGen = Gen.oneOf(
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Seq(tp("X")))),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), true, Nil),
        PosStage(tp("C"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Seq(tp("X"))),
        PosStage(tp("C"), true, Nil), PosStage(tp("D"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), true, Nil),
        PosStage(tp("C"), true, Nil), PosStage(tp("D"), false, Nil)),
      Seq(PosStage(tp("A"), false, Seq.empty), PosStage(tp("B"), false, Seq(tp("A"))),
        PosStage(tp("C"), false, Seq(tp("X"), tp("B")))),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("A"), true, Nil),
        PosStage(tp("B"), false, Nil)),
      // trailing optionals (times(from, to) tails)
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), true, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("A"), false, Nil),
        PosStage(tp("A"), true, Nil)))
    val caseGen = for {
      evs <- evGen
      pat <- patGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, pat, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 500) { case (evs, pat, within, seals, arrivals) =>
      val fin = seals.last + 5000
      val (oneShot, rest) = PatternMatcher.seal(1L, evs, pat, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.seal(1L, buffer ++ due, pat, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot (modifiers) for within=$within seals=$seals")
    }
  }

  test("CEP sealing with kleene stages: incremental == one-shot at any schedule (r14)") {
    import graft.streaming.{BufEv, Event, PatternMatcher, PosStage}
    def tp(t: String): Event => Boolean = (e: Event) => e.event_type == t
    def or(a: String, b: String): Event => Boolean =
      (e: Event) => e.event_type == a || e.event_type == b
    val evGen = for {
      n <- Gen.chooseNum(0, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", "D", "X"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    // every builder-legal kleene position: head, tail, middle; next to
    // optionals; with guards between plain required neighbors only; with
    // overlapping predicates (the greedy tie-break corner)
    val patGen = Gen.oneOf(
      Seq(PosStage(tp("A"), false, Nil, true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, true)),
      Seq(PosStage(tp("A"), false, Nil, true), PosStage(tp("B"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, true),
        PosStage(tp("C"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Seq(tp("X"))),
        PosStage(tp("C"), false, Nil, true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), true, Nil),
        PosStage(tp("C"), false, Nil, true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(or("A", "B"), false, Nil, true),
        PosStage(tp("C"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, true),
        PosStage(tp("C"), true, Nil)))
    val caseGen = for {
      evs <- evGen
      pat <- patGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, pat, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 500) { case (evs, pat, within, seals, arrivals) =>
      val fin = seals.last + 5000
      val (oneShot, rest) = PatternMatcher.seal(1L, evs, pat, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.seal(1L, buffer ++ due, pat, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot (kleene) for within=$within seals=$seals")
    }
  }

  test("CEP sealing with strict (next) stages: incremental == one-shot at any schedule (r14)") {
    import graft.streaming.{BufEv, Event, PatternMatcher, PosStage}
    def tp(t: String): Event => Boolean = (e: Event) => e.event_type == t
    def or(a: String, b: String): Event => Boolean =
      (e: Event) => e.event_type == a || e.event_type == b
    val evGen = for {
      n <- Gen.chooseNum(0, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", "X"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    // every builder-legal strict position: after the head, after a
    // relaxed stage, chained, before an optional tail, and with
    // overlapping predicates (a strict candidate consumed by an earlier
    // match must read as unavailable, not as an adjacency break)
    val patGen = Gen.oneOf(
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, strict = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil),
        PosStage(tp("C"), false, Nil, strict = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, strict = true),
        PosStage(tp("C"), false, Nil, strict = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, strict = true),
        PosStage(tp("C"), true, Nil)),
      Seq(PosStage(or("A", "B"), false, Nil), PosStage(or("B", "C"), false, Nil, strict = true)),
      // notNext strict guards: after the head, mid-pattern, on a strict
      // stage, and with overlapping guard/stage predicates
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, negsNext = Seq(tp("X")))),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil),
        PosStage(tp("C"), false, Nil, negsNext = Seq(tp("X")))),
      Seq(PosStage(tp("A"), false, Nil),
        PosStage(tp("B"), false, Nil, strict = true, negsNext = Seq(or("X", "B")))),
      Seq(PosStage(tp("A"), false, Nil),
        PosStage(or("B", "C"), false, Nil, negsNext = Seq(or("C", "X")))))
    val caseGen = for {
      evs <- evGen
      pat <- patGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, pat, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 500) { case (evs, pat, within, seals, arrivals) =>
      val fin = seals.last + 5000
      val (oneShot, rest) = PatternMatcher.seal(1L, evs, pat, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.seal(1L, buffer ++ due, pat, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot (strict) for within=$within seals=$seals")
    }
  }

  test("all-matches sealing (sealAll): incremental == one-shot at any schedule (r14)") {
    import graft.streaming.{BufEv, Event, PatternMatcher, PosStage}
    def tp(t: String): Event => Boolean = (e: Event) => e.event_type == t
    def or(a: String, b: String): Event => Boolean =
      (e: Event) => e.event_type == a || e.event_type == b
    val evGen = for {
      n <- Gen.chooseNum(0, 30)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", "X"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    // anyMode at each position, kleene with and without combinations,
    // branched optionals, overlapping predicates
    val patGen = Gen.oneOf(
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, anyMode = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, anyMode = true),
        PosStage(tp("C"), false, Nil)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil),
        PosStage(tp("C"), false, Nil, anyMode = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), false, Nil, kleene = true)),
      Seq(PosStage(tp("A"), false, Nil),
        PosStage(tp("B"), false, Nil, kleene = true, combinations = true)),
      Seq(PosStage(tp("A"), false, Nil), PosStage(tp("B"), true, Nil),
        PosStage(tp("C"), false, Nil, anyMode = true)),
      Seq(PosStage(or("A", "B"), false, Nil), PosStage(or("B", "C"), false, Nil, anyMode = true)),
      Seq(PosStage(tp("A"), false, Nil, kleene = true), PosStage(tp("C"), false, Nil)))
    val caseGen = for {
      evs <- evGen
      pat <- patGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, pat, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 500) { case (evs, pat, within, seals, arrivals) =>
      val fin = seals.last + 5000
      val (oneShot, rest) = PatternMatcher.sealAll(1L, evs, pat, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.sealAll(1L, buffer ++ due, pat, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot (sealAll) for within=$within seals=$seals")
    }
  }

  test("PERMUTE sealing: incremental matching at any watermark schedule == one-shot") {
    import graft.streaming.{BufEv, Event, PatternMatcher}
    val evGen = for {
      n <- Gen.chooseNum(0, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B", "C"))
    } yield ts.zip(tp).zipWithIndex.map { case ((t, y), i) => BufEv(i.toLong, t, y, 0.0) }
    val memGen = Gen.oneOf(Seq("A", "B"), Seq("B", "A"), Seq("A", "B", "C"))
    val caseGen = for {
      evs <- evGen
      mem <- memGen
      within <- Gen.chooseNum(1L, 800L)
      nSeals <- Gen.chooseNum(1, 5)
      seals <- Gen.listOfN(nSeals, Gen.chooseNum(0L, 3000L))
      arrivals <- Gen.listOfN(evs.length, Gen.chooseNum(0, nSeals - 1))
    } yield (evs, mem, within, seals.sorted, arrivals)
    forAllN(caseGen, n = 400) { case (evs, mem, within, seals, arrivals) =>
      val members: Seq[Event => Boolean] = mem.map(t => (e: Event) => e.event_type == t)
      val fin = seals.last + 5000
      val (oneShot, rest) = PatternMatcher.sealPermute(1L, evs, members, within, fin)
      assert(rest.isEmpty, "final seal must drain the buffer")
      def effectiveBatch(e: BufEv, a: Int): Int = {
        val firstCovering = seals.indexWhere(_ >= e.ts_ms)
        if (firstCovering < 0) a else a min firstCovering
      }
      var buffer = Seq.empty[BufEv]
      var emitted = Seq.empty[graft.streaming.PatternMatch]
      (seals :+ fin).zipWithIndex.foreach { case (wm, batch) =>
        val due = evs.zip(arrivals).collect {
          case (e, a) if effectiveBatch(e, a) == batch => e
        }
        val (m, keep) = PatternMatcher.sealPermute(1L, buffer ++ due, members, within, wm)
        emitted ++= m
        buffer = keep
      }
      assert(emitted.toSet === oneShot.toSet,
        s"incremental != one-shot (permute) for mem=$mem within=$within seals=$seals")
    }
  }

  test("PERMUTE oracle model: last-picks recursive replay == consumed-set engine (3000 streams)") {
    import graft.streaming.{BufEv, Event, PatternMatcher}
    // the q_cep_permute DuckDB oracle carries only (last head, last A pick,
    // last B pick) and jumps to the earliest head whose complementary
    // partner exists — the monotone-picks model. Re-implement that model
    // here and pit it against the consumed-set engine on random streams.
    def model(evs: Seq[BufEv], within: Long): Seq[(Long, Long, Seq[Long])] = {
      val sorted = evs.sortBy(e => (e.ts_ms, e.event_id))
      def gt(x: (Long, Long), y: (Long, Long)) =
        x._1 > y._1 || (x._1 == y._1 && x._2 > y._2)
      var h = (Long.MinValue, -1L); var a = (Long.MinValue, -1L); var b = (Long.MinValue, -1L)
      def pickOk(e: BufEv) = {
        val k = (e.ts_ms, e.event_id)
        if (e.event_type == "A") gt(k, a) else gt(k, b)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Long])]
      var go = true
      while (go) {
        val cand = sorted.iterator
          .filter(e => gt((e.ts_ms, e.event_id), h) && pickOk(e))
          .map { e =>
            val p = sorted.find(p => p.event_type != e.event_type && pickOk(p) &&
              gt((p.ts_ms, p.event_id), (e.ts_ms, e.event_id)) &&
              p.ts_ms <= e.ts_ms + within)
            (e, p)
          }.collectFirst { case (e, Some(p)) => (e, p) }
        cand match {
          case Some((e, p)) =>
            h = (e.ts_ms, e.event_id)
            if (e.event_type == "A") { a = (e.ts_ms, e.event_id); b = (p.ts_ms, p.event_id) }
            else { b = (e.ts_ms, e.event_id); a = (p.ts_ms, p.event_id) }
            out += ((e.ts_ms, p.ts_ms, Seq(e.event_id, p.event_id)))
          case None => go = false
        }
      }
      out.toSeq
    }
    val members: Seq[Event => Boolean] =
      Seq((e: Event) => e.event_type == "A", (e: Event) => e.event_type == "B")
    val caseGen = for {
      n <- Gen.chooseNum(0, 30)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 300L)) // dense → heavy collision
      tp <- Gen.listOfN(n, Gen.oneOf("A", "B"))
      within <- Gen.chooseNum(1L, 200L)
    } yield (ts.zip(tp).zipWithIndex.map { case ((t, y), i) =>
      BufEv(i.toLong, t, y, 0.0) }, within)
    forAllN(caseGen, n = 3000) { case (evs, within) =>
      val (engine, _) = PatternMatcher.sealPermute(1L, evs, members, within, Long.MaxValue)
      val got = engine.map(m => (m.first_ms, m.last_ms, m.event_ids))
      assert(got === model(evs, within),
        s"CTE model != engine for within=$within evs=${evs.map(e => (e.event_id, e.ts_ms, e.event_type))}")
    }
  }
}
