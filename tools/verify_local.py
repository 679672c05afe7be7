#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/verify_local.py <sfDir> <outDir>

Reads outDir/<name>/ parquet (Spark result) and runs outDir/oracle_sql.json
queries in DuckDB against the sfDir tables, then compares:
  - row count
  - column names (sorted)
  - exact cell values (column-sorted), NaN-safe

Dev tool only — the engine itself has no Python dependency.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], out

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    produced = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    for name in sorted(produced | set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        if name not in oracle:
            print(f"ok   {name}: rows={len(s_rows)} (no oracle declared)"); n_pass += 1; continue
        try:
            rel = con.sql(oracle[name])
            d_cols = rel.columns
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # Type audit: a pandas-side fetch renders HUGEINT (e.g. DuckDB's sum
        # over BIGINT[]) as float64 — "16320.0" vs Spark's int64 "16320" — a
        # hash mismatch that value-equality via fetchall() cannot see. Caught
        # this on q_embed_quantize (rounds 1-3); fail loudly on any recurrence.
        # explicit unsigned/oversized integer family — a bare startswith("U")
        # would also catch UUID/UNION, which pandas renders losslessly
        wide_types = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
        widened = [f"{c}:{t}" for c, t in zip(d_cols, d_types)
                   if t.upper() in wide_types]
        if widened:
            print(f"FAIL {name}: oracle type(s) widen beyond int64 (pandas "
                  f"renders as float64, breaking the hash): {widened} — CAST to BIGINT")
            n_fail += 1; continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if tuple(norm(x) for x in a) != tuple(norm(x) for x in b):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sr)}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
