#!/usr/bin/env bash
# Self-test for the digest-based leak gate (VERDICT r10 #1 done-criteria:
# "hook still blocks a planted fixture string in a spec run of the hook").
# Uses the harmless fixture hostname whose digest is in the stored list —
# proves the mechanism end-to-end without the repo containing any secret.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
. tools/leakcheck_lib.sh

fail() { echo "[test_leak_gate] FAIL: $1" >&2; exit 1; }

# The fixture hostname is NOT a secret (it's an .invalid-TLD test string);
# it is split here only because writing it whole would trip the very gate
# this file tests when committing this file. Digest in leakcheck_lib.sh.
FIXTURE='leakgate-selftest.fixture''.invalid'

# 1. Detection lib: fixture token is caught, clean text is not.
printf '+val url = "https://%s/path"\n' "$FIXTURE" | graft_leak_hits >/dev/null \
  || fail "lib missed the planted fixture token"
printf '+val url = "https://example.com/path"\nplain text\n' | graft_leak_hits >/dev/null \
  && fail "lib flagged clean text"

# 2. Full hook run: a scratch repo with the fixture staged must be rejected,
#    and a commit that only REMOVES the fixture must be allowed (ADVICE r10 #2).
scratch="$(mktemp -d)"
trap 'rm -rf "$scratch"' EXIT
repo_root="$(pwd)"
git -C "$scratch" init -q
mkdir -p "$scratch/tools"
cp tools/pre-commit tools/leakcheck_lib.sh "$scratch/tools/"
(
  cd "$scratch"
  printf 'endpoint = %s\n' "$FIXTURE" > leaky.txt
  git add leaky.txt
  if GRAFT_SKIP_COMPILE_GATE=0 bash tools/pre-commit; then
    exit 2   # gate let a planted fixture through
  fi
  # Commit it with the gate bypassed, then stage its REMOVAL: must pass.
  git -c user.email=t@t -c user.name=t commit -qm seed
  git rm -q leaky.txt
  GRAFT_SKIP_COMPILE_GATE=0 bash tools/pre-commit || exit 3
) || { rc=$?; [ "$rc" = "2" ] && fail "hook did not block planted fixture"; \
       [ "$rc" = "3" ] && fail "hook blocked a removal-only commit"; \
       fail "scratch-repo run errored (rc=$rc)"; }

# 3. No recoverable assembly left: nothing in tools/ concatenates sub-word
#    pieces of any hostname (the round-10 printf pattern is gone).
grep -rn --exclude=test_leak_gate.sh "printf.*%s.*infra" tools/ \
  && fail "printf assembly still present"

echo "[test_leak_gate] PASS" >&2
