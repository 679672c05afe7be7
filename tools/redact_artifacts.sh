#!/usr/bin/env bash
# Redact digest-listed hostnames from driver-written round artifacts
# (LEAKCHECK.json / ADVICE.md quote raw matched strings verbatim, which
# re-introduces the leak at HEAD — ADVICE r9 #1). Run at round start, before
# the first commit of the round.
#
# Round-11 (VERDICT r10 #1): detection is by sha256 digest of each
# hostname-shaped token found IN the artifact — this script encodes nothing
# recoverable. A matched token is only ever material the driver already
# wrote; we learn it from the file, mask it, and never store it.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
. tools/leakcheck_lib.sh
MASK='redacted-internal-host.invalid'
for f in LEAKCHECK.json ADVICE.md VERDICT.md BASELINE.md SURVEY.md; do
  [ -f "$f" ] || continue
  hits="$(graft_leak_hits <"$f")" || continue
  while IFS= read -r tok; do
    [ -n "$tok" ] || continue
    esc="$(printf '%s' "$tok" | sed 's/[.[\*^$/]/\\&/g')"
    sed -i "s/${esc}/${MASK}/g" "$f"
  done <<<"$hits"
  echo "[redact] masked digest-listed hostname(s) in $f" >&2
done
echo "[redact] done" >&2
