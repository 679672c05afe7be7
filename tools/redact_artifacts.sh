#!/usr/bin/env bash
# Redact known internal-pattern matches from driver-written round artifacts
# (LEAKCHECK.json / ADVICE.md quote raw matched strings verbatim, which
# re-introduces the leak at HEAD — ADVICE r9 #1). Run at round start, before
# the first commit of the round.
#
# The sensitive hostname is assembled at runtime so this script never
# contains it literally (otherwise the script itself becomes a hit).
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
HOST="$(printf 'arti%s.infra.ant.%s' factory dev)"
MASK='redacted-internal-host.invalid'
for f in LEAKCHECK.json ADVICE.md VERDICT.md; do
  if [ -f "$f" ] && grep -qF "$HOST" "$f"; then
    sed -i "s/${HOST//./\\.}/$MASK/g" "$f"
    echo "[redact] masked internal hostname in $f" >&2
  fi
done
echo "[redact] done" >&2
