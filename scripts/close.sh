#!/usr/bin/env bash
# End-of-round close ritual. Runs every gate against the EXACT tree that
# will be committed, in order, and only commits if all pass — so an
# uncompiled diff can never void a round's official record again.
#
# Usage: scripts/close.sh "<commit message>"
#
# Gates, in order (any failure aborts before the commit):
#   1. sbt compile + Test/compile
#   2. full Verify sweep + DuckDB check at sf0.001, sf0.01, sf0.1
#   3. Bench JSON line at sf0.1 (rc must be 0 and output must parse)
#   4. git add -A && git commit
set -euo pipefail
cd "$(dirname "$0")/.."
MSG="${1:?usage: scripts/close.sh \"<commit message>\"}"

echo "== close: 1/4 compile"
sbt -batch compile Test/compile

echo "== close: 2/4 verify sweep x3 fixtures"
for sf in 0.001 0.01 0.1; do
  out="/tmp/close_v$sf"
  rm -rf "$out"
  scripts/run.sh graft.Verify "/root/testdata/sf$sf" "$out" 2>"/tmp/close_verify_$sf.log"
  # capture once: run the oracle compare a single time, then both display
  # and gate on the captured output (a piped grep -q under pipefail can
  # also spuriously fail on SIGPIPE)
  result=$(python3 scripts/check.py "/root/testdata/sf$sf" "$out")
  echo "$result" | tail -3
  case "$result" in
    *", 0 fail"*) ;;
    *) echo "close: FAIL at sf$sf"; exit 1 ;;
  esac
done

echo "== close: 3/4 bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/run.sh graft.Bench 2>/tmp/close_bench.log | tee /tmp/close_bench.json
python3 -c "import json,sys; json.load(open('/tmp/close_bench.json'))" \
  || { echo "close: bench output is not valid JSON"; exit 1; }

echo "== close: 4/4 commit"
git add -A
git commit -m "$MSG"
echo "== close: done"
