#!/usr/bin/env bash
# End-to-end proof that the bench artifact survives a SIGKILL mid-run
# (round-3 failure mode: the driver's timeout KILLed the bench after all 42
# queries ran but 0.2 s after the single end-of-run artifact write — one
# flush later and the whole round's perf signal would have been lost).
#
# Launches graft.Bench directly (java, not sbt, so the kill hits the bench
# JVM), waits until the artifact reports >= 1 completed query, SIGKILLs the
# JVM, then asserts the on-disk JSON still parses and carries every
# completed query with "partial": true.
#
# Usage: tools/bench_killsafe.sh   (compile first: sbt compile)
set -eu

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first"; exit 2; }

OUT="$(mktemp -d)/bench_out.json"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_CPUS=4 \
SPARK_GRAFT_BENCH_PASSES=1 \
SPARK_GRAFT_BENCH_WARMUP=0 \
SPARK_GRAFT_BENCH_OUT="$OUT" \
java $ADD_OPENS -Xmx4g -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  >/dev/null 2>&1 &
PID=$!

# wait for >= 1 completed query in the artifact, then SIGKILL mid-bench
for _ in $(seq 1 600); do
  if [ -f "$OUT" ] && python3 - "$OUT" <<'EOF' 2>/dev/null
import json, sys
j = json.load(open(sys.argv[1]))
sys.exit(0 if len(j.get("queries", {})) >= 1 else 1)
EOF
  then break; fi
  kill -0 "$PID" 2>/dev/null || { echo "FAIL: bench exited before first flush"; exit 1; }
  sleep 0.5
done

kill -9 "$PID" 2>/dev/null || true
wait "$PID" 2>/dev/null || true

python3 - "$OUT" <<'EOF'
import json, sys
j = json.load(open(sys.argv[1]))
qs = j.get("queries", {})
assert j.get("partial") is True, f"expected partial:true after SIGKILL, got {j.get('partial')}"
assert len(qs) >= 1, "no completed queries in artifact"
assert abs(j["value"] - sum(qs.values())) < 1e-2, "total != sum of queries"
print(f"PASS: artifact parseable after SIGKILL mid-bench — "
      f"{len(qs)} completed queries, total {j['value']}s, partial={j['partial']}")
EOF
