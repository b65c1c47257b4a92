#!/bin/bash
# Process-isolated 10x scaling sweep (round-13 verdict item 1): fork ONE
# JVM PER QUERY so no row inherits same-JVM residue from the 50+ queries
# before it — r10 (q187), r11 (driver bench window), and r12 (q05 43.1 s
# vs 11.6 s solo; q202 5.97 s vs 2.65 s solo) each burned an adjudication
# cycle on exactly that contamination. Each fork runs graft.Bench with
# its standard min-of-2 passes (warmup pass 1 doubles as codegen warmup,
# SPARK_GRAFT_BENCH_WARMUP=0 skips the sf0.001 pre-pass); per-query
# artifacts merge into one Bench-shaped json via merge_bench_parts.py.
#
# Warmup stays ON inside each fork (it respects SPARK_GRAFT_ONLY, so it
# costs one sf0.001 pass of just that query): a cold fork otherwise pays
# JIT/codegen warmup inside measured pass 1 and partially pass 2, which
# inflates small sf0.1 rows and flatters the 10x ratio. On top of that,
# SPARK_GRAFT_BENCH_STEADY=3 runs up to 3 unmeasured TARGET-SF passes
# (early-out at 10% convergence) before the measured min-of-2 — the
# round-13 fork floor (median +0.4 s, ~3 s on shuffle-heavy plans, q05
# fork/fork ratio 3.0x vs 11.6x vs-warm) is the residual JIT those
# passes retire. Override with SPARK_GRAFT_BENCH_STEADY=0 for the
# cheap-and-bracketed mode.
#
# Usage: tools/sweep_forked.sh SF_DIR OUT_JSON query1 [query2 ...]
set -u
SF_DIR=$1
OUT=$2
shift 2
TMPD=$(mktemp -d /tmp/sweep_forked.XXXXXX)
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
PARTS=()
for q in "$@"; do
  t0=$(date +%s)
  if SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_SF_DIR="$SF_DIR" \
     SPARK_GRAFT_BENCH_STEADY="${SPARK_GRAFT_BENCH_STEADY:-3}" \
     SPARK_GRAFT_BENCH_OUT="$TMPD/$q.json" \
     java $ADD_OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
       graft.Bench > /dev/null 2> "$TMPD/$q.err"; then
    PARTS+=("$TMPD/$q.json")
    echo "[sweep] $q ok ($(( $(date +%s) - t0 ))s incl. jvm)"
  else
    echo "[sweep] $q FAILED — see $TMPD/$q.err"
  fi
done
python3 tools/merge_bench_parts.py "$OUT" "$SF_DIR" "${PARTS[@]}"
echo "[sweep] wrote $OUT (per-query artifacts in $TMPD)"
