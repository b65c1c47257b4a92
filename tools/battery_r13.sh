#!/bin/bash
# Round-13 sequential measurement battery — run alone in tmux on an idle
# box (r11/r12 lesson: nothing else may run, no sbt compile mid-battery).
# Order: full self-gate -> full bench replica -> forked 10x sweeps (WH,
# docs) with in-band work-mass counters -> incremental oracle floor.
# Every artifact flushes per-query. The first r13 battery attempt died
# after step 2 (environment restart); this run re-does the bench replica
# on the final tree (bench_local_r13b.json — the first replica also
# carried a transient slowdown cluster across the q100-q110 block).
set -u
cd /root/repo
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
JAVA="java $ADD_OPENS -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "== [1/6] full self-gate (Verify sf0.01 + DuckDB compare)"
$JAVA graft.Verify /root/testdata/sf0.01 /tmp/verify_r13_full \
  > /tmp/verify_r13_full.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r13_full \
  > /tmp/check_r13_full.log 2>&1
tail -2 /tmp/check_r13_full.log

echo "== [2/6] full bench replica at sf0.1 (one JVM, driver conditions)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=bench_local_r13b.json \
$JAVA graft.Bench > /tmp/bench_r13b_stdout.log 2> /tmp/bench_r13b.log
tail -1 /tmp/bench_r13b_stdout.log

echo "== [3/6] warehouse sweep, forked per query (sf0.1 then 10x) + work mass"
WH=$(cat /tmp/wh_list.txt)
bash tools/sweep_forked.sh /root/testdata/sf0.1 /tmp/wh_sf01_r13.json $WH \
  > /tmp/sweep_wh_sf01.log 2>&1
tail -1 /tmp/sweep_wh_sf01.log
bash tools/sweep_forked.sh /tmp/sf1wh /tmp/wh_sf1_r13.json $WH \
  > /tmp/sweep_wh_sf1.log 2>&1
tail -1 /tmp/sweep_wh_sf1.log
$JAVA graft.WorkMass /root/testdata/sf0.1 /tmp/wm_wh_sf01.json \
  q05_disjunctive_join q75_editdist_pairs q108_entity_resolution \
  > /tmp/wm_wh_sf01.log 2>&1
$JAVA graft.WorkMass /tmp/sf1wh /tmp/wm_wh_sf1.json \
  q05_disjunctive_join q75_editdist_pairs q108_entity_resolution \
  > /tmp/wm_wh_sf1.log 2>&1
python3 tools/combine_scaling.py SCALING_WH_r13.json \
  sf0.1=/tmp/wh_sf01_r13.json sf1wh=/tmp/wh_sf1_r13.json \
  wm:sf0.1=/tmp/wm_wh_sf01.json wm:sf1wh=/tmp/wm_wh_sf1.json

echo "== [4/6] docs sweep, forked per query (sf0.1 then 10x) + work mass"
DOCS=$(cat /tmp/docs_list.txt)
bash tools/sweep_forked.sh /root/testdata/sf0.1 /tmp/docs_sf01_r13.json $DOCS \
  > /tmp/sweep_docs_sf01.log 2>&1
tail -1 /tmp/sweep_docs_sf01.log
bash tools/sweep_forked.sh /tmp/sf1docs /tmp/docs_sf1_r13.json $DOCS \
  > /tmp/sweep_docs_sf1.log 2>&1
tail -1 /tmp/sweep_docs_sf1.log
$JAVA graft.WorkMass /root/testdata/sf0.1 /tmp/wm_docs_sf01.json \
  q25_ngram_jaccard_pairs q54_boilerplate q87_shared_spans \
  q159_lm_score q223_containment_sample \
  > /tmp/wm_docs_sf01.log 2>&1
$JAVA graft.WorkMass /tmp/sf1docs /tmp/wm_docs_sf1.json \
  q25_ngram_jaccard_pairs q54_boilerplate q87_shared_spans \
  q159_lm_score q223_containment_sample \
  > /tmp/wm_docs_sf1.log 2>&1
python3 tools/combine_scaling.py SCALING_r13.json \
  sf0.1=/tmp/docs_sf01_r13.json sf1docs=/tmp/docs_sf1_r13.json \
  wm:sf0.1=/tmp/wm_docs_sf01.json wm:sf1docs=/tmp/wm_docs_sf1.json

echo "== [5/6] incremental oracle floor (new oracles + 10 spot checks)"
python3 - <<'EOF'
import json
full = json.load(open('/tmp/verify_r13_full/oracle_sql.json'))
keep = ["q224_exists_disjunct", "q225_notexists_disjunct",
        "q226_leftouter_disjunct",
        "q108_entity_resolution", "q127_mmr_select", "q149_jw_linkage",
        "q204_count_min", "q212_incremental_cms", "q219_triple_disjunct",
        "q25_ngram_jaccard_pairs", "q44_rotated_ann", "q62_unpivot",
        "q75_editdist_pairs"]
subset = {k: full[k] for k in keep if k in full}
json.dump(subset, open('/tmp/oracle_sql_r13_subset.json', 'w'))
print(f"floor subset: {len(subset)} oracles")
EOF
python3 tools/bench_oracle.py /root/testdata/sf0.1 \
  /tmp/oracle_sql_r13_subset.json oracle_floor_r13_incremental.json \
  > /tmp/oracle_floor_r13.log 2>&1
tail -1 oracle_floor_r13_incremental.json | head -c 400; echo

echo "== [6/6] advisor A/B probe record is at /tmp/adv13.log (ran pre-battery)"
echo "== battery done $(date -u +%H:%M:%S)"
