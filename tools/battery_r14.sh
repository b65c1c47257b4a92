#!/bin/bash
# Round-14 sequential measurement battery — run alone (no sbt, no probes
# mid-battery; the r11/r12 lesson). Order: full self-gate -> full bench
# replica on the final tree -> forked 10x sweeps (WH, docs) with
# SPARK_GRAFT_BENCH_STEADY=3 (verdict item 4: single ratios, no bracket)
# and in-band work-mass counters incl. the r13 additions (q27/q97/q201,
# verdict item 5) -> incremental oracle floor for the queries this round
# touched. Every artifact flushes per-query.
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

echo "== [1/6] full self-gate (Verify sf0.01 + DuckDB compare) $(date -u +%H:%M:%S)"
$JAVA graft.Verify /root/testdata/sf0.01 /tmp/verify_r14_full \
  > /tmp/verify_r14_full.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r14_full \
  > /tmp/check_r14_full.log 2>&1
tail -2 /tmp/check_r14_full.log

echo "== [2/6] full bench replica at sf0.1 (one JVM, driver conditions) $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=bench_local_r14.json \
$JAVA graft.Bench > /tmp/bench_r14_stdout.log 2> /tmp/bench_r14.log
tail -1 /tmp/bench_r14_stdout.log

echo "== [3/6] docs sweep, forked per query (sf0.1 then 10x, STEADY=3) $(date -u +%H:%M:%S)"
DOCS=$(cat /tmp/docs_list.txt)
bash tools/sweep_forked.sh /root/testdata/sf0.1 /tmp/docs_sf01_r14.json $DOCS \
  > /tmp/sweep_docs_sf01.log 2>&1
tail -1 /tmp/sweep_docs_sf01.log
bash tools/sweep_forked.sh /tmp/sf1docs /tmp/docs_sf1_r14.json $DOCS \
  > /tmp/sweep_docs_sf1.log 2>&1
tail -1 /tmp/sweep_docs_sf1.log
WM_DOCS="q25_ngram_jaccard_pairs q54_boilerplate q87_shared_spans \
q159_lm_score q223_containment_sample q27_simhash q97_setsim_join \
q201_equality_deletes"
$JAVA graft.WorkMass /root/testdata/sf0.1 /tmp/wm_docs_sf01.json $WM_DOCS \
  > /tmp/wm_docs_sf01.log 2>&1
$JAVA graft.WorkMass /tmp/sf1docs /tmp/wm_docs_sf1.json $WM_DOCS \
  > /tmp/wm_docs_sf1.log 2>&1
python3 tools/combine_scaling.py SCALING_r14.json \
  sf0.1=/tmp/docs_sf01_r14.json sf1docs=/tmp/docs_sf1_r14.json \
  wm:sf0.1=/tmp/wm_docs_sf01.json wm:sf1docs=/tmp/wm_docs_sf1.json

echo "== [4/6] warehouse sweep, forked per query (sf0.1 then 10x, STEADY=3) $(date -u +%H:%M:%S)"
WH=$(cat /tmp/wh_list.txt)
bash tools/sweep_forked.sh /root/testdata/sf0.1 /tmp/wh_sf01_r14.json $WH \
  > /tmp/sweep_wh_sf01.log 2>&1
tail -1 /tmp/sweep_wh_sf01.log
bash tools/sweep_forked.sh /tmp/sf1wh /tmp/wh_sf1_r14.json $WH \
  > /tmp/sweep_wh_sf1.log 2>&1
tail -1 /tmp/sweep_wh_sf1.log
WM_WH="q05_disjunctive_join q75_editdist_pairs q108_entity_resolution"
$JAVA graft.WorkMass /root/testdata/sf0.1 /tmp/wm_wh_sf01.json $WM_WH \
  > /tmp/wm_wh_sf01.log 2>&1
$JAVA graft.WorkMass /tmp/sf1wh /tmp/wm_wh_sf1.json $WM_WH \
  > /tmp/wm_wh_sf1.log 2>&1
python3 tools/combine_scaling.py SCALING_WH_r14.json \
  sf0.1=/tmp/wh_sf01_r14.json sf1wh=/tmp/wh_sf1_r14.json \
  wm:sf0.1=/tmp/wm_wh_sf01.json wm:sf1wh=/tmp/wm_wh_sf1.json

echo "== [5/6] incremental oracle floor (touched queries + spot checks) $(date -u +%H:%M:%S)"
python3 - <<'EOF'
import json
full = json.load(open('/tmp/verify_r14_full/oracle_sql.json'))
keep = ["q37_curation_pipeline", "q40_curation_stats", "q133_net_tokens",
        "q143_ks_drift", "q176_gini_split", "q191_bfs_reach",
        "q163_ks_matrix", "q26_minhash_lsh", "q161_weighted_median",
        "q05_disjunctive_join", "q97_setsim_join", "q208_spearman"]
subset = {k: full[k] for k in keep if k in full}
json.dump(subset, open('/tmp/oracle_sql_r14_subset.json', 'w'))
print(f"floor subset: {len(subset)} oracles")
EOF
python3 tools/bench_oracle.py /root/testdata/sf0.1 \
  /tmp/oracle_sql_r14_subset.json oracle_floor_r14_incremental.json \
  > /tmp/oracle_floor_r14.log 2>&1
tail -1 oracle_floor_r14_incremental.json | head -c 400; echo

echo "== [6/6] plan dumps on the final tree -> plans/r14 $(date -u +%H:%M:%S)"
SPARK_GRAFT_ONLY=$(cat /tmp/plandump_list.txt) \
$JAVA graft.PlanDump /root/testdata/sf0.1 /tmp/plans_r14_after \
  > /tmp/plandump_r14.log 2>&1
for f in /tmp/plans_r14_after/*.txt; do
  q=$(basename "$f" .txt)
  case " $(cat /tmp/touched_list.txt) " in
    *" $q "*) cp "$f" "plans/r14/${q}_after.txt" ;;
    *)        cp "$f" "plans/r14/${q}.txt" ;;
  esac
done
ls plans/r14 | wc -l
echo "== battery done $(date -u +%H:%M:%S)"
