#!/bin/sh
# Round pre-flight (run before staging a driver window; records to .scratch):
#   1. bare-session driver-sim: all 287 queries() vs oracle_sql() row counts
#      at sf0.01 (the driver's own check, minus the value hash -- pytest
#      tests/test_parity.py is the stricter cell-exact layer);
#   2. standing dup-heavy gate: the 25 flagged heavy names in ONE worker
#      JVM at sf10 (SCALING.md);
#   3. full-registry sweep at sf1 (10x) under the orchestrator;
#   4. dup-heavy CELL-EXACT sweep: every oracled query value-checked vs
#      DuckDB on a replicated sf0.001 corpus whose shape ROLLS per day
#      (replicas 16-24, stride pad 0-999 — round 10; counts can't see
#      tie-resolution divergence on duplicated data, and a frozen corpus
#      shape can be overfit).
# Takes ~65 min total; each step prints PASS/FAIL at the end.
set -eu
cd "$(dirname "$0")"
OUT=.scratch/preflight_$(date +%Y%m%d_%H%M)
mkdir -p .scratch

python - <<'PY' > "$OUT.driver_sim.txt" 2>&1
import sys, os
sys.path.insert(0, os.getcwd())
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
assert E.entry(spark).collect(), "entry() empty"
qs, osql = E.queries(), E.oracle_sql()
import duckdb
con = duckdb.connect(); sf = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
bad = 0
for name in qs:
    try:
        n_s = qs[name](spark, sf).count()
        n_o = len(con.sql(osql[name]).fetchall()) if name in osql else None
        ok = n_o is None or n_s == n_o
    except Exception as ex:
        ok, n_s, n_o = False, type(ex).__name__, None
    if not ok: bad += 1
    print(("OK" if ok else "BAD"), name, n_s, n_o, flush=True)
print("DONE bad=%d" % bad)
PY
tail -1 "$OUT.driver_sim.txt"
FAIL=0
grep -q "^DONE bad=0$" "$OUT.driver_sim.txt" || { echo "driver-sim: FAIL"; FAIL=1; }

HEAVY25="sparse_cosine_topk_docs binned_range_join_orders dedup_canonical_docs \
neardup_components neardup_components_star ngram_jaccard_pairs minhash_lsh_neardup \
edit_distance_neardup cosine_topk_similarity cosine_topk_sharded ann_lsh_topk \
embedding_neardup_lsh ivf_ann_topk ivf_pq_topk ivf_rpq_topk ivf_pq_rerank_topk \
pq_adc_topk maxsim_label_topk maxsim_label_sharded ppr_trade_recommendations \
sorted_neighborhood_neardup item_item_cf_topk bfs_hops_trade_graph \
streaming_session_counts substring_dup_spans"
# check_sweep <file> <label>: FAIL on an empty/missing output (the sweep
# itself crashed — previously `grep -c ""` exited 1 here under set -eu and
# aborted the script) and FAIL when failure markers are present (previously
# that grep's success let the script exit 0 — a failing preflight reported
# success; round-8 advice fix).
check_sweep() {
    if ! [ -s "$1" ]; then
        echo "$2: FAIL (empty sweep output — orchestrator crashed?)"; FAIL=1; return
    fi
    echo "$2 lines: $(wc -l < "$1")"
    if grep "TIMEOUT\|ERROR\|KILLED" "$1"; then
        echo "$2: FAIL"; FAIL=1
    else
        echo "$2: clean"
    fi
}

# regenerate the replicas when .scratch starts clean (fresh round)
[ -d .scratch/sf10 ] || python tools_scale_gen.py /root/testdata/sf0.1 .scratch/sf10 100 >/dev/null 2>&1
[ -d .scratch/sf1 ] || python tools_scale_gen.py /root/testdata/sf0.1 .scratch/sf1 10 >/dev/null 2>&1

# shellcheck disable=SC2086
python tools_scale_sweep.py .scratch/sf10 420 $HEAVY25 > "$OUT.sf10_heavy25.txt" 2>/dev/null || true
check_sweep "$OUT.sf10_heavy25.txt" "sf10 heavy-25"

python tools_scale_sweep.py .scratch/sf1 180 > "$OUT.sf1_all.txt" 2>/dev/null || true
check_sweep "$OUT.sf1_all.txt" "sf1 full sweep"

# Roll the dup corpus shape per day (VERDICT r9 ask #6): replication
# factor 16..24 and a stride pad 0..999, both derived from the date, so a
# tie-resolution bug cannot overfit one frozen layout. DUP_R / DUP_PAD
# env vars override for reproducing a specific shape.
DOY=$(date +%j | sed 's/^0*//')
DUP_R=${DUP_R:-$(( 16 + DOY % 9 ))}
DUP_PAD=${DUP_PAD:-$(( (DOY * 7919) % 1000 ))}
DUPDIR=".scratch/dup_r${DUP_R}_p${DUP_PAD}"
echo "dup-value corpus: replicas=$DUP_R stride_pad=$DUP_PAD ($DUPDIR)"
[ -d "$DUPDIR" ] || python tools_scale_gen.py /root/testdata/sf0.001 "$DUPDIR" "$DUP_R" "$DUP_PAD" >/dev/null 2>&1
if python tools_dup_value_sweep.py "$DUPDIR" > "$OUT.dup_value.txt" 2>/dev/null \
   && grep -q "^DONE 0 failures" "$OUT.dup_value.txt"; then
    echo "dup-value sweep: clean ($(grep -c ' OK ' "$OUT.dup_value.txt") names)"
else
    echo "dup-value sweep: FAIL"; FAIL=1
    grep "FAILURE" "$OUT.dup_value.txt" | head -5
fi

[ "$FAIL" -eq 0 ] && echo "PREFLIGHT: PASS" || echo "PREFLIGHT: FAIL"
exit "$FAIL"
