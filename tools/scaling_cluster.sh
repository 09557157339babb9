#!/bin/bash
# Multi-executor-JVM scaling evidence — the closest sandbox analog of the
# north rule's "N vs 4N executors" criterion: Spark standalone local-cluster
# mode launches REAL separate executor JVMs (own heap, own allocator, own
# GC), unlike local[N] threads sharing one heap. Compares N executors vs 4N
# executors at fixed 4 cores / 4g each, on identical input.
#
# Requires SPARK_HOME (/opt/spark). ~8 min.
set -u
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
J=${1:-target/scala-2.13/ocrspark_2.13-0.1.0.jar}
N=${SPARK_GRAFT_SCALE_EXECS:-2}
DOCS=${SPARK_GRAFT_BENCH_DOCS:-200000}
run() { # $1 = executor count
  local cores=$(($1 * 4))
  SPARK_GRAFT_CPUS=$cores SPARK_GRAFT_BENCH_DOCS=$DOCS SPARK_GRAFT_BENCH_REPEATS=5 \
    "$SPARK_HOME/bin/spark-submit" --master "local-cluster[$1,4,6144]" \
    --driver-memory 8g --conf spark.executor.memory=4g \
    --conf "spark.executor.extraJavaOptions=-XX:+UseParallelGC" \
    --class graft.Bench "$J" ep1 2>/dev/null | grep '^{'
}
TMP=$(mktemp)
for i in 1 2; do
  run $N >> "$TMP" || echo "run $N failed (iteration $i)" >&2
  run $((4 * N)) >> "$TMP" || echo "run $((4*N)) failed (iteration $i)" >&2
done
echo "[cluster scaling raw]" >&2; cat "$TMP" >&2
python3 - "$TMP" <<'PY'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip().startswith('{')]
cores_seen = sorted({r["cores"] for r in runs})
if len(cores_seen) < 2:
    sys.exit(f"scaling_cluster: need results from BOTH levels, got cores={cores_seen} "
             f"({len(runs)} successful runs) — check the raw output above for launch failures")
by = {}
for r in runs:
    c = r["cores"]
    if c not in by or r["best_docs_per_sec"] > by[c]["best_docs_per_sec"]:
        by[c] = r
cs = sorted(by)
a, b = by[cs[0]], by[cs[1]]
eff = b["best_docs_per_sec"] / (4 * a["best_docs_per_sec"])
print(json.dumps({
  "metric": "scaling_efficiency_multi_jvm", "value": round(eff, 3), "unit": "ratio",
  "method": "local-cluster[N,4,6144] separate executor JVMs, peak of 2 JVM launches x 5 in-JVM repeats",
  "n_execs": a["cores"] // 4, "n_docs_per_sec": a["best_docs_per_sec"],
  "four_n_execs": b["cores"] // 4, "four_n_docs_per_sec": b["best_docs_per_sec"],
  "docs": a["docs"]}))
PY
