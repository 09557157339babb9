#!/bin/bash
# Quantify the Spark daemon CPU tax during a local-cluster scaling run:
# launches graft.Bench ep1 under local-cluster[EXECS,4,6144] and samples
# per-process CPU every 2s, classifying JVMs into executor vs daemon
# (standalone master, worker, driver/SparkSubmit) share. The 8x4 scaling
# level runs 32 task cores PLUS these daemons on a 32-vCPU host — this
# script measures exactly how much CPU the daemons steal from the tasks,
# the oversubscription tax that depresses the saturated 2->8 efficiency.
set -u
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
J=${1:-target/scala-2.13/ocrspark_2.13-0.1.0.jar}
EXECS=${SPARK_GRAFT_SCALE_EXECS:-8}
DOCS=${SPARK_GRAFT_BENCH_DOCS:-200000}
CORES=$((EXECS * 4))
OUT=$(mktemp); SAMPLES=$(mktemp)
( SPARK_GRAFT_CPUS=$CORES SPARK_GRAFT_BENCH_DOCS=$DOCS SPARK_GRAFT_BENCH_REPEATS=5 \
  "$SPARK_HOME/bin/spark-submit" --master "local-cluster[$EXECS,4,6144]" \
  --driver-memory 8g --conf spark.executor.memory=4g \
  --conf "spark.executor.extraJavaOptions=-XX:+UseParallelGC" \
  --class graft.Bench "$J" ep1 2>/dev/null | grep '^{' > "$OUT" ) &
PID=$!
while kill -0 $PID 2>/dev/null; do
  ps -eo pcpu,args --no-headers 2>/dev/null | grep java >> "$SAMPLES"
  echo "---" >> "$SAMPLES"
  sleep 2
done
wait $PID 2>/dev/null
python3 - "$SAMPLES" "$OUT" "$CORES" <<'PY'
import sys, json
samples = open(sys.argv[1]).read().split("---\n")
def cls(args):
    if "CoarseGrainedExecutorBackend" in args: return "executor"
    if "deploy.master.Master" in args: return "master"
    if "deploy.worker.Worker" in args: return "worker"
    if "SparkSubmit" in args: return "driver"
    return None
tot, nsamp = {}, 0
for s in samples:
    lines = [l for l in s.splitlines() if l.strip()]
    if not lines: continue
    nsamp += 1
    for l in lines:
        try: pcpu, args = l.strip().split(None, 1)
        except ValueError: continue
        c = cls(args)
        if c: tot[c] = tot.get(c, 0.0) + float(pcpu)
avg = {k: round(v / max(nsamp, 1), 1) for k, v in tot.items()}
daemon = round(sum(v for k, v in avg.items() if k != "executor"), 1)
host_pcpu = 3200.0  # 32 vCPUs
print(json.dumps({
  "metric": "daemon_cpu_share", "samples": nsamp, "task_cores": int(sys.argv[3]),
  "avg_pcpu_by_class": avg, "daemon_pcpu": daemon,
  "daemon_share_of_host": round(daemon / host_pcpu, 3),
  "bench": json.loads(open(sys.argv[2]).read().strip() or "{}")}))
PY
