#!/bin/bash
# A/B bench: r14-close (3c1ab45) vs r15 HEAD (568ab65), alternating
# A B A B on the same box, one suite pass per invocation, sf0.1.
set -u
OUT=/root/repo/.ab/out
mkdir -p "$OUT"
run_one() {
  local side=$1 pass=$2
  rm -rf /tmp/spark-* /tmp/graft_* 2>/dev/null
  cd /root/repo/.ab/$side || exit 1
  echo "=== $side pass $pass start $(date -u +%H:%M:%S) ===" >> "$OUT/log.txt"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=1 \
  java -XX:+UseG1GC -Xmx100g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$OUT/${side}_p${pass}.out" 2> "$OUT/${side}_p${pass}.err"
  cp target/bench_metrics.json "$OUT/${side}_p${pass}_metrics.json" 2>/dev/null
  echo "=== $side pass $pass done  $(date -u +%H:%M:%S) ===" >> "$OUT/log.txt"
}
run_one r14 1
run_one r15 1
run_one r14 2
run_one r15 2
echo ALL_DONE >> "$OUT/log.txt"
