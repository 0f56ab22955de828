#!/bin/bash
# Interleaved A/B scaling matrix: repeats cancel noisy-neighbor drift;
# report the MIN wall per level (standard noise-resistant estimator).
# Output: one JSON line per run appended to $OUT.
set -u
N_PAGES="${1:-160000}"
REPEATS="${2:-3}"
OUT="${3:-/root/repo/BENCH_SCALING.jsonl}"
: > "$OUT"
for i in $(seq 1 "$REPEATS"); do
  for CFG in "4 8" "16 32"; do
    set -- $CFG
    CORES=$1; PARTS=$2
    timeout 590 spark-submit --master "local[$CORES]" --driver-memory 8g \
      --conf spark.local.dir=/dev/shm/spark-local \
      --conf spark.sql.shuffle.partitions=$PARTS \
      /root/repo/tools/scaling_run.py "$N_PAGES" 2>/dev/null | tail -1 >> "$OUT"
  done
done
echo "done" >> "$OUT"
