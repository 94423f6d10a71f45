#!/bin/bash
# Round-4 on-chip evidence queue, part 2 (verify already passed 12:14 UTC).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r4
mkdir -p "$OUT"
ts() { date -u +%H:%M:%S; }

echo "$(ts) step 1/2: full bench (100k + 1M + 6M scales)" | tee -a "$OUT/driver.log"
BENCH_BUDGET_S=3300 BENCH_HARD_S=3500 timeout 3600 python bench.py > "$OUT/bench2.log" 2>&1
rc=$?
echo "$(ts) bench rc=$rc" | tee -a "$OUT/driver.log"
grep '"metric"' "$OUT/bench2.log" | tail -1 >> BENCH_NOTES_r4_captures.jsonl
tail -5 "$OUT/bench2.log" | tee -a "$OUT/driver.log"

echo "$(ts) step 2/2: fuzzy dictionary-size scaling" | tee -a "$OUT/driver.log"
timeout 1800 python tools/fuzzy_dict_scaling.py 125000 250000 500000 1000000 > "$OUT/fuzzy_scaling.log" 2>&1
echo "$(ts) scaling rc=$? (table):" | tee -a "$OUT/driver.log"
tail -8 "$OUT/fuzzy_scaling.log" | tee -a "$OUT/driver.log"
echo "$(ts) queue done" | tee -a "$OUT/driver.log"
