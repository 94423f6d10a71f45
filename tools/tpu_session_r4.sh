#!/bin/bash
# Round-4 on-chip evidence queue. Run as ONE process chain the moment the
# tunnel recovers (single-client tunnel: never two TPU processes at once).
# Logs land in /tmp/tpu_r4/; the bench JSON line is appended to
# BENCH_NOTES_r4_captures.jsonl in the repo root.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r4
mkdir -p "$OUT"
ts() { date -u +%H:%M:%S; }

echo "$(ts) step 1/4: tpu_verify" | tee -a "$OUT/driver.log"
timeout 900 python tools/tpu_verify.py > "$OUT/verify.log" 2>&1
echo "$(ts) verify rc=$? (tail):" | tee -a "$OUT/driver.log"
tail -3 "$OUT/verify.log" | tee -a "$OUT/driver.log"

echo "$(ts) step 2/4: full bench (100k + 1M + 6M scales)" | tee -a "$OUT/driver.log"
BENCH_BUDGET_S=3300 BENCH_HARD_S=3500 timeout 3600 python bench.py > "$OUT/bench.log" 2>&1
rc=$?
echo "$(ts) bench rc=$rc" | tee -a "$OUT/driver.log"
grep '"metric"' "$OUT/bench.log" | tail -1 >> BENCH_NOTES_r4_captures.jsonl
tail -5 "$OUT/bench.log" | tee -a "$OUT/driver.log"

echo "$(ts) step 3/4: fuzzy dictionary-size scaling" | tee -a "$OUT/driver.log"
timeout 1800 python tools/fuzzy_dict_scaling.py 125000 250000 500000 1000000 > "$OUT/fuzzy_scaling.log" 2>&1
echo "$(ts) scaling rc=$? (table):" | tee -a "$OUT/driver.log"
tail -8 "$OUT/fuzzy_scaling.log" | tee -a "$OUT/driver.log"

echo "$(ts) step 4/4: done — captures in $OUT + BENCH_NOTES_r4_captures.jsonl" | tee -a "$OUT/driver.log"
