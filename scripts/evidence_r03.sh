#!/bin/bash
# Round-3 hardware evidence: end-to-end solves + STATS batch + kbench.
# Run AFTER -check; serializes TPU use in one process chain.
# Outputs under /tmp/hw_r03/ (copied into hw_evidence/ once reviewed).
set -u
OUT=/tmp/hw_r03
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
stamp() { date -u +%H:%M:%S; }

echo "[$(stamp)] 1/4 56-bit solve (auto dp/window)..."
timeout 3600 python -u -m kangaroo_tpu.cli -nk 131072 \
    -o "$OUT/solve56_key.txt" fixtures/in56.txt \
    > "$OUT/solve56.txt" 2>&1
echo "rc=$?" >> "$OUT/solve56.txt"

echo "[$(stamp)] 2/4 64-bit solve (auto dp/window)..."
timeout 5400 python -u -m kangaroo_tpu.cli -nk 524288 \
    -o "$OUT/solve64_key.txt" fixtures/in64.txt \
    > "$OUT/solve64.txt" 2>&1
echo "rc=$?" >> "$OUT/solve64.txt"

echo "[$(stamp)] 3/4 STATS batch: 20 keys x 40-bit range..."
timeout 5400 python -u scripts/stats_batch.py fixtures/in40_20.txt 16 \
    > "$OUT/stats40.txt" 2>&1
echo "rc=$?" >> "$OUT/stats40.txt"

echo "[$(stamp)] 4/4 kbench per-op rates..."
timeout 3600 python -u scripts/kbench.py 19 > "$OUT/kbench.txt" 2>&1
echo "rc=$?" >> "$OUT/kbench.txt"

echo "[$(stamp)] done"
