#!/bin/bash
# One-shot hardware evidence run: execute the full runbook the moment
# the TPU relay is reachable, saving all output under /tmp/hw_session/.
# Usage: bash scripts/hw_session.sh   (from the repo root)
#
# Sequence (each step under its own timeout so a relay drop mid-run
# still leaves the earlier evidence on disk):
#   1. variant sweep (scripts/chunk_sweep.py defaults, ~20 variants)
#   2. bench.py with current defaults
#   3. -check (hardware Pallas lockstep, production shapes)
set -u
OUT=/tmp/hw_session
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

stamp() { date -u +%H:%M:%S; }

echo "[$(stamp)] probing device..."
if ! timeout 90 python -c "import jax; print(jax.devices())" \
    > "$OUT/devices.txt" 2>&1; then
  echo "[$(stamp)] relay unreachable; aborting (see $OUT/devices.txt)"
  exit 1
fi
cat "$OUT/devices.txt"

echo "[$(stamp)] 1/3 variant sweep (long: ~20 compiles)..."
timeout 5400 python -u scripts/chunk_sweep.py 2>&1 | tee "$OUT/sweep.txt"

echo "[$(stamp)] 2/3 bench.py (current defaults)..."
timeout 900 python -u bench.py 2>&1 | tee "$OUT/bench.txt"

echo "[$(stamp)] 3/4 -check (hardware lockstep)..."
timeout 1800 python -u -m kangaroo_tpu.cli -check 2>&1 | tee "$OUT/check.txt"

echo "[$(stamp)] 4/4 56-bit solve wall rate (auto dp/nbrun/nwin)..."
timeout 1800 python -u -m kangaroo_tpu.cli -nk 131072 \
    fixtures/in56.txt 2>&1 | tee "$OUT/solve56.txt"

echo "[$(stamp)] done; outputs in $OUT"
