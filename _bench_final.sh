#!/bin/bash
cd /root/repo
echo "=== BASELINE 1M x 1M divergence sweep ==="
timeout 6000 python tools/baseline_e2e.py --config 3 2>/dev/null
echo "=== best-hit 32768 x 10M (BASELINE config) ==="
timeout 6000 python tools/query_scale_bench.py --rows 10000000 --batch 32768 --batches 4 2>/dev/null
echo "=== K-mode 8192 x 10M (round-4: 8.30 s/batch) ==="
timeout 6000 python tools/query_scale_bench.py --rows 10000000 --batch 8192 --batches 3 --mode kmode --k 99 2>/dev/null
