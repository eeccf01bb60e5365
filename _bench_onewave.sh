#!/bin/bash
cd /root/repo
echo "=== best-hit 16384x1M ONEWAVE=0 ==="
SMAFA_TPU_ONEWAVE=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 16384 --batches 6 2>/dev/null
echo "=== best-hit 16384x1M ONEWAVE=1 ==="
SMAFA_TPU_ONEWAVE=1 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 16384 --batches 6 2>/dev/null
