#!/bin/bash
cd /root/repo
echo "=== K=99 16384x1M (round-4 best: 4.50 s/batch) ==="
timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 16384 --batches 5 --mode kmode --k 99 2>/dev/null
echo "=== K=99 16384x1M with XLA compact (A/B) ==="
SMAFA_TPU_PALLAS_COMPACT=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 16384 --batches 5 --mode kmode --k 99 2>/dev/null
