#!/bin/bash
cd /root/repo
echo "=== A: default (tcount+miditer), 32768x1M ==="
SMAFA_TPU_ONEWAVE=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 32768 --batches 6 2>/dev/null
echo "=== B: adaptive compaction path (PAIR_COUNT=0, Mosaic compact), 32768x1M ==="
SMAFA_TPU_ONEWAVE=0 SMAFA_TPU_PAIR_COUNT=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 32768 --batches 6 2>/dev/null
echo "=== C: same as B but XLA compact (PALLAS_COMPACT=0) ==="
SMAFA_TPU_ONEWAVE=0 SMAFA_TPU_PAIR_COUNT=0 SMAFA_TPU_PALLAS_COMPACT=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 32768 --batches 6 2>/dev/null
