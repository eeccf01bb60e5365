#!/bin/bash
cd /root/repo
echo "=== A: pallas min2 + fused count ==="
SMAFA_TPU_PALLAS_MIN2=1 SMAFA_TPU_PALLAS_COUNT=1 timeout 2400 python tools/query_scale_bench.py --rows 1048576 --batch 16384 --batches 6 2>/dev/null | tail -1
echo "=== B: pallas min2 + tcount path (no fused count) ==="
SMAFA_TPU_PALLAS_MIN2=1 SMAFA_TPU_PALLAS_COUNT=0 timeout 2400 python tools/query_scale_bench.py --rows 1048576 --batch 16384 --batches 6 2>/dev/null | tail -1
echo "=== C: XLA min2 + tcount (round-3 shipped) ==="
SMAFA_TPU_PALLAS_MIN2=0 timeout 2400 python tools/query_scale_bench.py --rows 1048576 --batch 16384 --batches 6 2>/dev/null | tail -1
