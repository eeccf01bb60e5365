#!/bin/bash
cd /root/repo
echo "=== min2 headline (sanity) ==="
timeout 3000 python bench.py 2>/dev/null
echo "=== compact XLA (PALLAS_COMPACT=0) ==="
SMAFA_TPU_PALLAS_COMPACT=0 timeout 3000 python bench.py --kernel compact 2>/dev/null
echo "=== compact Mosaic (PALLAS_COMPACT=1) ==="
SMAFA_TPU_PALLAS_COMPACT=1 timeout 3000 python bench.py --kernel compact 2>/dev/null
