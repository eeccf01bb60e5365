#!/bin/bash
cd /root/repo
echo "=== production shape (mutated queries, div=5): ONEWAVE=0 ==="
SMAFA_TPU_ONEWAVE=0 timeout 4000 python tools/baseline_e2e.py --skip-small --sweep 5 --queries 500000 2>/dev/null
echo "=== ONEWAVE=1 ==="
SMAFA_TPU_ONEWAVE=1 timeout 4000 python tools/baseline_e2e.py --skip-small --sweep 5 --queries 500000 2>/dev/null
