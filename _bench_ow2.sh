#!/bin/bash
cd /root/repo
python - <<'PY' 2>/dev/null
from smafa_tpu.utils.platform import dispatch_latency_ms
print("dispatch latency ms:", dispatch_latency_ms())
PY
echo "=== 32768x1M ONEWAVE=0 ==="
SMAFA_TPU_ONEWAVE=0 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 32768 --batches 6 2>/dev/null
echo "=== 32768x1M ONEWAVE=1 ==="
SMAFA_TPU_ONEWAVE=1 timeout 4000 python tools/query_scale_bench.py --rows 1000000 --batch 32768 --batches 6 2>/dev/null
