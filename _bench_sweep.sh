#!/bin/bash
cd /root/repo
timeout 6000 python tools/baseline_e2e.py --skip-small 2>/dev/null
