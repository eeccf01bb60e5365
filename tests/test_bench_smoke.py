"""Smoke test for bench.py — the artifact the driver runs on real TPU
hardware at the end of every round. Runs it in a subprocess on the CPU
backend (bench.py's own CI sizing branch) and validates the one-JSON-line
output contract so schema or import rot is caught in the suite, not at
judging time."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent


def _run_bench(*extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device is enough, faster startup
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *extra],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {proc.stdout!r}"
    return json.loads(lines[0])


def test_bench_default_contract():
    rec = _run_bench()
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "query_db_comparisons_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 1.0e9)


@pytest.mark.parametrize("kernel", ["compact", "hist"])
def test_bench_kernel_variants(kernel):
    rec = _run_bench("--kernel", kernel)
    assert rec["value"] > 0
