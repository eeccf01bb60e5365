"""Profiling subsystem: stage timers, counters, and XLA trace emission."""

import io
import logging

import numpy as np
import pytest

from smafa_tpu.utils.profiling import StageTimers, maybe_trace


def test_stage_timers_accumulate_and_report(caplog):
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    t.count("comparisons", 1000)
    t.count("comparisons", 500)
    assert set(t.seconds) == {"a", "b"}
    assert t.counters["comparisons"] == 1500
    with caplog.at_level(logging.INFO, logger="smafa"):
        t.log_report(logging.INFO)
    joined = " ".join(r.getMessage() for r in caplog.records)
    assert "Stage times" in joined
    assert "1.5e+03" in joined or "1500" in joined


def test_maybe_trace_writes_xla_trace(tmp_path, monkeypatch):
    monkeypatch.setenv("SMAFA_TPU_TRACE_DIR", str(tmp_path / "trace"))
    import jax.numpy as jnp

    with maybe_trace():
        _ = np.asarray(jnp.arange(16) * 2)
    files = list((tmp_path / "trace").rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_maybe_trace_noop_without_config(monkeypatch):
    monkeypatch.delenv("SMAFA_TPU_TRACE_DIR", raising=False)
    with maybe_trace():
        pass  # must not raise or create anything
