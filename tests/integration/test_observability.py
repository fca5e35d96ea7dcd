"""Profiler window + stall accounting + lr decay behavior through fit()."""

import dataclasses
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "helpers"))


def test_profiler_window_writes_trace(tmp_path):
    from train_small import tiny_cfg

    from uig.train.loop import fit

    cfg = tiny_cfg(str(tmp_path), "prof")
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, profile_steps=(1, 3)))
    fit(cfg, max_steps=4)
    traces = glob.glob(os.path.join(tmp_path, "prof", "profile", "**", "*"),
                       recursive=True)
    assert traces, "no profiler trace written"


def test_lr_linear_decay_reaches_zero():
    from uig.config import OptConfig
    from uig.train.state import lr_schedule

    sched = lr_schedule(OptConfig(lr=2e-4, total_steps=100, decay_start_step=50))
    np.testing.assert_allclose(float(sched(0)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(75)), 1e-4, rtol=1e-5)
    assert float(sched(100)) == 0.0
    assert float(sched(150)) == 0.0  # clamped


def test_metrics_contains_throughput_and_stall(tmp_path):
    from train_small import tiny_cfg

    from uig.train.loop import fit

    cfg = tiny_cfg(str(tmp_path), "obs")
    fit(cfg, max_steps=2)
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, "obs", "metrics.jsonl"))]
    assert lines
    for l in lines:
        assert "images_per_sec_chip" in l and "input_stall_pct" in l
        assert 0 <= l["input_stall_pct"] <= 100


def test_hbm_stats_gated():
    """_hbm_stats returns {} on backends without memory_stats (CPU/tunnel)
    and only GB-scaled keys when the backend provides them."""
    from uig.train.loop import _hbm_stats

    out = _hbm_stats()
    assert isinstance(out, dict)
    for k, v in out.items():
        assert k in ("hbm_gb_in_use", "hbm_gb_peak")
        assert v >= 0
