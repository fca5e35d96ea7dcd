"""In-training FID + best-FID checkpoint retention through fit()."""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "helpers"))


def test_fit_with_inline_fid_and_best_retention(tmp_path):
    from train_small import tiny_cfg

    from uig.train.loop import fit

    cfg = tiny_cfg(str(tmp_path), "fidrun")
    cfg = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, ckpt_every=2),
        eval=dataclasses.replace(cfg.eval, fid_every=2, fid_num_samples=6,
                                 fid_batch_size=3, fid_features="random",
                                 sample_grid_every=0),
    )
    fit(cfg, max_steps=4)
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, "fidrun", "metrics.jsonl"))]
    fids = [l["fid"] for l in lines if "fid" in l]
    assert len(fids) >= 2
    assert all(np.isfinite(f) and f >= 0 for f in fids)
    # checkpoints carry the metric and survive retention
    ckpts = os.listdir(os.path.join(tmp_path, "fidrun", "ckpt"))
    assert any(c.isdigit() for c in ckpts)
