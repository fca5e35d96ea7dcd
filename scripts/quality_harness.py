"""Shared scaffold for the per-family quality runs (VERDICT round-3 item 9).

Every quality run drives the FULL production path the same way — CLI train →
pipeline → one jitted shard_map step → EMA → in-training FID → checkpoints —
then parses `metrics.jsonl` and prints a loss subsample + the FID
trajectory.  That scaffold lives here ONCE; the per-family scripts are thin
entry points holding only their config overrides and the family-specific
post-train probes (multimodality, CAM separation, encoder reuse, ...).

Reference parity note: the reference repo is an empty stub
(/root/reference/README.md:1); these runs verify the derived spec's
golden/fidelity strategy (SURVEY.md §4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def run_cli_train(preset, workroot, name, overrides):
    """Run `uig train --preset <preset>` with dotted overrides; return the
    run workdir.  Asserts the CLI exits 0."""
    from uig.cli.main import main as cli

    args = ["train", "--preset", preset]
    for o in list(overrides) + [f"run.workdir={workroot}", f"run.name={name}"]:
        args += ["--set", o]
    t0 = time.perf_counter()
    rc = cli(args)
    wall = time.perf_counter() - t0
    assert rc == 0, f"train CLI failed (rc={rc}) for {name}"
    return os.path.join(workroot, name), wall


def read_metrics(workdir):
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def collect_fids(records):
    return [(r["step"], r["fid"]) for r in records if "fid" in r]


def print_loss_table(records, keys, every=8):
    """Print an every-(len//every) subsample of the loss records.

    ``keys``: list of (metric_key, format) — a record is a loss record when
    it contains the FIRST key; missing later keys print as 0.
    """
    rows = [r for r in records if keys[0][0] in r]
    for r in rows[:: max(1, len(rows) // every)]:
        cells = [f"{k} {r.get(k, 0.0):{fmt}}" for k, fmt in keys]
        print(f"step {r['step']:5d}  " + "  ".join(cells))


def print_fid_trajectory(fids, label="FID trajectory"):
    if not fids:
        print(f"{label}: no FID records!")
        return None
    best = min(fids, key=lambda t: t[1])
    print(f"{label}: first {fids[0][1]:.4f} @ {fids[0][0]} "
          f"... best {best[1]:.4f} @ {best[0]} "
          f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}")
    return best


def run_and_summarize(preset, workroot, name, overrides, loss_keys,
                      every=8):
    """The common whole: train, parse, print losses + FID trajectory.
    Returns (workdir, records, fids, wall_seconds)."""
    workdir, wall = run_cli_train(preset, workroot, name, overrides)
    records = read_metrics(workdir)
    if loss_keys:
        print_loss_table(records, loss_keys, every=every)
    fids = collect_fids(records)
    print_fid_trajectory(fids)
    return workdir, records, fids, wall


def load_eval_batch(workdir, n=8, domain=None):
    """Restore the run and build a normalized eval batch.

    domain=None  -> side A of the two-domain eval split;
    domain=int   -> that index of the multi-domain split.
    Returns (cfg, trainer, state, x).
    """
    import jax
    import numpy as np

    from uig.cli.translate import load_run
    from uig.kernels import center_crop_normalize

    cfg, trainer, state = load_run(workdir)
    if domain is None:
        from uig.data import eval_datasets

        ds, _ = eval_datasets(cfg)
    else:
        from uig.data import multidomain_eval_datasets

        ds = multidomain_eval_datasets(cfg)[domain]
    raw = np.stack([ds[i] for i in range(n)])
    x = center_crop_normalize(jax.numpy.asarray(raw), cfg.model.image_size)
    return cfg, trainer, state, x


def mean_pairwise_l1(outs):
    """Mean pairwise L1 across a list of equally-shaped arrays."""
    import numpy as np

    n = len(outs)
    d = [np.abs(outs[i] - outs[j]).mean()
         for i in range(n) for j in range(i + 1, n)]
    return float(np.mean(d))
