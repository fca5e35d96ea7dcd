"""Worker for the two-process multi-host DP test.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <outdir>

Each process gets 4 fake CPU devices; the global mesh is 8 devices over DCN
(the same jax.distributed plumbing a real multi-host TPU pod uses). Runs one
CycleGAN train step with per-host input shards and writes its view of the
metrics + a param checksum for cross-process comparison.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", "src"))

import jax

coordinator, num_procs, proc_id, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)

import dataclasses

import numpy as np

from uig.config import get_preset
from uig.data import make_input_pipeline
from uig.runtime import make_mesh
from uig.train.cyclegan import CycleGANTrainer

assert jax.process_count() == num_procs
assert jax.device_count() == 4 * num_procs

cfg = get_preset("smoke64")
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                              d_layers=2),
    data=dataclasses.replace(cfg.data, batch_size=8, load_size=20,
                             synthetic_len=16, num_workers=1),
    opt=dataclasses.replace(cfg.opt, pool_size=2),
)
mesh = make_mesh()  # all 8 global devices
trainer = CycleGANTrainer(cfg, mesh)
state = trainer.init_state(jax.random.PRNGKey(0))
pipe = make_input_pipeline(cfg, mesh, start=False)  # per-host shards inside
batch = next(pipe)
state, metrics = trainer.train_step(state, batch)
host_metrics = {k: float(v) for k, v in metrics.items()}

# checksum of (replicated) updated params — must agree across processes
leaves = jax.tree_util.tree_leaves(jax.device_get(
    jax.tree_util.tree_map(
        lambda x: x.addressable_data(0), state.g_params)))
checksum = float(sum(np.float64(np.asarray(l)).sum() for l in leaves))

# in-training FID under process_count()>1 (round-1 rung-4 gap): each host
# streams its shard with a host-local EMA copy; the stats allgather inside
# compute_fid must make the value identical on every host.
import dataclasses as _dc

from uig.train.loop import _inline_fid

fid_cfg = _dc.replace(cfg, eval=_dc.replace(cfg.eval, fid_num_samples=8,
                                            fid_batch_size=4))
fid = float(_inline_fid(fid_cfg, trainer, state))

# in-training FID with FEWER eval images than hosts: host 1 owns zero
# indices and must contribute empty stats (not a duplicated image) — both
# hosts still agree on the value.
tiny_fid_cfg = _dc.replace(cfg, eval=_dc.replace(cfg.eval, fid_num_samples=1,
                                                 fid_batch_size=4))
fid_tiny = float(_inline_fid(tiny_fid_cfg, trainer, state))


def _checksum(tree) -> float:
    leaves = jax.tree_util.tree_leaves(jax.device_get(
        jax.tree_util.tree_map(lambda x: x.addressable_data(0), tree)))
    return float(sum(np.float64(np.asarray(l)).sum() for l in leaves))


# distributed checkpoint roundtrip (VERDICT round-2 item 8 — orbax
# multi-process save coordination is the classic place a pod launch dies
# first): save under process_count()==2, restore into a fresh state
# template, continue one step, and record a checksum of the continued
# params for cross-process comparison.
from uig.checkpoint.ckpt import CheckpointManager

ckpt_dir = os.path.join(outdir, "ckpt")  # shared dir, as on a pod's NFS/GCS
mngr = CheckpointManager(ckpt_dir, keep=2)
mngr.save(1, state, data_state=pipe.state_dict(), force=True)
mngr.wait()
template = trainer.init_state(jax.random.PRNGKey(0))
restored, data_state, _ = mngr.restore(template)
mngr.close()
restore_checksum = _checksum(restored.g_params)
pipe2 = make_input_pipeline(cfg, mesh, start=False)
pipe2.load_state_dict(data_state)
state2, metrics2 = trainer.train_step(restored, next(pipe2))
continued_checksum = _checksum(state2.g_params)

# KID across ragged per-host shards: raw features can't process_allgather
# directly (shapes must match), so compute_kid pads to the global max count
# and slices back by gathered counts — including a host with ZERO rows.
from uig.eval.fid import compute_kid

rng_k = np.random.default_rng(7)
kid_feats = {0: 24, 1: 5}[proc_id]   # ragged
kid = compute_kid(
    iter([rng_k.standard_normal((kid_feats, 16))]),
    iter([rng_k.standard_normal((kid_feats, 16)) + 0.5]),
    feature_fn=lambda x: np.asarray(x), feature_dim=16,
    n_subsets=8, subset_size=16)[0]
kid_empty = compute_kid(   # host 1 owns nothing at all
    iter([rng_k.standard_normal((12, 16))] if proc_id == 0 else []),
    iter([rng_k.standard_normal((12, 16))] if proc_id == 0 else []),
    feature_fn=lambda x: np.asarray(x), feature_dim=16,
    n_subsets=8, subset_size=8)[0]

with open(os.path.join(outdir, f"proc{proc_id}.json"), "w") as f:
    json.dump({"metrics": host_metrics, "checksum": checksum, "fid": fid,
               "fid_tiny": fid_tiny, "kid": kid, "kid_empty": kid_empty,
               "restore_checksum": restore_checksum,
               "continued_checksum": continued_checksum,
               "continued_metrics": {k: float(v) for k, v in metrics2.items()},
               "devices": jax.device_count(),
               "local_devices": jax.local_device_count()}, f)
print("WORKER_DONE", proc_id)
