"""The training loop — glue for SURVEY.md §3 call stack 1.

Composes: config → mesh → trainer → input pipeline → hot loop (jitted
train_step) → metrics (JSONL/TB) → async orbax checkpoints → sample grids →
profiler window. Also the failure-detection story (SURVEY.md §5): SIGTERM/
SIGINT triggers a final checkpoint save; resume is exact (state + pipeline
cursor both checkpointed).
"""

from __future__ import annotations

import os
import signal
import time

import jax
import numpy as np

from uig.checkpoint import CheckpointManager
from uig.checkpoint.ckpt import dump_run_config
from uig.config import Config, config_to_dict
from uig.data import make_input_pipeline
from uig.kernels import center_crop_normalize, denormalize_to_u8
from uig.metrics import MetricsWriter, StepTimer
from uig.runtime.mesh import make_mesh, maybe_init_multihost


def build_trainer(cfg: Config, mesh):
    """Trainer factory over the three model families (SURVEY.md §2)."""
    kind = cfg.model.kind
    perceptual_fn = None
    if cfg.loss.lambda_lpips > 0:
        from uig.eval.lpips import make_lpips

        perceptual_fn = make_lpips(cfg, weights_path=cfg.eval.vgg_weights or None)
    if kind == "cyclegan":
        from uig.train.cyclegan import CycleGANTrainer

        return CycleGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "cut":
        from uig.train.cut import CUTTrainer

        return CUTTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "dclgan":
        from uig.train.dclgan_trainer import DCLGANTrainer

        return DCLGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "gcgan":
        from uig.train.gcgan_trainer import GcGANTrainer

        return GcGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "unit":
        from uig.train.unit_trainer import UNITTrainer

        return UNITTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "munit":
        from uig.train.munit_trainer import MUNITTrainer

        return MUNITTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "stargan":
        from uig.train.stargan_trainer import StarGANTrainer

        return StarGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "starganv2":
        from uig.train.starganv2_trainer import StarGANv2Trainer

        return StarGANv2Trainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "nicegan":
        from uig.train.nicegan_trainer import NICEGANTrainer

        return NICEGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "ugatit":
        from uig.train.ugatit_trainer import UGATITTrainer

        return UGATITTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "vqgan":
        from uig.train.vqgan_trainer import VQGANTrainer

        return VQGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "vaegan":
        from uig.train.vaegan_trainer import VAEGANTrainer

        return VAEGANTrainer(cfg, mesh, perceptual_fn=perceptual_fn)
    if kind == "vqgan_prior":
        from uig.train.prior_trainer import PriorTrainer

        return PriorTrainer(cfg, mesh)
    raise ValueError(f"unknown model kind {kind!r}")


def fit(cfg: Config, max_steps: int | None = None) -> dict:
    """Run training to cfg.opt.total_steps (or max_steps). Returns final
    metrics. Resumes automatically from the newest checkpoint in workdir."""
    maybe_init_multihost(cfg.parallel.multihost)
    if cfg.run.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.run.check_tracer_leaks:
        jax.config.update("jax_check_tracer_leaks", True)
    mesh = make_mesh(cfg.parallel.num_devices, cfg.parallel.data_axis)
    trainer = build_trainer(cfg, mesh)
    k = cfg.run.steps_per_dispatch
    multi_step = None
    if cfg.run.n_critic_fuse:
        from uig.train.multi_step import validate_dispatch_alignment

        if k > 1:
            raise ValueError(
                "run.n_critic_fuse and run.steps_per_dispatch>1 are "
                "mutually exclusive (both change the dispatch chunk)")
        if not hasattr(trainer, "build_period_step"):
            raise ValueError(
                "run.n_critic_fuse is only supported for model.kind="
                f"'stargan', not {cfg.model.kind!r}")
        k = trainer.n_critic
        validate_dispatch_alignment(cfg, k)
        multi_step = trainer.build_period_step()
    elif k > 1:
        from uig.train.multi_step import (build_multi_step,
                                          validate_dispatch_alignment)

        validate_dispatch_alignment(cfg)
        multi_step = build_multi_step(trainer, k)

    workdir = os.path.join(cfg.run.workdir, cfg.run.name)
    os.makedirs(workdir, exist_ok=True)
    dump_run_config(config_to_dict(cfg), workdir)
    writer = MetricsWriter(workdir, tensorboard=cfg.run.tensorboard)
    ckpt = CheckpointManager(
        os.path.join(workdir, "ckpt"), keep=cfg.run.ckpt_keep,
        best_metric="fid" if cfg.eval.fid_every else None)

    state = trainer.init_state(jax.random.PRNGKey(cfg.run.seed))
    pipe = make_input_pipeline(cfg, mesh, start=False)
    if ckpt.latest_step() is not None:
        state, data_state, _ = ckpt.restore(state)
        if data_state:
            pipe.load_state_dict(data_state)
    pipe.start()

    stop = {"flag": False}

    def _handle(sig, frame):
        stop["flag"] = True

    old_term = signal.signal(signal.SIGTERM, _handle)
    old_int = signal.signal(signal.SIGINT, _handle)

    total = max_steps if max_steps is not None else cfg.opt.total_steps
    timer = StepTimer()
    metrics = {}
    last_saved = -1
    last_fid = None
    prof_start, prof_stop = cfg.run.profile_steps
    profiling = False
    single_warned = False
    try:
        step = int(jax.device_get(state.step))
        while step < total and not stop["flag"]:
            if prof_stop > prof_start and step == prof_start and not profiling:
                jax.profiler.start_trace(os.path.join(workdir, "profile"))
                profiling = True
            # chunk = k steps in one dispatch (run.steps_per_dispatch) when
            # aligned; 1 otherwise (unaligned preemption-resume point or
            # tail). Cadences are validated multiples of k.
            chunk = (k if multi_step is not None and step % k == 0
                     and step + k <= total else 1)
            if multi_step is not None and chunk == 1 and not single_warned:
                # the single-step fallback compiles a SECOND full XLA
                # program — loud so the (rare) cost is attributable
                print("uig: steps_per_dispatch falling back to single-step "
                      f"dispatch at step {step} (unaligned resume point or "
                      "tail); this compiles the single-step program once.")
                single_warned = True
            timer.data_start()
            batches = [next(pipe) for _ in range(chunk)]
            timer.data_stop()
            if chunk == 1:
                state, metrics = trainer.train_step(state, batches[0])
            else:
                state, metrics = multi_step(state, batches)
            step += chunk
            timer.step_done(cfg.data.batch_size * chunk)
            if profiling and step >= prof_stop:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False
            if step % cfg.run.log_every == 0:
                host_m = {k: float(v) for k, v in metrics.items()}
                host_m["images_per_sec_chip"] = timer.throughput / max(
                    jax.device_count(), 1
                )
                host_m["input_stall_pct"] = timer.stall_pct
                host_m.update(_hbm_stats())
                writer.write(step, host_m)
                timer.reset()
            if (cfg.eval.fid_every and step % cfg.eval.fid_every == 0
                    and hasattr(trainer, "translate")):
                last_fid = _inline_fid(cfg, trainer, state)
                writer.write(step, {"fid": last_fid})
            if cfg.run.ckpt_every and step % cfg.run.ckpt_every == 0:
                ckpt.save(step, state, data_state=pipe.state_dict(),
                          metrics={"fid": last_fid} if last_fid is not None
                          else None)
                last_saved = step
            if (
                cfg.eval.sample_grid_every
                and step % cfg.eval.sample_grid_every == 0
                and hasattr(trainer, "translate")
            ):
                _write_sample_grid(cfg, trainer, state, workdir, step)
        # final (or preemption) save
        if last_saved != step:
            ckpt.save(step, state, data_state=pipe.state_dict(), force=True)
        ckpt.wait()
    finally:
        if profiling:
            jax.profiler.stop_trace()
        pipe.stop()
        writer.close()
        ckpt.close()
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
    return {k: float(v) for k, v in metrics.items()} if metrics else {}


def _hbm_stats() -> dict:
    """Device-memory observability: HBM in use / peak on local device 0,
    logged at each metrics boundary. Gated — some backends (CPU, the axon
    tunnel) return None from memory_stats(); they just get no HBM keys."""
    try:
        s = jax.local_devices()[0].memory_stats()
    except Exception:
        return {}
    if not s:
        return {}
    out = {}
    if "bytes_in_use" in s:
        out["hbm_gb_in_use"] = s["bytes_in_use"] / 2**30
    if "peak_bytes_in_use" in s:
        out["hbm_gb_peak"] = s["peak_bytes_in_use"] / 2**30
    return out


def _local_ema(state):
    """EMA params usable for host-local (non-collective) jit: the global
    replicated arrays as-is in single-process runs, a host-local copy in
    multi-process runs (replicated arrays are fully addressable per host, so
    device_get is a local read — no collective)."""
    if jax.process_count() == 1:
        return state.ema
    return jax.device_get(state.ema)


def _inline_fid(cfg, trainer, state) -> float:
    """In-training FID (a2b) on up to eval.fid_num_samples images — feeds the
    best-FID checkpoint retention (SURVEY.md §5).

    Multi-host: each host translates + featurizes its strided index shard
    with a host-local EMA copy; compute_fid sums the streaming mean/cov
    stats across processes before the Fréchet solve, so every host returns
    the same FID and best-FID retention works in multi-host runs (the
    round-1 rung-4 gap)."""
    import jax.numpy as jnp

    from uig.data import eval_datasets
    from uig.eval.fid import compute_fid, make_feature_fn

    if cfg.model.kind in ("stargan", "starganv2"):
        return _inline_fid_stargan(cfg, trainer, state)
    ds_a, ds_b = eval_datasets(cfg)
    n = min(cfg.eval.fid_num_samples, len(ds_a), len(ds_b))
    bs = cfg.eval.fid_batch_size
    crop = cfg.model.image_size
    hc, hi = jax.process_count(), jax.process_index()
    # a host may own zero indices (fid_num_samples < process_count); it then
    # contributes empty (n=0) stats to the cross-process reduction instead of
    # re-using an image another host already owns (which would double-count
    # those features in the summed stats).
    mine = list(range(hi, n, hc))
    ema = _local_ema(state)

    def real_batches():
        for s in range(0, len(mine), bs):
            raw = np.stack([ds_b[i] for i in mine[s:s + bs]])
            yield center_crop_normalize(jnp.asarray(raw), crop)

    def fake_batches():
        for s in range(0, len(mine), bs):
            raw = np.stack([ds_a[i] for i in mine[s:s + bs]])
            yield trainer.translate(
                ema, center_crop_normalize(jnp.asarray(raw), crop), "a2b")

    feature_fn, _ = make_feature_fn(cfg)
    feat_dim = int(jax.eval_shape(
        feature_fn,
        jax.ShapeDtypeStruct((1, crop, crop, 3), jnp.float32)).shape[-1])
    return compute_fid(real_batches(), fake_batches(), feature_fn,
                       feature_dim=feat_dim)


def _inline_fid_stargan(cfg, trainer, state) -> float:
    """StarGAN in-training FID: translate every OTHER domain's eval images
    into domain 0 and compare to domain-0 reals (one scalar that tracks both
    realism and domain transfer; same streaming cross-process stats as the
    two-domain path)."""
    import jax.numpy as jnp

    from uig.data import multidomain_eval_datasets
    from uig.eval.fid import compute_fid, make_feature_fn

    domains = multidomain_eval_datasets(cfg)
    n = min(cfg.eval.fid_num_samples, *[len(d) for d in domains])
    bs = cfg.eval.fid_batch_size
    crop = cfg.model.image_size
    hc, hi = jax.process_count(), jax.process_index()
    mine = list(range(hi, n, hc))
    ema = _local_ema(state)
    sources = domains[1:]

    def real_batches():
        for s in range(0, len(mine), bs):
            raw = np.stack([domains[0][i] for i in mine[s:s + bs]])
            yield center_crop_normalize(jnp.asarray(raw), crop)

    def fake_batches():
        # round-robin the source domains over the index shard
        for s in range(0, len(mine), bs):
            idx = mine[s:s + bs]
            raw = np.stack([sources[i % len(sources)][i] for i in idx])
            yield trainer.translate(
                ema, center_crop_normalize(jnp.asarray(raw), crop), 0)

    feature_fn, _ = make_feature_fn(cfg)
    feat_dim = int(jax.eval_shape(
        feature_fn,
        jax.ShapeDtypeStruct((1, crop, crop, 3), jnp.float32)).shape[-1])
    return compute_fid(real_batches(), fake_batches(), feature_fn,
                       feature_dim=feat_dim)


def _write_sample_grid(cfg, trainer, state, workdir: str, step: int,
                       n: int | None = None) -> None:
    """Fixed-seed A→B and B→A translation grid PNG (SURVEY.md §5 metrics).

    Multi-host: host 0 renders the grid from its host-local EMA copy (the
    translation is not collective); other hosts return immediately."""
    if jax.process_index() != 0:
        return
    try:
        from PIL import Image
    except ImportError:
        return
    from uig.data import eval_datasets

    n = n or cfg.eval.sample_grid_n
    import jax.numpy as jnp

    ema = _local_ema(state)
    if cfg.model.kind in ("stargan", "starganv2"):
        # one row pair per domain d: sources, then their translation to
        # domain (d+1) % N
        from uig.data import multidomain_eval_datasets

        domains = multidomain_eval_datasets(cfg)
        rows = []
        for d, ds in enumerate(domains):
            raw = jnp.asarray(np.stack([ds[i] for i in range(n)]))
            x = center_crop_normalize(raw, cfg.model.image_size)
            y = trainer.translate(ema, x, (d + 1) % len(domains))
            src = np.asarray(denormalize_to_u8(x))
            dst = np.asarray(denormalize_to_u8(y))
            rows.append(np.concatenate([np.concatenate(list(src), 1),
                                        np.concatenate(list(dst), 1)], 0))
        grid = np.concatenate(rows, 0)
        out_dir = os.path.join(workdir, "samples")
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray(grid).save(
            os.path.join(out_dir, f"step_{step:08d}.png"))
        return
    ds_a, ds_b = eval_datasets(cfg)
    raw_a = jnp.asarray(np.stack([ds_a[i] for i in range(n)]))
    raw_b = jnp.asarray(np.stack([ds_b[i] for i in range(n)]))
    xa = center_crop_normalize(raw_a, cfg.model.image_size)
    xb = center_crop_normalize(raw_b, cfg.model.image_size)
    pairs = [(xa, trainer.translate(ema, xa, "a2b"))]
    if "b2a" in getattr(trainer, "directions", ("a2b", "b2a")):
        pairs.append((xb, trainer.translate(ema, xb, "b2a")))
    rows = []
    for pair in pairs:
        src = np.asarray(denormalize_to_u8(pair[0]))
        dst = np.asarray(denormalize_to_u8(pair[1]))
        rows.append(np.concatenate([np.concatenate(list(src), 1),
                                    np.concatenate(list(dst), 1)], 0))
    grid = np.concatenate(rows, 0)
    out_dir = os.path.join(workdir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    Image.fromarray(grid).save(os.path.join(out_dir, f"step_{step:08d}.png"))
