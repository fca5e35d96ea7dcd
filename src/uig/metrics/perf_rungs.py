"""Per-rung throughput + roofline measurement (library).

Measures img/s and XLA-cost-model FLOPs for each trainer family at its
headline config on whatever accelerator is present.  Used by
``scripts/perf_rungs.py`` (manual, verbose) and by ``bench.py``'s all-rungs
array (driver-captured artifact, so a regression in ANY family surfaces in
``BENCH_r{N}.json`` — VERDICT round-3 item 8).

StarGAN honesty note (VERDICT round-3 item 7): the n_critic G update sits
inside a ``lax.cond``; XLA's static cost model counts BOTH branches, which
overstates the average executed step.  ``measure_rung`` lowers each branch
separately (``StarGANTrainer.flops_force_g_turn``) and weights them by the
schedule: F_avg = ((n-1)·F_dskip + F_dg)/n.
"""

import time

import numpy as np

PEAK_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}

# name -> (preset, overrides, batch)
RUNGS = {
    "cyclegan128": ("cyclegan128", [], 16),
    "cyclegan256": ("cyclegan256_dp", [], 16),
    # rung 3 AS BASELINE.json specifies it (configs[2]: identity + LPIPS
    # perceptual loss) — every other rung pins lambda_lpips=0, so this row
    # records the measured LPIPS tax vs the LPIPS-off headline.  VGG
    # features follow the documented converted-weights/random-VGG caveat
    # (eval/lpips.py; zero-egress env).
    "cyclegan256_lpips": ("cyclegan256_dp", ["loss.lambda_lpips=1.0"], 16),
    "cut256": ("cut256_multihost", ["parallel.multihost=False"], 16),
    # the official CUT topology (blur-pool/blur-up resampling); taps shifted
    # to the antialias layer list (stem / both post-IN-relu down features /
    # mid-trunk — the same stages the strided taps hit)
    "cut256_antialias": ("cut256_multihost", [
        "parallel.multihost=False", "model.resample=antialias",
        "model.nce_layers=(0,6,10,15)"], 16),
    "fastcut256": ("fastcut256", [], 16),
    "dclgan256": ("dclgan256", [], 16),
    "gcgan256": ("gcgan256", [], 16),
    # batch 24 (not 16): round-4 sweep — 60.5 img/s at 16 vs 61.7 at 24
    # with stem_dx_s2d (0.443 -> 0.452)
    "unit256": ("unit256", [], 24),
    "munit256": ("munit256", ["parallel.multihost=False"], 16),
    # batch 12: per-device batch must be a multiple of num_domains=3.
    # n_critic period fusion (round-5 A/B: 12.49 -> 11.83 ms/step, +5.6%,
    # scripts/stargan_period_ab.py): one statically-unrolled 4xD + 1x(D+G)
    # program per dispatch — the family's best measured config.
    "stargan128": ("stargan128", ["run.n_critic_fuse=True"], 12),
    # batch 24 (not 12): round-4 sweep 12/18/24 -> 22.7 / 21.2 / 27.1
    # img/s (0.280 / 0.265 / 0.340) — the 256²x64 full-res stages of v2's
    # four networks need the deeper batch to fill the MXU; 18 (not an
    # 8-multiple per device plane) is the worst of the three
    "starganv2_256": ("starganv2_256", [], 24),
    # B=16 + fused applies: round-5 sweep with the gather-free upsample —
    # B=16 plain 0.403, B=16 fused 0.419 (37.2 img/s), B=8 fused 0.406;
    # the rung records the family's best config (round-4 artifact
    # under-reported it at B=8 plain, 0.353; VERDICT r4 weak #2)
    "ugatit256": ("ugatit256", ["model.fused_applies=True"], 16),
    # B=16 (not 8): round-5 sweep with the gather-free upsample — B=8
    # 0.411, B=16 0.470 (48.8 img/s), B=12 0.351 (non-8-multiple plane)
    "nicegan256": ("nicegan256", [], 16),
    "vaegan256": ("vaegan256", [], 8),
    "vqgan256": ("vqgan512", ["model.image_size=256", "model.remat=none"], 4),
    "vqgan512": ("vqgan512", ["model.remat=blocks"], 8),
    # grad-accum-vs-remat A/B at the memory-bound rung: both memory levers
    # fit 512² B=8; remat pays recompute FLOPs, grad_accum pays microbatch
    # (B=2) execution efficiency. Adaptive weight off in BOTH arms (accum
    # cannot run it — see VQGANTrainer validation), so the pair is fair.
    "vqgan512_remat": ("vqgan512", ["model.remat=blocks",
                                    "loss.vq_adaptive_weight=false"], 8),
    # k=8 -> microbatch 2 over the 2B=16 union batch (microbatch 4 OOMs at
    # remat=none: fp32 GroupNorm temps are 520 MB each at 512² batch 4)
    "vqgan512_accum": ("vqgan512", ["model.remat=none", "opt.grad_accum=8",
                                    "loss.vq_adaptive_weight=false"], 8),
    # and the composition of both levers at microbatch 4
    "vqgan512_accum_remat": ("vqgan512", ["model.remat=blocks",
                                          "opt.grad_accum=4",
                                          "loss.vq_adaptive_weight=false"], 8),
}

# families covered by bench.py's driver-captured array: one rung per family
# (the headline config) plus the LPIPS-on flagship variant.  Ordered so the
# four families round 4's budget cut skipped (nicegan/vaegan/vqgan256/
# vqgan512) come FIRST after the flagship rows — a budget cut now drops the
# rungs that already have the most recorded history, not the least.  The
# extra A/B rungs stay manual (scripts/perf_rungs.py).
BENCH_FAMILIES = [
    "cyclegan256", "cyclegan256_lpips", "nicegan256", "vaegan256",
    "vqgan256", "vqgan512", "cyclegan128", "cut256", "fastcut256",
    "dclgan256", "gcgan256", "unit256", "munit256", "stargan128",
    "starganv2_256", "ugatit256",
]


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12  # default: v5e


def _static_flops(tr, state, dev):
    """XLA-cost-model FLOPs of the compiled step."""
    c = tr._train_step.lower(state, *(
        (tr.vqgan_params, dev[0], dev[1])
        if hasattr(tr, "vqgan_params") else tuple(dev))).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure_rung(name, steps=12, repeats=3, target_s: float = 0.0):
    """Measure one rung; returns a dict with ms/step, img/s, TF/step,
    roofline fraction and the repeat spread.  Raises on failure (callers
    decide how to report).

    ``target_s`` > 0 scales ``steps`` per rung from a 2-step probe so each
    repeat loop runs ~target_s seconds regardless of ms/step (an 886 ms
    starganv2 step doesn't need 10x3 to beat tunnel noise, while a 60 ms
    128² step needs >10 steps/loop to avoid the round-4 contamination
    footnote); ``steps`` then acts as the cap."""
    import jax

    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.loop import build_trainer

    preset, overrides, batch = RUNGS[name]
    cfg = apply_overrides(get_preset(preset), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0",
    ] + overrides)
    mesh = make_mesh()
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = cfg.data.load_size
    a = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    # stargan consumes ONE interleaved multi-domain array; v2 takes THREE
    if cfg.model.kind == "stargan":
        dev = shard_batch(mesh, (a,))
    elif cfg.model.kind == "starganv2":
        c = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
        dev = shard_batch(mesh, (a, b, c))
    else:
        dev = shard_batch(mesh, (a, b))
    # run.n_critic_fuse (StarGAN): measure the period-fused program; each
    # "step" below is one period of n_critic sub-steps, so per-step time
    # divides by n_critic and the schedule-weighted FLOPs stay comparable
    period_k = 1
    if getattr(cfg.run, "n_critic_fuse", False):
        period_k = tr.n_critic
        step_p = tr.build_period_step()
        one = dev[0] if isinstance(dev, tuple) else dev
        orig_step = tr.train_step
        tr.train_step = lambda s, d: step_p(s, [one] * period_k)
        del orig_step
    state, m = tr.train_step(state, dev)
    jax.device_get(m)
    if target_s > 0:
        t0 = time.perf_counter()
        for _ in range(2):
            state, m = tr.train_step(state, dev)
        jax.device_get(m)
        probe = (time.perf_counter() - t0) / 2
        steps = max(4, min(steps, int(round(target_s / max(probe, 1e-4)))))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = tr.train_step(state, dev)
        jax.device_get(m)
        # one train_step call = period_k schedule steps under n_critic_fuse
        times.append((time.perf_counter() - t0) / (steps * period_k))
    best = min(times)
    spread = (max(times) - best) / best if best else 0.0

    note = ""
    tf_step = 0.0
    try:
        if cfg.model.kind == "stargan" and tr.n_critic > 1:
            # schedule-weighted FLOPs: lower the D-only and D+G branches
            # separately (static python branch instead of the lax.cond)
            n = tr.n_critic
            fl = {}
            for flag in (False, True):
                tb = build_trainer(cfg, mesh)
                tb.flops_force_g_turn = flag
                fl[flag] = _static_flops(tb, state, dev)
            tf_step = ((n - 1) * fl[False] + fl[True]) / n / 1e12
            note = (f"schedule-weighted lax.cond FLOPs: d-only "
                    f"{fl[False] / 1e12:.2f} TF x{n - 1}/{n} + d+g "
                    f"{fl[True] / 1e12:.2f} TF x1/{n}")
        else:
            tf_step = _static_flops(tr, state, dev) / 1e12
    except Exception as e:
        note = f"cost analysis failed: {e}"
    peak = _peak_flops(jax.devices()[0])
    frac = tf_step * 1e12 / peak / best if tf_step else 0.0
    out = {
        "rung": name, "batch": batch,
        "ms_step": round(best * 1e3, 2),
        "img_s": round(batch / best, 2),
        "tf_step": round(tf_step, 3),
        "roofline": round(frac, 4),
        "steps": steps, "repeats": repeats,
        "spread": round(spread, 4),
    }
    if note:
        out["note"] = note
    return out
