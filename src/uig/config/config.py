"""Typed dataclass config tree with dotted-path CLI overrides.

Capability spec: SURVEY.md §2 "Config system" / §5 "Config/flag system"
(reference repo is an empty stub — /root/reference/README.md:1 — so the
surface here is derived from BASELINE.json's five config rungs).

Design: a frozen nested dataclass tree; presets (uig/config/presets.py) give
one named ``Config`` per BASELINE.json rung; ``apply_overrides`` implements
``--opt.lr=1e-4``-style dotted overrides; every run dumps its resolved config
(``config_to_dict`` → json) next to its checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Generator/discriminator architecture knobs."""

    # cyclegan | cut | dclgan | gcgan | unit | munit | stargan | starganv2 |
    # ugatit | nicegan | vqgan | vaegan | vqgan_prior
    kind: str = "cyclegan"
    image_size: int = 256  # output (crop) resolution, square
    in_channels: int = 3
    out_channels: int = 3
    # ResNet generator (c7s1-64, d128, d256, R256 x n_res_blocks, u128, u64, c7s1-3)
    g_base_features: int = 64
    n_res_blocks: int = 9
    upsample: str = "conv_transpose"  # conv_transpose | resize_conv
    # generator resampling topology: "strided" = canonical CycleGAN
    # (stride-2 convs down, `upsample` up); "antialias" = the official CUT
    # generator's default — stride-1 conv + blur-pool down, blur-upsample +
    # conv up (Zhang 2019). Needed to serve/import official CUT checkpoints
    # (scripts/import_cut_torch.py). Layer indices shift: nce_layers are
    # per-resample-mode.
    resample: str = "strided"  # strided | antialias
    norm: str = "instance"  # instance | group | none
    padding: str = "reflect"  # reflect | zeros
    # reflect-conv lowering. "fused": implicit-zero-pad conv + exact border
    # ring overwrite — canonical reflect semantics WITHOUT the ~20% step tax
    # explicit pads cost (they defeat XLA's pad-into-conv fusion; BASELINE.md
    # round-2 pad ablation). "explicit": materialized reflect pad (the
    # canonical-but-slow lowering; kept for A/Bs and as the fallback for
    # planes ≤ 2·pad).
    pad_impl: str = "fused"  # fused | explicit
    # PatchGAN discriminator
    d_base_features: int = 64
    d_layers: int = 3  # 3 => 70x70 receptive field
    # dtypes: params fp32 always; compute dtype selectable (bf16 on TPU train,
    # fp32 for bit-exact eval — BASELINE.json north_star fidelity clause).
    compute_dtype: str = "bfloat16"
    eval_dtype: str = "float32"
    # rematerialize generator activations (jax.checkpoint): trades FLOPs for
    # HBM so 512²/large-batch configs fit (SURVEY.md §7 donation/memory note).
    #   none   — store all activations
    #   full   — checkpoint whole generator applies (one region per apply;
    #            largest programs — this environment's remote compiler 500s
    #            on it at 512², BASELINE.md)
    #   blocks — checkpoint per residual block (many small regions: near-full
    #            memory savings in the trunk, compiler-friendlier program)
    # bools are accepted for backward compat (True→full, False→none).
    remat: str = "none"
    # conv execution for the generator's movement-bound shapes:
    # "pallas" = s2d coarse-domain Pallas kernel for the 7x7 head conv
    # (the honest round-2 breakdown: head ran at 0.018 of roofline under
    # XLA; the Pallas kernel wins 1.5x in isolation but loses in-graph to
    # XLA fusion — BASELINE.md round 2). Everything else (trunk resblocks,
    # stem, downsample, instance norms) always stays on XLA, which measured
    # at or near the practical ceiling for those shapes.
    conv_impl: str = "xla"  # xla | pallas
    # route trunk conv+IN(+ReLU) pairs through the fused Pallas kernel
    # (uig.kernels.convin_pallas): conv + fp32 channel moments + normalize
    # in ONE VMEM residency per example — two full-plane HBM reads saved
    # per pair vs XLA's conv/moments/normalize lowering. Identical param
    # tree and math; falls back per-plane when VMEM won't fit.
    convin_pallas: bool = False
    # space-to-depth factor for the 3-channel generator head conv (0 = off).
    # The c7s1-3 head is 3/128 MXU-lane-efficient and ~25% of the 256² step;
    # b=4 executes the same linear map with 48 output lanes (docs/DESIGN.md
    # §5b). Exact same parameters; output differs only by fp reassociation.
    head_s2d: int = 0
    # same trick for the c7s1-64 stem conv (cin=3 is 3/128 lane-efficient on
    # the CONTRACTION side: k·k·cin = 147; b=4 recomputes it as one stride-4
    # conv with contraction 10·10·3 = 300 and 1024 output lanes). 0 = off.
    stem_s2d: int = 0
    # s2d the stem's BACKWARD-DATA conv only: its dx writes a 3-lane
    # 256²-image-grad plane, profiled at 0.023 of MXU peak — the single
    # worst conv in the round-4 per-op budget (scripts/perf_budget.py).
    # Forward lowering (and thus the stem->IN fusion that made stem_s2d a
    # round-3 negative) is untouched. 0 = off.
    stem_dx_s2d: int = 0
    # and for the two stride-2 downsample convs (executed as one stride-2b
    # conv over b² output blocks — layers.PadConv._s2d_conv generalizes to
    # any stride). 0 = off.
    down_s2d: int = 0
    # batch same-params applies inside the step: the fake and identity
    # passes share generator params (fake_b = G_a2b(real_a), idt_b =
    # G_a2b(real_b)) and run as ONE 2B-batch apply; likewise each
    # discriminator's real/fake pair in the D loss. InstanceNorm is
    # per-example, so this is the same math (fp reassociation only); it
    # halves the per-op count of those passes, amortizing per-op fixed
    # costs. Measured +2% on 256² CycleGAN (preset default there); for CUT
    # it measured -12%: batching defeats XLA's CSE of the NCE encoder
    # passes against the full generator applies (BASELINE.md round 3) —
    # leave it off for CUT unless the taps/flow change.
    fused_applies: bool = False
    # VQGAN (rung 5)
    vq_embed_dim: int = 256
    vq_codebook_size: int = 1024
    vq_channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)
    vq_base_features: int = 128
    vq_attn_resolutions: tuple[int, ...] = (32,)
    vq_beta: float = 0.25  # commitment cost
    attn_impl: str = "pallas"  # pallas | xla
    # VQGAN latent prior (stage 2: autoregressive transformer over the code
    # grid — kind="vqgan_prior"; models/prior.py)
    prior_dim: int = 512
    prior_depth: int = 8
    prior_heads: int = 8
    # "ar" = decoder-only autoregressive transformer (canonical VQGAN
    # stage 2); "maskgit" = bidirectional masked-token prior with parallel
    # iterative decoding (MaskGIT, Chang et al. 2022) — same trainer,
    # different training objective + sampler (models/prior.py)
    prior_style: str = "ar"
    # maskgit sampling: decoding rounds and the annealed-Gumbel choice
    # temperature from the published recipe
    prior_sample_steps: int = 12
    prior_choice_temp: float = 4.5
    # finished stage-1 vqgan run dir whose frozen EMA params the prior
    # trains against (required for kind="vqgan_prior" outside tests)
    prior_vqgan_run: str = ""
    # UNIT (shared-latent VAE pair — models/unit.py): residual blocks that
    # are private per domain vs SHARED between the two encoders/decoders
    # (the shared-latent-space assumption). Latent = 4·g_base_features
    # channels at quarter resolution; posterior is N(mu, I).
    unit_private_res: int = 2
    unit_shared_res: int = 2
    # MUNIT (content/style decomposition — models/munit.py): style vector
    # dim (canonical 8), residual blocks in the content encoder = AdaIN
    # blocks in the decoder, and the style-MLP hidden width.
    munit_style_dim: int = 8
    munit_content_res: int = 4
    munit_mlp_dim: int = 256
    # multi-scale PatchGAN (models/patch_disc.py MultiScaleDiscriminator):
    # number of avg-pool pyramid scales D judges (1 = the plain single-scale
    # PatchGAN; MUNIT's canonical config uses 3). Honored by the MUNIT
    # trainer; d_norm picks the per-scale norm ("none" is MUNIT-canonical,
    # the normalization-free D).
    d_num_scales: int = 3
    d_norm: str = "none"
    # StarGAN (multi-domain translation — models/stargan.py): ONE generator
    # conditioned on a target-domain one-hot (spatially broadcast, concat to
    # the input), ONE discriminator with a real/fake patch head plus an
    # auxiliary domain classifier. num_domains also sizes the multi-domain
    # input pipeline (data.domain_dirs for folders; synthetic provides
    # procedural domains).
    num_domains: int = 3
    # StarGAN v2 (style-based multi-domain multimodal — models/starganv2.py):
    # style-vector width (canonical 64), mapping-network latent width
    # (canonical 16), and the channel cap for the G/E/D trunks (canonical
    # 512). num_domains is shared with StarGAN v1; g_base_features /
    # d_base_features size the G and E/D stems.
    v2_style_dim: int = 64
    v2_latent_dim: int = 16
    v2_max_features: int = 512
    # U-GAT-IT (attention member of the lineage — models/ugatit.py): depth
    # of the per-domain GLOBAL and LOCAL spectral-norm CAM discriminators
    # (published config: 7 and 5 — i.e. 5 and 3 stride-2 convs).
    ugatit_d_global_layers: int = 7
    ugatit_d_local_layers: int = 5
    # CUT (rung 4)
    nce_layers: tuple[int, ...] = (0, 4, 8, 12, 16)
    nce_patches: int = 256
    nce_proj_dim: int = 256
    # GcGAN (train/gcgan_trainer.py): the fixed geometric transform f the
    # translator must commute with (G(f(x)) == f(G(x))). The paper's two
    # instantiations: 90° rotation or vertical flip — horizontal flip is
    # deliberately NOT offered (it is an augmentation symmetry of most
    # domains, so commuting with it would be vacuous).
    gc_transform: str = "rot90"  # rot90 | vflip


@dataclass(frozen=True)
class LossConfig:
    gan_mode: str = "lsgan"  # lsgan | vanilla | hinge | wgan
    lambda_cycle: float = 10.0
    lambda_identity: float = 0.5  # multiplied by lambda_cycle (CycleGAN recipe)
    lambda_lpips: float = 0.0
    lambda_nce: float = 1.0  # CUT
    nce_temperature: float = 0.07
    nce_include_identity: bool = True  # CUT: NCE on idt pass (Y->Y)
    # FastCUT's flip-equivariance regularizer: with p=0.5 per step the whole
    # batch is horizontally flipped before the generator, and the NCE QUERY
    # features (from G's output) are flipped back before patch matching —
    # the deliberate q/k misalignment that pressures G toward
    # flip-equivariance. Canonical FastCUT = this + nce_include_identity
    # False + lambda_nce 10 (the fastcut256 preset).
    nce_flip_equivariance: bool = False
    # UNIT: weight on all four KL(N(mu,I)‖N(0,I)) terms (canonical config
    # value 0.01); the recon/cycle L1 weights reuse lambda_cycle (=10 in
    # the canonical UNIT recipe for both)
    lambda_unit_kl: float = 0.01
    # MUNIT latent-reconstruction weights (image recon reuses lambda_cycle,
    # =10 in the canonical config): content recon L1(c, E_dst(x_cross)),
    # style recon L1(s~N(0,I), S_dst(x_cross)), and the optional explicit
    # cycle x -> cross -> back (0 in the canonical edges/faces configs).
    lambda_munit_c: float = 1.0
    lambda_munit_s: float = 1.0
    lambda_munit_cyc: float = 0.0
    lambda_vq_adv: float = 1.0  # VQGAN generator adversarial weight
    vq_disc_start: int = 0  # step at which D loss turns on (VQGAN warmup)
    # canonical VQGAN adaptive adversarial weight: scale lambda_vq_adv by
    # ||grad_last(L_rec)|| / ||grad_last(L_adv)|| (Esser et al. 2021), the
    # known-fragile-but-standard stabilizer for 512² VQGAN training
    vq_adaptive_weight: bool = False
    # StarGAN: auxiliary domain-classification weight (λ_cls, canonical 1)
    # and WGAN-GP gradient-penalty weight (λ_gp, canonical 10; active with
    # gan_mode="wgan"). The cycle-reconstruction weight reuses lambda_cycle
    # (canonical λ_rec = 10, same value).
    lambda_cls: float = 1.0
    lambda_gp: float = 10.0
    # StarGAN v2: style-reconstruction weight λ_sty (canonical 1), the
    # INITIAL diversity-sensitive weight λ_ds (canonical 1; 2 for AFHQ) —
    # linearly decayed to 0 over ds_decay_steps (canonical 100k) — and the
    # decay horizon. Cycle weight reuses lambda_cycle (canonical 1 for v2,
    # set in the preset).
    lambda_sty: float = 1.0
    lambda_ds: float = 1.0
    ds_decay_steps: int = 100_000
    # U-GAT-IT CAM weight: BCE on the generators' attention-classifier
    # logits (source domain -> 1, identity pass -> 0); published 1000.
    lambda_cam: float = 1000.0
    # GcGAN: weight of the summed two-direction geometry-consistency L1
    # (f(G(x)) vs G(f(x)) and f⁻¹(G(f(x))) vs G(x)). Plays the structural
    # role the cycle term plays elsewhere (the content-preserving
    # constraint), hence the same weight class as lambda_cycle.
    lambda_gc: float = 10.0
    # NICE-GAN: weight of the own-encoding reconstruction term
    # Dec_src(E_src(x)) ≈ x (the paper's identity analogue; published 10;
    # cycle reuses lambda_cycle, same published value).
    lambda_recon: float = 10.0
    # R1 gradient penalty on D at real inputs (γ/2·E‖∇ₓD(x)‖²); 0 disables.
    # The D-regularization knob for small-data runs where D overpowers G
    # (round-1 5000-step finding: d_loss→0.04 and FID drifts back up).
    r1_gamma: float = 0.0
    # Adaptive discriminator augmentation (train/ada.py): differentiable
    # augmentation of EVERY image D sees (reals, pool fakes, and the fakes
    # inside the G loss — G gets gradients through it). ada_target > 0
    # enables the StyleGAN2-ADA controller (p driven by the overfitting
    # heuristic r_t = E[sign(D(real)−center)] toward the target, canonical
    # 0.6); ada_target == 0 with ada_p_init > 0 is the fixed-p DiffAugment
    # policy. The p state lives in the train state and the whole controller
    # is inside the one compiled step.
    ada_target: float = 0.0
    ada_p_init: float = 0.0
    ada_speed_kimg: float = 500.0  # images (k) for p to traverse 0→1
    ada_ops: str = "color,translation,cutout"  # + optional xflip


@dataclass(frozen=True)
class OptConfig:
    optimizer: str = "adam"
    lr: float = 2e-4
    b1: float = 0.5
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 0.0  # 0 disables
    # linear decay to 0 after `decay_start_step`, reaching 0 at `total_steps`
    total_steps: int = 200_000
    decay_start_step: int = 100_000
    # decay shape after decay_start_step: linear (canonical CycleGAN),
    # cosine (half-cosine to 0 at total_steps), or constant (no decay)
    lr_decay: str = "linear"
    # linear lr warmup 0→lr over the first N steps (0 = off); composes with
    # any lr_decay shape and with d_lr_ratio/f_lr_ratio scaling
    warmup_steps: int = 0
    ema_decay: float = 0.999
    # split the per-device batch into k microbatches whose forward/backward
    # run sequentially under lax.scan INSIDE the one compiled step
    # (train/microbatch.py): peak activation memory ~ B_local/k at unchanged
    # FLOPs and an IDENTICAL training trajectory (all losses are batch
    # means; fp reassociation only — with ADA on, augmentation draws are
    # resampled per microbatch). The in-graph alternative to model.remat
    # when batch > 1. Per-device batch must divide by k. 1 = off.
    grad_accum: int = 1
    pool_size: int = 50  # replay buffer (per data-parallel shard)
    # D learning rate = lr * d_lr_ratio (TTUR-style knob; <1 weakens D on
    # small datasets)
    d_lr_ratio: float = 1.0
    # StarGAN v2 mapping network F trains at lr·f_lr_ratio (canonical
    # 1e-6 vs the 1e-4 base — ratio 0.01)
    f_lr_ratio: float = 0.01
    # critic steps per generator step (canonical WGAN-GP/StarGAN: 5). The
    # trainer updates D every step and gates the G/EMA update on
    # step % d_steps_per_g == d_steps_per_g - 1 via lax.cond, so the whole
    # schedule stays ONE compiled XLA program. 1 = classic alternating.
    d_steps_per_g: int = 1


@dataclass(frozen=True)
class DataConfig:
    source: str = "synthetic"  # synthetic | folders | packed | tfrecord | webdataset
    dir_a: str = ""
    dir_b: str = ""
    # StarGAN multi-domain sources: one image folder per domain (must match
    # model.num_domains); empty = synthetic procedural domains
    domain_dirs: tuple[str, ...] = ()
    load_size: int = 286  # host resize target; device crops to image_size
    batch_size: int = 1  # GLOBAL batch size (sharded over the data axis)
    shuffle_seed: int = 0
    num_workers: int = 4
    prefetch: int = 2
    # producer threads building+device_put'ing whole batches concurrently
    # (>1 overlaps host->device transfers; batches stay ordered via a
    # reorder buffer, and the one-integer iterator checkpoint is unchanged)
    producer_threads: int = 1
    augment: str = "pallas"  # pallas | xla | none (none = center crop)
    synthetic_len: int = 200  # images per domain for the synthetic set


@dataclass(frozen=True)
class ParallelConfig:
    data_axis: str = "data"
    num_devices: int = 0  # 0 = all local devices
    multihost: bool = False  # call jax.distributed.initialize()


@dataclass(frozen=True)
class EvalConfig:
    fid_num_samples: int = 500
    fid_features: str = "auto"  # auto | inception | random
    inception_weights: str = ""  # optional .npz path (zero-egress environment)
    vgg_weights: str = ""  # optional .npz for LPIPS (else random seed-0 VGG)
    # optional official LPIPS lin-layer weights .npz (export_weights.py
    # lpips_lin); with it AND vgg_weights the term is exact published LPIPS
    lpips_lin_weights: str = ""
    fid_every: int = 0  # in-training FID cadence (0 = off); enables best-FID
    fid_batch_size: int = 16
    sample_grid_every: int = 1000
    sample_grid_n: int = 4


@dataclass(frozen=True)
class RunConfig:
    name: str = "run"
    workdir: str = "/tmp/uig_runs"
    log_every: int = 50
    ckpt_every: int = 1000
    ckpt_keep: int = 3
    seed: int = 0
    # scan k train steps inside ONE jitted dispatch (train/multi_step.py):
    # identical math to k separate dispatches; removes per-step host launch
    # overhead, which dominates at small resolutions (64² rungs) where the
    # device step is a few ms. Every host-visible cadence (log/ckpt/fid/
    # sample/profile) must be a multiple of k (validated loudly). 1 = off.
    steps_per_dispatch: int = 1
    # StarGAN only: statically unroll one n_critic period ((n-1) D-only +
    # 1 D+G sub-steps) into ONE jitted dispatch
    # (StarGANTrainer.build_period_step) — removes the n_critic lax.cond
    # and amortizes per-dispatch fixed overhead n×. Identical math to
    # aligned single steps; cadences must be multiples of n_critic
    # (validated loudly). Mutually exclusive with steps_per_dispatch.
    n_critic_fuse: bool = False
    profile_steps: tuple[int, int] = (0, 0)  # (start, stop); equal = disabled
    tensorboard: bool = False
    # sanitizer-equivalents (SURVEY.md §5 "race detection"): no native code,
    # so the JAX-level checks are the story — nan/inf trapping and leaked-
    # tracer checking around the train loop.
    debug_nans: bool = False
    check_tracer_leaks: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    opt: OptConfig = field(default_factory=OptConfig)
    data: DataConfig = field(default_factory=DataConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    run: RunConfig = field(default_factory=RunConfig)


# ---------------------------------------------------------------------------
# dict round-trip + dotted-path overrides
# ---------------------------------------------------------------------------


def config_to_dict(cfg: Any) -> dict:
    """Recursively convert a (nested) dataclass to plain JSON-able dicts."""
    out = {}
    for f in fields(cfg):
        v = getattr(cfg, f.name)
        if is_dataclass(v):
            out[f.name] = config_to_dict(v)
        elif isinstance(v, tuple):
            out[f.name] = list(v)
        else:
            out[f.name] = v
    return out


def config_from_dict(d: dict, cls: type = Config) -> Any:
    """Inverse of config_to_dict (unknown keys rejected loudly)."""
    kwargs = {}
    field_map = {f.name: f for f in fields(cls)}
    for k, v in d.items():
        if k not in field_map:
            raise KeyError(f"unknown config field {cls.__name__}.{k}")
        f = field_map[k]
        if is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[k] = config_from_dict(v, f.type)
        elif isinstance(v, dict):
            # nested dataclass declared via string annotation
            sub = _resolve_dataclass(cls, f.name)
            kwargs[k] = config_from_dict(v, sub)
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _resolve_dataclass(cls: type, name: str) -> type:
    for f in fields(cls):
        if f.name == name:
            t = f.type
            if isinstance(t, str):
                t = globals()[t]
            return t
    raise KeyError(name)


def _coerce(old: Any, raw: str) -> Any:
    """Coerce a CLI string to the type of the existing value."""
    if isinstance(old, bool):
        if raw.lower() in ("1", "true", "yes"):
            return True
        if raw.lower() in ("0", "false", "no"):
            return False
        raise ValueError(f"cannot parse bool from {raw!r}")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, tuple):
        parts = [p for p in raw.strip("()[] ").split(",") if p != ""]
        if old:
            elem_t = type(old[0])
        else:
            # empty default carries no element type (e.g. data.domain_dirs);
            # infer per-part: int if it parses, else float, else string
            def elem_t(p):
                for t in (int, float):
                    try:
                        return t(p)
                    except ValueError:
                        pass
                return p
        return tuple(elem_t(p) for p in parts)
    return raw


def apply_overrides(cfg: Config, overrides: dict[str, str] | list[str]) -> Config:
    """Apply ``{"opt.lr": "1e-4"}`` or ``["opt.lr=1e-4"]`` style overrides."""
    if isinstance(overrides, list):
        pairs = {}
        for item in overrides:
            if "=" not in item:
                raise ValueError(f"override {item!r} is not key=value")
            k, v = item.split("=", 1)
            pairs[k.lstrip("-")] = v
        overrides = pairs
    for path, raw in overrides.items():
        parts = path.split(".")
        cfg = _replace_path(cfg, parts, raw)
    return cfg


def _replace_path(node: Any, parts: list[str], raw: str) -> Any:
    head = parts[0]
    if not hasattr(node, head):
        raise KeyError(f"no config field {head!r} on {type(node).__name__}")
    cur = getattr(node, head)
    if len(parts) == 1:
        new = raw if not isinstance(raw, str) else _coerce(cur, raw)
        return dataclasses.replace(node, **{head: new})
    return dataclasses.replace(node, **{head: _replace_path(cur, parts[1:], raw)})


def dump_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2, sort_keys=True)


def load_config(path: str) -> Config:
    with open(path) as f:
        return config_from_dict(json.load(f))


def remat_mode(value) -> str:
    """Normalize ModelConfig.remat: bools and their string forms are legacy
    for full/none; returns one of none | full | blocks."""
    if isinstance(value, bool):
        return "full" if value else "none"
    v = str(value).lower()
    if v in ("true", "1", "yes"):
        return "full"
    if v in ("false", "0", "no", ""):
        return "none"
    if v not in ("none", "full", "blocks"):
        raise ValueError(f"model.remat must be none|full|blocks, got {value!r}")
    return v
