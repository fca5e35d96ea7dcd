"""Named presets — one per BASELINE.json config rung.

BASELINE.json `configs` (the reference repo itself is an empty stub,
/root/reference/README.md:1, so these rungs are the authoritative ladder):

1. 64² ResNet G + 3-layer PatchGAN, CycleGAN losses, 200-image subset,
   single-host CPU, batch=1.
2. 128² full CycleGAN (2G+2D, replay buffer), single TPU chip.
3. 256² CycleGAN + identity/LPIPS, data-parallel, on-device augmentation.
4. 256² CUT-style contrastive unpaired translation with EMA, multi-host DP.
5. 512² VQGAN-style generator (codebook + discriminator) with Pallas
   attention blocks — stretch.
"""

from __future__ import annotations

import dataclasses

from uig.config.config import (
    Config,
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    OptConfig,
    ParallelConfig,
    RunConfig,
)


def _smoke64() -> Config:
    return Config(
        model=ModelConfig(
            kind="cyclegan",
            image_size=64,
            n_res_blocks=6,
            d_layers=3,
            compute_dtype="float32",
        ),
        loss=LossConfig(gan_mode="lsgan"),
        opt=OptConfig(total_steps=2000, decay_start_step=1000, pool_size=50),
        data=DataConfig(
            source="synthetic",
            load_size=72,
            batch_size=1,
            augment="xla",
            synthetic_len=200,
        ),
        run=RunConfig(name="smoke64", log_every=10, ckpt_every=200),
    )


def _smalldata64() -> Config:
    """The round-2-validated small-dataset recipe (BASELINE.md "Quality run
    v2"): TTUR (d_lr_ratio=0.5) + R1 (gamma=0.05) remove the D-overpowers-G
    collapse on few-hundred-image sets, and resize_conv upsampling (no
    checkerboard) improved best random-feature FID 20% (0.245@4500 vs the
    canonical recipe's 0.306@2000-then-collapse)."""
    return Config(
        model=ModelConfig(
            kind="cyclegan",
            image_size=64,
            n_res_blocks=6,
            d_layers=3,
            upsample="resize_conv",
        ),
        loss=LossConfig(gan_mode="lsgan", r1_gamma=0.05),
        opt=OptConfig(total_steps=5000, decay_start_step=2500,
                      d_lr_ratio=0.5, pool_size=50),
        data=DataConfig(
            source="synthetic",
            load_size=72,
            batch_size=8,
            augment="pallas",
            synthetic_len=200,
        ),
        eval=EvalConfig(fid_every=250, fid_num_samples=200),
        run=RunConfig(name="smalldata64", log_every=100, ckpt_every=1000),
    )


def _cyclegan128() -> Config:
    return Config(
        model=ModelConfig(kind="cyclegan", image_size=128, n_res_blocks=6,
                          head_s2d=4, stem_dx_s2d=4, fused_applies=True),
        loss=LossConfig(gan_mode="lsgan"),
        opt=OptConfig(total_steps=100_000, decay_start_step=50_000),
        data=DataConfig(load_size=143, batch_size=1, augment="pallas"),
        run=RunConfig(name="cyclegan128"),
    )


def _cyclegan256_dp() -> Config:
    return Config(
        model=ModelConfig(kind="cyclegan", image_size=256, n_res_blocks=9,
                          head_s2d=4, stem_dx_s2d=4, fused_applies=True),
        loss=LossConfig(gan_mode="lsgan", lambda_lpips=1.0),
        opt=OptConfig(total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="cyclegan256_dp"),
    )


def _cut256_multihost() -> Config:
    return Config(
        model=ModelConfig(kind="cut", image_size=256, n_res_blocks=9,
                          head_s2d=4),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=0.0, lambda_identity=0.0,
                        lambda_nce=1.0),
        opt=OptConfig(total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=16, augment="pallas"),
        parallel=ParallelConfig(num_devices=0, multihost=True),
        run=RunConfig(name="cut256_multihost"),
    )


def _fastcut256() -> Config:
    # FastCUT (Park et al. 2020, same paper as CUT): the lighter recipe —
    # NO identity NCE pass, lambda_NCE=10, flip-equivariance regularizer
    # (loss.nce_flip_equivariance). ~×2 faster per step than CUT (one
    # generator+one encoder apply fewer) at slightly weaker quality; the
    # published second configuration of the CUT paper.
    return Config(
        model=ModelConfig(kind="cut", image_size=256, n_res_blocks=9,
                          head_s2d=4),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=0.0,
                        lambda_identity=0.0, lambda_nce=10.0,
                        nce_include_identity=False,
                        nce_flip_equivariance=True),
        opt=OptConfig(total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=16, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="fastcut256"),
    )


def _dclgan256() -> Config:
    # DCLGAN (Han et al. 2021): dual-generator contrastive translation —
    # CycleGAN's two-generator topology but NO cycle loss; each direction
    # is constrained by PatchNCE with the paper's dual cross-embedding
    # (keys through the direction's own encoder+heads, queries through the
    # OTHER generator's). Published weights: λ_GAN=1, λ_NCE=2, L1 identity
    # (lambda_identity is the ABSOLUTE idt weight here — no cycle term to
    # scale by); built on the CUT codebase defaults (Adam 2e-4 β1 0.5,
    # 256 patches, τ=0.07).
    return Config(
        model=ModelConfig(kind="dclgan", image_size=256, n_res_blocks=9,
                          head_s2d=4),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=0.0,
                        lambda_identity=1.0, lambda_nce=2.0),
        opt=OptConfig(total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=16, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="dclgan256"),
    )


def _gcgan256() -> Config:
    # GcGAN (Fu et al. 2019): one-sided geometry-consistent translation —
    # ONE generator, TWO discriminators (the plain stream and the
    # f-transformed stream), content held by requiring G to commute with a
    # fixed geometric transform f (rot90 here; model.gc_transform=vflip is
    # the paper's other instantiation). No cycle, no contrastive term.
    # CycleGAN-family optimizer defaults (Adam 2e-4 β1 0.5, LSGAN, linear
    # decay); lambda_identity is the ABSOLUTE idt weight (off by default —
    # the gc term alone holds content in the paper's main configuration).
    return Config(
        model=ModelConfig(kind="gcgan", image_size=256, n_res_blocks=9,
                          gc_transform="rot90", head_s2d=4),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=0.0,
                        lambda_identity=0.0, lambda_gc=10.0),
        opt=OptConfig(total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=16, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="gcgan256"),
    )


def _discogan64() -> Config:
    # DiscoGAN (Kim et al. 2017) is architecturally the CycleGAN topology
    # with the original (vanilla/BCE) GAN loss and NO identity term — it
    # maps onto CycleGANTrainer directly; this preset encodes the canonical
    # DiscoGAN recipe (64², vanilla GAN, recon weight folded into
    # lambda_cycle, Adam 2e-4/(0.5, 0.999)). Completes the SURVEY §0
    # lineage "CycleGAN / CUT / UNIT / DiscoGAN".
    return Config(
        model=ModelConfig(kind="cyclegan", image_size=64, n_res_blocks=6,
                          d_layers=3),
        loss=LossConfig(gan_mode="vanilla", lambda_cycle=10.0,
                        lambda_identity=0.0),
        opt=OptConfig(total_steps=100_000, decay_start_step=50_000),
        data=DataConfig(load_size=72, batch_size=8, augment="pallas"),
        run=RunConfig(name="discogan64"),
    )


def _unit256() -> Config:
    # rung-4 family sibling: shared-latent UNIT (the remaining member of
    # the SURVEY §0 lineage "CycleGAN / CUT / UNIT / DiscoGAN"). Canonical
    # UNIT weights: recon = cycle = 10 (lambda_cycle), KL = 0.01, LSGAN,
    # Adam lr 1e-4 / (0.5, 0.999).
    return Config(
        model=ModelConfig(kind="unit", image_size=256,
                          stem_dx_s2d=4,
                          unit_private_res=2, unit_shared_res=2),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=10.0,
                        lambda_unit_kl=0.01),
        opt=OptConfig(lr=1e-4, total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="unit256"),
    )


def _munit256() -> Config:
    # multimodal extension of the lineage (MUNIT, Huang et al. 2018):
    # content/style decomposition, AdaIN decoder, 3-scale unnormalized
    # PatchGAN. Canonical config: style_dim 8, 4 content res blocks,
    # recon λ_x=10 / λ_c=λ_s=1 / cycle 0, LSGAN, Adam 1e-4 (0.5, 0.999).
    return Config(
        model=ModelConfig(kind="munit", image_size=256,
                          stem_dx_s2d=4,
                          munit_style_dim=8, munit_content_res=4,
                          munit_mlp_dim=256, d_num_scales=3, d_norm="none",
                          d_layers=4),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=10.0,
                        lambda_munit_c=1.0, lambda_munit_s=1.0,
                        lambda_munit_cyc=0.0),
        opt=OptConfig(lr=1e-4, total_steps=200_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="munit256"),
    )


def _stargan128() -> Config:
    # multi-domain extension of the lineage (StarGAN, Choi et al. 2018):
    # one G(x, target_label) + one D with an auxiliary domain classifier.
    # Canonical CelebA recipe: 128², 6 res blocks, 6-layer D, WGAN-GP
    # (λ_gp=10), λ_cls=1, λ_rec=10, Adam 1e-4 (0.5, 0.999), n_critic=5.
    return Config(
        model=ModelConfig(kind="stargan", image_size=128, num_domains=3,
                          stem_dx_s2d=4,
                          n_res_blocks=6, d_layers=6),
        loss=LossConfig(gan_mode="wgan", lambda_cycle=10.0, lambda_cls=1.0,
                        lambda_gp=10.0, lambda_identity=0.0),
        opt=OptConfig(lr=1e-4, total_steps=200_000, decay_start_step=100_000,
                      d_steps_per_g=5),
        data=DataConfig(load_size=143, batch_size=12, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="stargan128"),
    )


def _starganv2_256() -> Config:
    # style-based multi-domain multimodal successor (StarGAN v2, Choi et
    # al. 2020). Canonical AFHQ recipe: 256², style_dim 64, latent 16,
    # non-saturating GAN + R1(γ=1), λ_sty=1, λ_ds=2 decayed over 100k,
    # λ_cyc=1, Adam 1e-4 (0, 0.99) + wd 1e-4, mapping network at 1e-6.
    # (num_domains=3 matches AFHQ's cat/dog/wild; set data.domain_dirs.)
    return Config(
        model=ModelConfig(kind="starganv2", image_size=256, num_domains=3,
                          v2_style_dim=64, v2_latent_dim=16,
                          v2_max_features=512),
        loss=LossConfig(gan_mode="vanilla", r1_gamma=1.0, lambda_sty=1.0,
                        lambda_ds=2.0, ds_decay_steps=100_000,
                        lambda_cycle=1.0, lambda_identity=0.0),
        opt=OptConfig(lr=1e-4, b1=0.0, b2=0.99, weight_decay=1e-4,
                      f_lr_ratio=0.01, ema_decay=0.999,
                      total_steps=100_000, decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="starganv2_256"),
    )


def _ugatit256() -> Config:
    # attention member of the lineage (U-GAT-IT, Kim et al. 2019, "light"):
    # CAM-attended generator with AdaLIN decoder, per-domain global (7-layer)
    # + local (5-layer) spectral-norm CAM discriminators. Canonical recipe:
    # 256², 4 res blocks, LSGAN, λ_cycle=10, λ_identity=10 (absolute — here
    # lambda_identity is the ×lambda_cycle multiplier, so 1.0), λ_cam=1000,
    # Adam 1e-4 (0.5, 0.999) + weight decay 1e-4, resize-286/crop-256.
    return Config(
        model=ModelConfig(kind="ugatit", image_size=256, n_res_blocks=4,
                          stem_dx_s2d=4,
                          ugatit_d_global_layers=7, ugatit_d_local_layers=5),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=10.0,
                        lambda_identity=1.0, lambda_cam=1000.0),
        opt=OptConfig(lr=1e-4, weight_decay=1e-4, total_steps=200_000,
                      decay_start_step=100_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="ugatit256"),
    )


def _nicegan256() -> Config:
    # encoder-reuse member of the lineage (NICE-GAN, Chen et al. 2020):
    # translation = Dec_tgt(E_src(x)) with E the first stage of the
    # spectral-norm discriminator; decoupled training (E updates only in
    # the D step). Published recipe: 256², 6 decoder res blocks, LSGAN,
    # adv 1 (patch + CAM), λ_cycle=10, λ_recon=10, Adam 1e-4 (0.5, 0.999)
    # + weight decay 1e-4, resize-286/crop-256.
    return Config(
        model=ModelConfig(kind="nicegan", image_size=256, n_res_blocks=6),
        loss=LossConfig(gan_mode="lsgan", lambda_cycle=10.0,
                        lambda_recon=10.0),
        opt=OptConfig(lr=1e-4, weight_decay=1e-4, total_steps=100_000,
                      decay_start_step=50_000),
        data=DataConfig(load_size=286, batch_size=8, augment="pallas"),
        parallel=ParallelConfig(num_devices=0),
        run=RunConfig(name="nicegan256"),
    )


def _vaegan256() -> Config:
    # rung 4 alternative: "256² VAE-GAN ... with EMA generator, multi-host DP"
    return Config(
        model=ModelConfig(
            kind="vaegan",
            image_size=256,
            vq_base_features=64,
            vq_channel_mults=(1, 2, 2, 4),
            vq_embed_dim=64,
            vq_attn_resolutions=(32,),
            vq_beta=1e-2,  # KL weight
            attn_impl="pallas",
        ),
        loss=LossConfig(gan_mode="hinge", lambda_vq_adv=0.5, vq_disc_start=5_000),
        opt=OptConfig(lr=1e-4, b1=0.5, b2=0.9, total_steps=300_000,
                      decay_start_step=150_000),
        data=DataConfig(load_size=286, batch_size=16, augment="pallas"),
        parallel=ParallelConfig(num_devices=0, multihost=True),
        run=RunConfig(name="vaegan256"),
    )


def _vqgan512() -> Config:
    return Config(
        model=ModelConfig(
            kind="vqgan",
            image_size=512,
            vq_base_features=128,
            vq_channel_mults=(1, 1, 2, 2, 4),
            vq_attn_resolutions=(32,),
            attn_impl="pallas",
        ),
        loss=LossConfig(gan_mode="hinge", lambda_vq_adv=0.8,
                        vq_disc_start=10_000, vq_adaptive_weight=True),
        opt=OptConfig(lr=4.5e-6, b1=0.5, b2=0.9, total_steps=500_000,
                      decay_start_step=500_000),
        data=DataConfig(load_size=512, batch_size=4, augment="pallas"),
        run=RunConfig(name="vqgan512"),
    )


PRESETS = {
    "smoke64": _smoke64,
    "smalldata64": _smalldata64,
    "cyclegan128": _cyclegan128,
    "cyclegan256_dp": _cyclegan256_dp,
    "cut256_multihost": _cut256_multihost,
    "fastcut256": _fastcut256,
    "dclgan256": _dclgan256,
    "gcgan256": _gcgan256,
    "unit256": _unit256,
    "munit256": _munit256,
    "stargan128": _stargan128,
    "starganv2_256": _starganv2_256,
    "ugatit256": _ugatit256,
    "nicegan256": _nicegan256,
    "discogan64": _discogan64,
    "vaegan256": _vaegan256,
    "vqgan512": _vqgan512,
}


def get_preset(name: str, **replacements) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    if replacements:
        cfg = dataclasses.replace(cfg, **replacements)
    return cfg
