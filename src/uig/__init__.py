"""uig — a TPU-native framework for unpaired image generation & translation.

Built from scratch in JAX/XLA/Pallas with the capability surface of
EleutherAI/Unpaired-Image-Generation (reference is an empty stub —
``/root/reference/README.md:1`` is its only line; the capability spec is
derived in SURVEY.md from the unpaired-translation domain + BASELINE.json):

* five model families: CycleGAN (+DiscoGAN preset), CUT, UNIT (shared-latent
  VAE pair), VAE-GAN, two-stage VQGAN (autoencoder + autoregressive prior)
* ResNet-block generators + PatchGAN discriminators (flax, NHWC, bf16 compute)
* adversarial (LSGAN/vanilla/hinge) + cycle + identity + KL + LPIPS +
  PatchNCE losses
* alternating G/D Adam steps compiled into a single XLA program per train step
* on-device fused augmentation (random-crop / flip / normalize) as Pallas and
  XLA kernels so the TPU never stalls on host preprocessing
* data-parallel training over a ``jax.sharding.Mesh`` with gradient ``pmean``
  over the ICI (``shard_map``); multi-host DP over DCN
* EMA generator weights, exact checkpoint/resume (orbax), FID eval, CLIs

High-level API::

    from uig import Config, get_preset, make_mesh, fit
    fit(get_preset("cyclegan128"))

or assemble manually::

    from uig import make_mesh
    from uig.train.cyclegan import CycleGANTrainer
    trainer = CycleGANTrainer(cfg, make_mesh())
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: importing uig must not pull jax eagerly
    if name in ("Config", "get_preset", "apply_overrides"):
        import uig.config as m

        return getattr(m, name)
    if name == "make_mesh":
        from uig.runtime import make_mesh

        return make_mesh
    if name == "fit":
        from uig.train.loop import fit

        return fit
    if name == "build_trainer":
        from uig.train.loop import build_trainer

        return build_trainer
    raise AttributeError(name)
