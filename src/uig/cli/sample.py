"""`uig sample` — unconditional latent-space generation (SURVEY.md §0:
VAE-GAN prior sampling / VQGAN random-code decoding; the rung-4/5
"latent-space unpaired generation" serving path)."""

from __future__ import annotations

import os

import jax
import numpy as np


def run_sample(run_dir: str, output_dir: str, n: int = 16, seed: int = 0,
               step: int | None = None, overrides=()) -> int:
    from PIL import Image

    from uig.cli.translate import load_run
    from uig.kernels import denormalize_to_u8

    cfg, trainer, state = load_run(run_dir, step, overrides)
    os.makedirs(output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)

    kind = cfg.model.kind
    if kind == "vaegan":
        imgs = trainer.sample(state.ema, rng, n)
    elif kind == "vqgan_prior":
        # the canonical stage-2 path: autoregressive prior over the code
        # grid, decoded through the frozen stage-1 VQGAN
        imgs = trainer.sample(state, rng, n)
    elif kind == "vqgan":
        import warnings

        warnings.warn(
            "sampling a stage-1 vqgan run decodes UNIFORM-RANDOM codes "
            "(texture noise, not generation) — train a latent prior "
            "(model.kind=vqgan_prior, model.prior_vqgan_run=<this run>) "
            "and sample that run instead", stacklevel=2)
        latent_hw = cfg.model.image_size // (
            2 ** (len(cfg.model.vq_channel_mults) - 1))
        codes = jax.random.randint(
            rng, (n, latent_hw, latent_hw), 0, cfg.model.vq_codebook_size)
        imgs = trainer.decode_codes(state.ema, codes)
    else:
        raise ValueError(
            f"model kind {kind!r} has no unconditional sampling path "
            "(use vaegan, vqgan_prior, or vqgan)")

    u8 = np.asarray(denormalize_to_u8(imgs))
    for i in range(n):
        Image.fromarray(u8[i]).save(os.path.join(output_dir, f"{i:05d}.png"))
    return n
