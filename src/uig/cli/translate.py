"""Batch inference: translate a directory through the EMA generator —
SURVEY.md §3 call stack 3.

Reuses the training-time L0 preprocessing kernel in deterministic mode
(host decode+resize to load_size → device center-crop + normalize), so
outputs are pixel-identical to training-time eval within float tolerance
(BASELINE.json north-star clause). Forward runs fp32 with pinned matmul
precision — the bit-exact serving path.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def load_run(run_dir: str, step: int | None = None, overrides=()):
    """Restore (cfg, trainer, state) from a training workdir."""
    from uig.checkpoint import CheckpointManager
    from uig.config import apply_overrides, config_from_dict
    from uig.runtime.mesh import make_mesh
    from uig.train.loop import build_trainer

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = config_from_dict(json.load(f))
    if overrides:
        cfg = apply_overrides(cfg, list(overrides))
    mesh = make_mesh(cfg.parallel.num_devices, cfg.parallel.data_axis)
    trainer = build_trainer(cfg, mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.run.seed))
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    state, _, _ = ckpt.restore(state, step=step)
    ckpt.close()
    return cfg, trainer, state


def run_translate(run_dir: str, input_dir: str, output_dir: str,
                  direction: str = "a2b", batch_size: int = 8,
                  step: int | None = None, overrides=(),
                  source: str = "auto", style_seed: int | None = None,
                  style_ref: str | None = None,
                  target_domain: int | None = None,
                  attention_dir: str | None = None) -> int:
    """``input_dir`` may be an image folder, a packed ``.npy``, or a
    tfrecord file/dir — every trainable source is servable (resolved by
    uig.data.datasets.resolve_dataset).

    Multimodal runs (kind=munit): ``style_seed`` samples ONE target-domain
    style code from N(0, I) applied to every image (vary the seed for a
    different output mode); ``style_ref`` extracts the style from a
    reference image of the TARGET domain instead (style-guided
    translation). Default (both None) is the zero style code — the prior
    mode, deterministic without flags.

    Multi-domain runs (kind=stargan): ``target_domain`` picks the integer
    domain translated INTO (default 0); ``direction`` is ignored.

    Attention runs (kind=ugatit): ``attention_dir`` additionally writes
    each input's CAM attention heatmap (the interpretability surface the
    U-GAT-IT paper ships) as a per-image-normalized grayscale PNG at the
    generator's attention resolution (H/4 × W/4), nearest-upsampled to the
    output size so it overlays the translation."""
    from PIL import Image

    from uig.data.datasets import item_names, resolve_dataset
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    cfg, trainer, state = load_run(run_dir, step, overrides)
    stargan = cfg.model.kind == "stargan"
    starganv2 = cfg.model.kind == "starganv2"
    if target_domain is not None and not (stargan or starganv2):
        raise ValueError(
            "--target-domain applies only to multi-domain (kind=stargan/"
            f"starganv2) runs; this run is kind={cfg.model.kind!r}")
    if attention_dir is not None and cfg.model.kind != "ugatit":
        raise ValueError(
            "--attention-dir applies only to attention (kind=ugatit) runs; "
            f"this run is kind={cfg.model.kind!r}")
    if attention_dir is not None:
        os.makedirs(attention_dir, exist_ok=True)
    ds = resolve_dataset(input_dir, cfg.data.load_size, source)
    names = item_names(ds)
    os.makedirs(output_dir, exist_ok=True)

    style = None
    if style_seed is not None or style_ref:
        import jax.numpy as jnp

        if not hasattr(trainer, "encode_style"):
            raise ValueError(
                "--style-seed/--style-ref apply only to multimodal "
                "(kind=munit/starganv2) runs; this run is "
                f"kind={cfg.model.kind!r}")

        def _load_ref():
            img = Image.open(style_ref).convert("RGB")
            s = cfg.data.load_size
            img = img.resize((s, s), Image.BILINEAR)
            return center_crop_normalize(
                jnp.asarray(np.asarray(img)[None]), cfg.model.image_size)

        if starganv2:
            # v2 styles are domain-conditional: reference image through the
            # EMA style encoder, or a mapping-network style from the seed
            t = target_domain or 0
            style = (trainer.encode_style(state.ema, _load_ref(), domain=t)
                     if style_ref
                     else trainer.style_from_seed(state.ema, style_seed, t))
        elif style_ref:
            style = trainer.encode_style(state.ema, _load_ref(),
                                         domain=direction[-1])
        else:
            style = jax.random.normal(
                jax.random.PRNGKey(style_seed), (1, trainer.style_dim))
        style = jnp.repeat(style, batch_size, 0)

    n = len(ds)
    done = 0
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        raw = np.stack([ds[i] for i in idxs])
        # pad the tail batch to the compiled batch size (static shapes)
        pad = batch_size - len(idxs)
        if pad:
            raw = np.concatenate([raw, np.repeat(raw[-1:], pad, 0)])
        import jax.numpy as jnp

        x = center_crop_normalize(jnp.asarray(raw), cfg.model.image_size)
        if starganv2:
            y = trainer.translate(state.ema, x, target_domain or 0,
                                  style=style)
        elif stargan:
            y = trainer.translate(state.ema, x, target_domain or 0)
        elif style is not None:
            y = trainer.translate(state.ema, x, direction, style=style)
        else:
            y = trainer.translate(state.ema, x, direction)
        out = np.asarray(denormalize_to_u8(y))[: len(idxs)]
        for i, img in zip(idxs, out):
            Image.fromarray(img).save(
                os.path.join(output_dir, f"{names[i]}.png"))
            done += 1
        if attention_dir is not None:
            heat = np.asarray(trainer.attention_heatmap(
                state.ema, x, direction))[: len(idxs), :, :, 0]
            s = cfg.model.image_size
            for i, h in zip(idxs, heat):
                lo, hi = float(h.min()), float(h.max())
                h8 = ((h - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)
                Image.fromarray(h8, mode="L").resize(
                    (s, s), Image.NEAREST).save(
                    os.path.join(attention_dir, f"{names[i]}.png"))
    return done
