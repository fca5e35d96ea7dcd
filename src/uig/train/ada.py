"""Adaptive discriminator augmentation (ADA) / DiffAugment — in-graph
differentiable augmentation of every image the discriminator sees.

Why this exists: the measured failure mode of every small-data quality run
in BASELINE.md (CycleGAN round-1 5000-step run, UNIT, MUNIT) is D
memorizing the tiny dataset — d_loss → 0 and FID drifts back up after the
best checkpoint. TTUR (`opt.d_lr_ratio`) + R1 (`loss.r1_gamma`) bound the
drift; augmenting D's inputs attacks the cause (D can no longer memorize
exact pixels). Published specs implemented here (architecture/recipe
constants only — the reference repo is an empty stub,
/root/reference/README.md:1):

  * DiffAugment (Zhao et al. 2020): fixed-probability policy
    {color, translation, cutout} applied to BOTH reals and fakes at every
    D application, differentiably, so G receives gradients through the
    augmentation.
  * StyleGAN2-ADA (Karras et al. 2020): the same pipeline gated per image
    per op with probability p, where p is CONTROLLED by the overfitting
    heuristic r_t = E[sign(D(real) - center)]: if D is more confident than
    ``target`` (r_t > target) p rises, else it decays — p lives in the
    train state and the update is part of the one compiled step program.

TPU-first design: every op is a static-shape jnp expression (selects,
per-example dynamic_slice on a zero-padded plane, iota masks) — XLA fuses
the whole pipeline into the surrounding D forward; nothing here allocates
dynamically or round-trips to the host. The per-image Bernoulli gates and
magnitudes are pure functions of the step key, so the step stays a
deterministic function of (state, batch) and resume is exact.

Config surface (LossConfig):
  ada_target     > 0 enables the adaptive controller (canonical 0.6)
  ada_p_init     initial p; with ada_target == 0 a nonzero value is the
                 fixed-p DiffAugment policy
  ada_speed_kimg images (in thousands) for p to traverse 0 → 1 when the
                 heuristic saturates (canonical 500; smaller = faster)
  ada_ops        comma list out of color,translation,cutout,xflip
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VALID_OPS = ("color", "translation", "cutout", "xflip")


def ada_enabled(loss_cfg) -> bool:
    """True when any D-input augmentation is configured."""
    return loss_cfg.ada_target > 0 or loss_cfg.ada_p_init > 0


def parse_ada_ops(spec: str) -> tuple[str, ...]:
    ops = tuple(s.strip() for s in spec.split(",") if s.strip())
    bad = [o for o in ops if o not in _VALID_OPS]
    if bad:
        raise ValueError(
            f"loss.ada_ops contains unknown ops {bad}; valid: {_VALID_OPS}")
    if not ops:
        raise ValueError("loss.ada_ops is empty but ADA is enabled")
    return ops


def _gate(key: jax.Array, p, b: int) -> jax.Array:
    """(B,1,1,1) per-image Bernoulli(p) gate."""
    return jax.random.bernoulli(key, p, (b, 1, 1, 1))


def _color(x: jax.Array, key: jax.Array, p) -> jax.Array:
    """Brightness (+U(-.5,.5)), saturation (×U(0,2) about the per-pixel
    channel mean), contrast (×U(.5,1.5) about the per-image mean) — each
    independently gated per image. Images are in [-1, 1]."""
    b = x.shape[0]
    kb, ks, kc, gb, gs, gc = jax.random.split(key, 6)
    dt = x.dtype

    # each sub-op selects the WHOLE augmented candidate per image so an
    # un-gated image passes through bit-exactly (p=0 ⇒ identity)
    br = jax.random.uniform(kb, (b, 1, 1, 1), jnp.float32, -0.5, 0.5)
    x = jnp.where(_gate(gb, p, b), x + br.astype(dt), x)

    sat = jax.random.uniform(ks, (b, 1, 1, 1), jnp.float32, 0.0, 2.0)
    m = jnp.mean(x, axis=-1, keepdims=True)
    x = jnp.where(_gate(gs, p, b), m + (x - m) * sat.astype(dt), x)

    con = jax.random.uniform(kc, (b, 1, 1, 1), jnp.float32, 0.5, 1.5)
    mc = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = jnp.where(_gate(gc, p, b), mc + (x - mc) * con.astype(dt), x)
    return x


def _translation(x: jax.Array, key: jax.Array, p,
                 ratio: float = 0.125) -> jax.Array:
    """Integer shift in ±round(ratio·size) per axis, zero-filled (on [-1,1]
    images zero = mid-gray). Static shapes: one zero-pad of the batch, then
    a per-example dynamic_slice (the same formulation as the fused crop
    kernel in uig.kernels.augment)."""
    b, h, w, c = x.shape
    my = max(int(h * ratio + 0.5), 1)
    mx = max(int(w * ratio + 0.5), 1)
    ky, kx, kg = jax.random.split(key, 3)
    sy = jax.random.randint(ky, (b,), -my, my + 1)
    sx = jax.random.randint(kx, (b,), -mx, mx + 1)
    gate = _gate(kg, p, b)[:, 0, 0, 0]
    sy = jnp.where(gate, sy, 0)
    sx = jnp.where(gate, sx, 0)
    xp = jnp.pad(x, ((0, 0), (my, my), (mx, mx), (0, 0)))

    def one(img, dy, dx):
        return jax.lax.dynamic_slice(img, (my - dy, mx - dx, 0), (h, w, c))

    return jax.vmap(one)(xp, sy, sx)


def _cutout(x: jax.Array, key: jax.Array, p, ratio: float = 0.5) -> jax.Array:
    """Zero a random s×s square (s = round(ratio·size)) centered uniformly
    over the image (border-clipped), per gated image. Mask built from iota
    comparisons — no gather, fuses into the multiply."""
    b, h, w, _ = x.shape
    s_h = max(int(h * ratio + 0.5), 1)
    s_w = max(int(w * ratio + 0.5), 1)
    ky, kx, kg = jax.random.split(key, 3)
    cy = jax.random.randint(ky, (b, 1), 0, h)
    cx = jax.random.randint(kx, (b, 1), 0, w)
    ty, tx = cy - s_h // 2, cx - s_w // 2
    rows = jnp.arange(h)[None, :]
    cols = jnp.arange(w)[None, :]
    row_in = (rows >= ty) & (rows < ty + s_h)  # (B, H)
    col_in = (cols >= tx) & (cols < tx + s_w)  # (B, W)
    hole = row_in[:, :, None] & col_in[:, None, :]  # (B, H, W)
    hole = hole & _gate(kg, p, b)[:, :, :, 0].astype(bool)
    return x * (1.0 - hole[..., None].astype(x.dtype))


def _xflip(x: jax.Array, key: jax.Array, p) -> jax.Array:
    return jnp.where(_gate(key, p, x.shape[0]), x[:, :, ::-1, :], x)


_OP_FNS = {
    "color": _color,
    "translation": _translation,
    "cutout": _cutout,
    "xflip": _xflip,
}


def diff_augment(x: jax.Array, key: jax.Array, p,
                 ops: tuple[str, ...] = ("color", "translation", "cutout"),
                 ) -> jax.Array:
    """Apply the gated differentiable augmentation pipeline to a (B,H,W,C)
    batch in [-1, 1]. ``p`` may be a python float or a traced scalar (the
    ADA-controlled probability). Differentiable in ``x``; a pure function
    of (x, key, p)."""
    for i, op in enumerate(ops):
        x = _OP_FNS[op](x, jax.random.fold_in(key, i), p)
    return x


# ---------------------------------------------------------------------------
# the ADA controller
# ---------------------------------------------------------------------------


def ada_heuristic(real_logits, gan_mode: str) -> jax.Array:
    """Overfitting heuristic r_t = E[sign(D(real) − center)] over every
    patch logit D produced for real inputs this step (accepts one map or a
    tuple of multi-scale maps). center is the decision boundary of the GAN
    loss: 0.5 for lsgan (regression to 1/0 labels), 0 for vanilla/hinge.
    r_t → 1 means D is certain on reals (overfitting); → -1 undertrained."""
    if gan_mode == "wgan":
        raise ValueError(
            "the ADA controller heuristic needs a fixed decision boundary; "
            "wgan critics have none — use fixed-p DiffAugment "
            "(loss.ada_p_init > 0, loss.ada_target = 0) instead")
    center = 0.5 if gan_mode == "lsgan" else 0.0
    if not isinstance(real_logits, (tuple, list)):
        real_logits = (real_logits,)
    signs = [jnp.sign(l.astype(jnp.float32) - center) for l in real_logits]
    return sum(jnp.mean(s) for s in signs) / len(signs)


def ada_update_p(p: jax.Array, r_t: jax.Array, target: float,
                 speed_kimg: float, images_per_step: int) -> jax.Array:
    """One controller step: nudge p toward/away by the amount that makes p
    traverse the full [0,1] range over ``speed_kimg`` thousand images when
    the heuristic saturates (the StyleGAN2-ADA schedule)."""
    step = images_per_step / (speed_kimg * 1000.0)
    return jnp.clip(p + jnp.sign(r_t - target) * step, 0.0, 1.0)
