"""Loss library (SURVEY.md §2 "Loss library" row).

All losses are plain jnp expressions — XLA fuses them into the surrounding
forward/backward program; losses are computed in fp32 even when the model
compute dtype is bf16 (adversarial losses on bf16 logits lose too much
signal at the |logit|≈0 equilibrium).

GAN modes (BASELINE.json: LSGAN for CycleGAN/CUT rungs; hinge for VQGAN):
  * lsgan   — MSE to the 1/0 label (least-squares GAN)
  * vanilla — BCE-with-logits
  * hinge   — hinge loss for D, -E[D(fake)] for G
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def gan_loss_g(fake_logits, mode: str = "lsgan") -> jax.Array:
    """Generator-side adversarial loss: make D(fake) read as real.

    Accepts one logit map or a tuple/list of maps (multi-scale PatchGAN —
    models/patch_disc.py MultiScaleDiscriminator); multi-scale losses SUM
    over scales, the canonical MUNIT/pix2pixHD weighting."""
    if isinstance(fake_logits, (tuple, list)):
        return sum(gan_loss_g(f, mode) for f in fake_logits)
    y = _f32(fake_logits)
    if mode == "lsgan":
        return jnp.mean(jnp.square(y - 1.0))
    if mode == "vanilla":
        return jnp.mean(jax.nn.softplus(-y))  # -log sigmoid(y)
    if mode == "hinge":
        return -jnp.mean(y)
    raise ValueError(f"unknown gan mode {mode!r}")


def gan_loss_d(real_logits, fake_logits,
               mode: str = "lsgan") -> jax.Array:
    """Discriminator adversarial loss, already 0.5-weighted as in the
    canonical CycleGAN recipe (D steps at half the G adversarial scale).

    Accepts single logit maps or same-length tuples of maps (multi-scale
    PatchGAN; summed over scales)."""
    if isinstance(real_logits, (tuple, list)):
        return sum(gan_loss_d(r, f, mode)
                   for r, f in zip(real_logits, fake_logits))
    r, f = _f32(real_logits), _f32(fake_logits)
    if mode == "lsgan":
        return 0.5 * (jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f)))
    if mode == "vanilla":
        return 0.5 * (jnp.mean(jax.nn.softplus(-r)) + jnp.mean(jax.nn.softplus(f)))
    if mode == "hinge":
        return 0.5 * (jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f)))
    raise ValueError(f"unknown gan mode {mode!r}")


def cycle_loss(real: jax.Array, reconstructed: jax.Array) -> jax.Array:
    """L1 cycle-consistency ‖F(G(x)) − x‖₁."""
    return jnp.mean(jnp.abs(_f32(reconstructed) - _f32(real)))


def identity_loss(real: jax.Array, same: jax.Array) -> jax.Array:
    """L1 identity-mapping loss ‖G(y) − y‖₁ (color-preservation term)."""
    return jnp.mean(jnp.abs(_f32(same) - _f32(real)))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(_f32(a) - _f32(b)))


def patch_nce_loss(feat_q: jax.Array, feat_k: jax.Array,
                   temperature: float = 0.07) -> jax.Array:
    """PatchNCE contrastive loss (CUT).

    feat_q: (B, N, D) projected features of translated patches (query)
    feat_k: (B, N, D) projected features of the corresponding input patches
            (key; caller stop-gradients as appropriate)

    For each (b, n): positive = same spatial location, negatives = the other
    N-1 locations *within the same image* (the canonical internal-negatives
    formulation). One (N, N) matmul per image — MXU-friendly.
    """
    q = _f32(feat_q)
    k = _f32(feat_k)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-10)
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-10)
    # (B, N, N) similarity between all query/key patch pairs per image
    logits = jnp.einsum("bnd,bmd->bnm", q, k) / temperature
    n = logits.shape[1]
    labels = jnp.arange(n)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[None, :, None], axis=-1)
    return jnp.mean(nll)


def r1_penalty(d_apply, d_params, real: "jax.Array") -> "jax.Array":
    """R1 gradient penalty: 0.5·E_x‖∇ₓD(x)‖² on REAL inputs (Mescheder et
    al. 2018) — the standard GAN regularizer that keeps D from overpowering
    G on small datasets. Caller scales by loss.r1_gamma."""
    def scalar_d(x):
        out = d_apply(d_params, x)
        if isinstance(out, (tuple, list)):  # multi-scale D: sum over scales
            return sum(jnp.sum(_f32(o)) for o in out)
        return jnp.sum(_f32(out))

    g = jax.grad(scalar_d)(_f32(real))
    return 0.5 * jnp.mean(jnp.sum(jnp.square(_f32(g)), axis=(1, 2, 3)))
