"""LPIPS perceptual metric/loss (SURVEY.md §2 "Loss library": LPIPS term).

Canonical LPIPS (Zhang et al. 2018, net='vgg') is three pieces, all present
here:

  1. a fixed input scaling layer mapping [-1, 1] pixels to the
     ImageNet-normalized statistics the VGG backbone was trained on
     ((x - shift) / scale with the published constants);
  2. the VGG16 feature stack, tapped after the last relu of each of the 5
     stages (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), features
     channel-unit-normalized;
  3. learned per-layer 1×1 "lin" weights on the squared feature differences,
     spatially averaged and SUMMED over layers.

The term is pure and closed over its params, so it inlines into the
generator's jitted loss (one XLA program — no separate dispatch).

Zero-egress environment: with ``cfg.eval.vgg_weights`` unset, features come
from a fixed seed-0 random VGG, and without ``cfg.eval.lpips_lin_weights``
the lin stage falls back to equal channel weights with a layer average —
a known-reasonable perceptual *training signal* (recorded in the resolved
config), but not the published LPIPS metric. With both weight files
(produced by scripts/export_weights.py) the distance matches the official
torch implementation ≤1e-5 (tests/unit/test_lpips_oracle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512)
# taps after the last conv of each stage (relu indices in the flat stack)
TAP_STAGES = (1, 3, 6, 9, 12)
# official LPIPS ScalingLayer constants (maps [-1,1] to ImageNet-normalized)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        stage_last = None
        for item in VGG16_CFG:
            if item == "M":
                feats.append(stage_last)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                stage_last = x
                conv_i += 1
        feats.append(stage_last)
        return feats  # 5 stages


def _unit_normalize(f):
    return f * jax.lax.rsqrt(jnp.sum(jnp.square(f), -1, keepdims=True) + 1e-10)


def make_lpips(cfg=None, weights_path: str | None = None,
               lin_path: str | None = None):
    """Returns lpips(x, y) -> scalar; x, y in [-1, 1], NHWC.

    ``weights_path``: VGG16 conv weights npz (scripts/export_weights.py
    vgg16). ``lin_path``: official LPIPS lin weights npz (…py lpips_lin);
    when given, the distance is exact official LPIPS (per-layer learned
    channel weights, layer sum); when absent, equal channel weights with a
    layer average (documented fallback).
    """
    if cfg is not None and lin_path is None:
        lin_path = getattr(cfg.eval, "lpips_lin_weights", "") or None
    net = VGG16Features()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if weights_path:
        params = _load_flat(params, np.load(weights_path))
    lins = None
    if lin_path:
        loaded = np.load(lin_path)
        lins = [jnp.asarray(loaded[f"lin{i}"], jnp.float32) for i in range(5)]
    shift = jnp.asarray(LPIPS_SHIFT, jnp.float32)
    scale = jnp.asarray(LPIPS_SCALE, jnp.float32)

    def lpips(x, y):
        xs = (x.astype(jnp.float32) - shift) / scale
        ys = (y.astype(jnp.float32) - shift) / scale
        fx = net.apply(params, xs)
        fy = net.apply(params, ys)
        d = jnp.float32(0.0)
        for i, (a, b) in enumerate(zip(fx, fy)):
            sq = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            if lins is not None:
                # official: 1x1 non-negative lin conv, spatial mean, layer sum
                d = d + jnp.mean(jnp.sum(sq * lins[i], -1), axis=None)
            else:
                d = d + jnp.mean(jnp.sum(sq, -1))
        return d if lins is not None else d / len(fx)

    return lpips


def _load_flat(params, loaded):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        out.append(jnp.asarray(loaded[key]))
    return jax.tree_util.tree_unflatten(treedef, out)
