"""LPIPS perceptual loss (SURVEY.md §2 "Loss library": LPIPS term).

VGG16-topology feature stack; the LPIPS distance is the layer-weighted L2
between channel-unit-normalized feature maps. The perceptual term is pure
and closed over its params, so it inlines into the generator's jitted loss
(one XLA program — no separate dispatch).

Zero-egress environment: with ``cfg.eval.vgg_weights`` unset, features come
from a fixed seed-0 random VGG — random-VGG LPIPS is a known-reasonable
perceptual metric and keeps the term deterministic. The loss is a *training
signal*, not a reported metric, so relative behavior is what matters; the
resolved config (dumped next to checkpoints) records the weights path used.
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


def make_lpips(cfg=None, weights_path: str | None = None):
    """Returns lpips(x, y) -> scalar; x, y in [-1, 1], NHWC."""
    net = VGG16Features()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if weights_path:
        params = _load_flat(params, np.load(weights_path))

    def lpips(x, y):
        fx = net.apply(params, x.astype(jnp.float32))
        fy = net.apply(params, y.astype(jnp.float32))
        d = jnp.float32(0.0)
        for a, b in zip(fx, fy):
            diff = _unit_normalize(a) - _unit_normalize(b)
            d = d + jnp.mean(jnp.sum(jnp.square(diff), -1))
        return d / len(fx)

    return lpips


def _load_flat(params, loaded):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        out.append(jnp.asarray(loaded[key]))
    return jax.tree_util.tree_unflatten(treedef, out)
