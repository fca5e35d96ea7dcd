"""InceptionV3 (FID variant) in flax — feature extractor for uig.eval.fid.

Architecture follows the canonical FID-Inception topology (pool3, 2048-d
features, 299×299 input). This environment has zero egress, so pretrained
weights cannot be downloaded; behavior (SURVEY.md §2 "Eval / FID"):

  * ``cfg.eval.inception_weights`` set → load the .npz (flattened
    'path/to/param' keys) and FID is the standard Inception-feature FID.
  * no weights + fid_features="auto"/"random" → a deterministic
    seed-0-initialized extractor is used instead (uig.eval.fid.RandomFeatureNet);
    random-feature FID is a valid *relative* metric for tracking training
    progress, and the choice is recorded in the metric name.

The reference repo has no FID code (empty stub, /root/reference/README.md:1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        # FID-Inception uses BN in inference mode: scale+shift with stored
        # moments; expressed here as affine params over frozen statistics.
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="b1x1")(x)
        b5 = BasicConv(48, (1, 1), name="b5x5_1")(x)
        b5 = BasicConv(64, (5, 5), name="b5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="b3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), name="b3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), name="b3x3dbl_3")(b3)
        # count_include_pad=False matches pytorch-fid's FIDInception blocks
        # (the canonical FID network patches torchvision's avg pools this
        # way); with it True, border features diverge from every published
        # FID number. Torch forward-parity: tests/unit/test_inception_oracle.py
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = BasicConv(self.pool_features, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), padding="VALID",
                       name="b3x3")(x)
        bd = BasicConv(64, (1, 1), name="b3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), name="b3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), padding="VALID",
                       name="b3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="b1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="b7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), name="b7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), name="b7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="b7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), name="b7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), name="b7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), name="b7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), name="b7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="b3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), padding="VALID",
                       name="b3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="b7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), name="b7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), name="b7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), padding="VALID",
                       name="b7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="b1x1")(x)
        b3 = BasicConv(384, (1, 1), name="b3x3_1")(x)
        b3 = jnp.concatenate(
            [BasicConv(384, (1, 3), name="b3x3_2a")(b3),
             BasicConv(384, (3, 1), name="b3x3_2b")(b3)], -1)
        bd = BasicConv(448, (1, 1), name="b3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), name="b3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [BasicConv(384, (1, 3), name="b3x3dbl_3a")(bd),
             BasicConv(384, (3, 1), name="b3x3dbl_3b")(bd)], -1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3Features(nn.Module):
    """Input: (B, 299, 299, 3) in [-1, 1]. Output: (B, 2048) pool3 features,
    or (B, num_classes) logits when ``num_classes`` > 0 (the torchvision fc
    head — needed by the Inception Score; FID never uses it)."""

    num_classes: int = 0

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), strides=(2, 2), padding="VALID",
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), padding="VALID", name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = BasicConv(80, (1, 1), padding="VALID", name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), padding="VALID", name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        if self.num_classes:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def init_inception(weights_path: str | None = None, num_classes: int = 0):
    """Returns (apply_fn, params). Weights: .npz with 'a/b/c' flattened keys.
    ``num_classes`` > 0 appends the fc head (its weights must then be in the
    file — export with scripts/export_weights.py --fc)."""
    model = InceptionV3Features(num_classes=num_classes)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    if weights_path:
        loaded = np.load(weights_path)
        flat = {"/".join(str(k) for k in path): leaf
                for path, leaf in _flatten(variables)}
        for k in flat:
            if k not in loaded:
                raise KeyError(f"weights file missing param {k}")
        variables = _unflatten(
            {path: jnp.asarray(loaded["/".join(map(str, path))])
             for path, _ in _flatten(variables)}, variables)

    def apply_fn(v, imgs):
        """imgs: (B, H, W, 3) in [-1, 1]; resized to 299² on device."""
        b, h, w, c = imgs.shape
        if (h, w) != (299, 299):
            imgs = jax.image.resize(imgs.astype(jnp.float32),
                                    (b, 299, 299, c), "bilinear")
        return model.apply(v, imgs)

    return apply_fn, variables


def _flatten(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flatten(v, prefix + (k,))
    else:
        out.append((prefix, tree))
    return out


def _unflatten(flat: dict, like):
    if isinstance(like, dict):
        return {k: _unflatten(
            {p[1:]: v for p, v in flat.items() if p and p[0] == k},
            subtree) for k, subtree in like.items()}
    return flat[()]
