"""FID evaluation — SURVEY.md §2 "Eval / FID", §3 call stack 4.

Feature extraction is jitted on device (InceptionV3 pool3 by default);
mean/covariance accumulate on host in float64 (TPUs have no fast fp64, and
the Fréchet solve is O(d³) host work anyway). The matrix square root uses a
symmetric eigendecomposition of √Σ₁·Σ₂·√Σ₁ — no scipy dependency.

Zero-egress note: without a pretrained weights file this falls back to a
deterministic random-feature extractor (valid as a *relative* metric; the
metric name records which extractor was used) — see uig/eval/inception.py.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class RandomFeatureNet(nn.Module):
    """Deterministic random-conv feature extractor (seed-0 init).

    5 stride-2 conv stages + GAP -> 768-d features. Random convolutional
    features preserve enough image statistics to give a meaningful relative
    Fréchet distance for tracking training progress.
    """

    width: int = 96

    @nn.compact
    def __call__(self, x):
        f = self.width
        for i, mult in enumerate((1, 2, 4, 8, 8)):
            x = nn.Conv(f * mult, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return jnp.mean(x, axis=(1, 2))


def make_feature_fn(cfg) -> tuple[Callable, str]:
    """Returns (jitted images->features fn, extractor name)."""
    kind = cfg.eval.fid_features
    weights = cfg.eval.inception_weights or None
    if kind == "auto":
        kind = "inception" if weights else "random"
    if kind == "inception":
        from uig.eval.inception import init_inception

        apply_fn, params = init_inception(weights)
        name = "inception_pool3" if weights else "inception_untrained"
        return jax.jit(lambda x: apply_fn(params, x)), name
    if kind == "random":
        net = RandomFeatureNet()
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return jax.jit(lambda x: net.apply(params, x)), "random_conv"
    raise ValueError(f"unknown fid_features {kind!r}")


class FIDStats:
    """Streaming mean/cov accumulator (host, float64)."""

    def __init__(self, dim: int):
        self.n = 0
        self.s = np.zeros((dim,), np.float64)
        self.ss = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s += f.sum(0)
        self.ss += f.T @ f

    def save(self, path: str, extractor: str = "", image_size: int = 0):
        """Persist RAW sums (n, Σx, Σxxᵀ) — exact, mergeable — plus the
        provenance needed to refuse a mismatched reuse loudly (the
        pytorch-fid precomputed-statistics workflow: compute the real
        domain's stats once, reuse them across every eval)."""
        np.savez(path, n=np.int64(self.n), s=self.s, ss=self.ss,
                 extractor=np.str_(extractor), image_size=np.int64(image_size))

    @classmethod
    def load(cls, path: str) -> tuple["FIDStats", str, int]:
        """Returns (stats, extractor_name, image_size)."""
        z = np.load(path, allow_pickle=False)
        for key in ("n", "s", "ss", "extractor", "image_size"):
            if key not in z:
                raise ValueError(
                    f"{path} is not a uig fid-stats file (missing {key!r})")
        st = cls(int(z["s"].shape[0]))
        st.n = int(z["n"])
        st.s = np.asarray(z["s"], np.float64)
        st.ss = np.asarray(z["ss"], np.float64)
        return st, str(z["extractor"]), int(z["image_size"])

    @property
    def mean(self) -> np.ndarray:
        return self.s / max(self.n, 1)

    @property
    def cov(self) -> np.ndarray:
        if self.n < 2:
            return np.zeros_like(self.ss)
        m = self.mean
        return (self.ss - self.n * np.outer(m, m)) / (self.n - 1)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh(a)
    w = np.clip(w, 0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """d² = |μ₁−μ₂|² + Tr(Σ₁+Σ₂−2·sqrtm(Σ₁Σ₂)), scipy-free."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(len(mu1))
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(len(mu2))
    s1 = _sqrtm_psd(cov1)
    middle = s1 @ cov2 @ s1  # symmetric PSD; same spectrum as cov1 @ cov2
    w = np.clip(np.linalg.eigvalsh(middle), 0, None)
    tr_sqrt = np.sqrt(w).sum()
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


def kid_from_features(real: np.ndarray, fake: np.ndarray,
                      n_subsets: int = 100, subset_size: int = 100,
                      seed: int = 0) -> tuple[float, float]:
    """Kernel Inception Distance (Binkowski et al. 2018): unbiased MMD² with
    the polynomial kernel k(x,y) = (xᵀy/d + 1)³, averaged over random
    subsets. Unlike FID it is unbiased at small sample counts — the right
    metric for the ≤500-image eval splits this framework's configs use.
    Returns (mean, std) over subsets."""
    rng = np.random.default_rng(seed)
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    d = real.shape[1]
    m = min(subset_size, real.shape[0], fake.shape[0])
    vals = []
    for _ in range(n_subsets):
        x = real[rng.choice(real.shape[0], m, replace=False)]
        y = fake[rng.choice(fake.shape[0], m, replace=False)]
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        np.fill_diagonal(kxx, 0.0)
        np.fill_diagonal(kyy, 0.0)
        mmd = (kxx.sum() + kyy.sum()) / (m * (m - 1)) - 2.0 * kxy.mean()
        vals.append(mmd)
    return float(np.mean(vals)), float(np.std(vals))


def collect_features(real_batches: Iterable, fake_batches: Iterable,
                     feature_fn: Callable, feature_dim: int | None = None,
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Materialize (real, fake) feature matrices from two image streams —
    the shared front half of the sample-based metrics (KID, PRDC).
    Multi-host: features are gathered across processes; a host whose shard
    is empty contributes a (0, feature_dim) block (pass feature_dim to
    allow that — without it an empty local stream is an error)."""
    feats = []
    for batches in (real_batches, fake_batches):
        fs = [np.asarray(jax.device_get(feature_fn(b))) for b in batches]
        if not fs:
            if feature_dim is None:
                raise ValueError("empty image stream")
            fs = [np.zeros((0, feature_dim), np.float64)]
        feats.append(np.concatenate(fs, 0))
    if jax.process_count() > 1:
        feats = [allgather_ragged(f) for f in feats]
    return feats[0], feats[1]


def allgather_ragged(f: np.ndarray) -> np.ndarray:
    """Concatenate per-host feature blocks of differing row counts.

    process_allgather needs identical shapes on every process, so a host
    with an empty shard can't gather its ragged (0, D) block directly:
    gather per-host counts first, pad every block to the global max,
    gather, then slice each block back."""
    from jax.experimental import multihost_utils

    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([f.shape[0]], np.int64))).reshape(-1)
    max_n = int(counts.max())
    if max_n == 0:
        return f  # globally empty → callers raise their own loud error
    pad = np.zeros((max_n, f.shape[1]), f.dtype)
    pad[: f.shape[0]] = f
    blocks = np.asarray(multihost_utils.process_allgather(pad))
    return np.concatenate(
        [blocks[i, : int(c)] for i, c in enumerate(counts)], 0)


def compute_kid(real_batches: Iterable, fake_batches: Iterable,
                feature_fn: Callable, feature_dim: int | None = None,
                **kw) -> tuple[float, float]:
    """KID between two image streams (same interface as compute_fid);
    multi-host gather semantics as collect_features."""
    real, fake = collect_features(real_batches, fake_batches,
                                  feature_fn, feature_dim)
    for name, f in zip(("real", "fake"), (real, fake)):
        if f.shape[0] < 2:  # m<2 → 0/0 in the unbiased MMD estimator
            raise ValueError(
                f"KID needs >=2 {name} images globally, got {f.shape[0]}")
    return kid_from_features(real, fake, **kw)


def stream_stats(batches: Iterable, feature_fn: Callable,
                 feature_dim: int | None = None) -> FIDStats:
    """Accumulate FIDStats over one image stream; multi-host: per-process
    raw sums are summed across processes (a host with an empty shard
    contributes n=0 — pass feature_dim to allow that)."""
    st = FIDStats(feature_dim) if feature_dim is not None else None
    for b in batches:
        f = np.asarray(jax.device_get(feature_fn(b)))
        if st is None:
            st = FIDStats(f.shape[-1])
        st.update(f)
    if st is None:
        raise ValueError("empty image stream for FID")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        packed = np.concatenate(
            [np.array([st.n], np.float64), st.s, st.ss.ravel()])
        summed = multihost_utils.process_allgather(packed).sum(0)
        st.n = int(summed[0])
        d = st.s.shape[0]
        st.s = summed[1 : 1 + d]
        st.ss = summed[1 + d :].reshape(d, d)
    return st


def compute_fid(real_batches: Iterable | None, fake_batches: Iterable,
                feature_fn: Callable, feature_dim: int | None = None,
                real_stats: FIDStats | None = None) -> float:
    """FID between two streams of (B, H, W, 3) images in [-1, 1].

    Multi-host: each host streams its shard; stats are summed across
    processes before the Fréchet solve. A host whose shard is empty (fewer
    eval images than processes) contributes n=0 stats and still joins the
    reduction — pass feature_dim to allow that; without it an empty local
    stream is an error.

    ``real_stats``: precomputed GLOBAL statistics of the real domain
    (`uig fid-stats` / FIDStats.load) — the real stream is then skipped
    entirely (and never reduced: the stats are already global).
    """
    if real_stats is not None:
        r = real_stats
    elif real_batches is not None:
        r = stream_stats(real_batches, feature_fn, feature_dim)
    else:
        raise ValueError("need real_batches or real_stats")
    g = stream_stats(fake_batches, feature_fn, feature_dim)
    if r.n == 0 or g.n == 0:
        raise ValueError("empty global image stream for FID")
    return frechet_distance(r.mean, r.cov, g.mean, g.cov)
