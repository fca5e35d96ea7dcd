"""Inception Score (Salimans et al. 2016).

IS = exp(E_x KL(p(y|x) || p(y))), reported as mean ± std over equal splits
(the canonical 10-split protocol). Needs CLASS PROBABILITIES, i.e. the
InceptionV3 fc head — export weights with
`scripts/export_weights.py inception --fc 1000` and set
`eval.inception_weights`; the random-feature FID fallback has no classes,
so IS is a loud error there rather than a silently meaningless number.

Unlike FID/KID/PRDC this metric never looks at the real set — it scores
sharpness (confident per-image predictions) × diversity (uniform marginal).
No reference code exists to cite (/root/reference/README.md:1); semantics
follow the canonical public implementation (openai/improved-gan).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def inception_score_from_probs(probs: np.ndarray, splits: int = 10,
                               eps: float = 1e-16) -> tuple[float, float]:
    """probs: (N, C), rows on the simplex. Returns (mean, std) over splits."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    if n < splits:
        raise ValueError(f"IS with splits={splits} needs >= that many "
                         f"samples, got {n}")
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(0)
        kl = (part * (np.log(part + eps) - np.log(py + eps))).sum(1).mean()
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


def compute_inception_score(batches: Iterable, logits_fn: Callable,
                            splits: int = 10,
                            num_classes: int | None = None,
                            ) -> tuple[float, float]:
    """IS of one image stream. ``logits_fn``: jitted (B,H,W,3)->(B,C) class
    logits (softmax happens here, in float64 on host). Multi-host shards
    are gathered before splitting so every process returns the same number;
    a host whose shard is empty must pass ``num_classes`` so its (0, C)
    block joins the gather."""
    ps = []
    for b in batches:
        lg = np.asarray(jax.device_get(logits_fn(b)), np.float64)
        lg -= lg.max(axis=1, keepdims=True)
        e = np.exp(lg)
        ps.append(e / e.sum(axis=1, keepdims=True))
    if not ps:
        if num_classes is None:
            raise ValueError("empty local image stream for Inception Score "
                             "— pass num_classes to allow an empty shard")
        ps = [np.zeros((0, num_classes), np.float64)]
    probs = np.concatenate(ps, 0)
    if jax.process_count() > 1:
        from uig.eval.fid import allgather_ragged

        probs = allgather_ragged(probs)
    if probs.shape[0] == 0:
        raise ValueError("empty image stream for Inception Score")
    return inception_score_from_probs(probs, splits=splits)
