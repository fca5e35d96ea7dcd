"""Inception Score — analytic properties + fc-head torch-oracle parity."""

import os
import sys

import numpy as np
import pytest

from uig.eval.is_score import (compute_inception_score,
                               inception_score_from_probs)


def test_uniform_probs_score_one():
    # p(y|x) == p(y) for every x -> KL 0 -> IS exactly 1.
    probs = np.full((40, 8), 1.0 / 8)
    mean, std = inception_score_from_probs(probs, splits=4)
    assert mean == pytest.approx(1.0, abs=1e-9)
    assert std == pytest.approx(0.0, abs=1e-9)


def test_onehot_uniform_classes_score_num_classes():
    # Confident predictions uniformly covering C classes -> IS -> C.
    c, reps = 6, 10
    probs = np.tile(np.eye(c), (reps, 1))
    mean, _ = inception_score_from_probs(probs, splits=2)
    assert mean == pytest.approx(c, rel=1e-3)


def test_mode_collapse_scores_one():
    # Confident but ALL the same class -> marginal == conditional -> IS 1.
    probs = np.zeros((30, 6))
    probs[:, 2] = 1.0
    mean, _ = inception_score_from_probs(probs, splits=3)
    assert mean == pytest.approx(1.0, rel=1e-3)


def test_too_few_samples_is_loud():
    with pytest.raises(ValueError, match="splits=10"):
        inception_score_from_probs(np.full((4, 3), 1 / 3), splits=10)


def test_compute_is_stream_matches_direct():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = rng.normal(size=(12, 7)).astype(np.float32)
    logits_fn = jax.jit(lambda x: x.mean(axis=(1, 2)) @ jnp.asarray(w))
    imgs = rng.normal(size=(20, 4, 4, 12)).astype(np.float32)

    got = compute_inception_score(
        (jnp.asarray(imgs[i : i + 8]) for i in range(0, 20, 8)),
        logits_fn, splits=2)

    lg = imgs.mean(axis=(1, 2)).astype(np.float64) @ w.astype(np.float64)
    e = np.exp(lg - lg.max(1, keepdims=True))
    want = inception_score_from_probs(e / e.sum(1, keepdims=True), splits=2)
    assert got[0] == pytest.approx(want[0], rel=1e-5)


def test_empty_stream_is_loud():
    import jax

    with pytest.raises(ValueError, match="empty local image stream"):
        compute_inception_score(iter(()), jax.jit(lambda x: x), splits=2)


@pytest.mark.slow
def test_is_logits_match_torch_oracle(tmp_path):
    """fc-head forward parity: flax logits == torch logits through the
    converter (--fc path), so a real torchvision inception_v3 checkpoint
    gives the canonical IS."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "helpers"))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "scripts"))
    from export_weights import convert_inception
    from torch_nets import FIDInceptionV3, randomize_bn_stats

    torch.manual_seed(0)
    m = FIDInceptionV3(num_classes=10)
    randomize_bn_stats(m)
    m = m.eval()
    sd = {k: np.asarray(v) for k, v in m.state_dict().items()}
    npz = tmp_path / "inception_fc.npz"
    np.savez(npz, **convert_inception(sd, num_classes=10))

    import jax.numpy as jnp

    from uig.eval.inception import init_inception

    apply_fn, variables = init_inception(str(npz), num_classes=10)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    got = np.asarray(apply_fn(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
