"""Synthetic roundtrip for scripts/export_weights.py: build a fake
torch-keyed checkpoint, convert, load through the real loaders, and check
values landed in the right params (the VERDICT "weight converter" item).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
sys.path.insert(0, SCRIPTS)

import export_weights  # noqa: E402


def _fake_inception_sd(rng):
    """Synthesize a torch-style inception_v3 state_dict with the exact keys
    the converter expects, derived from the flax model structure."""
    from uig.eval.inception import InceptionV3Features, _flatten

    model = InceptionV3Features()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3), jnp.float32)))
    sd = {}
    for path, leaf in _flatten(variables):
        col, *mods, layer, pname = path
        torch_mods = [m if m.startswith(("Conv2d", "Mixed")) else
                      export_weights._branch_to_torch(m) for m in mods]
        shape = tuple(leaf.shape)
        if layer == "conv":
            tk = ".".join(torch_mods + ["conv", "weight"])
            # flax HWIO -> torch OIHW; scaled small so the 90-layer forward
            # stays finite with random weights
            sd[tk] = rng.standard_normal(
                (shape[3], shape[2], shape[0], shape[1])).astype(np.float32) * 0.02
        else:
            tname = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}[pname]
            tk = ".".join(torch_mods + ["bn", tname])
            base = rng.standard_normal(shape).astype(np.float32)
            if tname == "running_var":
                base = np.abs(base) + 0.5
            sd[tk] = base
    return sd


def test_inception_roundtrip(tmp_path):
    from uig.eval.inception import init_inception

    rng = np.random.default_rng(0)
    sd = _fake_inception_sd(rng)
    src = tmp_path / "torch_inception.npz"
    np.savez(src, **sd)
    out = tmp_path / "inception_fid.npz"
    export_weights.main(["inception", "--src", str(src), "--out", str(out)])

    apply_fn, variables = init_inception(str(out))
    # spot-check a conv kernel landed transposed in the right place
    k = np.asarray(
        variables["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
    np.testing.assert_allclose(
        k, sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0))
    m = np.asarray(
        variables["batch_stats"]["Mixed_7c"]["bpool"]["bn"]["mean"])
    np.testing.assert_allclose(m, sd["Mixed_7c.branch_pool.bn.running_mean"])
    # forward runs and is finite
    feats = apply_fn(variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_inception_missing_key_is_loud(tmp_path):
    rng = np.random.default_rng(1)
    sd = _fake_inception_sd(rng)
    del sd["Mixed_5b.branch1x1.conv.weight"]
    src = tmp_path / "bad.npz"
    np.savez(src, **sd)
    with pytest.raises(KeyError, match="torch keys missing"):
        export_weights.main(
            ["inception", "--src", str(src), "--out", str(tmp_path / "o.npz")])


def test_vgg16_roundtrip(tmp_path):
    from uig.eval.lpips import VGG16_CFG, make_lpips

    rng = np.random.default_rng(2)
    sd = {}
    cin = 3
    widths = [c for c in VGG16_CFG if c != "M"]
    for i, ti in enumerate(export_weights.VGG16_TORCH_CONV_IDX):
        cout = widths[i]
        sd[f"features.{ti}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05)
        sd[f"features.{ti}.bias"] = (
            rng.standard_normal((cout,)).astype(np.float32) * 0.05)
        cin = cout
    src = tmp_path / "torch_vgg.npz"
    np.savez(src, **sd)
    out = tmp_path / "vgg16_lpips.npz"
    export_weights.main(["vgg16", "--src", str(src), "--out", str(out)])

    lpips = make_lpips(weights_path=str(out))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32) * 0.2
    y = x + 0.1
    d = lpips(x, y)
    assert np.isfinite(float(d)) and float(d) > 0
    assert float(lpips(x, x)) == pytest.approx(0.0, abs=1e-6)
