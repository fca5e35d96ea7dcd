"""Torch forward-parity oracle for LPIPS (VERDICT round-2 items 2/3).

Builds a hand-written torch LPIPS (official structure: scaling layer →
VGG16 feature slices (torchvision
layout, hand-built — torchvision is not installed here) → channel-unit-normalize → learned lin
1×1 weights → spatial mean → layer sum), exports the SAME VGG + lin weights
through scripts/export_weights.py's converters, and asserts
uig.eval.lpips.make_lpips matches ≤1e-5. torch weights are random
(zero-egress env) — parity of the *function* is what's under test; real
checkpoints ride the identical converter path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "helpers"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", "scripts"))
from export_weights import convert_lpips_lin, convert_vgg16  # noqa: E402
from torch_nets import build_vgg16  # noqa: E402

# official lpips VGG16 slice boundaries over torchvision vgg16.features
SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))


def _torch_lpips(vgg_features, lins, x, y):
    """Official LPIPS forward in torch (NCHW, [-1,1] inputs)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        t = (t - shift) / scale
        out = []
        for lo, hi in SLICES:
            for i in range(lo, hi):
                t = vgg_features[i](t)
            out.append(t)
        return out

    def unit(f):
        norm = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
        return f / (norm + 1e-10)

    total = 0.0
    for fl, (fx, fy) in zip(lins, zip(feats(x), feats(y))):
        sq = (unit(fx) - unit(fy)) ** 2
        weighted = (sq * fl.view(1, -1, 1, 1)).sum(dim=1)  # lin 1x1 conv
        total = total + weighted.mean(dim=(1, 2))  # spatial mean
    return total.mean().item()  # batch mean, layer sum


@pytest.fixture(scope="module")
def vgg_and_weights(tmp_path_factory):
    torch.manual_seed(0)
    vgg = build_vgg16().eval()
    sd = {k: np.asarray(v) for k, v in vgg.state_dict().items()}
    gen = torch.Generator().manual_seed(1)
    lins = [torch.rand((1, c, 1, 1), generator=gen) * 0.1
            for c in (64, 128, 256, 512, 512)]
    lin_sd = {f"lin{i}.model.1.weight": np.asarray(t)
              for i, t in enumerate(lins)}
    d = tmp_path_factory.mktemp("lpips")
    vgg_npz, lin_npz = d / "vgg.npz", d / "lin.npz"
    np.savez(vgg_npz, **convert_vgg16(sd))
    np.savez(lin_npz, **convert_lpips_lin(lin_sd))
    return vgg, lins, str(vgg_npz), str(lin_npz)


def test_lpips_matches_torch_oracle(vgg_and_weights):
    vgg, lins, vgg_npz, lin_npz = vgg_and_weights
    from uig.eval.lpips import make_lpips

    lp = make_lpips(weights_path=vgg_npz, lin_path=lin_npz)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = float(lp(jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        want = _torch_lpips(vgg.features,
                            [t.squeeze(0).squeeze(-1).squeeze(-1) for t in lins],
                            torch.from_numpy(x).permute(0, 3, 1, 2),
                            torch.from_numpy(y).permute(0, 3, 1, 2))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-5)


def test_lpips_identity_zero(vgg_and_weights):
    _, _, vgg_npz, lin_npz = vgg_and_weights
    from uig.eval.lpips import make_lpips

    lp = make_lpips(weights_path=vgg_npz, lin_path=lin_npz)
    x = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert float(lp(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_fallback_mode_no_lin(vgg_and_weights):
    """Without lin weights the documented equal-weight fallback still works."""
    _, _, vgg_npz, _ = vgg_and_weights
    from uig.eval.lpips import make_lpips

    lp = make_lpips(weights_path=vgg_npz)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(lp(x, y)) > 0.0
    assert float(lp(x, x)) == pytest.approx(0.0, abs=1e-6)
