"""Oracles for scripts/import_cut_torch.py and the antialiased generator
resampling (`model.resample=antialias`): hand-built torch replicas of the
official CUT implementation's Downsample/Upsample blur modules and its
antialiased ResnetGenerator, asserted against uig's BlurPool/BlurUpsample
and ResNetGenerator(resample="antialias")."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
sys.path.insert(0, SCRIPTS)

import import_cut_torch as imp  # noqa: E402


def _filt(size: int) -> torch.Tensor:
    a = np.ones((1,))
    for _ in range(size - 1):
        a = np.convolve(a, np.ones((2,)))
    f = np.outer(a, a)
    return torch.from_numpy((f / f.sum()).astype(np.float32))


class TorchDownsample(nn.Module):
    """The antialiased-cnns blur-pool as used by CUT's generator."""

    def __init__(self, channels, filt_size=3, stride=2, pad_type="reflect"):
        super().__init__()
        self.stride = stride
        lo = (filt_size - 1) // 2
        hi = filt_size - 1 - lo
        pads = {"reflect": nn.ReflectionPad2d, "repl": nn.ReplicationPad2d}
        self.pad = pads[pad_type]([lo, hi, lo, hi])
        self.register_buffer(
            "filt", _filt(filt_size)[None, None].repeat(channels, 1, 1, 1))

    def forward(self, x):
        return F.conv2d(self.pad(x), self.filt, stride=self.stride,
                        groups=x.shape[1])


class TorchUpsample(nn.Module):
    """CUT's blur upsample: repl pad 1, transposed depthwise blur conv
    (filter scaled by stride²), crop to exactly 2x."""

    def __init__(self, channels, filt_size=4, stride=2, pad_type="repl"):
        super().__init__()
        self.stride = stride
        self.filt_odd = filt_size % 2 == 1
        self.pad_size = (filt_size - 1) // 2
        pads = {"reflect": nn.ReflectionPad2d, "repl": nn.ReplicationPad2d}
        self.pad = pads[pad_type]([1, 1, 1, 1])
        self.register_buffer(
            "filt",
            (_filt(filt_size) * stride ** 2)[None, None].repeat(
                channels, 1, 1, 1))

    def forward(self, x):
        y = F.conv_transpose2d(self.pad(x), self.filt, stride=self.stride,
                               padding=1 + self.pad_size,
                               groups=x.shape[1])[:, :, 1:, 1:]
        return y if self.filt_odd else y[:, :, :-1, :-1]


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


def test_blurpool_matches_torch():
    from uig.models.layers import BlurPool

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    for filt_size, pad in ((3, "reflect"), (5, "reflect"), (4, "repl")):
        with torch.no_grad():
            yt = _nhwc(TorchDownsample(5, filt_size, pad_type=pad)(_nchw(x)))
        y = np.asarray(BlurPool(filt_size=filt_size, pad_mode=pad).apply(
            {}, jnp.asarray(x)))
        np.testing.assert_allclose(y, yt, atol=1e-6, err_msg=str(filt_size))


def test_blurupsample_matches_torch():
    from uig.models.layers import BlurUpsample

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    for filt_size in (4, 3):
        with torch.no_grad():
            yt = _nhwc(TorchUpsample(4, filt_size)(_nchw(x)))
        y = np.asarray(BlurUpsample(filt_size=filt_size).apply(
            {}, jnp.asarray(x)))
        assert y.shape == (2, 14, 18, 4)
        np.testing.assert_allclose(y, yt, atol=1e-6, err_msg=str(filt_size))


def test_blur_resampling_preserves_constants():
    """Normalized (down) / stride²-scaled (up) filters keep a constant image
    constant — the antialiasing contract."""
    from uig.models.layers import BlurPool, BlurUpsample

    x = jnp.full((1, 8, 8, 3), 0.7, jnp.float32)
    d = np.asarray(BlurPool().apply({}, x))
    u = np.asarray(BlurUpsample().apply({}, x))
    np.testing.assert_allclose(d, 0.7, atol=1e-6)
    np.testing.assert_allclose(u, 0.7, atol=1e-6)
    assert d.shape == (1, 4, 4, 3) and u.shape == (1, 16, 16, 3)


class _TorchAABlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
            nn.InstanceNorm2d(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
            nn.InstanceNorm2d(dim),
        )

    def forward(self, x):
        return x + self.conv_block(x)


class _TorchCUTGenerator(nn.Module):
    """The official CUT ResnetGenerator (antialias default layout)."""

    def __init__(self, ngf=8, n_blocks=2):
        super().__init__()
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(3, ngf, 7),
                  nn.InstanceNorm2d(ngf), nn.ReLU(True)]
        mult = 1
        for _ in range(2):
            layers += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=1,
                                 padding=1),
                       nn.InstanceNorm2d(ngf * mult * 2), nn.ReLU(True),
                       TorchDownsample(ngf * mult * 2)]
            mult *= 2
        for _ in range(n_blocks):
            layers += [_TorchAABlock(ngf * mult)]
        for _ in range(2):
            layers += [TorchUpsample(ngf * mult),
                       nn.Conv2d(ngf * mult, ngf * mult // 2, 3, stride=1,
                                 padding=1),
                       nn.InstanceNorm2d(ngf * mult // 2), nn.ReLU(True)]
            mult //= 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, 3, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


def test_cut_antialias_generator_roundtrip(tmp_path):
    from uig.models import ResNetGenerator

    torch.manual_seed(0)
    ngf, n_blocks = 8, 2
    tg = _TorchCUTGenerator(ngf=ngf, n_blocks=n_blocks).eval()

    sd = {k: np.asarray(v.detach()) for k, v in tg.state_dict().items()}
    params = imp.convert(sd, n_blocks=n_blocks, ngf=ngf)
    out = tmp_path / "g.npz"
    np.savez(out, **imp.flatten_params(params))
    params2 = imp.load_npz_params(str(out))

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        yt = _nhwc(tg(_nchw(x)))

    gen = ResNetGenerator(base_features=ngf, n_res_blocks=n_blocks,
                          resample="antialias", dtype=jnp.float32)
    assert gen.num_layers == 3 + 8 + n_blocks + 8 + 2
    for p in (params, params2):
        y = np.asarray(gen.apply(p, jnp.asarray(x)))
        np.testing.assert_allclose(y, yt, atol=1e-4)


def test_custom_blur_filter_is_rejected():
    import pytest

    sd = {"model.7.filt": np.full((4, 1, 3, 3), 1 / 9.0, np.float32)}
    with pytest.raises(ValueError, match="binomial blur filter"):
        imp._check_blur_buffers(sd)
