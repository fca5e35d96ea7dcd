"""End-to-end oracle for scripts/import_cyclegan_torch.py: build the
canonical torch ResnetGenerator (junyanz/pytorch-CycleGAN-and-pix2pix
layout — ReflectionPad+Conv stem/head, strided downs, 9 ResnetBlocks,
ConvTranspose2d ups, InstanceNorm2d(affine=False)), convert its state_dict,
and assert the uig ResNetGenerator reproduces its outputs."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
sys.path.insert(0, SCRIPTS)

import import_cyclegan_torch as imp  # noqa: E402


class _TorchResnetBlock(nn.Module):
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


class _TorchResnetGenerator(nn.Module):
    """The canonical public CycleGAN generator topology."""

    def __init__(self, ngf=8, n_blocks=2):
        super().__init__()
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(3, ngf, 7),
                  nn.InstanceNorm2d(ngf), nn.ReLU(True)]
        mult = 1
        for _ in range(2):
            layers += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=2,
                                 padding=1),
                       nn.InstanceNorm2d(ngf * mult * 2), nn.ReLU(True)]
            mult *= 2
        for _ in range(n_blocks):
            layers += [_TorchResnetBlock(ngf * mult)]
        for _ in range(2):
            layers += [nn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3,
                                          stride=2, padding=1,
                                          output_padding=1),
                       nn.InstanceNorm2d(ngf * mult // 2), nn.ReLU(True)]
            mult //= 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, 3, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


def test_torch_generator_roundtrip(tmp_path):
    from uig.models import ResNetGenerator

    torch.manual_seed(0)
    ngf, n_blocks = 8, 2
    tg = _TorchResnetGenerator(ngf=ngf, n_blocks=n_blocks).eval()

    # convert via the script's function path + the npz file path
    sd = {k: np.asarray(v.detach()) for k, v in tg.state_dict().items()}
    params = imp.convert(sd, n_blocks=n_blocks, ngf=ngf)
    out = tmp_path / "g.npz"
    np.savez(out, **imp.flatten_params(params))
    params2 = imp.load_npz_params(str(out))

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        yt = tg(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    yt = np.transpose(yt, (0, 2, 3, 1))

    gen = ResNetGenerator(base_features=ngf, n_res_blocks=n_blocks,
                          upsample="conv_transpose_torch",
                          dtype=jnp.float32)
    for p in (params, params2):
        y = np.asarray(gen.apply(p, jnp.asarray(x)))
        np.testing.assert_allclose(y, yt, atol=1e-4)


def test_upsample_conv_transpose_torch_matches_torch():
    """The conv_transpose_torch execution path alone vs the torch layer."""
    from uig.models.layers import UpsampleConv

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    tw = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    tb = rng.normal(size=(3,)).astype(np.float32)

    t = torch.nn.ConvTranspose2d(4, 3, 3, stride=2, padding=1,
                                 output_padding=1)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(tw))
        t.bias.copy_(torch.from_numpy(tb))
    yt = np.transpose(
        t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy(),
        (0, 2, 3, 1))

    k = np.transpose(tw, (2, 3, 0, 1))[::-1, ::-1].copy()
    mod = UpsampleConv(3, method="conv_transpose_torch")
    params = {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(k),
                                             "bias": jnp.asarray(tb)}}}
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(y, yt, atol=1e-5)
