"""StarGAN v2 torch-checkpoint importer oracle (scripts/
import_starganv2_torch.py): a hand-written torch replica of the canonical
public implementation's modules (clovaai/stargan-v2 core/model.py naming,
w_hpf=0) is randomly initialized, converted, and must match uig's
V2Generator / V2MappingNetwork / V2StyleEncoder / V2Discriminator
forward-for-forward at float tolerance — borders, styles, and per-domain
heads included."""

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", "scripts"))

from import_starganv2_torch import (convert_checkpoint,  # noqa: E402
                                    convert_discriminator,
                                    convert_generator, convert_mapping,
                                    convert_style_encoder, load_ema_npz,
                                    save_ema_npz)

IMG = 32
STYLE = 8
LATENT = 4
BASE = 8
MAXF = 16
DOMAINS = 3


# --------------------------------------------------------------------------
# torch replica of the official modules (state_dict naming preserved)
# --------------------------------------------------------------------------
class TResBlk(tnn.Module):
    def __init__(self, dim_in, dim_out, normalize=False, downsample=False):
        super().__init__()
        self.normalize, self.downsample = normalize, downsample
        self.learned_sc = dim_in != dim_out
        self.conv1 = tnn.Conv2d(dim_in, dim_in, 3, 1, 1)
        self.conv2 = tnn.Conv2d(dim_in, dim_out, 3, 1, 1)
        if normalize:
            self.norm1 = tnn.InstanceNorm2d(dim_in, affine=True)
            self.norm2 = tnn.InstanceNorm2d(dim_in, affine=True)
        if self.learned_sc:
            self.conv1x1 = tnn.Conv2d(dim_in, dim_out, 1, 1, 0, bias=False)

    def _shortcut(self, x):
        if self.learned_sc:
            x = self.conv1x1(x)
        if self.downsample:
            x = tF.avg_pool2d(x, 2)
        return x

    def _residual(self, x):
        if self.normalize:
            x = self.norm1(x)
        x = tF.leaky_relu(x, 0.2)
        x = self.conv1(x)
        if self.downsample:
            x = tF.avg_pool2d(x, 2)
        if self.normalize:
            x = self.norm2(x)
        x = tF.leaky_relu(x, 0.2)
        x = self.conv2(x)
        return x

    def forward(self, x):
        return (self._shortcut(x) + self._residual(x)) / math.sqrt(2)


class TAdaIN(tnn.Module):
    def __init__(self, style_dim, num_features):
        super().__init__()
        self.norm = tnn.InstanceNorm2d(num_features, affine=False)
        self.fc = tnn.Linear(style_dim, num_features * 2)

    def forward(self, x, s):
        h = self.fc(s).view(s.size(0), -1, 1, 1)
        gamma, beta = torch.chunk(h, 2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class TAdainResBlk(tnn.Module):
    def __init__(self, dim_in, dim_out, style_dim, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.learned_sc = dim_in != dim_out
        self.conv1 = tnn.Conv2d(dim_in, dim_out, 3, 1, 1)
        self.conv2 = tnn.Conv2d(dim_out, dim_out, 3, 1, 1)
        self.norm1 = TAdaIN(style_dim, dim_in)
        self.norm2 = TAdaIN(style_dim, dim_out)
        if self.learned_sc:
            self.conv1x1 = tnn.Conv2d(dim_in, dim_out, 1, 1, 0, bias=False)

    def _shortcut(self, x):
        if self.upsample:
            x = tF.interpolate(x, scale_factor=2, mode="nearest")
        if self.learned_sc:
            x = self.conv1x1(x)
        return x

    def _residual(self, x, s):
        x = self.norm1(x, s)
        x = tF.leaky_relu(x, 0.2)
        if self.upsample:
            x = tF.interpolate(x, scale_factor=2, mode="nearest")
        x = self.conv1(x)
        x = self.norm2(x, s)
        x = tF.leaky_relu(x, 0.2)
        x = self.conv2(x)
        return x

    def forward(self, x, s):
        return (self._residual(x, s) + self._shortcut(x)) / math.sqrt(2)


class TGenerator(tnn.Module):
    """Official Generator with w_hpf=0 (the supported variant)."""

    def __init__(self, img_size, style_dim, dim_in, max_conv_dim):
        super().__init__()
        self.from_rgb = tnn.Conv2d(3, dim_in, 3, 1, 1)
        self.encode = tnn.ModuleList()
        self.decode = tnn.ModuleList()
        self.to_rgb = tnn.Sequential(
            tnn.InstanceNorm2d(dim_in, affine=True),
            tnn.LeakyReLU(0.2),
            tnn.Conv2d(dim_in, 3, 1, 1, 0))
        repeat_num = int(np.log2(img_size)) - 4
        for _ in range(repeat_num):
            dim_out = min(dim_in * 2, max_conv_dim)
            self.encode.append(
                TResBlk(dim_in, dim_out, normalize=True, downsample=True))
            self.decode.insert(
                0, TAdainResBlk(dim_out, dim_in, style_dim, upsample=True))
            dim_in = dim_out
        for _ in range(2):
            self.encode.append(TResBlk(dim_out, dim_out, normalize=True))
            self.decode.insert(0, TAdainResBlk(dim_out, dim_out, style_dim))

    def forward(self, x, s):
        x = self.from_rgb(x)
        for block in self.encode:
            x = block(x)
        for block in self.decode:
            x = block(x, s)
        return self.to_rgb(x)


class TMappingNetwork(tnn.Module):
    def __init__(self, latent_dim, style_dim, num_domains, hidden=16):
        super().__init__()
        layers = [tnn.Linear(latent_dim, hidden), tnn.ReLU()]
        for _ in range(3):
            layers += [tnn.Linear(hidden, hidden), tnn.ReLU()]
        self.shared = tnn.Sequential(*layers)
        self.unshared = tnn.ModuleList()
        for _ in range(num_domains):
            self.unshared.append(tnn.Sequential(
                tnn.Linear(hidden, hidden), tnn.ReLU(),
                tnn.Linear(hidden, hidden), tnn.ReLU(),
                tnn.Linear(hidden, hidden), tnn.ReLU(),
                tnn.Linear(hidden, style_dim)))

    def forward(self, z, y):
        h = self.shared(z)
        out = torch.stack([layer(h) for layer in self.unshared], dim=1)
        return out[torch.arange(y.size(0)), y]


def _trunk_blocks(img_size, dim_in, max_conv_dim):
    blocks = [tnn.Conv2d(3, dim_in, 3, 1, 1)]
    repeat_num = int(np.log2(img_size)) - 2
    for _ in range(repeat_num):
        dim_out = min(dim_in * 2, max_conv_dim)
        blocks.append(TResBlk(dim_in, dim_out, downsample=True))
        dim_in = dim_out
    blocks += [tnn.LeakyReLU(0.2),
               tnn.Conv2d(dim_out, dim_out, 4, 1, 0),
               tnn.LeakyReLU(0.2)]
    return blocks, dim_out


class TStyleEncoder(tnn.Module):
    def __init__(self, img_size, style_dim, num_domains, dim_in,
                 max_conv_dim):
        super().__init__()
        blocks, dim_out = _trunk_blocks(img_size, dim_in, max_conv_dim)
        self.shared = tnn.Sequential(*blocks)
        self.unshared = tnn.ModuleList(
            [tnn.Linear(dim_out, style_dim) for _ in range(num_domains)])

    def forward(self, x, y):
        h = self.shared(x).view(x.size(0), -1)
        out = torch.stack([layer(h) for layer in self.unshared], dim=1)
        return out[torch.arange(y.size(0)), y]


class TDiscriminator(tnn.Module):
    def __init__(self, img_size, num_domains, dim_in, max_conv_dim):
        super().__init__()
        blocks, dim_out = _trunk_blocks(img_size, dim_in, max_conv_dim)
        blocks.append(tnn.Conv2d(dim_out, num_domains, 1, 1, 0))
        self.main = tnn.Sequential(*blocks)

    def forward(self, x, y):
        out = self.main(x).view(x.size(0), -1)
        return out[torch.arange(y.size(0)), y].view(-1, 1)


# --------------------------------------------------------------------------
def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.2
    module.load_state_dict(sd)
    return {k: v.numpy() for k, v in module.state_dict().items()}


def _imgs(n, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, IMG, IMG, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def models():
    from uig.models.starganv2 import (V2Discriminator, V2Generator,
                                      V2MappingNetwork, V2StyleEncoder)

    tg = TGenerator(IMG, STYLE, BASE, MAXF).eval()
    tf_ = TMappingNetwork(LATENT, STYLE, DOMAINS).eval()
    te = TStyleEncoder(IMG, STYLE, DOMAINS, BASE, MAXF).eval()
    td = TDiscriminator(IMG, DOMAINS, BASE, MAXF).eval()
    sds = {"generator": _randomize(tg, 0),
           "mapping_network": _randomize(tf_, 1),
           "style_encoder": _randomize(te, 2),
           "discriminator": _randomize(td, 3)}
    jg = V2Generator(image_size=IMG, style_dim=STYLE, base_features=BASE,
                     max_features=MAXF)
    jf = V2MappingNetwork(num_domains=DOMAINS, latent_dim=LATENT,
                          style_dim=STYLE, hidden=16)
    je = V2StyleEncoder(image_size=IMG, num_domains=DOMAINS, style_dim=STYLE,
                        base_features=BASE, max_features=MAXF)
    jd = V2Discriminator(image_size=IMG, num_domains=DOMAINS,
                         base_features=BASE, max_features=MAXF)
    return (tg, tf_, te, td), (jg, jf, je, jd), sds


def test_generator_forward_parity(models):
    (tg, _, _, _), (jg, _, _, _), sds = models
    params = convert_generator(sds["generator"], IMG)
    x = _imgs(2, 10)
    s = np.random.default_rng(11).standard_normal((2, STYLE)).astype(
        np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(s)).permute(0, 2, 3, 1).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jg.apply(params, jnp.asarray(x), jnp.asarray(s)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_mapping_forward_parity_every_domain(models):
    (_, tf_, _, _), (_, jf, _, _), sds = models
    params = convert_mapping(sds["mapping_network"])
    z = np.random.default_rng(12).standard_normal((4, LATENT)).astype(
        np.float32)
    for d in range(DOMAINS):
        y = np.full((4,), d, np.int64)
        with torch.no_grad():
            ref = tf_(torch.from_numpy(z), torch.from_numpy(y)).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(jf.apply(params, jnp.asarray(z),
                                      jnp.asarray(y, jnp.int32)))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_style_encoder_forward_parity(models):
    (_, _, te, _), (_, _, je, _), sds = models
    params = convert_style_encoder(sds["style_encoder"], IMG)
    x = _imgs(3, 13)
    y = np.asarray([0, 2, 1], np.int64)
    with torch.no_grad():
        ref = te(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(y)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(je.apply(params, jnp.asarray(x),
                                  jnp.asarray(y, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_discriminator_forward_parity(models):
    (_, _, _, td), (_, _, _, jd), sds = models
    params = convert_discriminator(sds["discriminator"], IMG)
    x = _imgs(3, 14)
    y = np.asarray([1, 0, 2], np.int64)
    with torch.no_grad():
        ref = td(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(y)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jd.apply(params, jnp.asarray(x),
                                  jnp.asarray(y, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_npz_roundtrip_and_w_hpf_rejection(models, tmp_path):
    _, (jg, _, _, _), sds = models
    ema = convert_checkpoint(sds, IMG)
    p = str(tmp_path / "ema.npz")
    save_ema_npz(ema, p)
    loaded = load_ema_npz(p)
    x = _imgs(1, 15)
    s = np.random.default_rng(16).standard_normal((1, STYLE)).astype(
        np.float32)
    with jax.default_matmul_precision("highest"):
        a = jg.apply(ema["g"], jnp.asarray(x), jnp.asarray(s))
        b = jg.apply(jax.tree_util.tree_map(jnp.asarray, loaded["g"]),
                     jnp.asarray(x), jnp.asarray(s))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a w_hpf=1 checkpoint (one extra encode block) must be rejected loudly
    bigger = TGenerator(2 * IMG, STYLE, BASE, MAXF)  # one more block pair
    sd = {k: v.numpy() for k, v in bigger.state_dict().items()}
    with pytest.raises(ValueError, match="w_hpf"):
        convert_generator(sd, IMG)
