"""End-to-end oracle for scripts/import_ugatit_torch.py: build the
canonical torch U-GAT-IT light generator (znxlwm/UGATIT-pytorch
networks.py layout — DownBlock with bias-free convs + InstanceNorm2d,
CAM gap/gmp linear heads doubling as channel attention, light γ/β FC,
adaILN decoder blocks with ρ buffers, ILN upsamples, torch.var-unbiased
normalization), convert its state_dict, and assert uig's UGATITGenerator
reproduces image, CAM logits, and heatmap."""

import os
import sys

import jax
import numpy as np
import torch
import torch.nn as nn

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
sys.path.insert(0, SCRIPTS)

import import_cyclegan_torch as imp_cg  # noqa: E402
import import_ugatit_torch as imp  # noqa: E402


class _ResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False),
            nn.InstanceNorm2d(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False),
            nn.InstanceNorm2d(dim),
        )

    def forward(self, x):
        return x + self.conv_block(x)


class _AdaILN(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.rho = nn.Parameter(torch.full((1, dim, 1, 1), 0.9))

    def forward(self, x, gamma, beta):
        in_m = torch.mean(x, dim=[2, 3], keepdim=True)
        in_v = torch.var(x, dim=[2, 3], keepdim=True)
        out_in = (x - in_m) / torch.sqrt(in_v + self.eps)
        ln_m = torch.mean(x, dim=[1, 2, 3], keepdim=True)
        ln_v = torch.var(x, dim=[1, 2, 3], keepdim=True)
        out_ln = (x - ln_m) / torch.sqrt(ln_v + self.eps)
        rho = self.rho.expand(x.shape[0], -1, -1, -1)
        out = rho * out_in + (1 - rho) * out_ln
        return (out * gamma.unsqueeze(2).unsqueeze(3)
                + beta.unsqueeze(2).unsqueeze(3))


class _ILN(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.rho = nn.Parameter(torch.zeros(1, dim, 1, 1))
        self.gamma = nn.Parameter(torch.ones(1, dim, 1, 1))
        self.beta = nn.Parameter(torch.zeros(1, dim, 1, 1))

    def forward(self, x):
        in_m = torch.mean(x, dim=[2, 3], keepdim=True)
        in_v = torch.var(x, dim=[2, 3], keepdim=True)
        out_in = (x - in_m) / torch.sqrt(in_v + self.eps)
        ln_m = torch.mean(x, dim=[1, 2, 3], keepdim=True)
        ln_v = torch.var(x, dim=[1, 2, 3], keepdim=True)
        out_ln = (x - ln_m) / torch.sqrt(ln_v + self.eps)
        rho = self.rho.expand(x.shape[0], -1, -1, -1)
        out = rho * out_in + (1 - rho) * out_ln
        return (out * self.gamma.expand(x.shape[0], -1, -1, -1)
                + self.beta.expand(x.shape[0], -1, -1, -1))


class _AdaILNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.pad1 = nn.ReflectionPad2d(1)
        self.conv1 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm1 = _AdaILN(dim)
        self.relu1 = nn.ReLU(True)
        self.pad2 = nn.ReflectionPad2d(1)
        self.conv2 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm2 = _AdaILN(dim)

    def forward(self, x, gamma, beta):
        out = self.norm1(self.conv1(self.pad1(x)), gamma, beta)
        out = self.norm2(self.conv2(self.pad2(self.relu1(out))), gamma, beta)
        return out + x


class _TorchUGATITGenerator(nn.Module):
    """The canonical public U-GAT-IT light generator topology."""

    def __init__(self, ngf=8, n_blocks=2):
        super().__init__()
        self.n_blocks = n_blocks
        down = [nn.ReflectionPad2d(3), nn.Conv2d(3, ngf, 7, bias=False),
                nn.InstanceNorm2d(ngf), nn.ReLU(True)]
        for i in range(2):
            mult = 2 ** i
            down += [nn.ReflectionPad2d(1),
                     nn.Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 0,
                               bias=False),
                     nn.InstanceNorm2d(ngf * mult * 2), nn.ReLU(True)]
        mult = 4
        for _ in range(n_blocks):
            down += [_ResnetBlock(ngf * mult)]
        self.DownBlock = nn.Sequential(*down)

        self.gap_fc = nn.Linear(ngf * mult, 1, bias=False)
        self.gmp_fc = nn.Linear(ngf * mult, 1, bias=False)
        self.conv1x1 = nn.Conv2d(ngf * mult * 2, ngf * mult, 1, bias=True)
        self.relu = nn.ReLU(True)

        self.FC = nn.Sequential(
            nn.Linear(ngf * mult, ngf * mult, bias=False), nn.ReLU(True),
            nn.Linear(ngf * mult, ngf * mult, bias=False), nn.ReLU(True))
        self.gamma = nn.Linear(ngf * mult, ngf * mult, bias=False)
        self.beta = nn.Linear(ngf * mult, ngf * mult, bias=False)

        for i in range(n_blocks):
            setattr(self, f"UpBlock1_{i + 1}", _AdaILNBlock(ngf * mult))

        up = []
        for i in range(2):
            mult = 2 ** (2 - i)
            up += [nn.Upsample(scale_factor=2, mode="nearest"),
                   nn.ReflectionPad2d(1),
                   nn.Conv2d(ngf * mult, ngf * mult // 2, 3, bias=False),
                   _ILN(ngf * mult // 2), nn.ReLU(True)]
        up += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, 3, 7, bias=False),
               nn.Tanh()]
        self.UpBlock2 = nn.Sequential(*up)

    def forward(self, x):
        x = self.DownBlock(x)
        b = x.shape[0]
        gap = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        gap_logit = self.gap_fc(gap.view(b, -1))
        gap_w = list(self.gap_fc.parameters())[0]
        x_gap = x * gap_w.unsqueeze(2).unsqueeze(3)
        gmp = torch.nn.functional.adaptive_max_pool2d(x, 1)
        gmp_logit = self.gmp_fc(gmp.view(b, -1))
        gmp_w = list(self.gmp_fc.parameters())[0]
        x_gmp = x * gmp_w.unsqueeze(2).unsqueeze(3)
        cam_logit = torch.cat([gap_logit, gmp_logit], 1)
        x = self.relu(self.conv1x1(torch.cat([x_gap, x_gmp], 1)))
        heatmap = torch.sum(x, dim=1, keepdim=True)
        x_ = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        x_ = self.FC(x_.view(b, -1))
        gamma, beta = self.gamma(x_), self.beta(x_)
        for i in range(self.n_blocks):
            x = getattr(self, f"UpBlock1_{i + 1}")(x, gamma, beta)
        out = self.UpBlock2(x)
        return out, cam_logit, heatmap


def test_ugatit_import_matches_torch_oracle(tmp_path):
    torch.manual_seed(0)
    ngf, n_blocks, size = 8, 2, 32
    net = _TorchUGATITGenerator(ngf=ngf, n_blocks=n_blocks).eval()
    # non-default rho/ILN values so the buffers are actually exercised
    with torch.no_grad():
        for name, p in net.named_parameters():
            if name.endswith(".rho") or name.endswith(".gamma") \
                    or name.endswith(".beta"):
                if p.dim() == 4:  # adaILN/ILN channel buffers
                    p.add_(0.05 * torch.randn_like(p))
                    if name.endswith(".rho"):
                        p.clamp_(0.0, 1.0)

    sd = {k: np.asarray(v.detach()) for k, v in net.state_dict().items()}
    params = imp.convert(sd, n_blocks=n_blocks, ngf=ngf)

    x = np.random.default_rng(0).uniform(-1, 1, (2, 3, size, size))
    x = x.astype(np.float32)
    with torch.no_grad():
        t_img, t_cam, t_heat = net(torch.from_numpy(x))

    from uig.models import UGATITGenerator

    gen = UGATITGenerator(base_features=ngf, n_res_blocks=n_blocks)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    with jax.default_matmul_precision("highest"):
        j_img, j_cam, j_heat = gen.apply(params, x_nhwc)

    np.testing.assert_allclose(
        np.asarray(j_img), np.transpose(t_img.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_cam), t_cam.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_heat), np.transpose(t_heat.numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3)

    # npz roundtrip through the flat dump format
    npz = tmp_path / "g.npz"
    np.savez(npz, **imp_cg.flatten_params(params))
    loaded = imp_cg.load_npz_params(str(npz))
    with jax.default_matmul_precision("highest"):
        r_img, _, _ = gen.apply(loaded, x_nhwc)
    np.testing.assert_array_equal(np.asarray(r_img), np.asarray(j_img))
