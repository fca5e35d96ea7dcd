"""Import a torch U-GAT-IT generator checkpoint into uig.

The canonical public implementation (znxlwm/UGATIT-pytorch) saves its
generators inside a dict checkpoint {'genA2B': state_dict, 'genB2A': ...}
(networks.ResnetGenerator, light or non-light; only the LIGHT variant is
supported here — the non-light full-flatten FC layer is deliberately not
built, models/ugatit.py). This converter maps one generator state_dict
onto uig's UGATITGenerator parameter tree so existing trained models serve
on TPU through `uig translate` / `uig export` unchanged.

Semantics notes (all oracle-tested in tests/unit/test_ugatit_torch_import.py):
  * torch Conv2d OIHW weights → flax HWIO; Linear (out,in) → Dense (in,out).
  * gap_fc/gmp_fc weights (1,C) → the CAM attention vectors (C,1): the
    SAME tensor serves as classifier weight and channel attention, exactly
    as in the original.
  * adaILN/ILN ρ/γ/β buffers (1,C,1,1) → per-channel vectors (C,). The
    torch.var-unbiased normalization quirk is reproduced in uig's
    AdaLIN/ILN, so outputs match at float tolerance.
  * affine-less InstanceNorm2d → uig's affine IN at identity; torch's
    bias-free block convs → uig bias at zero.

Usage:
  python scripts/import_ugatit_torch.py --src model.pt --gen genA2B \\
      --out g_a2b.npz [--n-blocks 4] [--ngf 64]

Load in python:
  from uig.models import UGATITGenerator
  from import_cyclegan_torch import load_npz_params
  params = load_npz_params("g_a2b.npz")
  gen = UGATITGenerator(n_res_blocks=4)
  img, cam_logit, heatmap = gen.apply(params, x)   # x in [-1,1] NHWC
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"]).astype(np.float32)
    return out


def _dense(sd, key):
    # torch Linear (out, in) -> flax Dense kernel (in, out)
    return {"kernel": np.asarray(sd[f"{key}.weight"]).T.astype(np.float32)}


def _idt_inorm(c):
    return {"scale": np.ones((c,), np.float32),
            "bias": np.zeros((c,), np.float32)}


def _chan(sd, key):
    # (1, C, 1, 1) buffers -> (C,)
    return np.asarray(sd[key]).reshape(-1).astype(np.float32)


def convert(sd: dict, n_blocks: int = 4, ngf: int = 64) -> dict:
    """torch (light) ResnetGenerator state_dict -> uig UGATITGenerator
    params. torch layout (networks.py): DownBlock = [pad conv IN relu]
    + 2×[pad conv IN relu] + n×ResnetBlock; CAM gap_fc/gmp_fc/conv1x1;
    FC (2 linears) + gamma + beta; UpBlock1_{1..n} AdaILN blocks;
    UpBlock2 = 2×[up pad conv ILN relu] + [pad conv tanh]."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if any(k.startswith("FC.0") and np.asarray(v).shape[1] > ngf * 4
           for k, v in sd.items() if k == "FC.0.weight"):
        raise ValueError(
            "non-light U-GAT-IT checkpoint (full-flatten FC layer); only "
            "the light variant is supported (models/ugatit.py)")
    p: dict = {}
    # encoder: DownBlock indices 1/2, 5/6, 9/10 (pads and relus own 0/3/...)
    p["PadConv_0"] = _conv(sd, "DownBlock.1")
    p["InstanceNorm_0"] = _idt_inorm(ngf)
    p["PadConv_1"] = _conv(sd, "DownBlock.5")
    p["InstanceNorm_1"] = _idt_inorm(ngf * 2)
    p["PadConv_2"] = _conv(sd, "DownBlock.9")
    p["InstanceNorm_2"] = _idt_inorm(ngf * 4)
    # encoder residual blocks: DownBlock.{12+i}.conv_block.{1,5} (bias-free)
    zero_b = np.zeros((ngf * 4,), np.float32)
    for i in range(n_blocks):
        base = f"DownBlock.{12 + i}.conv_block"
        c0 = _conv(sd, f"{base}.1")
        c1 = _conv(sd, f"{base}.5")
        c0.setdefault("bias", zero_b)
        c1.setdefault("bias", zero_b)
        p[f"EncBlock_{i}"] = {
            "PadConv_0": c0, "InstanceNorm_0": _idt_inorm(ngf * 4),
            "PadConv_1": c1, "InstanceNorm_1": _idt_inorm(ngf * 4),
        }
    # CAM: gap_fc/gmp_fc (1, C) -> (C, 1); conv1x1 keeps its bias
    p["_CAM_0"] = {
        "gap_w": np.asarray(sd["gap_fc.weight"]).T.astype(np.float32),
        "gmp_w": np.asarray(sd["gmp_fc.weight"]).T.astype(np.float32),
        "PadConv_0": _conv(sd, "conv1x1"),
    }
    # light γ/β MLP: FC.0, FC.2 (relu at 1/3), then gamma/beta heads
    p["Dense_0"] = _dense(sd, "FC.0")
    p["Dense_1"] = _dense(sd, "FC.2")
    p["Dense_2"] = _dense(sd, "gamma")
    p["Dense_3"] = _dense(sd, "beta")
    # AdaLIN decoder blocks: UpBlock1_{i+1}.conv{1,2} + norm{1,2}.rho
    for i in range(n_blocks):
        base = f"UpBlock1_{i + 1}"
        p[f"DecBlock_{i}"] = {
            "PadConv_0": _conv(sd, f"{base}.conv1"),
            "AdaLIN_0": {"rho": _chan(sd, f"{base}.norm1.rho")},
            "PadConv_1": _conv(sd, f"{base}.conv2"),
            "AdaLIN_1": {"rho": _chan(sd, f"{base}.norm2.rho")},
        }
    # upsamples: UpBlock2 indices [up 0, pad 1, conv 2, ILN 3, relu 4] ×2,
    # then [pad 10, conv 11, tanh 12]
    for j, (conv_i, iln_i) in enumerate(((2, 3), (7, 8))):
        p[f"PadConv_{3 + j}"] = _conv(sd, f"UpBlock2.{conv_i}")
        p[f"ILN_{j}"] = {
            "rho": _chan(sd, f"UpBlock2.{iln_i}.rho"),
            "gamma": _chan(sd, f"UpBlock2.{iln_i}.gamma"),
            "beta": _chan(sd, f"UpBlock2.{iln_i}.beta"),
        }
    p["PadConv_5"] = _conv(sd, "UpBlock2.11")
    return {"params": p}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="torch checkpoint (.pt dict or bare state_dict)")
    ap.add_argument("--gen", default="genA2B",
                    help="key inside a dict checkpoint (genA2B | genB2A); "
                         "ignored for a bare state_dict")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--n-blocks", type=int, default=4)
    ap.add_argument("--ngf", type=int, default=64)
    args = ap.parse_args(argv)

    import torch

    from import_cyclegan_torch import flatten_params

    ckpt = torch.load(args.src, map_location="cpu", weights_only=True)
    sd = ckpt[args.gen] if args.gen in ckpt else ckpt
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert(sd, n_blocks=args.n_blocks, ngf=args.ngf)
    np.savez(args.out, **flatten_params(params))
    print(f"wrote {args.out} "
          f"({len(np.load(args.out).files)} arrays; use with "
          f"UGATITGenerator(n_res_blocks={args.n_blocks}))")


if __name__ == "__main__":
    main()
