"""Import a torch CycleGAN generator checkpoint into uig.

The canonical public implementation (junyanz/pytorch-CycleGAN-and-pix2pix)
saves generators as `*_net_G_A.pth` / `*_net_G_B.pth` state_dicts of its
ResnetGenerator (c7s1-64 → d128 → d256 → R256×n → u128 → u64 → c7s1-3,
InstanceNorm2d(affine=False), no dropout). This converter maps such a
state_dict onto uig's ResNetGenerator parameter tree, so existing trained
models serve on TPU through `uig translate` unchanged.

Semantics notes (all oracle-tested in tests/unit/test_torch_import.py):
  * torch Conv2d OIHW weights → flax HWIO.
  * torch ConvTranspose2d(k3,s2,p1,op1) → the `conv_transpose_torch`
    upsample method (VALID conv_transpose of the 180°-flipped kernel,
    low-edge crop) — use `--set model.upsample=conv_transpose_torch` with
    imported weights.
  * affine-less InstanceNorm2d → uig's affine IN at identity (scale=1,
    bias=0); affine INs map directly.

Usage:
  python scripts/import_cyclegan_torch.py --src latest_net_G_A.pth \\
      --out g_a2b.npz [--n-blocks 9]

Load in python:
  from uig.models import ResNetGenerator
  from import_cyclegan_torch import load_npz_params
  params = load_npz_params("g_a2b.npz")
  gen = ResNetGenerator(n_res_blocks=9, upsample="conv_transpose_torch")
  y = gen.apply(params, x)   # x in [-1,1] NHWC
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def _conv(sd, idx):
    w = np.asarray(sd[f"model.{idx}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)}
    if f"model.{idx}.bias" in sd:
        out["bias"] = np.asarray(sd[f"model.{idx}.bias"]).astype(np.float32)
    return out


def _convT(sd, idx):
    # torch (in, out, kh, kw) -> flax (kh, kw, in, out), rot180 for the
    # conv_transpose_torch execution path
    w = np.asarray(sd[f"model.{idx}.weight"])
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy().astype(np.float32)
    out = {"kernel": k}
    if f"model.{idx}.bias" in sd:
        out["bias"] = np.asarray(sd[f"model.{idx}.bias"]).astype(np.float32)
    return out


def _inorm(sd, idx, channels):
    if f"model.{idx}.weight" in sd:  # affine IN
        return {"scale": np.asarray(sd[f"model.{idx}.weight"]).astype(np.float32),
                "bias": np.asarray(sd[f"model.{idx}.bias"]).astype(np.float32)}
    return {"scale": np.ones((channels,), np.float32),
            "bias": np.zeros((channels,), np.float32)}


def convert(sd: dict, n_blocks: int = 9, ngf: int = 64) -> dict:
    """torch ResnetGenerator state_dict -> uig ResNetGenerator params."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p: dict = {}
    # uig layer indices (flat list in ResNetGenerator.setup): stem 0, IN 1,
    # relu 2; down1 3/4/5; down2 6/7/8; blocks 9..8+n; up1 (9+n)/(10+n);
    # up2 (12+n)/(13+n); head 15+n.
    p["layers_0"] = _conv(sd, 1)
    p["layers_1"] = _inorm(sd, 2, ngf)
    p["layers_3"] = _conv(sd, 4)
    p["layers_4"] = _inorm(sd, 5, ngf * 2)
    p["layers_6"] = _conv(sd, 7)
    p["layers_7"] = _inorm(sd, 8, ngf * 4)
    # torch blocks at model.10 ..; conv_block = [pad, conv(1), IN(2), relu,
    # pad, conv(5), IN(6)]  (no-dropout layout, the CycleGAN default)
    for i in range(n_blocks):
        base = f"model.{10 + i}.conv_block"
        bsd = {k.removeprefix(f"model.{10 + i}.conv_block."): v
               for k, v in sd.items() if k.startswith(base)}

        def bconv(j):
            w = np.asarray(bsd[f"{j}.weight"])
            out = {"kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)}
            if f"{j}.bias" in bsd:
                out["bias"] = np.asarray(bsd[f"{j}.bias"]).astype(np.float32)
            return out

        def binorm(j):
            if f"{j}.weight" in bsd:
                return {"scale": np.asarray(bsd[f"{j}.weight"]).astype(np.float32),
                        "bias": np.asarray(bsd[f"{j}.bias"]).astype(np.float32)}
            return {"scale": np.ones((ngf * 4,), np.float32),
                    "bias": np.zeros((ngf * 4,), np.float32)}

        p[f"layers_{9 + i}"] = {
            "PadConv_0": bconv(1), "InstanceNorm_0": binorm(2),
            "PadConv_1": bconv(5), "InstanceNorm_1": binorm(6),
        }
    # torch ups at model.(10+n) and model.(13+n); head conv at model.(17+n)
    u = 10 + n_blocks
    p[f"layers_{9 + n_blocks}"] = {"ConvTranspose_0": _convT(sd, u)}
    p[f"layers_{10 + n_blocks}"] = _inorm(sd, u + 1, ngf * 2)
    p[f"layers_{12 + n_blocks}"] = {"ConvTranspose_0": _convT(sd, u + 3)}
    p[f"layers_{13 + n_blocks}"] = _inorm(sd, u + 4, ngf)
    p[f"layers_{15 + n_blocks}"] = _conv(sd, u + 7)
    return {"params": p}


def flatten_params(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def load_npz_params(path: str) -> dict:
    """Inverse of the npz dump: flat 'a/b/c' keys -> nested params tree."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = flat[key]
    return tree


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="torch .pth state_dict")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--n-blocks", type=int, default=9)
    ap.add_argument("--ngf", type=int, default=64)
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert(sd, n_blocks=args.n_blocks, ngf=args.ngf)
    np.savez(args.out, **flatten_params(params))
    print(f"wrote {args.out} "
          f"({len(np.load(args.out).files)} arrays; use with "
          f"ResNetGenerator(n_res_blocks={args.n_blocks}, "
          f"upsample='conv_transpose_torch'))")


if __name__ == "__main__":
    main()
