"""Import a torch CUT / FastCUT generator checkpoint into uig.

The canonical public implementation (taesungp/contrastive-unpaired-
translation) saves its generator as `*_net_G.pth` — the CycleGAN
ResnetGenerator topology but with ANTIALIASED resampling by default
(Zhang 2019): each downsample is a stride-1 conv followed by a blur-pool
`Downsample`, each upsample a blur `Upsample` followed by a stride-1 conv.
This converter maps such a state_dict onto uig's
`ResNetGenerator(resample="antialias")` parameter tree so trained CUT
models serve on TPU through `uig translate` unchanged. The blur modules
are parameter-free (their `filt` buffers are fixed binomial filters and
are validated, not copied).

Checkpoints trained with `--no_antialias --no_antialias_up` have the exact
CycleGAN generator layout — pass `--no-antialias` to route through
scripts/import_cyclegan_torch.py's mapping instead.

Semantics oracle-tested in tests/unit/test_cut_torch_import.py (hand-built
torch replica of the antialiased generator, forward parity incl. the
blur-pool/upsample modules alone).

Usage:
  python scripts/import_cut_torch.py --src latest_net_G.pth --out g.npz

Load in python:
  from uig.models import ResNetGenerator
  from import_cyclegan_torch import load_npz_params
  gen = ResNetGenerator(n_res_blocks=9, resample="antialias")
  y = gen.apply(load_npz_params("g.npz"), x)   # x in [-1,1] NHWC
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

from import_cyclegan_torch import (_conv, _inorm, convert as convert_strided,
                                   flatten_params, load_npz_params)  # noqa

__all__ = ["convert", "flatten_params", "load_npz_params"]


def _expected_filt(size: int) -> np.ndarray:
    a = np.ones((1,))
    for _ in range(size - 1):
        a = np.convolve(a, np.ones((2,)))
    f = np.outer(a, a)
    return f / f.sum()


def _check_blur_buffers(sd: dict) -> None:
    """The blur filters are FIXED buffers; if a checkpoint's differ from the
    binomial filters uig hard-codes, refuse rather than silently mis-serve."""
    for key, val in sd.items():
        if not key.endswith(".filt"):
            continue
        filt = np.asarray(val)
        size = filt.shape[-1]
        want = _expected_filt(size)
        got = filt.reshape(-1, size, size)[0]
        scale = got.sum()  # Upsample filters are scaled by stride² (=4)
        if not np.allclose(got / scale, want, atol=1e-6):
            raise ValueError(
                f"{key} is not the binomial blur filter uig implements "
                f"(size {size}); this checkpoint used a custom filt_size")


def convert(sd: dict, n_blocks: int = 9, ngf: int = 64,
            antialias: bool = True) -> dict:
    """torch CUT ResnetGenerator state_dict -> uig ResNetGenerator params."""
    if not antialias:
        return convert_strided(sd, n_blocks=n_blocks, ngf=ngf)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    _check_blur_buffers(sd)
    p: dict = {}
    # torch module list (antialias): pad 0, conv 1, IN 2, relu 3;
    # [conv, IN, relu, Downsample] at 4-7 and 8-11; blocks 12..11+n;
    # [Upsample, conv, IN, relu] at (12+n)-(15+n) and (16+n)-(19+n);
    # pad 20+n, conv 21+n, tanh 22+n.
    # uig layer list (resample="antialias"): stem 0/1/2; [conv, IN, relu,
    # BlurPool] at 3-6 and 7-10; blocks 11..10+n; [BlurUpsample, conv, IN,
    # relu] at (11+n)-(14+n) and (15+n)-(18+n); head 19+n.
    p["layers_0"] = _conv(sd, 1)
    p["layers_1"] = _inorm(sd, 2, ngf)
    p["layers_3"] = _conv(sd, 4)
    p["layers_4"] = _inorm(sd, 5, ngf * 2)
    p["layers_7"] = _conv(sd, 8)
    p["layers_8"] = _inorm(sd, 9, ngf * 4)
    for i in range(n_blocks):
        base = f"model.{12 + i}.conv_block"
        bsd = {k.removeprefix(base + "."): v
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

        p[f"layers_{11 + i}"] = {
            "PadConv_0": bconv(1), "InstanceNorm_0": binorm(2),
            "PadConv_1": bconv(5), "InstanceNorm_1": binorm(6),
        }
    u = 12 + n_blocks
    p[f"layers_{12 + n_blocks}"] = _conv(sd, u + 1)
    p[f"layers_{13 + n_blocks}"] = _inorm(sd, u + 2, ngf * 2)
    p[f"layers_{16 + n_blocks}"] = _conv(sd, u + 5)
    p[f"layers_{17 + n_blocks}"] = _inorm(sd, u + 6, ngf)
    p[f"layers_{19 + n_blocks}"] = _conv(sd, u + 9)
    return {"params": p}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="torch .pth state_dict")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--n-blocks", type=int, default=9)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--no-antialias", action="store_true",
                    help="checkpoint trained with --no_antialias "
                         "--no_antialias_up (exact CycleGAN layout)")
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert(sd, n_blocks=args.n_blocks, ngf=args.ngf,
                     antialias=not args.no_antialias)
    np.savez(args.out, **flatten_params(params))
    mode = ("upsample='conv_transpose_torch'" if args.no_antialias
            else "resample='antialias'")
    print(f"wrote {args.out} ({len(np.load(args.out).files)} arrays; use "
          f"with ResNetGenerator(n_res_blocks={args.n_blocks}, {mode}))")


if __name__ == "__main__":
    main()
