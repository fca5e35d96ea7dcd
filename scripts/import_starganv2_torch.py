"""Import a torch StarGAN v2 checkpoint into uig.

The canonical public implementation (clovaai/stargan-v2) saves its EMA
serving networks as ``{iter}_nets_ema.ckpt`` — a dict of state_dicts
{'generator': ..., 'mapping_network': ..., 'style_encoder': ...} (plus
'discriminator' in the nets checkpoint). This converter maps those onto
uig's StarGAN v2 parameter trees (models/starganv2.py) so published
AFHQ/CelebA-HQ models serve on TPU through `uig translate` / `uig export`
unchanged.

Scope and semantics (oracle-tested in tests/unit/test_starganv2_import.py):
  * Only the **w_hpf=0** generator variant is supported (the published
    AFHQ config; models/starganv2.py builds exactly this). CelebA-HQ
    checkpoints trained with w_hpf=1 carry one extra encode/decode block
    pair and require external facial masks — detected and rejected loudly.
  * torch Conv2d OIHW weights → flax HWIO; Linear (out,in) → Dense (in,out).
  * InstanceNorm2d(affine=True) weight/bias → InstanceNorm scale/bias
    (identical biased-variance semantics, eps 1e-5, no running stats).
  * AdaIN fc = Linear(style, 2C) producing [γ, β] chunks → StyleAdaIN's
    owned Dense (same chunk order: scale first).
  * per-domain ModuleList heads (mapping unshared MLPs, style-encoder /
    discriminator Linears, D's final 1×1 num_domains conv) → the STACKED
    (D, in, out) `_DomainHeads` parameters, stacked over the domain axis.

Usage:
  python scripts/import_starganv2_torch.py --src 100000_nets_ema.ckpt \\
      --out afhq_ema.npz [--img-size 256]

Load in python:
  from import_starganv2_torch import load_ema_npz
  ema = load_ema_npz("afhq_ema.npz")       # {"g": …, "f": …, "e": …}
  y = trainer.translate(ema, x, target_domain, style_seed=0)
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def _strip(sd):
    """Drop a DataParallel 'module.' prefix if present."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return out


def _inorm(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32)}


def _dense(sd, key):
    out = {"kernel": np.asarray(sd[f"{key}.weight"],
                                dtype=np.float32).T}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return out


def _resblk(sd, pre, normalize):
    """torch ResBlk → V2ResBlk: conv1/conv2 → PadConv_0/1, optional
    conv1x1 shortcut → PadConv_2, norm1/norm2 → InstanceNorm_0/1."""
    p = {"PadConv_0": _conv(sd, f"{pre}.conv1"),
         "PadConv_1": _conv(sd, f"{pre}.conv2")}
    if f"{pre}.conv1x1.weight" in sd:
        p["PadConv_2"] = _conv(sd, f"{pre}.conv1x1")
    if normalize:
        p["InstanceNorm_0"] = _inorm(sd, f"{pre}.norm1")
        p["InstanceNorm_1"] = _inorm(sd, f"{pre}.norm2")
    return p


def _adain_resblk(sd, pre):
    """torch AdainResBlk → V2AdainResBlk: norm{1,2}.fc → StyleAdaIN_{0,1}'s
    Dense_0 ([γ, β] chunk order is shared)."""
    p = {"StyleAdaIN_0": {"Dense_0": _dense(sd, f"{pre}.norm1.fc")},
         "StyleAdaIN_1": {"Dense_0": _dense(sd, f"{pre}.norm2.fc")},
         "PadConv_0": _conv(sd, f"{pre}.conv1"),
         "PadConv_1": _conv(sd, f"{pre}.conv2")}
    if f"{pre}.conv1x1.weight" in sd:
        p["PadConv_2"] = _conv(sd, f"{pre}.conv1x1")
    return p


def convert_generator(sd, img_size: int = 256) -> dict:
    """Official Generator (w_hpf=0) state_dict → V2Generator params."""
    sd = _strip(sd)
    n_down = int(math.log2(img_size)) - 4
    n_encode = n_down + 2
    have = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("encode.")})
    if len(have) != n_encode:
        raise ValueError(
            f"generator has {len(have)} encode blocks, expected {n_encode} "
            f"for img_size={img_size} with w_hpf=0 — CelebA-HQ w_hpf=1 "
            "checkpoints (one extra block + facial masks) are not supported")
    p = {"PadConv_0": _conv(sd, "from_rgb")}
    # encode: Down_0..{n-1} then Bottle_0/1 (all normalized)
    for i in range(n_down):
        p[f"Down_{i}"] = _resblk(sd, f"encode.{i}", normalize=True)
    for j in range(2):
        p[f"Bottle_{j}"] = _resblk(sd, f"encode.{n_down + j}",
                                   normalize=True)
    # decode applies in list order: 2 bottleneck AdaIN blocks, then the
    # upsample blocks deepest-plane first — exactly AdaBottle_0/1, Up_0..
    for j in range(2):
        p[f"AdaBottle_{j}"] = _adain_resblk(sd, f"decode.{j}")
    for i in range(n_down):
        p[f"Up_{i}"] = _adain_resblk(sd, f"decode.{2 + i}")
    p["InstanceNorm_0"] = _inorm(sd, "to_rgb.0")
    p["PadConv_1"] = _conv(sd, "to_rgb.2")
    return {"params": p}


def _stack_heads(sd, fmt_w, fmt_b, num_domains, layers):
    """ModuleList of per-domain torch Linears → stacked (D, in, out)
    `_DomainHeads` params. ``layers`` maps head-layer index → torch
    sequential index (e.g. {0: 0, 1: 2, ...} for Linear/ReLU pairs)."""
    p = {}
    for li, ti in layers.items():
        w = np.stack([np.asarray(sd[fmt_w.format(d=d, t=ti)],
                                 dtype=np.float32).T
                      for d in range(num_domains)])
        b = np.stack([np.asarray(sd[fmt_b.format(d=d, t=ti)],
                                 dtype=np.float32)
                      for d in range(num_domains)])
        p[f"w{li}"] = w
        p[f"b{li}"] = b
    return p


def _infer_domains(sd, prefix):
    return 1 + max(int(k.split(".")[1]) for k in sd
                   if k.startswith(prefix + "."))


def convert_mapping(sd) -> dict:
    """Official MappingNetwork state_dict → V2MappingNetwork params."""
    sd = _strip(sd)
    num_domains = _infer_domains(sd, "unshared")
    p = {}
    # shared trunk: Sequential [Linear, ReLU] ×4 → Dense_0..3
    for i, ti in enumerate((0, 2, 4, 6)):
        p[f"Dense_{i}"] = _dense(sd, f"shared.{ti}")
    # unshared per-domain 4-layer MLPs → stacked w0..3/b0..3
    p["_DomainHeads_0"] = _stack_heads(
        sd, "unshared.{d}.{t}.weight", "unshared.{d}.{t}.bias",
        num_domains, {0: 0, 1: 2, 2: 4, 3: 6})
    return {"params": p}


def _convert_trunk(sd, prefix, img_size):
    """Official shared Sequential (E) / main Sequential (D) → _SharedTrunk:
    index 0 = from-RGB conv, 1..r = unnormalized downsample ResBlks,
    r+2 = the 4×4 VALID conv."""
    n = int(math.log2(img_size)) - 2
    p = {"PadConv_0": _conv(sd, f"{prefix}.0")}
    for i in range(n):
        p[f"Down_{i}"] = _resblk(sd, f"{prefix}.{1 + i}", normalize=False)
    p["Conv_0"] = _conv(sd, f"{prefix}.{n + 2}")
    return p


def convert_style_encoder(sd, img_size: int = 256) -> dict:
    """Official StyleEncoder state_dict → V2StyleEncoder params."""
    sd = _strip(sd)
    num_domains = _infer_domains(sd, "unshared")
    return {"params": {
        "_SharedTrunk_0": _convert_trunk(sd, "shared", img_size),
        "_DomainHeads_0": {
            "w0": np.stack([np.asarray(sd[f"unshared.{d}.weight"],
                                       dtype=np.float32).T
                            for d in range(num_domains)]),
            "b0": np.stack([np.asarray(sd[f"unshared.{d}.bias"],
                                       dtype=np.float32)
                            for d in range(num_domains)])},
    }}


def convert_discriminator(sd, img_size: int = 256) -> dict:
    """Official Discriminator state_dict → V2Discriminator params. The
    final 1×1 conv to num_domains channels IS the per-domain linear head:
    weight (D, C, 1, 1) → w0 (D, C, 1), bias (D,) → b0 (D, 1)."""
    sd = _strip(sd)
    n = int(math.log2(img_size)) - 2
    head_w = np.asarray(sd[f"main.{n + 4}.weight"], dtype=np.float32)
    head_b = np.asarray(sd[f"main.{n + 4}.bias"], dtype=np.float32)
    num_domains = head_w.shape[0]
    return {"params": {
        "_SharedTrunk_0": _convert_trunk(sd, "main", img_size),
        "_DomainHeads_0": {
            "w0": head_w[:, :, 0, 0][:, :, None],
            "b0": head_b.reshape(num_domains, 1)},
    }}


def convert_checkpoint(ckpt: dict, img_size: int = 256) -> dict:
    """A loaded nets_ema checkpoint dict → uig EMA dict {"g","f","e"}."""
    return {"g": convert_generator(ckpt["generator"], img_size),
            "f": convert_mapping(ckpt["mapping_network"]),
            "e": convert_style_encoder(ckpt["style_encoder"], img_size)}


# ---------------------------------------------------------------------------
# flat npz (same scheme as import_cyclegan_torch, with a net prefix)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


def save_ema_npz(ema: dict, path: str):
    np.savez(path, **_flatten(ema))


def load_ema_npz(path: str) -> dict:
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", required=True,
                    help="torch checkpoint (e.g. 100000_nets_ema.ckpt)")
    ap.add_argument("--out", required=True, help=".npz output path")
    ap.add_argument("--img-size", type=int, default=256)
    args = ap.parse_args(argv)

    import torch

    ckpt = torch.load(args.src, map_location="cpu", weights_only=True)
    ckpt = {k: {kk: vv.numpy() for kk, vv in v.items()}
            for k, v in ckpt.items()}
    ema = convert_checkpoint(ckpt, args.img_size)
    save_ema_npz(ema, args.out)
    n = sum(v.size for v in _flatten(ema).values())
    print(f"wrote {args.out}: g/f/e EMA trees, {n:,} parameters")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
