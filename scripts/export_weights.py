"""Convert pretrained torch checkpoints into the .npz layouts uig loads.

Addresses the "FID/LPIPS weight converter" gap: `uig.eval.inception` and
`uig.eval.lpips` accept .npz weight files (flattened 'a/b/c' keys), but this
zero-egress environment cannot download the pretrained checkpoints. This
script is the bridge: the moment an InceptionV3 / VGG16 torch checkpoint is
reachable (any machine with the file), one command produces the exact npz
the framework loads.

Sources accepted (``--src``):
  * a torch ``.pth``/``.pt`` state_dict — torchvision ``inception_v3`` /
    ``vgg16`` naming, which is also the naming used by the canonical
    pytorch-fid checkpoint (pt_inception-2015-12-05-21f595d4e1b676bc8bdabf19.pth)
  * a ``.npz`` already using the torch key names (for testing / re-export)

Usage:
  python scripts/export_weights.py inception --src pt_inception.pth --out inception_fid.npz
  python scripts/export_weights.py vgg16 --src vgg16-397923af.pth --out vgg16_lpips.npz

Then point configs at them:
  --set eval.inception_weights=/path/inception_fid.npz
  --set eval.vgg_weights=/path/vgg16_lpips.npz

The mapping is verified by tests/unit/test_export_weights.py with a
synthetic torch-keyed checkpoint (roundtrip through init_inception /
make_lpips, forward pass, and value equality on sampled params).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

# torchvision vgg16.features conv layer indices, in order of uig's conv0..12
VGG16_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _load_state_dict(src: str) -> dict:
    if src.endswith(".npz"):
        return dict(np.load(src))
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items()}


def _branch_to_torch(name: str) -> str:
    """uig branch name -> torchvision branch name.

    b1x1 -> branch1x1, bpool -> branch_pool, b3x3dbl_2 -> branch3x3dbl_2, ...
    """
    if name == "bpool":
        return "branch_pool"
    assert name.startswith("b"), name
    return "branch" + name[1:]


def convert_inception(sd: dict, num_classes: int = 0) -> dict:
    """torch inception_v3 state_dict -> flattened flax npz dict.

    Target layout: the keys produced by flattening the variables of
    uig.eval.inception.InceptionV3Features (see init_inception), i.e.
    'params/<block>/<branch>/conv/kernel', 'params/.../bn/scale', ... and
    'batch_stats/.../bn/mean'/'var'. ``num_classes`` > 0 additionally maps
    the fc head ('fc.weight'/'fc.bias' -> 'params/fc/kernel'/'bias') for
    the Inception Score path."""
    import jax
    import jax.numpy as jnp

    from uig.eval.inception import InceptionV3Features, _flatten

    model = InceptionV3Features(num_classes=num_classes)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3), jnp.float32)))

    out = {}
    missing = []
    for path, leaf in _flatten(variables):
        # path examples:
        #   ('params', 'Conv2d_1a_3x3', 'conv', 'kernel')
        #   ('params', 'Mixed_5b', 'b1x1', 'bn', 'scale')
        #   ('batch_stats', 'Mixed_5b', 'b1x1', 'bn', 'mean')
        col, *mods, layer, pname = path
        torch_mods = [m if m.startswith(("Conv2d", "Mixed")) else
                      _branch_to_torch(m) for m in mods]
        if layer == "fc":
            tk = f"fc.{'weight' if pname == 'kernel' else 'bias'}"
            if tk not in sd:
                missing.append(tk)
                continue
            val = np.asarray(sd[tk])
            if pname == "kernel":
                val = val.T  # torch (out, in) -> flax (in, out)
        elif layer == "conv":
            assert pname == "kernel"
            tk = ".".join(torch_mods + ["conv", "weight"])
            if tk not in sd:
                missing.append(tk)
                continue
            val = np.asarray(sd[tk]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            assert layer == "bn"
            tname = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}[pname]
            tk = ".".join(torch_mods + ["bn", tname])
            if tk not in sd:
                missing.append(tk)
                continue
            val = np.asarray(sd[tk])
        if tuple(val.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(path)}: torch {val.shape} "
                f"vs expected {tuple(leaf.shape)}")
        out["/".join(path)] = val.astype(np.float32)
    if missing:
        raise KeyError(
            f"{len(missing)} torch keys missing, e.g. {missing[:5]} — is this "
            "an inception_v3 / pytorch-fid state_dict?")
    return out


def convert_vgg16(sd: dict) -> dict:
    """torchvision vgg16 state_dict -> flattened flax npz for uig LPIPS."""
    out = {}
    for i, ti in enumerate(VGG16_TORCH_CONV_IDX):
        wk, bk = f"features.{ti}.weight", f"features.{ti}.bias"
        if wk not in sd:
            raise KeyError(f"missing {wk} — is this a torchvision vgg16 "
                           "state_dict?")
        out[f"params/conv{i}/kernel"] = (
            np.asarray(sd[wk]).transpose(2, 3, 1, 0).astype(np.float32))
        out[f"params/conv{i}/bias"] = np.asarray(sd[bk]).astype(np.float32)
    return out


def convert_lpips_lin(sd: dict) -> dict:
    """Official LPIPS lin weights (lpips/weights/v0.1/vgg.pth: keys
    lin{0..4}.model.1.weight, shape (1, C, 1, 1)) -> npz {lin0: (C,), ...}
    for uig.eval.lpips.make_lpips(lin_path=...)."""
    out = {}
    for i in range(5):
        tk = f"lin{i}.model.1.weight"
        if tk not in sd:
            raise KeyError(f"missing {tk} — is this an official LPIPS "
                           "(net='vgg') weights state_dict?")
        out[f"lin{i}"] = np.asarray(sd[tk]).reshape(-1).astype(np.float32)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("net", choices=("inception", "vgg16", "lpips_lin"))
    ap.add_argument("--src", required=True, help=".pth/.pt/.npz checkpoint")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--fc", type=int, default=0, metavar="NUM_CLASSES",
                    help="inception only: also export the fc head with this "
                         "many classes (1000 for torchvision inception_v3) "
                         "— enables the Inception Score path")
    args = ap.parse_args(argv)

    sd = _load_state_dict(args.src)
    conv = {"inception": convert_inception, "vgg16": convert_vgg16,
            "lpips_lin": convert_lpips_lin}[args.net]
    kw = {"num_classes": args.fc} if args.net == "inception" else {}
    np.savez(args.out, **conv(sd, **kw))
    print(f"wrote {args.out} ({len(np.load(args.out).files)} arrays)")


if __name__ == "__main__":
    main()
