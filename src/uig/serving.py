"""Serving export: freeze a trained run's EMA translate path into a
self-contained, ahead-of-time StableHLO artifact (`jax.export`).

SURVEY.md §3 call stack 3 ends at batch inference through the live
framework; production deployment wants the opposite — an artifact that
needs NO uig (or flax/orbax) at serving time, just jax on the target
platform. `export_translate` bakes everything into one serialized
function:

  * the EMA weights as constants (no checkpoint to load at serving time),
  * the L0 deterministic preprocessing (center-crop + normalize) and the
    output denormalization, so the artifact is uint8 (B, load, load, 3)
    in → uint8 (B, crop, crop, 3) out and serving preprocessing is
    pixel-identical to training-time eval (the north-star clause),
  * the fp32 pinned-matmul-precision serving path (byte-identical outputs
    across runs), or bf16 via `model.eval_dtype=bfloat16` overrides.

The artifact is a directory: `fn.stablehlo` (the serialized exported
function) + `meta.json` (shape/dtype/provenance). Load with
`load_exported(path)` — a plain callable — anywhere jax runs for the
platforms baked at export time (`platforms=("tpu", "cpu")` by default, so
one artifact serves both the fleet and CPU smoke tests).
"""

from __future__ import annotations

import json
import os

import numpy as np

_FN_FILE = "fn.stablehlo"
_META_FILE = "meta.json"


def export_translate(run_dir: str, output_dir: str, direction: str = "a2b",
                     batch_size: int = 8, step: int | None = None,
                     overrides=(), target_domain: int | None = None,
                     style_seed: int = 0,
                     platforms: tuple[str, ...] = ("tpu", "cpu")) -> dict:
    """Export ``run_dir``'s EMA translate path as a serving artifact.

    Multi-domain runs (kind=stargan/starganv2): ``target_domain`` is baked
    in (one artifact per target domain — serving needs no label plumbing);
    v2 additionally bakes the mapping-network style from ``style_seed``
    (one artifact per output mode). Returns the metadata dict (also
    written to ``meta.json``)."""
    import jax
    from jax import export as jex

    from uig.cli.translate import load_run
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    cfg, trainer, state = load_run(run_dir, step, overrides)
    kind = cfg.model.kind
    if not hasattr(trainer, "translate"):
        raise ValueError(
            f"kind={kind!r} has no translate path to export; use the "
            "sample CLI for unconditional-generation families")
    stargan = kind == "stargan"
    starganv2 = kind == "starganv2"
    if target_domain is not None and not (stargan or starganv2):
        raise ValueError(
            "target_domain applies only to multi-domain (kind=stargan/"
            f"starganv2) runs; this run is kind={kind!r}")
    ema = jax.device_get(state.ema)  # host copy — baked in as constants
    crop = cfg.model.image_size
    load = cfg.data.load_size

    def serve(raw_u8):
        x = center_crop_normalize(raw_u8, crop)
        if starganv2:
            y = trainer.translate(ema, x, target_domain or 0,
                                  style_seed=style_seed)
        elif stargan:
            y = trainer.translate(ema, x, target_domain or 0)
        else:
            y = trainer.translate(ema, x, direction)
        return denormalize_to_u8(y)

    spec = jax.ShapeDtypeStruct((batch_size, load, load, 3), np.uint8)
    exported = jex.export(jax.jit(serve), platforms=platforms)(spec)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, _FN_FILE), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "kind": kind,
        "direction": None if (stargan or starganv2) else direction,
        "target_domain": ((target_domain or 0) if (stargan or starganv2)
                          else None),
        "style_seed": style_seed if starganv2 else None,
        "input": [batch_size, load, load, 3],
        "input_dtype": "uint8",
        "output": [batch_size, crop, crop, 3],
        "output_dtype": "uint8",
        "eval_dtype": cfg.model.eval_dtype,
        "platforms": list(platforms),
        "run_dir": os.path.abspath(run_dir),
        "preset": cfg.run.name,
    }
    with open(os.path.join(output_dir, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedTranslator:
    """A loaded serving artifact: ``y_u8 = translator(x_u8)``.

    Static batch (the compiled shape): shorter final batches are padded by
    repeating the last row and trimmed after — same policy as the live
    translate CLI."""

    def __init__(self, path: str):
        from jax import export as jex

        with open(os.path.join(path, _FN_FILE), "rb") as f:
            self._exported = jex.deserialize(bytearray(f.read()))
        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        self.batch = self.meta["input"][0]

    def __call__(self, raw_u8: np.ndarray) -> np.ndarray:
        n = raw_u8.shape[0]
        if n == 0 or n > self.batch:
            raise ValueError(
                f"batch {n} out of range for exported batch {self.batch}")
        pad = self.batch - n
        if pad:
            raw_u8 = np.concatenate(
                [raw_u8, np.repeat(raw_u8[-1:], pad, 0)])
        out = np.asarray(self._exported.call(raw_u8))
        return out[:n]


def load_exported(path: str) -> ExportedTranslator:
    """Load an `export_translate` artifact; returns a plain callable."""
    return ExportedTranslator(path)
