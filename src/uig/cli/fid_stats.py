"""`uig fid-stats` — precompute a dataset's FID reference statistics once
and reuse them across every eval (`uig eval-fid --ref-stats`), the
pytorch-fid `--save-stats` workflow. The npz stores RAW sums (n, Σx, Σxxᵀ)
in float64 plus the extractor name and crop size, so a mismatched reuse is
a loud error, never a silently wrong number.

No reference code exists to cite (/root/reference/README.md:1); semantics
follow SURVEY.md §3 call stack 4 (streamed mean/cov over jitted features).
"""

from __future__ import annotations

import numpy as np


def run_fid_stats(data_dir: str, output: str, image_size: int,
                  num_samples: int | None = None, batch_size: int = 16,
                  source: str = "auto", load_size: int | None = None,
                  overrides=()) -> str:
    """Stream `data_dir` (folder / packed .npy / tfrecord) through the
    configured feature extractor and save its FID statistics to `output`.
    Returns the extractor name. Single-process utility (run it once on one
    host; eval-fid loads the result on every host)."""
    import jax.numpy as jnp

    from uig.config import Config, apply_overrides
    from uig.data.datasets import resolve_dataset
    from uig.eval.fid import make_feature_fn, stream_stats
    from uig.kernels import center_crop_normalize

    cfg = apply_overrides(Config(), list(overrides))
    ds = resolve_dataset(data_dir, load_size or cfg.data.load_size,
                         source=source)
    n = min(num_samples or len(ds), len(ds))
    if n < 2:
        raise ValueError(f"FID statistics need >=2 images, {data_dir} "
                         f"yields {n}")
    feature_fn, name = make_feature_fn(cfg)

    def batches():
        for s in range(0, n, batch_size):
            raw = np.stack([ds[i] for i in range(s, min(s + batch_size, n))])
            yield center_crop_normalize(jnp.asarray(raw), image_size)

    st = stream_stats(batches(), feature_fn)
    st.save(output, extractor=name, image_size=image_size)
    print(f"wrote {output}: n={st.n} dim={st.s.shape[0]} "
          f"extractor={name} image_size={image_size}")
    return name
