"""Index-addressable image datasets — host side of L2 (SURVEY.md §2 "Input
pipeline").

Two sources:
  * FolderDataset — a directory of image files; host decodes (PIL) and
    resizes to ``load_size`` (the documented host/device boundary — JPEG
    Huffman decode is not TPU-expressible, SURVEY.md §7). Decoded arrays are
    uint8 NHWC; all later stages run on device.
  * SyntheticUnpairedDataset — deterministic procedural two-domain images
    ("blobs" vs "stripes") for tests and benches; no files, no egress.
    Index-addressable and seed-stable so golden tests are reproducible.
"""

from __future__ import annotations

import os

import numpy as np

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class FolderDataset:
    """Directory of images; host decode+resize to ``load_size`` uint8 HWC.

    decoder: "auto" (native C++ loader when buildable, else PIL), "native",
    or "pil". The native path (native/uig_loader.cpp) decodes a whole batch
    on a C++ thread pool with the GIL released — see
    uig/data/native_loader.py.
    """

    def __init__(self, root: str, load_size: int, decoder: str = "auto"):
        self.root = root
        self.load_size = load_size
        self.files = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.lower().endswith(_IMG_EXTS)
        )
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        if decoder == "auto":
            from uig.data import native_loader

            decoder = "native" if native_loader.available() else "pil"
        elif decoder == "native":
            from uig.data import native_loader

            if not native_loader.available():
                raise RuntimeError("native loader requested but unavailable")
        self.decoder = decoder

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self.decoder == "native":
            from uig.data import native_loader

            return native_loader.decode_resize(self.files[idx], self.load_size)
        from PIL import Image

        with Image.open(self.files[idx]) as im:
            im = im.convert("RGB")
            s = self.load_size
            # BILINEAR to match the native C++ loader's resampler exactly —
            # decoder='auto' must produce identical pixels on machines with
            # and without the native toolchain (parity asserted in
            # tests/unit/test_native_loader.py).
            im = im.resize((s, s), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)

    def get_batch(self, idxs: list[int], n_threads: int = 8) -> np.ndarray:
        """Batch decode; the native path parallelizes outside the GIL, the
        PIL path over python worker threads (PIL releases the GIL during
        decode, so threads still help)."""
        if self.decoder == "native":
            from uig.data import native_loader

            return native_loader.decode_batch(
                [self.files[i] for i in idxs], self.load_size, n_threads)
        if n_threads > 1 and len(idxs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            if not hasattr(self, "_pil_pool"):
                self._pil_pool = ThreadPoolExecutor(n_threads)
            return np.stack(list(self._pil_pool.map(self.__getitem__, idxs)))
        return np.stack([self[i] for i in idxs])


class PackedDataset:
    """Pre-decoded images in one memmapped ``.npy`` (N, S, S, 3) uint8 file —
    uig's ArrayRecord/TFRecord equivalent (SURVEY.md §2 "Input pipeline":
    "host JPEG decode (or pre-decoded ...)"). Random access is an mmap page
    read: no decode work on the hot path at all, so the host never becomes
    the bottleneck at scale. Create with ``python -m uig.cli pack``.
    """

    def __init__(self, path: str, load_size: int | None = None):
        self.path = path
        self.arr = np.load(path, mmap_mode="r")
        if self.arr.ndim != 4 or self.arr.shape[-1] != 3 or \
                self.arr.dtype != np.uint8:
            raise ValueError(
                f"{path}: expected uint8 (N, S, S, 3), got "
                f"{self.arr.dtype} {self.arr.shape}")
        if load_size is not None and self.arr.shape[1] != load_size:
            raise ValueError(
                f"{path} is packed at {self.arr.shape[1]}px, config wants "
                f"load_size={load_size}; re-pack or fix the config")

    def __len__(self) -> int:
        return self.arr.shape[0]

    def __getitem__(self, idx: int) -> np.ndarray:
        return np.asarray(self.arr[idx])

    def get_batch(self, idxs: list[int], n_threads: int = 0) -> np.ndarray:
        del n_threads  # mmap gather needs no workers
        return np.asarray(self.arr[np.asarray(idxs)])

    @staticmethod
    def pack(src, out_path: str) -> int:
        """Pack any index-addressable dataset into a .npy; returns count."""
        n = len(src)
        first = src[0]
        arr = np.lib.format.open_memmap(
            out_path, mode="w+", dtype=np.uint8, shape=(n,) + first.shape)
        arr[0] = first
        for i in range(1, n):
            arr[i] = src[i]
        arr.flush()
        return n


class TFRecordImageDataset:
    """Random-access reader for TFRecord shards of tf.Example records with
    JPEG/PNG bytes (SURVEY.md §2 "Input pipeline": "pre-decoded
    ArrayRecord/TFRecord" family).

    TFRecord is a sequential format; random access (which uig's
    pure-function-of-counter sampling needs) comes from a one-time offset
    scan of the framing (8-byte length + 4-byte crc + payload + 4-byte crc)
    done in pure Python — no tf.data graph, no tf dependency on the hot
    path. Record parsing uses tf.train.Example (tensorflow is an optional
    extra; only imported here).
    """

    def __init__(self, paths, load_size: int,
                 feature_key: str = "image/encoded"):
        if isinstance(paths, str):
            paths = sorted(
                [paths] if os.path.isfile(paths) else [
                    os.path.join(paths, f) for f in os.listdir(paths)
                    if f.endswith((".tfrecord", ".tfrecords"))
                ]
            )
        if not paths:
            raise FileNotFoundError("no tfrecord files found")
        self.paths = list(paths)
        self.load_size = load_size
        self.feature_key = feature_key
        # (file_index, byte_offset, payload_length) per record
        self._index: list[tuple[int, int, int]] = []
        for fi, p in enumerate(self.paths):
            size = os.path.getsize(p)
            with open(p, "rb") as f:
                off = 0
                while off + 12 <= size:
                    f.seek(off)
                    header = f.read(8)
                    if len(header) < 8:
                        break
                    n = int.from_bytes(header, "little")
                    self._index.append((fi, off + 12, n))
                    off += 12 + n + 4  # len+lencrc + payload + datacrc
        if not self._index:
            raise ValueError(f"no records in {self.paths}")

    def __len__(self) -> int:
        return len(self._index)

    def _record_bytes(self, idx: int) -> bytes:
        fi, off, n = self._index[idx]
        with open(self.paths[fi], "rb") as f:
            f.seek(off)
            return f.read(n)

    def __getitem__(self, idx: int) -> np.ndarray:
        import io

        from PIL import Image

        raw = self._record_bytes(idx)
        img_bytes = _example_feature(raw, self.feature_key)
        with Image.open(io.BytesIO(img_bytes)) as im:
            im = im.convert("RGB")
            s = self.load_size
            # BILINEAR: same resampler as FolderDataset/native loader so a
            # dataset packed from any source format trains identically.
            im = im.resize((s, s), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)


class WebDatasetImageDataset:
    """Random-access reader for WebDataset-style ``.tar`` shards of encoded
    images (the img2dataset / webdataset ecosystem's on-disk format).

    Tar is sequential; random access (uig's pure-function-of-counter
    sampling needs it) comes from a one-time stdlib ``tarfile`` member scan
    per shard recording (data offset, size) of every image member —
    no webdataset dependency, reads are a seek+read+decode. Members sort by
    (shard path, member name) so ordering is stable across hosts; decode is
    PIL + BILINEAR resize, the same resampler as every other source, so a
    dataset trains identically regardless of container format.
    """

    def __init__(self, paths, load_size: int):
        import tarfile

        if isinstance(paths, str):
            paths = sorted(
                [paths] if os.path.isfile(paths) else [
                    os.path.join(paths, f) for f in os.listdir(paths)
                    if f.endswith(".tar")
                ]
            )
        if not paths:
            raise FileNotFoundError("no .tar shards found")
        self.paths = list(paths)
        self.load_size = load_size
        # (file_index, data_offset, size, member_name) per image member
        self._index: list[tuple[int, int, int, str]] = []
        for fi, p in enumerate(self.paths):
            members = []
            with tarfile.open(p, "r") as tf:
                for m in tf:
                    if m.isfile() and m.name.lower().endswith(_IMG_EXTS):
                        members.append((fi, m.offset_data, m.size, m.name))
            members.sort(key=lambda t: t[3])
            self._index.extend(members)
        if not self._index:
            raise ValueError(f"no image members in {self.paths}")
        # stable serving stems (see item_names)
        self.files = [name for _, _, _, name in self._index]

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> np.ndarray:
        import io

        from PIL import Image

        fi, off, size, _ = self._index[idx]
        with open(self.paths[fi], "rb") as f:
            f.seek(off)
            raw = f.read(size)
        with Image.open(io.BytesIO(raw)) as im:
            im = im.convert("RGB")
            s = self.load_size
            im = im.resize((s, s), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)


def _example_feature(serialized: bytes, key: str) -> bytes:
    """First bytes value of ``key`` in a serialized tf.train.Example."""
    try:
        import tensorflow as tf  # optional

        ex = tf.train.Example.FromString(serialized)
        vals = ex.features.feature[key].bytes_list.value
        if not vals:
            raise KeyError(f"feature {key!r} missing or not bytes")
        return vals[0]
    except ImportError as e:
        raise ImportError(
            "TFRecord parsing needs tensorflow (for tf.train.Example); "
            "use data.source=packed for a dependency-free pre-decoded format"
        ) from e


class _SyntheticDomain:
    """One procedural domain; index i → deterministic uint8 image."""

    def __init__(self, kind: str, n: int, size: int, seed: int):
        self.kind = kind
        self.n = n
        self.size = size
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        # Bounds-check so the legacy sequence-iteration protocol terminates:
        # without the IndexError, ``for img in domain`` (iter() falls back to
        # __getitem__(0), (1), ... on classes with no __iter__) would spin
        # forever generating procedural images.
        if not 0 <= idx < self.n:
            raise IndexError(
                f"synthetic domain index {idx} out of range [0, {self.n})")
        # zlib.crc32, NOT hash(): python string hashing is randomized per
        # process, which would break cross-process reproducibility (resume,
        # multi-host) of the synthetic stream.
        import zlib

        kind_tag = zlib.crc32(self.kind.encode()) & 0xFFFF
        rng = np.random.default_rng((self.seed, kind_tag, idx))
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        if self.kind == "blobs":
            img = np.stack([0.2 + 0.6 * yy, 0.3 * np.ones_like(yy), 0.2 + 0.6 * xx], -1)
            for _ in range(rng.integers(2, 6)):
                cy, cx = rng.uniform(0.15, 0.85, 2)
                r = rng.uniform(0.05, 0.25)
                col = rng.uniform(0.2, 1.0, 3)
                mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
                img[mask] = col
        elif self.kind == "stripes":
            freq = rng.uniform(4, 16)
            phase = rng.uniform(0, 2 * np.pi)
            angle = rng.uniform(0, np.pi)
            t = np.cos(angle) * xx + np.sin(angle) * yy
            wave = 0.5 + 0.5 * np.sin(2 * np.pi * freq * t + phase)
            base = rng.uniform(0.1, 0.9, 3)
            img = wave[..., None] * base + (1 - wave[..., None]) * (1 - base)
        elif self.kind == "checker":
            # axis-aligned checkerboard, random cell count/offset/palette —
            # visually distinct from both stripe waves and blobs
            cells = rng.integers(3, 9)
            oy, ox = rng.uniform(0, 1, 2)
            board = ((np.floor((yy + oy) * cells) + np.floor((xx + ox) * cells))
                     % 2).astype(np.float32)
            c0 = rng.uniform(0.05, 0.45, 3)
            c1 = rng.uniform(0.55, 0.95, 3)
            img = board[..., None] * c1 + (1 - board[..., None]) * c0
        elif self.kind == "rings":
            # concentric rings around a random center
            cy, cx = rng.uniform(0.25, 0.75, 2)
            freq = rng.uniform(4, 12)
            phase = rng.uniform(0, 2 * np.pi)
            rr = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            wave = 0.5 + 0.5 * np.cos(2 * np.pi * freq * rr + phase)
            base = rng.uniform(0.1, 0.9, 3)
            img = wave[..., None] * base + (1 - wave[..., None]) * (1 - base)
        else:
            raise ValueError(self.kind)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)


class SyntheticUnpairedDataset:
    """Two unpaired procedural domains (A: blobs, B: stripes)."""

    def __init__(self, n: int = 200, load_size: int = 72, seed: int = 0):
        self.domain_a = _SyntheticDomain("blobs", n, load_size, seed)
        self.domain_b = _SyntheticDomain("stripes", n, load_size, seed + 1)

    def write_png_dirs(self, root: str) -> tuple[str, str]:
        """Materialize both domains as PNG trees (tests the folder path)."""
        from PIL import Image

        dirs = []
        for name, dom in (("trainA", self.domain_a), ("trainB", self.domain_b)):
            d = os.path.join(root, name)
            os.makedirs(d, exist_ok=True)
            for i in range(len(dom)):
                Image.fromarray(dom[i]).save(os.path.join(d, f"{i:05d}.png"))
            dirs.append(d)
        return dirs[0], dirs[1]


class SyntheticMultiDomainDataset:
    """N unpaired procedural domains for the StarGAN (multi-domain) family.

    Domains cycle through four visually distinct pattern families (blobs,
    stripes, checker, rings); beyond four, the seed offset makes further
    domains distinct streams of the same families."""

    KINDS = ("blobs", "stripes", "checker", "rings")

    def __init__(self, num_domains: int, n: int = 200, load_size: int = 72,
                 seed: int = 0):
        if num_domains < 2:
            raise ValueError(
                f"multi-domain dataset needs >= 2 domains, got {num_domains}")
        self.domains = [
            _SyntheticDomain(self.KINDS[d % len(self.KINDS)], n, load_size,
                             seed + d)
            for d in range(num_domains)
        ]

    def write_png_dirs(self, root: str) -> list[str]:
        """Materialize every domain as a PNG tree (tests the folder path)."""
        from PIL import Image

        dirs = []
        for d, dom in enumerate(self.domains):
            out = os.path.join(root, f"domain{d}")
            os.makedirs(out, exist_ok=True)
            for i in range(len(dom)):
                Image.fromarray(dom[i]).save(os.path.join(out, f"{i:05d}.png"))
            dirs.append(out)
        return dirs


def resolve_dataset(path: str, load_size: int, source: str = "auto"):
    """Open an index-addressable dataset of any supported on-disk format.

    ``source``: folders | packed | tfrecord | webdataset | auto. "auto"
    detects by path shape: a ``.npy`` file → packed; a ``.tfrecord(s)``
    file or a directory containing them → tfrecord; a ``.tar`` file or a
    directory of them → webdataset; any other directory → image folder.
    Used by the translate/eval CLIs so every trainable source is also
    servable (inference parity with the training pipeline's source
    resolution).
    """
    if source == "auto":
        if path.endswith(".npy"):
            source = "packed"
        elif path.endswith((".tfrecord", ".tfrecords")):
            source = "tfrecord"
        elif path.endswith(".tar"):
            source = "webdataset"
        elif os.path.isdir(path):
            entries = os.listdir(path)
            if any(f.endswith((".tfrecord", ".tfrecords")) for f in entries):
                source = "tfrecord"
            elif any(f.endswith(".tar") for f in entries):
                source = "webdataset"
            elif any(f.endswith(".npy") for f in entries):
                raise ValueError(
                    f"{path!r} is a directory of packed .npy shards — point "
                    "at one .npy file (source=packed), not the directory")
            else:
                source = "folders"
        elif os.path.exists(path):
            raise ValueError(
                f"dataset path {path!r} exists but has an unrecognized "
                "format (expected an image directory, a packed .npy file, "
                "or a .tfrecord file)")
        else:
            raise FileNotFoundError(
                f"dataset path {path!r} does not exist (expected an image "
                "directory, a packed .npy file, or a .tfrecord file)")
    if source == "folders":
        return FolderDataset(path, load_size)
    if source == "packed":
        return PackedDataset(path, load_size)
    if source == "tfrecord":
        return TFRecordImageDataset(path, load_size)
    if source == "webdataset":
        return WebDatasetImageDataset(path, load_size)
    raise ValueError(f"unknown dataset source {source!r}")


def item_names(ds) -> list:
    """Stable output-file stems for a dataset (file basenames when the
    source has files, zero-padded indices otherwise). Non-unique stems
    (e.g. same member name in two webdataset shards) fall back to indices
    so translate outputs never silently overwrite each other."""
    files = getattr(ds, "files", None)
    if files:
        stems = [os.path.splitext(os.path.basename(f))[0] for f in files]
        if len(set(stems)) == len(stems):
            return stems
    return [f"{i:06d}" for i in range(len(ds))]
