"""Unpaired two-domain input pipeline — L2 (SURVEY.md §2 "Input pipeline",
§3 stack 1).

Host side: per-host sharded index streams, per-epoch shuffles driven by
(seed, epoch), worker threads decode/resize to ``load_size`` uint8, and a
bounded prefetch queue of already-device-put batches keeps the TPU fed (the
BASELINE.json "input-pipeline stall %" metric measures exactly this queue
running dry).

Device side: batches are uint8 (B, load, load, C) placed with leading-axis
sharding over the ``data`` mesh axis; random crop/flip/normalize happen
*inside* the jitted train step (uig.kernels.augment), so the host never
touches float pixels.

Determinism/checkpointing design: the batch stream is a PURE FUNCTION of
(seed, batch_counter) — batch ``t``'s indices are computed from the global
stream position ``t·B`` through per-epoch permutations, with no mutable
sampler state. The iterator checkpoint is therefore a single integer (the
count of *consumed* batches), and prefetch depth cannot desynchronize resume
(exercised by tests/integration/test_resume.py).
"""

from __future__ import annotations

import queue
import threading
import time as _time

import numpy as np


class _DomainStream:
    """Pure-function index stream: position -> dataset index."""

    def __init__(self, n: int, seed: int, host_index: int, host_count: int):
        self.n = n
        self.seed = seed
        self.host_index = host_index
        self.host_count = host_count
        # per-host epoch length (hosts stride the global permutation)
        self.epoch_len = len(range(host_index, n, host_count))
        if self.epoch_len == 0:
            raise ValueError(
                f"domain has {n} image(s), which leaves host {host_index} of "
                f"{host_count} with an empty per-host shard; every domain "
                f"needs at least one image per host (>= {host_count} total)"
            )
        self._perm_cache: dict[int, np.ndarray] = {}

    def _perm(self, epoch: int) -> np.ndarray:
        # Lock-free and safe under concurrent producer threads: read via a
        # LOCAL snapshot of the dict, and publish updates by swapping in a
        # NEW dict (never mutate the shared one in place).  Adjacent epochs
        # are kept so producers straddling an epoch boundary (common on
        # small datasets) don't thrash-recompute the permutation.
        cache = self._perm_cache
        perm = cache.get(epoch)
        if perm is None:
            rng = np.random.default_rng((self.seed, epoch))
            perm = rng.permutation(self.n)[self.host_index :: self.host_count]
            new = {k: v for k, v in cache.items() if abs(k - epoch) <= 1}
            new[epoch] = perm
            self._perm_cache = new  # atomic swap
        return perm

    def indices_at(self, start: int, k: int) -> list[int]:
        out = []
        for g in range(start, start + k):
            epoch, pos = divmod(g, self.epoch_len)
            out.append(int(self._perm(epoch)[pos]))
        return out


class UnpairedPipeline:
    """Infinite iterator of (batch_a, batch_b) uint8 device arrays."""

    def __init__(
        self,
        dataset_a,
        dataset_b,
        batch_size_local: int,
        mesh=None,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        host_index: int = 0,
        host_count: int = 1,
        producer_threads: int = 1,
    ):
        self.a = dataset_a
        self.b = dataset_b
        # generic N-domain form (MultiDomainPipeline reuses everything via
        # these lists; the two-domain API keeps .a/.b and stream seeds)
        self.datasets = [dataset_a, dataset_b]
        self.streams = [
            _DomainStream(len(dataset_a), seed, host_index, host_count),
            _DomainStream(len(dataset_b), seed + 0x9E3779B9,
                          host_index, host_count),
        ]
        self.batch = batch_size_local
        self.mesh = mesh
        self.stream_a, self.stream_b = self.streams
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        # >1 producers overlap decode + host->device transfers (the
        # device_put releases the GIL during the copy/tunnel transfer);
        # batch t is claimed atomically from the shared counter, and the
        # consumer reorders via _reorder so delivery order is unchanged
        self.producer_threads = max(1, producer_threads)
        self._t_next = 0  # next batch counter a producer will claim
        self._t_lock = threading.Lock()
        self._t_consumed = 0  # batches handed to the trainer
        self._q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        self._reorder: dict[int, object] = {}
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._error: Exception | None = None
        # decode pool created eagerly (threads spawn lazily on first submit)
        # so concurrent producer threads never race a lazy `if None` check
        self._pool = None
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(self.num_workers)
        self._sharding = None
        if mesh is not None:
            from uig.runtime.mesh import batch_sharding

            self._sharding = batch_sharding(mesh)

    # ---------------- host production ----------------
    def _load_domain(self, ds, stream: _DomainStream, start: int,
                     k: int) -> np.ndarray:
        """Decode k images of one domain starting at stream position start."""
        idx = stream.indices_at(start, k)
        # datasets with a batch decode (native C++ pool, GIL-free) get the
        # whole index list; otherwise fan out over python worker threads
        if hasattr(ds, "get_batch"):
            return ds.get_batch(idx, self.num_workers)
        if self.num_workers > 1 and k > 1:
            return np.stack(list(self._pool.map(ds.__getitem__, idx)))
        return np.stack([ds[i] for i in idx])

    def _load_batch(self, t: int) -> tuple[np.ndarray, np.ndarray]:
        return tuple(
            self._load_domain(ds, st, t * self.batch, self.batch)
            for ds, st in zip(self.datasets, self.streams)
        )

    def _put_device(self, batch):
        if self.mesh is None:
            return batch
        import jax

        one = not isinstance(batch, tuple)
        if one:
            batch = (batch,)
        if jax.process_count() > 1:
            from uig.runtime.mesh import shard_batch

            batch = shard_batch(self.mesh, batch)
        else:
            batch = tuple(jax.device_put(x, self._sharding) for x in batch)
        return batch[0] if one else batch

    def _producer(self) -> None:
        try:
            while not self._stop.is_set():
                with self._t_lock:  # claim the next batch counter
                    t = self._t_next
                    # Bound claiming so the documented prefetch contract
                    # (at most prefetch + in-flight device-put batches)
                    # holds even while the consumer drains the queue into
                    # _reorder waiting on a straggler ticket.  Reading a
                    # stale _t_consumed only delays a claim — safe.
                    claim = t < self._t_consumed + self.prefetch + self.producer_threads
                    if claim:
                        self._t_next = t + 1
                if not claim:
                    _time.sleep(0.002)
                    continue
                dev = self._put_device(self._load_batch(t))
                while not self._stop.is_set():
                    try:
                        self._q.put((t, dev), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surface decode/device errors to the consumer
            self._error = e
            try:
                self._q.put((-1, None), timeout=1.0)  # wake a blocked get()
            except queue.Full:
                pass

    def start(self) -> "UnpairedPipeline":
        if not self._threads:
            self._stop.clear()
            self._threads = [
                threading.Thread(target=self._producer, daemon=True)
                for _ in range(self.producer_threads)
            ]
            for th in self._threads:
                th.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._threads:
            # drain so producers blocked on a full queue can observe _stop
            deadline = 10.0
            for th in self._threads:
                t0 = _time.monotonic()
                while th.is_alive():
                    try:
                        while True:
                            self._q.get_nowait()
                    except queue.Empty:
                        pass
                    th.join(timeout=0.1)
                    if _time.monotonic() - t0 > deadline:
                        break
            self._threads = []
        self._reorder.clear()

    def __iter__(self):
        return self

    def __next__(self):
        if not self._threads:
            pair = self._put_device(self._load_batch(self._t_consumed))
            self._t_consumed += 1
            return pair
        while True:
            if self._error is not None:
                raise RuntimeError("input pipeline producer died") from self._error
            if self._t_consumed in self._reorder:
                dev = self._reorder.pop(self._t_consumed)
                self._t_consumed += 1
                return dev
            t, dev = self._q.get()
            if self._error is not None or dev is None:
                raise RuntimeError("input pipeline producer died") from self._error
            if t >= self._t_consumed:  # stash; stale prefetches are dropped
                self._reorder[t] = dev

    # ---------------- checkpointing ----------------
    def state_dict(self) -> dict:
        return {"t_consumed": self._t_consumed}

    def load_state_dict(self, s: dict) -> None:
        running = bool(self._threads)
        if running:
            self.stop()
        self._t_consumed = int(s["t_consumed"])
        self._t_next = self._t_consumed
        self._reorder.clear()
        if running:
            self.start()


class MultiDomainPipeline(UnpairedPipeline):
    """N-domain pipeline for the StarGAN family: yields ONE uint8
    (B, load, load, C) array per step whose examples cycle through the
    domains — position i holds a domain-(i % N) image.

    Because the layout repeats every N examples, domain labels never travel
    over the tunnel: as long as the per-DEVICE batch is a multiple of N
    (the trainer validates this), every device shard sees the same static
    label pattern tile([0..N-1]) and reconstructs it in-graph.

    Inherits the producer thread, bounded device-put prefetch queue, and the
    one-integer iterator checkpoint from UnpairedPipeline (the batch stream
    stays a pure function of (seed, batch_counter)).

    ``streams_per_step`` > 1 yields a TUPLE of that many INDEPENDENTLY
    sampled interleaved arrays per step (all advancing the same pure index
    stream, so the one-integer checkpoint still holds) — StarGAN v2 needs
    (x, x_ref, x_ref2) with matching label layouts, which the shared
    round-robin interleave provides by construction."""

    def __init__(self, datasets, batch_size_local: int, mesh=None,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 host_index: int = 0, host_count: int = 1,
                 streams_per_step: int = 1, producer_threads: int = 1):
        if len(datasets) < 2:
            raise ValueError(
                f"multi-domain pipeline needs >= 2 domains, got {len(datasets)}")
        if batch_size_local % len(datasets):
            raise ValueError(
                f"per-host batch {batch_size_local} must be a multiple of "
                f"the domain count {len(datasets)} (the batch interleaves "
                "domains round-robin)")
        super().__init__(datasets[0], datasets[1], batch_size_local,
                         mesh=mesh, seed=seed, num_workers=num_workers,
                         prefetch=prefetch, host_index=host_index,
                         host_count=host_count,
                         producer_threads=producer_threads)
        # rebuild the stream list for N domains with decorrelated seeds
        self.datasets = list(datasets)
        self.streams = [
            _DomainStream(len(ds), seed + d * 0x9E3779B9,
                          host_index, host_count)
            for d, ds in enumerate(datasets)
        ]
        if streams_per_step < 1:
            raise ValueError(
                f"streams_per_step must be >= 1, got {streams_per_step}")
        self.streams_per_step = streams_per_step

    def _interleave(self, t: int) -> np.ndarray:
        n = len(self.datasets)
        k = self.batch // n
        per = [self._load_domain(ds, st, t * k, k)
               for ds, st in zip(self.datasets, self.streams)]
        # interleave: out[i] = domain (i % n), sample (i // n)
        out = np.empty((self.batch,) + per[0].shape[1:], per[0].dtype)
        for d, arr in enumerate(per):
            out[d::n] = arr
        return out

    def _load_batch(self, t: int):
        s = self.streams_per_step
        if s == 1:
            return self._interleave(t)
        # stream j of batch t reads index positions (t*s + j)·k — still a
        # pure function of the single batch counter
        return tuple(self._interleave(t * s + j) for j in range(s))


def make_input_pipeline(cfg, mesh=None, start: bool = True) -> UnpairedPipeline:
    """Build the pipeline from a Config (SURVEY.md §3 stack 1 entry).

    model.kind="stargan"/"starganv2" gets the N-domain interleaved pipeline
    (MultiDomainPipeline; v2 with streams_per_step=3 — x, x_ref, x_ref2);
    every other trainer gets the two-domain one."""
    import jax

    from uig.data.datasets import FolderDataset, SyntheticUnpairedDataset

    d = cfg.data
    if getattr(cfg.model, "kind", "") in ("stargan", "starganv2"):
        return _make_multidomain(cfg, mesh, start)
    if d.source == "synthetic":
        syn = SyntheticUnpairedDataset(d.synthetic_len, d.load_size, d.shuffle_seed)
        ds_a, ds_b = syn.domain_a, syn.domain_b
    elif d.source == "folders":
        ds_a = FolderDataset(d.dir_a, d.load_size)
        ds_b = FolderDataset(d.dir_b, d.load_size)
    elif d.source == "packed":
        from uig.data.datasets import PackedDataset

        ds_a = PackedDataset(d.dir_a, d.load_size)
        ds_b = PackedDataset(d.dir_b, d.load_size)
    elif d.source == "tfrecord":
        from uig.data.datasets import TFRecordImageDataset

        ds_a = TFRecordImageDataset(d.dir_a, d.load_size)
        ds_b = TFRecordImageDataset(d.dir_b, d.load_size)
    elif d.source == "webdataset":
        from uig.data.datasets import WebDatasetImageDataset

        ds_a = WebDatasetImageDataset(d.dir_a, d.load_size)
        ds_b = WebDatasetImageDataset(d.dir_b, d.load_size)
    else:
        raise ValueError(f"unknown data source {d.source!r}")

    host_count = jax.process_count()
    local_batch = d.batch_size // host_count
    if local_batch * host_count != d.batch_size:
        raise ValueError(
            f"global batch {d.batch_size} not divisible by {host_count} hosts"
        )
    pipe = UnpairedPipeline(
        ds_a,
        ds_b,
        local_batch,
        mesh=mesh,
        seed=d.shuffle_seed,
        num_workers=d.num_workers,
        prefetch=d.prefetch,
        host_index=jax.process_index(),
        host_count=host_count,
        producer_threads=d.producer_threads,
    )
    return pipe.start() if start else pipe


def _make_multidomain(cfg, mesh, start: bool) -> MultiDomainPipeline:
    import jax

    from uig.data.datasets import SyntheticMultiDomainDataset, resolve_dataset

    d = cfg.data
    n_dom = cfg.model.num_domains
    if d.source == "synthetic":
        datasets = SyntheticMultiDomainDataset(
            n_dom, d.synthetic_len, d.load_size, d.shuffle_seed).domains
    else:
        if len(d.domain_dirs) != n_dom:
            raise ValueError(
                f"model.num_domains={n_dom} but data.domain_dirs has "
                f"{len(d.domain_dirs)} entries — one path per domain is "
                "required for non-synthetic multi-domain training")
        datasets = [resolve_dataset(p, d.load_size, source=d.source
                                    if d.source != "folders" else "auto")
                    for p in d.domain_dirs]

    host_count = jax.process_count()
    local_batch = d.batch_size // host_count
    if local_batch * host_count != d.batch_size:
        raise ValueError(
            f"global batch {d.batch_size} not divisible by {host_count} hosts")
    pipe = MultiDomainPipeline(
        datasets,
        local_batch,
        mesh=mesh,
        seed=d.shuffle_seed,
        num_workers=d.num_workers,
        prefetch=d.prefetch,
        host_index=jax.process_index(),
        host_count=host_count,
        streams_per_step=3 if cfg.model.kind == "starganv2" else 1,
        producer_threads=d.producer_threads,
    )
    return pipe.start() if start else pipe
