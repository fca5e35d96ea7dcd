"""Production serving runner: an HTTP micro-batching server over an
exported translate artifact (`uig export` → `uig serve`).

SURVEY.md §3 call stack 3 covers batch inference through the live
framework and `serving.py` freezes that path into a standalone StableHLO
artifact; this module is the deployment story on top — a dependency-free
(stdlib http.server + PIL decode) server that:

  * loads the artifact once (`serving.load_exported`), so serving needs no
    uig model/checkpoint code on the hot path — just the compiled function;
  * **micro-batches** concurrent requests into the artifact's static batch
    shape: the dispatcher collects up to B images, waiting at most
    ``max_delay_ms`` after the first arrival, pads the tail (the artifact's
    repeat-last-row policy) and trims on the way out — the standard
    accelerator-serving pattern (the XLA program has ONE compiled shape;
    dynamic batching happens host-side);
  * reproduces the live CLI preprocessing exactly: PIL RGB decode →
    bilinear resize to the artifact's load size (`cli/translate.py`); the
    center-crop + normalize + denormalize stages are already baked INSIDE
    the artifact, so server outputs are byte-identical to `uig translate`;
  * reports production metrics at /stats: request count, batch count, mean
    batch occupancy, p50/p95 end-to-end latency, images/sec since start.

Endpoints:
  POST /translate   image bytes (PNG/JPEG/anything PIL decodes) → PNG bytes
  GET  /healthz     {"ok": true, "kind": ..., "batch": B}
  GET  /stats       serving metrics JSON

Run: ``uig serve --artifact DIR [--port 8000] [--max-delay-ms 5]``.
The server binds, prints one JSON line {"serving": ..., "port": N} to
stdout, and blocks until SIGINT/SIGTERM.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pending:
    """One enqueued request: the preprocessed image and a completion event."""

    __slots__ = ("img", "event", "out", "err", "t_in")

    def __init__(self, img: np.ndarray):
        self.img = img
        self.event = threading.Event()
        self.out = None
        self.err = None
        self.t_in = time.perf_counter()


class BatchingTranslator:
    """Micro-batching front end over a loaded serving artifact.

    ``submit(img_u8[L,L,3]) -> img_u8[crop,crop,3]`` blocks the calling
    thread until its batch retires. A single dispatcher thread owns the
    artifact call: it drains the queue up to the static batch B, waiting at
    most ``max_delay_ms`` after the first item so a lone request is never
    stalled behind a full-batch timeout."""

    def __init__(self, translator, max_delay_ms: float = 5.0,
                 stats_window: int = 1024):
        self._translator = translator
        self.batch = translator.batch
        self.max_delay = max_delay_ms / 1000.0
        self._q: queue.Queue[_Pending] = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._latencies: deque[float] = deque(maxlen=stats_window)
        self._n_requests = 0
        self._n_images = 0
        self._n_batches = 0
        self._occupancy = 0
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="uig-serve-dispatcher")
        self._thread.start()

    # -- client side -----------------------------------------------------
    def submit(self, img: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        expect = tuple(self._translator.meta["input"][1:])
        if img.shape != expect or img.dtype != np.uint8:
            raise ValueError(
                f"expected uint8 image of shape {expect}, got "
                f"{img.dtype} {img.shape}")
        p = _Pending(img)
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("translate batch did not retire in time")
        if p.err is not None:
            raise p.err
        return p.out

    # -- dispatcher ------------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:  # shutdown sentinel
                return
            items = [first]
            deadline = time.perf_counter() + self.max_delay
            while len(items) < self.batch:
                rem = deadline - time.perf_counter()
                if rem <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=rem)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(items)
                    return
                items.append(nxt)
            self._flush(items)

    def _flush(self, items):
        try:
            raw = np.stack([p.img for p in items])
            out = self._translator(raw)  # pads+trims internally
            now = time.perf_counter()
            with self._lock:
                self._n_batches += 1
                self._occupancy += len(items)
                self._n_requests += len(items)
                self._n_images += len(items)
                for p in items:
                    self._latencies.append(now - p.t_in)
            for i, p in enumerate(items):
                p.out = out[i]
                p.event.set()
        except Exception as e:  # surface the failure to every waiter
            for p in items:
                p.err = e
                p.event.set()

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            elapsed = time.perf_counter() - self._t0
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "static_batch": self.batch,
                "mean_occupancy": (self._occupancy / self._n_batches
                                   if self._n_batches else 0.0),
                "latency_p50_ms": (1e3 * lat[len(lat) // 2] if lat else None),
                "latency_p95_ms": (1e3 * lat[int(len(lat) * 0.95)]
                                   if lat else None),
                "images_per_sec": self._n_images / elapsed if elapsed else 0.0,
                "uptime_sec": elapsed,
            }

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)


def _make_handler(batcher: BatchingTranslator, meta: dict, load_size: int):
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        # quiet: production logs go through /stats, not stderr per-request
        def log_message(self, fmt, *args):
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "kind": meta.get("kind"),
                                 "batch": batcher.batch})
            elif self.path == "/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/translate":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                img = Image.open(io.BytesIO(raw)).convert("RGB")
                img = img.resize((load_size, load_size), Image.BILINEAR)
                out = batcher.submit(np.asarray(img, np.uint8))
                buf = io.BytesIO()
                Image.fromarray(out).save(buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class ServeHandle:
    """A running server (tests / embedding): .port, .url, .close()."""

    def __init__(self, httpd: ThreadingHTTPServer,
                 batcher: BatchingTranslator):
        self._httpd = httpd
        self._batcher = batcher
        self.port = httpd.server_address[1]
        self.url = f"http://{httpd.server_address[0]}:{self.port}"
        self._thread = threading.Thread(target=httpd.serve_forever,
                                        daemon=True, name="uig-serve-http")
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
        self._batcher.close()


def start_server(artifact_dir: str, host: str = "127.0.0.1", port: int = 0,
                 max_delay_ms: float = 5.0) -> ServeHandle:
    """Load an exported artifact and serve it. ``port=0`` picks a free one
    (reported on the returned handle). Returns immediately; the server runs
    on daemon threads until ``handle.close()``."""
    from uig.serving import load_exported

    translator = load_exported(artifact_dir)
    # one warmup call so the first real request doesn't pay dispatch setup
    load = translator.meta["input"][1]
    translator(np.zeros((1, load, load, 3), np.uint8))
    batcher = BatchingTranslator(translator, max_delay_ms=max_delay_ms)
    handler = _make_handler(batcher, translator.meta, load)
    httpd = ThreadingHTTPServer((host, port), handler)
    return ServeHandle(httpd, batcher)


def run_serve(artifact_dir: str, host: str = "127.0.0.1", port: int = 8000,
              max_delay_ms: float = 5.0) -> int:
    """CLI entry: serve until SIGINT/SIGTERM."""
    import signal

    handle = start_server(artifact_dir, host, port, max_delay_ms)
    print(json.dumps({"serving": artifact_dir, "host": host,
                      "port": handle.port, "max_delay_ms": max_delay_ms}),
          flush=True)
    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    try:
        stop.wait()
    finally:
        handle.close()
    return 0
