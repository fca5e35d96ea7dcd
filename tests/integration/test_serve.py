"""`uig serve` (uig.serve): the HTTP micro-batching server must reproduce
the live translate path byte-for-byte through its full decode → resize →
artifact → PNG-encode loop, batch concurrent requests into one dispatch,
and report sane stats."""

import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from tests.integration.test_export_serving import _train_tiny


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from uig.cli.main import main
    from uig.serve import start_server

    tmp_path = tmp_path_factory.mktemp("serve")
    run_dir = _train_tiny(tmp_path, name="serverun")
    art = tmp_path / "artifact"
    assert main(["export", "--run-dir", run_dir, "--output-dir", str(art),
                 "--batch-size", "4", "--platforms", "cpu"]) == 0
    handle = start_server(str(art), port=0, max_delay_ms=50.0)
    yield handle, run_dir
    handle.close()


def _post_png(port: int, img_u8: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/translate", body=buf.getvalue(),
                 headers={"Content-Type": "image/png"})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    assert resp.status == 200, body
    return body


def _get(port: int, path: str) -> dict:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_serve_healthz_and_single_request_matches_live(served):
    handle, run_dir = served
    code, health = _get(handle.port, "/healthz")
    assert code == 200 and health["ok"] and health["batch"] == 4

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
    body = _post_png(handle.port, raw)
    out = np.asarray(Image.open(io.BytesIO(body)))
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8

    # byte-identical to the live framework on the identical input (the
    # PNG roundtrip and server-side resize are both lossless here: the
    # posted image already has the artifact's load size)
    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    cfg, trainer, state = load_run(run_dir)
    x = center_crop_normalize(jnp.asarray(raw[None]), cfg.model.image_size)
    live = np.asarray(denormalize_to_u8(
        trainer.translate(state.ema, x, "a2b")))[0]
    np.testing.assert_array_equal(out, live)


def test_serve_micro_batches_concurrent_requests(served):
    handle, _ = served
    _, before = _get(handle.port, "/stats")

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
            for _ in range(4)]
    outs = [None] * 4

    def post(i):
        outs[i] = _post_png(handle.port, imgs[i])

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(o is not None for o in outs)
    # each image translated independently of its batchmates: posting one
    # of them alone must give the identical PNG
    solo = _post_png(handle.port, imgs[2])
    assert solo == outs[2]

    _, after = _get(handle.port, "/stats")
    reqs = after["requests"] - before["requests"]
    batches = after["batches"] - before["batches"]
    assert reqs == 5
    # the 4 concurrent posts must have shared dispatches (< 1 batch each,
    # with the 50 ms window); the solo post adds one more
    assert batches < 5
    assert after["latency_p50_ms"] > 0
    assert after["mean_occupancy"] >= 1.0


def test_serve_rejects_garbage_and_unknown_routes(served):
    handle, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", handle.port, timeout=10)
    conn.request("POST", "/translate", body=b"not an image")
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "error" in body

    code, body = _get(handle.port, "/nope")
    assert code == 404
