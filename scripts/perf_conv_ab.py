"""On-chip A/B: Pallas vs XLA for the movement-bound generator convs.

Measures (scan-timed, one dispatch) the stem/head/downsample convs, the
full-res instance norm, whole-G forward, G fwd+bwd, and the full CycleGAN
train step under model.conv_impl = xla | pallas.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_conv_ab.py [sections...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

B, S = 16, 256
ITERS = 100


def scan_time(fn, x, *args, iters=ITERS):
    @jax.jit
    def many(x, *a):
        def body(c, _):
            return fn(c, *a), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    jax.device_get(many(x, *args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(x, *args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def section_kernels():
    from uig.kernels.conv_pallas import conv3s2_s2d, conv7_s2d
    from uig.kernels.norm_pallas import instance_norm_pallas

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x64 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 64)), dt)
    x3 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt)

    def ref7(x, w, b, mode="reflect"):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                     mode=("reflect" if mode == "reflect" else "constant"))
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    # head 64->3
    w = jnp.asarray(rng.standard_normal((7, 7, 64, 3)) * 0.05, dt)
    bb = jnp.zeros((3,), dt)
    got = jax.jit(lambda x: conv7_s2d(x, w, bb))(x64)
    ref = jax.jit(lambda x: ref7(x, w, bb))(x64)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"head parity max|diff|={err:.4f} "
          f"(scale {float(jnp.max(jnp.abs(ref.astype(jnp.float32)))):.2f})")
    tp = scan_time(lambda x: x + jnp.mean(
        conv7_s2d(x, w, bb)).astype(dt), x64)
    tx = scan_time(lambda x: x + jnp.mean(ref7(x, w, bb)).astype(dt), x64)
    print(f"head  fwd: pallas {tp*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  "
          f"speedup {tx/tp:.2f}x")

    def bwd_of(f):
        def g(x):
            return jax.grad(lambda xx: jnp.sum(
                f(xx).astype(jnp.float32)))(x).astype(dt)
        return g

    tp = scan_time(bwd_of(lambda x: conv7_s2d(x, w, bb)), x64, iters=40)
    tx = scan_time(bwd_of(lambda x: ref7(x, w, bb)), x64, iters=40)
    print(f"head fwd+bwd(dx): pallas {tp*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  "
          f"speedup {tx/tp:.2f}x")

    # stem 3->64
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, dt)
    bb = jnp.zeros((64,), dt)
    tp = scan_time(lambda x: x + jnp.mean(conv7_s2d(x, w, bb)).astype(dt), x3)
    tx = scan_time(lambda x: x + jnp.mean(ref7(x, w, bb)).astype(dt), x3)
    print(f"stem  fwd: pallas {tp*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  "
          f"speedup {tx/tp:.2f}x")

    # down 64->128 s2
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05, dt)
    bb = jnp.zeros((128,), dt)

    def refd(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb

    tp = scan_time(lambda x: x + jnp.mean(conv3s2_s2d(x, w, bb)).astype(dt), x64)
    tx = scan_time(lambda x: x + jnp.mean(refd(x)).astype(dt), x64)
    print(f"down  fwd: pallas {tp*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  "
          f"speedup {tx/tp:.2f}x")

    # instance norm 256^2 x 64
    g = jnp.ones((64,), jnp.float32)
    be = jnp.zeros((64,), jnp.float32)

    def in_ref(x):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=(1, 2), keepdims=True)
        ms = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(ms - jnp.square(m), 0.0)
        return ((x32 - m) * jax.lax.rsqrt(var + 1e-5) * g + be).astype(dt)

    tp = scan_time(lambda x: instance_norm_pallas(x, g, be), x64)
    tx = scan_time(in_ref, x64)
    print(f"IN    fwd: pallas {tp*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  "
          f"speedup {tx/tp:.2f}x")


def section_gen():
    from uig.models import ResNetGenerator

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x3 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt)
    gens = {i: ResNetGenerator(n_res_blocks=9, conv_impl=i, dtype=dt)
            for i in ("xla", "pallas")}
    params = gens["xla"].init(jax.random.PRNGKey(0),
                              jnp.zeros((1, S, S, 3), jnp.float32))
    for impl in ("pallas", "xla"):
        t = scan_time(lambda x, p: gens[impl].apply(p, x).astype(dt),
                      x3, params, iters=50)
        print(f"G fwd   ({impl:6s}): {t*1e3:8.3f} ms")
    for impl in ("pallas", "xla"):
        def fb(x, p, impl=impl):
            return jax.grad(lambda xx: jnp.sum(gens[impl].apply(
                p, xx).astype(jnp.float32)))(x).astype(dt)
        t = scan_time(fb, x3, params, iters=30)
        print(f"G fwd+bwd({impl:6s}): {t*1e3:8.3f} ms")


def section_step():
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    rng = np.random.default_rng(0)
    for impl in ("pallas", "xla"):
        cfg = apply_overrides(get_preset("cyclegan256_dp"), [
            "data.batch_size=16", "data.augment=xla", "loss.lambda_lpips=0",
            f"model.conv_impl={impl}",
        ])
        mesh = make_mesh()
        tr = CycleGANTrainer(cfg, mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        L = cfg.data.load_size
        a = rng.integers(0, 255, (16, L, L, 3), dtype=np.uint8)
        b = rng.integers(0, 255, (16, L, L, 3), dtype=np.uint8)
        dev = shard_batch(mesh, (a, b))
        state, m = tr.train_step(state, dev)
        jax.device_get(m)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                state, m = tr.train_step(state, dev)
            jax.device_get(m)
            best = min(best, (time.perf_counter() - t0) / 15)
        print(f"train step ({impl:6s}): {best*1e3:8.1f} ms/step "
              f"({16/best:.1f} img/s/chip)", flush=True)


if __name__ == "__main__":
    want = set(sys.argv[1:]) or {"kernels", "gen", "step"}
    if "kernels" in want:
        section_kernels()
    if "gen" in want:
        section_gen()
    if "step" in want:
        section_step()
