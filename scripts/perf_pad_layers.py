"""Per-layer A/B for the reflect lowerings, INCLUDING d/dw (the train step
differentiates wrt params, which the G-only d/dx harness missed).

Sections: trunk resblock conv (64²×256, k=3), stem (256², 3→64, k=7),
head (256², 64→3, k=7). Each timed fwd and fwd+bwd(dx+dw), scan-timed.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_pad_layers.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

from uig.models.layers import pad2d, reflect_conv2d

B = 16
ITERS = 50


def scan_time(fn, x, w, iters=ITERS):
    @jax.jit
    def many(x, w):
        def body(carry, _):
            c, acc = carry
            # acc-dependence keeps the conv loop-variant (no hoisting)
            y = fn(c * (1.0 + 1e-20 * acc).astype(c.dtype), w)
            return (c, acc + jnp.sum(y.astype(jnp.float32))), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None,
                                   length=iters)
        return acc

    jax.device_get(many(x, w))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(x, w))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def scan_time_grad(fn, x, w, iters=ITERS):
    def loss(xc, wc):
        return jnp.mean(jnp.square(fn(xc, wc)))

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def many(x, w):
        def body(c, _):
            dx, dw = g(c, w)
            return c - 1e-6 * dx.astype(c.dtype), dw

        y, dws = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(
            dws.astype(jnp.float32))

    jax.device_get(many(x, w))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(x, w))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def variants(k):
    p = k // 2
    dn = ("NHWC", "HWIO", "NHWC")

    def fused(x, w):
        return reflect_conv2d(x, w)

    def explicit(x, w):
        return jax.lax.conv_general_dilated(
            pad2d(x, p, "reflect"), w, (1, 1), "VALID", dimension_numbers=dn)

    def zeros(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)), dimension_numbers=dn)

    return {"fused": fused, "explicit": explicit, "zeros": zeros}


def run(name, shape, cout, k):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.uniform(-1, 1, (B,) + shape), dt)
    w = jnp.asarray(rng.standard_normal((k, k, shape[-1], cout)) * 0.05, dt)
    for vn, fn in variants(k).items():
        tf = scan_time(fn, x, w)
        tg = scan_time_grad(fn, x, w)
        print(f"{name:<22s} {vn:<9s} fwd {tf*1e3:6.2f} ms   "
              f"fwd+dx+dw {tg*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    run("trunk 64x64x256 k3", (64, 64, 256), 256, 3)
    run("stem 256x256x3 k7", (256, 256, 3), 64, 7)
    run("head 256x256x64 k7", (256, 256, 64), 3, 7)
