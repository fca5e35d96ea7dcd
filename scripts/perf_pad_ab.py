"""Scan-timed fwd / fwd+bwd split for the reflect-conv lowerings
(fused border-corrected vs explicit pad vs zeros) — locates where the
residual step-time gap vs padding=zeros lives (forward strips/DUS, or the
autodiff backward's full-plane cotangent masks).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_pad_ab.py
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
ITERS = 50


def scan_time(fn, x, iters=ITERS):
    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            # keep shapes closed: re-center so the carry matches x
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    jax.device_get(many(x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from uig.models.resnet_gen import ResNetGenerator

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt)

    variants = {
        "fused": dict(pad_mode="reflect", pad_impl="fused"),
        "explicit": dict(pad_mode="reflect", pad_impl="explicit"),
        "zeros": dict(pad_mode="zeros", pad_impl="fused"),
    }
    for name, kw in variants.items():
        gen = ResNetGenerator(n_res_blocks=9, dtype=dt, **kw)
        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, S, S, 3), dt))

        def fwd(xc):
            return gen.apply(params, xc)

        def fwdbwd(xc):
            def loss(v):
                return jnp.mean(jnp.square(gen.apply(params, v)))

            return xc - jax.grad(loss)(xc)

        t_f = scan_time(fwd, x)
        t_fb = scan_time(fwdbwd, x)
        print(f"{name:<9s} G fwd {t_f*1e3:6.2f} ms   fwd+bwd(dx) "
              f"{t_fb*1e3:6.2f} ms   bwd-only {(t_fb-t_f)*1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
