"""Compiled-mode Pallas kernel parity on the real TPU chip (SURVEY.md §4
"Kernel tests": interpreter mode in CI, compiled parity on hardware).

Run: PYTHONPATH=src python scripts/tpu_kernel_parity.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def check_augment():
    from uig.kernels.augment import augment_batch
    from uig.kernels.augment_pallas import augment_batch_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (8, 286, 286, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    for dt, tol in ((jnp.float32, 3e-7), (jnp.bfloat16, 2**-8)):
        ref = np.asarray(augment_batch(x, key, 256, out_dtype=dt), np.float32)
        got = np.asarray(
            jax.jit(lambda x, k: augment_batch_pallas(x, k, 256, out_dtype=dt))(
                x, key
            ),
            np.float32,
        )
        err = np.abs(ref - got).max()
        status = "OK" if err <= tol else "FAIL"
        print(f"augment parity [{np.dtype(dt).name}]: max|diff|={err:.2e} "
              f"(tol {tol:.1e}) {status}")
        if err > tol:
            return False

    # micro-bench: pallas vs xla wall time
    f_xla = jax.jit(lambda x, k: augment_batch(x, k, 256, out_dtype=jnp.bfloat16))
    f_pal = jax.jit(
        lambda x, k: augment_batch_pallas(x, k, 256, out_dtype=jnp.bfloat16))
    for name, f in (("xla", f_xla), ("pallas", f_pal)):
        jax.device_get(f(x, key))
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(x, key)
        jax.device_get(y)
        dt_ms = (time.perf_counter() - t0) / 50 * 1000
        print(f"augment {name}: {dt_ms:.3f} ms/batch(8x286²)")
    return True


def check_attention():
    try:
        from uig.kernels.attention_pallas import attention_pallas, attention_xla
    except ImportError:
        print("attention kernel not present yet — skipped")
        return True
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 1024, 512)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 1024, 512)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 1024, 512)), jnp.float32)
    ref = np.asarray(attention_xla(q, k, v))
    got = np.asarray(jax.jit(attention_pallas)(q, k, v))
    err = np.abs(ref - got).max()
    # fp32 softmax over N=1024 in different reduction orders: ~1e-5 scale
    tol = 1e-4
    print(f"attention parity: max|diff|={err:.2e} {'OK' if err < tol else 'FAIL'}")
    if err >= tol:
        return False

    # compiled flash backward (dq/dk/dv Pallas kernels) vs the XLA VJP —
    # n=1024 > block_q=256 exercises the cross-q-block dk/dv accumulation
    def loss_p(q, k, v):
        return jnp.sum(jnp.square(attention_pallas(q, k, v)))

    def loss_x(q, k, v):
        return jnp.sum(jnp.square(attention_xla(q, k, v)))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
    ok = True
    # tolerance note: on-chip f32 matmuls run at the MXU's default
    # (bf16-grade) precision in BOTH the Pallas kernel and the XLA VJP,
    # and the two use different contraction orders — interpret-mode CPU
    # tests pin the math at 2e-4; compiled parity allows bf16-scale
    # relative error.
    for a, b, name in zip(gp, gx, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        gerr = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        print(f"attention d{name} parity: rel max|diff|={gerr:.2e} "
              f"{'OK' if gerr < 5e-3 else 'FAIL'}")
        ok &= bool(gerr < 5e-3)
    return ok


if __name__ == "__main__":
    ok = check_augment() and check_attention()
    print("ALL OK" if ok else "PARITY FAILURES")
    sys.exit(0 if ok else 1)
