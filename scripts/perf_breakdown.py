"""Component-level timing breakdown for the 256² CycleGAN step: isolates
generator fwd / fwd+bwd, discriminator, augmentation, and ablates
instance-norm and upsample variants to locate the roofline gap.

Run: PYTHONPATH=src python scripts/perf_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def report(name, fn, *args):
    f = jax.jit(fn)
    dt = timeit(f, *args)
    fl = flops_of(fn, *args)
    frac = (fl / PEAK) / dt if fl else 0.0
    print(f"{name:<42s} {dt*1000:8.2f} ms  {fl/1e12:7.2f} TF  roofline {frac:.3f}",
          flush=True)
    return dt


def main():
    from uig.models import PatchDiscriminator, ResNetGenerator

    B = 8
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, 256, 256, 3)), jnp.bfloat16)

    for norm in ("instance", "none"):
        for up in ("conv_transpose", "resize_conv"):
            g = ResNetGenerator(n_res_blocks=9, dtype=jnp.bfloat16, norm=norm,
                                upsample=up)
            params = g.init(jax.random.PRNGKey(0), x[:1])
            tag = f"G fwd [{norm},{up}]"
            report(tag, lambda p, xx: g.apply(p, xx), params, x)

            def loss(p, xx):
                return jnp.mean(jnp.square(g.apply(p, xx).astype(jnp.float32)))

            report(f"G fwd+bwd [{norm},{up}]",
                   lambda p, xx: jax.grad(loss)(p, xx), params, x)

    d = PatchDiscriminator(dtype=jnp.bfloat16)
    dp = d.init(jax.random.PRNGKey(0), x[:1])

    def dloss(p, xx):
        return jnp.mean(jnp.square(d.apply(p, xx).astype(jnp.float32)))

    report("D fwd+bwd", lambda p, xx: jax.grad(dloss)(p, xx), dp, x)

    from uig.kernels.augment import augment_batch
    from uig.kernels.augment_pallas import augment_batch_pallas

    u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 286, 286, 3), np.uint8))
    key = jax.random.PRNGKey(0)
    report("augment xla", lambda a, k: augment_batch(a, k, 256,
                                                     jnp.bfloat16), u8, key)
    report("augment pallas", lambda a, k: augment_batch_pallas(
        a, k, 256, jnp.bfloat16), u8, key)


if __name__ == "__main__":
    main()
