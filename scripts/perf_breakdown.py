"""Component-level timing breakdown for the 256² CycleGAN step.

Methodology note (round 2): the axon tunnel adds ~30 ms latency per
dispatched executable, so timing N separate dispatches inflates small
components massively (round-1 numbers for sub-10ms components are
unreliable). Everything here is timed as ONE dispatch of a jitted
`lax.scan` of ITERS iterations whose carry keeps the op live, reduced to a
scalar so the fetch is tiny. Roofline fractions use the XLA cost model's
FLOP count for a single iteration.

Run: PYTHONPATH=src:$PYTHONPATH python scripts/perf_breakdown.py
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
ITERS = 100
B = 16
S = 256


def scan_time(fn, x, *args, iters=ITERS):
    """Time fn(x, *args) -> y with y.shape == x.shape, chained via scan."""

    @jax.jit
    def many(x, *a):
        def body(c, _):
            return fn(c, *a), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    r = many(x, *args)
    jax.device_get(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(x, *args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def report(name, fn, x, *args, iters=ITERS):
    dt = scan_time(fn, x, *args, iters=iters)
    fl = flops_of(fn, x, *args)
    frac = (fl / PEAK) / dt if fl else 0.0
    print(f"{name:<46s} {dt*1000:8.3f} ms  {fl/1e12:7.3f} TF  "
          f"roofline {frac:.3f}", flush=True)
    return dt


def main():
    only = set(sys.argv[1:])  # component name prefixes to run (empty = all)

    def want(name):
        return not only or any(name.startswith(p) for p in only)

    global report
    _report = report

    def report(name, *a, **kw):
        if want(name):
            return _report(name, *a, **kw)

    from flax import linen as nn

    from uig.models import PatchDiscriminator, ResNetGenerator
    from uig.models.layers import InstanceNorm, PadConv, ResnetBlock, UpsampleConv

    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt_)
    x64 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 64)), dt_)
    x128 = jnp.asarray(rng.uniform(-1, 1, (B, S // 2, S // 2, 128)), dt_)
    x256 = jnp.asarray(rng.uniform(-1, 1, (B, S // 4, S // 4, 256)), dt_)
    key = jax.random.PRNGKey(0)

    def mk(mod, xin):
        p = mod.init(key, xin)
        return p

    # ---- whole model ----
    gen = ResNetGenerator(n_res_blocks=9, dtype=dt_)
    gp = mk(gen, x3)

    def g_fwd(x, p):
        return gen.apply(p, x).astype(dt_)

    report("G fwd (c7s1-64..c7s1-3, 9 blocks)", g_fwd, x3, gp)

    def g_fwdbwd(x, p):
        def loss(xx):
            return jnp.sum(gen.apply(p, xx).astype(jnp.float32))
        g = jax.grad(loss)(x)
        return g.astype(dt_)

    report("G fwd+bwd (d/dx)", g_fwdbwd, x3, gp, iters=40)

    def g_fwdbwd_w(x, p):
        def loss(pp):
            return jnp.sum(gen.apply(pp, x).astype(jnp.float32))
        g = jax.grad(loss)(p)
        leaves = jax.tree_util.tree_leaves(g)
        return x + jnp.sum(
            jnp.stack([jnp.sum(l).astype(jnp.float32) for l in leaves])
        ).astype(dt_)

    report("G fwd+bwd (d/dparams)", g_fwdbwd_w, x3, gp, iters=40)

    disc = PatchDiscriminator(n_layers=3, dtype=dt_)
    dp = mk(disc, x3)

    def d_fwd(x, p):
        return x + jnp.mean(disc.apply(p, x)).astype(dt_)

    report("D fwd", d_fwd, x3, dp)

    # ---- stem / head ----
    stem = PadConv(64, 7, pad=3, pad_mode="reflect", dtype=dt_)
    sp = mk(stem, x3)

    def stem_fwd(x, p):
        return x + jnp.mean(stem.apply(p, x)).astype(dt_)

    report("stem c7s1-64 fwd (3->64)", stem_fwd, x3, sp)

    head = PadConv(3, 7, pad=3, pad_mode="reflect", dtype=dt_)
    hp = mk(head, x64)

    def head_fwd(x, p):
        return x + jnp.mean(head.apply(p, x)).astype(dt_)

    report("head c7s1-3 fwd (64->3)", head_fwd, x64, hp)

    def head_fwdbwd(x, p):
        def loss(xx):
            return jnp.sum(head.apply(p, xx).astype(jnp.float32))
        return jax.grad(loss)(x).astype(dt_)

    report("head c7s1-3 fwd+bwd(d/dx)", head_fwdbwd, x64, hp, iters=40)

    # ---- downsample / trunk / upsample ----
    down1 = PadConv(128, 3, stride=2, pad=1, pad_mode="zeros", dtype=dt_)
    dn1 = mk(down1, x64)

    def down_fwd(x, p):
        return x + jnp.mean(down1.apply(p, x)).astype(dt_)

    report("down d128 fwd (256^2x64 -> 128^2x128)", down_fwd, x64, dn1)

    blk = ResnetBlock(256, dtype=dt_)
    bp = mk(blk, x256)

    def blk_fwd(x, p):
        return blk.apply(p, x)

    report("1 ResnetBlock fwd (64^2x256)", blk_fwd, x256, bp)

    def blk_fwdbwd(x, p):
        def loss(xx):
            return jnp.sum(blk.apply(p, xx).astype(jnp.float32))
        return jax.grad(loss)(x).astype(dt_)

    report("1 ResnetBlock fwd+bwd(d/dx)", blk_fwdbwd, x256, bp)

    for method in ("conv_transpose", "resize_conv"):
        up = UpsampleConv(128, method=method, dtype=dt_)
        upp = mk(up, x256)

        def up_fwd(x, p, up=up):
            return x + jnp.mean(up.apply(p, x)).astype(dt_)

        report(f"up u128 fwd ({method})", up_fwd, x256, upp)

        def up_fwdbwd(x, p, up=up):
            def loss(xx):
                return jnp.sum(up.apply(p, xx).astype(jnp.float32))
            return jax.grad(loss)(x).astype(dt_)

        report(f"up u128 fwd+bwd(d/dx) ({method})", up_fwdbwd, x256, upp)

    inorm = InstanceNorm(dtype=dt_)
    ip = mk(inorm, x64)

    def in_fwd(x, p):
        return inorm.apply(p, x)

    report("InstanceNorm fwd (256^2x64)", in_fwd, x64, ip)


if __name__ == "__main__":
    main()
