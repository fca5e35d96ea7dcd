"""Prototype + parity harness for leaner reflect ring-delta formulations.

Round-3 follow-up: the fused reflect conv (layers.reflect_conv2d) costs ~9%
of the 256² step vs padding=zeros, and the round-3 analysis (BASELINE.md
"CORRECTION" note) attributes it to HLO op COUNT — ~16 tiny strip-assembly /
scatter ops per reflect conv × ~20 convs per generator chain, all
fixed-overhead-bound. This script prototypes two cheaper formulations and
checks them for exactness against the shipped one before any chip A/B:

  v2 ("sparse strips"): the r−z strip SUBTRACTION is algebraically
      unnecessary — the real-content rows cancel exactly, leaving the
      "pad frame": reflect values at pad cells, zeros elsewhere. Build that
      directly (fewer concats, no flip-vs-zero double assembly, no
      subtract).

  v3 ("one conv, channel-packed"): additionally pack the (top+bottom) and
      the TRANSPOSED (left+right) difference strips as two channel blocks
      of ONE conv with a block-diagonal [w 0; 0 wT] kernel — one strip conv
      per reflect conv instead of two (requires H == W; callers fall back
      otherwise). FLOPs on the strips double via the zero blocks, but the
      strips are p-high slivers — op count is what we pay for.

Run on CPU for exactness, then scripts/perf_conv_ab.py-style scan timing on
the chip decides. (Reference repo is an empty stub — /root/reference/
README.md:1 — this is north-star perf work, not parity work.)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "src")

from uig.models.layers import add_reflect_ring_delta, pad2d  # noqa: E402


def _conv(x, w, pad=0):
    p = ((pad, pad), (pad, pad))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def ring_delta_v2(y, x, w):
    """Sparse pad-frame strips: same math as add_reflect_ring_delta with
    the r−z subtraction folded away analytically.

    Difference strip contents (p = k//2):
      top strip rows 0..p-1   = reflected rows (flip of x[1..p]),
                                reflect-col-padded to W+2p;
      top strip rows p..p+k-2 = ZERO except the p-wide col-pad edges,
                                which hold the reflect col values of the
                                k-1 real rows the ring outputs read.
    Symmetric for bottom/left/right.
    """
    k = w.shape[0]
    p = k // 2
    b, h, wd, c = x.shape
    f = w.shape[-1]

    def colpad_reflect(t):  # reflect pad along axis 2
        return jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")

    def edge_cols(rows):  # (B, k-1, W, C) -> (B, k-1, W+2p, C), zero interior
        z = jnp.zeros(rows.shape[:2] + (wd, c), rows.dtype)
        return jnp.concatenate(
            [jnp.flip(rows[:, :, 1:p + 1], 2), z,
             jnp.flip(rows[:, :, wd - p - 1:wd - 1], 2)], 2)

    # top: pad rows are flip(x[1..p]); the ring outputs read real rows 0..k-2
    top = jnp.concatenate(
        [colpad_reflect(jnp.flip(x[:, 1:p + 1], 1)), edge_cols(x[:, :k - 1])], 1)
    bot = jnp.concatenate(
        [edge_cols(x[:, h - k + 1:]), colpad_reflect(jnp.flip(x[:, h - p - 1:h - 1], 1))], 1)
    tb = _conv(jnp.concatenate([top, bot], 0), w)  # (2B, p, W, f)
    y = y.at[:, :p].add(tb[:b])
    y = y.at[:, h - p:].add(tb[b:])

    # left/right: rows [p, H-p) read no row pad; only col-pad cells differ —
    # diff strip = [reflect col-pad values | zeros(k-1 real cols)]:
    lft = jnp.concatenate(
        [jnp.flip(x[:, :, 1:p + 1], 2),
         jnp.zeros((b, h, k - 1, c), x.dtype)], 2)
    rgt = jnp.concatenate(
        [jnp.zeros((b, h, k - 1, c), x.dtype),
         jnp.flip(x[:, :, wd - p - 1:wd - 1], 2)], 2)
    lr = _conv(jnp.concatenate([lft, rgt], 0), w)  # (2B, H-2p, p, f)
    y = y.at[:, p:h - p, :p].add(lr[:b])
    y = y.at[:, p:h - p, wd - p:].add(lr[b:])
    return y


def ring_delta_v3(y, x, w):
    """v2 strips, but ONE conv: channel-pack [tb | lr-transposed] with a
    block-diagonal [w 0; 0 wT] kernel. Requires H == W."""
    k = w.shape[0]
    p = k // 2
    b, h, wd, c = x.shape
    f = w.shape[-1]
    assert h == wd, "v3 requires square inputs"

    def colpad_reflect(t):
        return jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")

    def edge_cols(rows, width):
        z = jnp.zeros(rows.shape[:2] + (width, c), rows.dtype)
        return jnp.concatenate(
            [jnp.flip(rows[:, :, 1:p + 1], 2), z,
             jnp.flip(rows[:, :, width - p - 1:width - 1], 2)], 2)

    top = jnp.concatenate(
        [colpad_reflect(jnp.flip(x[:, 1:p + 1], 1)), edge_cols(x[:, :k - 1], wd)], 1)
    bot = jnp.concatenate(
        [edge_cols(x[:, h - k + 1:], wd),
         colpad_reflect(jnp.flip(x[:, h - p - 1:h - 1], 1))], 1)

    # left/right transposed into row-strip form: x^T swaps H and W, so the
    # left strip of x equals the TOP strip of x^T restricted to col pads —
    # i.e. rows = pad values only, no extra edge handling (rows [p, H-p)
    # read no row pad) — but the conv kernel must be transposed to match.
    xt = jnp.swapaxes(x, 1, 2)  # (B, W, H, C)
    lftT = jnp.concatenate(  # (B, p + k-1, H, C): [reflect rows; zeros]
        [jnp.flip(xt[:, 1:p + 1], 1), jnp.zeros((b, k - 1, h, c), x.dtype)], 1)
    rgtT = jnp.concatenate(
        [jnp.zeros((b, k - 1, h, c), x.dtype),
         jnp.flip(xt[:, wd - p - 1:wd - 1], 1)], 1)

    tb_in = jnp.concatenate([top, bot], 0)            # (2B, p+k-1, W+2p, C)
    lr_in = jnp.concatenate([lftT, rgtT], 0)          # (2B, p+k-1, H, C)
    lr_in = jnp.pad(lr_in, ((0, 0), (0, 0), (p, p), (0, 0)))  # width match?
    # NOTE: lr outputs only cover rows [p, H-p) of the ring; padding lr_in's
    # width by p zeros makes the conv produce H columns, of which we keep
    # the middle H-2p. Wasteful but keeps ONE conv shape; measured on chip.
    both = jnp.concatenate([tb_in, lr_in], -1)        # (2B, p+k-1, W+2p, 2C)
    wt = jnp.swapaxes(w, 0, 1)
    wb = jnp.zeros((k, k, 2 * c, 2 * f), w.dtype)
    wb = wb.at[:, :, :c, :f].set(w).at[:, :, c:, f:].set(wt)
    out = _conv(both, wb)                             # (2B, p, W, 2F)
    tb, lrT = out[..., :f], out[..., f:]
    y = y.at[:, :p].add(tb[:b])
    y = y.at[:, h - p:].add(tb[b:])
    lr = jnp.swapaxes(lrT, 1, 2)                      # (2B, W, p, F)
    y = y.at[:, p:h - p, :p].add(lr[:b, p:h - p])
    y = y.at[:, p:h - p, wd - p:].add(lr[b:, p:h - p])
    return y


def reference(x, w):
    return _conv(pad2d(x, w.shape[0] // 2, "reflect"), w)


def main():
    rng = np.random.default_rng(0)
    ok = True
    for k in (3, 7):
        for h in (16, 31):
            x = jnp.asarray(rng.normal(size=(2, h, h, 5)), jnp.float32)
            w = jnp.asarray(rng.normal(size=(k, k, 5, 4)), jnp.float32)
            p = k // 2
            y0 = _conv(x, w, pad=p)
            want = reference(x, w)
            got_ship = add_reflect_ring_delta(y0, x, w)
            err_ship = float(jnp.abs(want - got_ship).max())
            got2 = ring_delta_v2(y0, x, w)
            err2 = float(jnp.abs(want - got2).max())
            got3 = ring_delta_v3(y0, x, w)
            err3 = float(jnp.abs(want - got3).max())
            line = (f"k={k} h={h}: ship={err_ship:.2e} v2={err2:.2e} "
                    f"v3={err3:.2e}")
            print(line)
            ok &= max(err2, err3) < 1e-4
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
