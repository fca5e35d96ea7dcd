"""Self-attention kernels for the VQGAN bottleneck (SURVEY.md §2 "VQGAN
stretch": Pallas attention blocks; BASELINE.json rung 5).

VQGAN attends over the latent grid — N = (H/16)² tokens (1024 at 512²
input), single head, full channel width D. Two implementations:

  * attention_xla — reference einsum/softmax; differentiable; used on CPU
    and as the recompute backward.
  * attention_pallas — fused Pallas kernel: grid (B, N/BQ); K and V stay
    VMEM-resident across the q-block sweep, scores never touch HBM. For
    these shapes (N ≤ 4096, D ≤ 512) whole K/V fit VMEM, so each q block
    computes its full softmax row directly — no online-softmax passes
    needed. Softmax is numerically stabilized by the row max.

Backward: a fused Pallas kernel (one pass over q blocks per batch) that
recomputes the softmax rows in VMEM and emits dq/dk/dv — the O(N²) matrix
stays out of HBM in BOTH directions (round-1 VERDICT item 8 replaced the
earlier XLA-VJP recompute, whose backward materialized (B, N, N) in HBM).
dk/dv accumulate across q blocks in a VMEM-resident output block (constant
index map per batch, zero-initialized at the first q block).

Parity: tests/unit/test_attention.py (interpret mode, fwd + grads) and
scripts/tpu_kernel_parity.py (compiled, real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, N, D) single-head scaled-dot-product attention, fp32 softmax."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32)).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    v = v_ref[0].astype(jnp.float32)  # (N, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def _attention_fwd_impl(q, k, v, block_q: int = 256):
    b, n, d = q.shape
    bq = min(block_q, n)
    while n % bq:
        bq //= 2
    grid = (b, n // bq)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / float(d) ** 0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)


@jax.custom_vjp
def attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return _attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _attention_fwd_impl(q, k, v), (q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """One q block: recompute its softmax rows, emit dq, accumulate dk/dv.

    S = s·QKᵀ; P = softmax(S); O = PV
    dV = Pᵀ·dO            dP = dO·Vᵀ
    dS = P ∘ (dP − rowsum(P ∘ dP))
    dQ = s·dS·K           dK = s·dSᵀ·Q
    """
    j = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (N, D)
    v = v_ref[0].astype(jnp.float32)      # (N, D)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (BQ, N)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BQ, N)
    row = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - row)                                 # (BQ, N)

    dq_ref[0] = (scale * jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 ).astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (N, D)
    dv_ref[0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (N, D)


def _attention_bwd_impl(q, k, v, do, block_q: int = 256):
    b, n, d = q.shape
    bq = min(block_q, n)
    while n % bq:
        bq //= 2
    grid = (b, n // bq)  # j (q blocks) fastest: dk/dv accumulate per batch
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=1.0 / float(d) ** 0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd(res, g):
    q, k, v = res
    return _attention_bwd_impl(q, k, v, g)


attention_pallas.defvjp(_fwd, _bwd)


def attention(q, k, v, impl: str = "pallas"):
    if impl == "pallas" and jax.default_backend() in ("tpu", "axon", "cpu"):
        return attention_pallas(q, k, v)
    return attention_xla(q, k, v)
