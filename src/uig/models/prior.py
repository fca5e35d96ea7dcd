"""Autoregressive latent prior over the VQGAN code grid (VERDICT round-2
item 7 — BASELINE.json rung 5's "latent-space unpaired generation" stage 2).

The canonical VQGAN recipe (Esser et al. 2021) trains a decoder-only
transformer over the flattened (h·w) code sequence; sampling draws codes
autoregressively and decodes them through the frozen VQGAN decoder —
*this* is unconditional generation, unlike uniform-random codes (texture
noise). The reference repo has no code (/root/reference/README.md:1); this
follows the published recipe.

TPU-first structure:
  * training forward is ONE fused program: full-sequence causal attention
    (L ≤ 1024 tokens, (B, H, L, L) logits fit comfortably) — teacher
    forcing needs no step loop, so the MXU sees big batched matmuls;
  * sampling is a lax.scan over positions with a static-shape KV cache
    (dynamic_update_slice write, masked read) — the standard TPU decode
    pattern: no dynamic shapes, one compiled program for all L steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


class PriorBlock(nn.Module):
    """Pre-LN transformer block with explicit-cache decode support."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d, dt = self.dim, self.dtype
        kw = dict(dtype=dt, param_dtype=jnp.float32,
                  kernel_init=nn.initializers.normal(0.02))
        self.ln1 = nn.LayerNorm(dtype=dt, param_dtype=jnp.float32)
        self.wqkv = nn.Dense(3 * d, **kw)
        self.wo = nn.Dense(d, **kw)
        self.ln2 = nn.LayerNorm(dtype=dt, param_dtype=jnp.float32)
        self.fc1 = nn.Dense(self.mlp_ratio * d, **kw)
        self.fc2 = nn.Dense(d, **kw)

    def _qkv(self, x):
        b, l, _ = x.shape
        dh = self.dim // self.heads
        qkv = self.wqkv(self.ln1(x)).reshape(b, l, 3, self.heads, dh)
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, H, dh)

    def _mlp(self, x):
        return self.fc2(nn.gelu(self.fc1(self.ln2(x))))

    def __call__(self, x, causal: bool = True):
        """Full-sequence forward: x (B, L, D) -> (B, L, D). ``causal=False``
        gives the bidirectional attention the masked (MaskGIT-style) prior
        uses — every position sees the whole grid."""
        b, l, _ = x.shape
        dh = self.dim // self.heads
        q, k, v = self._qkv(x)
        s = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (dh ** -0.5)
        if causal:
            mask = jnp.tril(jnp.ones((l, l), bool))
            s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhlm,bmhd->blhd", p, v.astype(jnp.float32))
        x = x + self.wo(o.reshape(b, l, self.dim).astype(self.dtype))
        return x + self._mlp(x)

    def step(self, x, cache, t):
        """One-token decode: x (B, 1, D), cache {k,v: (B, L, H, dh)},
        t scalar position. Returns (y (B, 1, D), new cache)."""
        dh = self.dim // self.heads
        q, k, v = self._qkv(x)  # (B, 1, H, dh)
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                          (0, t, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                          (0, t, 0, 0))
        s = jnp.einsum("bqhd,bmhd->bhqm", q.astype(jnp.float32),
                       ck.astype(jnp.float32)) * (dh ** -0.5)
        valid = (jnp.arange(ck.shape[1]) <= t)[None, None, None, :]
        p = jax.nn.softmax(jnp.where(valid, s, NEG_INF), axis=-1)
        o = jnp.einsum("bhqm,bmhd->bqhd", p, cv.astype(jnp.float32))
        x = x + self.wo(o.reshape(x.shape[0], 1, self.dim).astype(self.dtype))
        return x + self._mlp(x), {"k": ck, "v": cv}


class CodePrior(nn.Module):
    """Decoder-only transformer over the flattened code grid.

    Token ``vocab`` (one past the codebook) is the BOS symbol; logits are
    over the codebook only.
    """

    vocab: int
    seq_len: int
    dim: int = 512
    depth: int = 8
    heads: int = 8
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.tok = nn.Embed(self.vocab + 1, self.dim,
                            embedding_init=nn.initializers.normal(0.02),
                            param_dtype=jnp.float32, dtype=self.dtype)
        self.pos = self.param("pos", nn.initializers.normal(0.02),
                              (self.seq_len, self.dim))
        self.blocks = [PriorBlock(self.dim, self.heads, self.mlp_ratio,
                                  self.dtype) for _ in range(self.depth)]
        self.ln_f = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)
        self.head = nn.Dense(self.vocab, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             kernel_init=nn.initializers.normal(0.02))

    def __call__(self, codes: jax.Array) -> jax.Array:
        """Teacher-forced logits: codes (B, L) int32 -> (B, L, vocab) fp32.
        Position t predicts codes[t] from BOS + codes[:t]."""
        b, l = codes.shape
        toks = jnp.concatenate(
            [jnp.full((b, 1), self.vocab, codes.dtype), codes[:, :-1]], axis=1)
        x = self.tok(toks) + self.pos[None, :l].astype(self.dtype)
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.ln_f(x))

    def decode_step(self, tok: jax.Array, t: jax.Array, caches):
        """tok (B,) int32 previous token, t scalar position -> (logits
        (B, vocab) fp32, new caches)."""
        x = self.tok(tok)[:, None] + jax.lax.dynamic_slice_in_dim(
            self.pos, t, 1, 0)[None].astype(self.dtype)
        new = []
        for blk, c in zip(self.blocks, caches):
            x, c = blk.step(x, c, t)
            new.append(c)
        return self.head(self.ln_f(x))[:, 0], new

    def init_cache(self, batch: int, dtype=jnp.float32):
        dh = self.dim // self.heads
        z = lambda: jnp.zeros((batch, self.seq_len, self.heads, dh), dtype)
        return [{"k": z(), "v": z()} for _ in range(self.depth)]


def sample_codes(model: CodePrior, params, rng: jax.Array, n: int,
                 grid_hw: int, temperature: float = 1.0,
                 top_k: int = 0) -> jax.Array:
    """Draw n code grids (n, grid_hw, grid_hw) int32 autoregressively.

    One jittable lax.scan over positions; KV caches carry static shapes.
    ``top_k`` > 0 restricts sampling to the k most likely codes.
    """
    l = model.seq_len
    assert l == grid_hw * grid_hw, (l, grid_hw)
    caches = model.init_cache(n, jnp.dtype(model.dtype))
    bos = jnp.full((n,), model.vocab, jnp.int32)

    def body(carry, t):
        tok, caches, rng = carry
        logits, caches = model.apply(params, tok, t, caches,
                                     method=CodePrior.decode_step)
        logits = logits / jnp.float32(max(temperature, 1e-6))
        if top_k and top_k < model.vocab:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits >= kth, logits, NEG_INF)
        rng, key = jax.random.split(rng)
        nxt = jax.random.categorical(key, logits).astype(jnp.int32)
        return (nxt, caches, rng), nxt

    (_, _, _), toks = jax.lax.scan(body, (bos, caches, rng), jnp.arange(l))
    # scan stacks over positions: (L, n) -> (n, h, w)
    return toks.T.reshape(n, grid_hw, grid_hw)


# ---------------------------------------------------------------------------
# Masked (MaskGIT-style) prior — parallel iterative decoding
# ---------------------------------------------------------------------------


class MaskedPrior(nn.Module):
    """Bidirectional masked-token prior over the code grid (MaskGIT,
    Chang et al. 2022 — the parallel-decoding alternative to the AR prior).

    Token ``vocab`` (one past the codebook) is the MASK symbol; logits are
    over the codebook only. TPU-first rationale: training is one full-grid
    bidirectional forward (identical MXU shape to the AR teacher-forced
    pass, no shift), and sampling is ``steps`` full-grid forwards instead
    of L sequential KV-cache steps — at L=1024 and steps=12 that is ~85×
    fewer serially-dependent dispatches, each of them a big batched matmul.
    """

    vocab: int
    seq_len: int
    dim: int = 512
    depth: int = 8
    heads: int = 8
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.tok = nn.Embed(self.vocab + 1, self.dim,
                            embedding_init=nn.initializers.normal(0.02),
                            param_dtype=jnp.float32, dtype=self.dtype)
        self.pos = self.param("pos", nn.initializers.normal(0.02),
                              (self.seq_len, self.dim))
        self.blocks = [PriorBlock(self.dim, self.heads, self.mlp_ratio,
                                  self.dtype) for _ in range(self.depth)]
        self.ln_f = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)
        self.head = nn.Dense(self.vocab, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             kernel_init=nn.initializers.normal(0.02))

    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens (B, L) int32 in [0, vocab] (``vocab`` = MASK) ->
        logits (B, L, vocab) fp32 at EVERY position (bidirectional)."""
        b, l = tokens.shape
        x = self.tok(tokens) + self.pos[None, :l].astype(self.dtype)
        for blk in self.blocks:
            x = blk(x, causal=False)
        return self.head(self.ln_f(x))


def mask_schedule(u: jax.Array) -> jax.Array:
    """MaskGIT cosine schedule: mask fraction gamma(u) = cos(pi/2 * u),
    u in [0, 1] (u=0 -> everything masked, u=1 -> nothing)."""
    return jnp.cos(0.5 * jnp.pi * u)


def random_code_mask(rng: jax.Array, batch: int, seq_len: int) -> jax.Array:
    """Training masks: per example, draw u~U(0,1), mask
    ceil(gamma(u)·L) >= 1 positions chosen uniformly without replacement
    (rank of per-position uniform keys — static shapes)."""
    ku, kp = jax.random.split(rng)
    u = jax.random.uniform(ku, (batch,))
    n_mask = jnp.clip(jnp.ceil(mask_schedule(u) * seq_len), 1, seq_len)
    keys = jax.random.uniform(kp, (batch, seq_len))
    ranks = jnp.argsort(jnp.argsort(keys, axis=-1), axis=-1)
    return ranks < n_mask[:, None].astype(ranks.dtype)


def sample_codes_maskgit(model: MaskedPrior, params, rng: jax.Array, n: int,
                         grid_hw: int, steps: int = 12,
                         temperature: float = 1.0,
                         choice_temp: float = 4.5) -> jax.Array:
    """Draw n code grids (n, grid_hw, grid_hw) int32 by iterative parallel
    decoding (MaskGIT): start all-MASK; each of ``steps`` rounds samples
    every still-masked position in parallel, keeps the most confident
    predictions per the cosine schedule, and re-masks the rest. Confidence
    is the sampled token's log-prob plus annealed Gumbel noise
    (``choice_temp`` · (1−ratio)) — the published diversity mechanism.
    One jittable lax.scan over rounds; all shapes static.
    """
    l = model.seq_len
    assert l == grid_hw * grid_hw, (l, grid_hw)
    mask_id = model.vocab
    # masked counts AFTER round t (1-indexed ratios); cos(pi/2)=0 -> the
    # final round always unmasks everything
    ratios = jnp.arange(1, steps + 1, dtype=jnp.float32) / steps
    n_mask_next = jnp.floor(mask_schedule(ratios) * l).astype(jnp.int32)

    tokens0 = jnp.full((n, l), mask_id, jnp.int32)
    unknown0 = jnp.ones((n, l), bool)

    def body(carry, xs):
        tokens, unknown, rng = carry
        n_next, ratio = xs
        rng, ks, kg = jax.random.split(rng, 3)
        logits = model.apply(params, tokens)
        logits = logits / jnp.float32(max(temperature, 1e-6))
        sampled = jax.random.categorical(ks, logits).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        conf = jnp.take_along_axis(logp, sampled[..., None], -1)[..., 0]
        # already-fixed positions never re-open
        conf = jnp.where(unknown, conf, jnp.inf)
        tokens = jnp.where(unknown, sampled, tokens)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(kg, conf.shape, jnp.float32, 1e-20, 1.0)))
        scored = conf + choice_temp * (1.0 - ratio) * gumbel
        ranks = jnp.argsort(jnp.argsort(scored, axis=-1), axis=-1)
        unknown = ranks < n_next  # lowest-confidence n_next stay masked
        tokens = jnp.where(unknown, mask_id, tokens)
        return (tokens, unknown, rng), None

    (tokens, unknown, _), _ = jax.lax.scan(
        body, (tokens0, unknown0, rng), (n_mask_next, ratios))
    # n_mask_next[-1] == 0 by construction; keep a hard guarantee anyway
    tokens = jnp.where(unknown, 0, tokens)
    return tokens.reshape(n, grid_hw, grid_hw)
