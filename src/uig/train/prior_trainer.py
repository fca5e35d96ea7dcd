"""VQGAN latent-prior trainer (SURVEY.md §2 "VQGAN stretch" stage 2;
VERDICT round-2 item 7).

Stage-2 of the canonical VQGAN recipe: with the stage-1 autoencoder FROZEN,
train a prior (models/prior.py) on the code sequences the frozen encoder
assigns to real images; sampling then draws codes from the prior and
decodes them — true latent-space unpaired generation, vs the uniform-random
codes `uig sample` previously fell back to. Two styles share this trainer
(``model.prior_style``): "ar" — the canonical decoder-only autoregressive
transformer — and "maskgit" — the bidirectional masked-token prior with
parallel iterative decoding (Chang et al. 2022), whose sampler needs
``prior_sample_steps`` full-grid forwards instead of L sequential ones.

TPU structure mirrors the other trainers: ONE jitted shard_map program per
step (frozen-encoder forward → teacher-forced prior forward/backward →
pmean'd grads → Adam), donated state, batch sharded over the ``data`` axis.
The frozen VQGAN params are passed as a step argument (replicated spec) —
NOT closed over — so they are program inputs rather than baked-in constants
(keeps the executable small and the params donat-able/shareable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uig.config import Config
from uig.kernels.augment import augment
from uig.models.prior import (CodePrior, MaskedPrior, random_code_mask,
                              sample_codes, sample_codes_maskgit)
from uig.models.vqgan import VQGANGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class PriorState(struct.PyTreeNode):
    params: dict
    opt: optax.OptState
    rng: jax.Array
    step: jax.Array


class PriorTrainer:
    """cfg.model.kind == "vqgan_prior". Requires the frozen stage-1 VQGAN:
    either ``vqgan_params`` injected directly (tests) or
    ``cfg.model.prior_vqgan_run`` pointing at a finished vqgan run dir
    (EMA params are used, matching the serving path)."""

    directions = ("a2b",)

    def __init__(self, cfg: Config, mesh: Mesh, perceptual_fn=None,
                 vqgan_params=None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)

        self.grid_hw = m.image_size // (2 ** (len(m.vq_channel_mults) - 1))
        self.vqgan = VQGANGenerator(
            base_features=m.vq_base_features,
            channel_mults=m.vq_channel_mults,
            embed_dim=m.vq_embed_dim,
            codebook_size=m.vq_codebook_size,
            out_channels=m.out_channels,
            attn_resolutions=m.vq_attn_resolutions,
            attn_impl=m.attn_impl,
            dtype=dt,
        )
        if m.prior_style not in ("ar", "maskgit"):
            raise ValueError(
                f"model.prior_style={m.prior_style!r}: expected 'ar' "
                "(autoregressive) or 'maskgit' (masked parallel decoding)")
        self.style = m.prior_style
        prior_cls = CodePrior if self.style == "ar" else MaskedPrior
        self.prior = prior_cls(
            vocab=m.vq_codebook_size,
            seq_len=self.grid_hw * self.grid_hw,
            dim=m.prior_dim, depth=m.prior_depth, heads=m.prior_heads,
            dtype=dt,
        )
        if vqgan_params is None:
            if not m.prior_vqgan_run:
                raise ValueError(
                    "vqgan_prior needs the frozen stage-1 model: set "
                    "model.prior_vqgan_run=/path/to/vqgan/run (EMA params "
                    "are loaded) or pass vqgan_params")
            vqgan_params = self._load_vqgan_params(m.prior_vqgan_run)
        self.vqgan_params = jax.device_put(
            vqgan_params, NamedSharding(mesh, P()))
        self.tx = make_optimizer(cfg.opt)
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'PriorTrainer', supported=False)

        n = mesh.devices.size
        if cfg.data.batch_size % n:
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by "
                f"{n} devices")
        self.local_batch = cfg.data.batch_size // n
        self.n_devices = n
        self._train_step = self._build_train_step()
        # n / temperature / top_k shape or trace the program -> static
        self._sample = jax.jit(self._sample_impl, static_argnums=(2, 3, 4))

    def _load_vqgan_params(self, run_dir: str):
        """EMA generator params from a finished stage-1 vqgan run."""
        from uig.cli.translate import load_run

        vq_cfg, _, vq_state = load_run(run_dir, None, ())
        if vq_cfg.model.kind != "vqgan":
            raise ValueError(
                f"model.prior_vqgan_run={run_dir!r} is a "
                f"{vq_cfg.model.kind!r} run, expected vqgan")
        return jax.device_get(vq_state.ema["a2b"])

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        codes = jnp.zeros((1, self.prior.seq_len), jnp.int32)
        params = self.prior.init(rng, codes)
        return PriorState(params=params, opt=self.tx.init(params), rng=rng,
                          step=jnp.zeros((), jnp.int32))

    def init_state(self, rng: jax.Array) -> PriorState:
        return jax.device_put(self._abstract_state(rng),
                              self.state_shardings())

    def _specs_for(self, state_like) -> PriorState:
        rep = P()
        bc = lambda subtree: jax.tree_util.tree_map(lambda _: rep, subtree)
        return PriorState(params=bc(state_like.params),
                          opt=bc(state_like.opt), rng=rep, step=rep)

    def state_shardings(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------
    def _device_step(self, state: PriorState, vq_params, real_a, real_b):
        cfg = self.cfg
        dt = jnp.dtype(cfg.model.compute_dtype)
        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(self.axis))
        keys = split_named(step_key, ("aug_a", "aug_b", "mask"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)
        # stage-1 trained one shared codebook over the union of domains
        # (vqgan_trainer.py:180); the prior models the same distribution
        x = jnp.concatenate([real_a, real_b], axis=0)
        vq = self.vqgan.apply(vq_params, x, method=VQGANGenerator.encode)
        codes = jax.lax.stop_gradient(
            vq.codes.reshape(x.shape[0], -1))  # (2B, L)

        if self.style == "ar":
            def loss_fn(params):
                logits = self.prior.apply(params, codes)  # (2B, L, K) fp32
                nll = optax.softmax_cross_entropy_with_integer_labels(
                    logits, codes).mean()
                acc = jnp.mean(jnp.argmax(logits, -1) == codes)
                return nll, acc
        else:
            # MaskGIT objective: corrupt with the cosine-schedule mask and
            # score cross-entropy at the MASKED positions only
            mask = random_code_mask(keys["mask"], codes.shape[0],
                                    self.prior.seq_len)
            inputs = jnp.where(mask, self.prior.vocab, codes)

            def loss_fn(params):
                logits = self.prior.apply(params, inputs)  # (2B, L, K) fp32
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, codes)
                denom = jnp.maximum(mask.sum(), 1)
                nll = jnp.where(mask, ce, 0.0).sum() / denom
                hit = (jnp.argmax(logits, -1) == codes) & mask
                acc = hit.sum() / denom
                return nll, acc

        (nll, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, self.axis)
        lr_now = self._lr(state.step)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "nll": nll,
            "code_ppl": jnp.exp(nll),
            "acc": acc,
            "lr": lr_now,
        }
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float32),
                                   metrics), self.axis)
        return state.replace(params=params, opt=opt, step=state.step + 1), \
            metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        rep = jax.tree_util.tree_map(lambda _: P(), self.vqgan_params)
        batch_spec = P(self.axis)
        out_metrics = {k: P() for k in ("nll", "code_ppl", "acc", "lr")}
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, rep, batch_spec, batch_spec),
            out_specs=(specs, out_metrics), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: PriorState, batch):
        real_a, real_b = batch
        return self._train_step(state, self.vqgan_params, real_a, real_b)

    # ------------------------------------------------------------------
    def _sample_impl(self, params, rng, n, temperature=1.0, top_k=0):
        if self.style == "ar":
            codes = sample_codes(self.prior, params, rng, n, self.grid_hw,
                                 temperature=temperature, top_k=top_k)
        else:
            if top_k:
                raise ValueError("top_k applies to the AR prior only; the "
                                 "maskgit sampler uses prior_choice_temp")
            m = self.cfg.model
            codes = sample_codes_maskgit(
                self.prior, params, rng, n, self.grid_hw,
                steps=m.prior_sample_steps, temperature=temperature,
                choice_temp=m.prior_choice_temp)
        imgs = self.vqgan.apply(self.vqgan_params, codes,
                                method=VQGANGenerator.decode_codes)
        return imgs.astype(jnp.float32)

    def sample(self, state_or_params, rng, n: int, temperature: float = 1.0,
               top_k: int = 0):
        """n prior-sampled images in [-1, 1] (decoded through the frozen
        VQGAN decoder)."""
        params = getattr(state_or_params, "params", state_or_params)
        return self._sample(params, rng, n, temperature, top_k)
