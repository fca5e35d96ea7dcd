"""VQGAN trainer — BASELINE.json rung 5 (SURVEY.md §2 "VQGAN stretch").

Latent-space unpaired generation: ONE VQGAN autoencoder is trained over the
union of both domains (each step's batch is the concatenation of the A and B
halves the pipeline yields), learning a shared discrete codebook; the
serving paths are reconstruction (translate ≡ reconstruct) and
``decode_codes`` for latent-space sampling.

Losses: L1 reconstruction + codebook + β·commitment (+ optional LPIPS),
plus a hinge-GAN term gated on by ``loss.vq_disc_start`` (lax-select inside
the jitted step — no Python branching on the step counter). Same TPU
structure as the other trainers: one XLA program per step under shard_map,
pmean'd grads, donated state, bf16 compute / fp32 losses+Adam.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from uig.config import Config
from uig.kernels.augment import augment
from uig.models.patch_disc import PatchDiscriminator
from uig.models.vqgan import VQGANGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import microbatch_value_and_grad, validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


def _select_tree(pred_f32, on_true, on_false):
    """Elementwise select over a pytree pair (pred is a traced 0/1 float)."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred_f32 > 0, a, b), on_true, on_false)


class VQGANState(struct.PyTreeNode):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": generator params} (translate == reconstruct)
    rng: jax.Array
    step: jax.Array


class VQGANTrainer:
    directions = ("a2b",)

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)
        kw = dict(
            base_features=m.vq_base_features,
            channel_mults=m.vq_channel_mults,
            embed_dim=m.vq_embed_dim,
            codebook_size=m.vq_codebook_size,
            out_channels=m.out_channels,
            attn_resolutions=m.vq_attn_resolutions,
            attn_impl=m.attn_impl,
        )
        from uig.config.config import remat_mode

        self._remat = remat_mode(m.remat)
        kw_train = dict(kw, remat_blocks=self._remat == "blocks")
        self.generator = VQGANGenerator(dtype=dt, **kw_train)
        self.eval_generator = VQGANGenerator(dtype=jnp.dtype(m.eval_dtype), **kw)
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt)
        # locate the decoder's FINAL conv kernel for the adaptive
        # adversarial weight (grad-norm ratio is taken at this leaf)
        abstract = jax.eval_shape(
            lambda: self.generator.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, m.image_size, m.image_size, m.in_channels),
                          jnp.float32)))
        dec = abstract["params"]["decoder"]
        last = max((k for k in dec if k.startswith("Conv_")),
                   key=lambda k: int(k.split("_")[1]))
        self._last_kernel_path = ("params", "decoder", last, "kernel")

        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)

        n = mesh.devices.size
        if cfg.data.batch_size % n:
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by {n} devices")
        self.local_batch = cfg.data.batch_size // n
        self.n_devices = n
        # the VQGAN step trains over the 2B union batch (A‖B concat), so
        # the microbatch divisibility constraint is on 2·local_batch
        self._grad_accum = validate_grad_accum(
            cfg, "VQGANTrainer", supported=True,
            local_batch=2 * self.local_batch)
        if self._grad_accum > 1 and cfg.loss.vq_adaptive_weight:
            raise ValueError(
                "opt.grad_accum>1 cannot be combined with "
                "loss.vq_adaptive_weight: the adaptive weight needs the "
                "full-batch grad-norm ratio BEFORE the microbatched "
                "backward (would double the forward FLOPs)")
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_apply)

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        kg, kd = jax.random.split(rng)
        g_params = self.generator.init(kg, sample)
        d_params = self.discriminator.init(kd, sample)
        return VQGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema={"a2b": jax.tree_util.tree_map(jnp.copy, g_params)},
            rng=rng,
            step=jnp.zeros((), jnp.int32),
        )

    def init_state(self, rng: jax.Array) -> VQGANState:
        state = self._abstract_state(rng)
        return jax.device_put(state, self.state_shardings())

    def _specs_for(self, state_like) -> VQGANState:
        rep = P()

        def bc(subtree):
            return jax.tree_util.tree_map(lambda _: rep, subtree)

        return VQGANState(
            g_params=bc(state_like.g_params),
            d_params=bc(state_like.d_params),
            g_opt=bc(state_like.g_opt),
            d_opt=bc(state_like.d_opt),
            ema=bc(state_like.ema),
            rng=rep,
            step=rep,
        )

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    def _get_last_kernel(self, g_params):
        node = g_params
        for k in self._last_kernel_path:
            node = node[k]
        return node

    # ------------------------------------------------------------------
    def _device_step(self, state: VQGANState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("aug_a", "aug_b"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)
        # one shared-codebook autoencoder over the union of both domains
        x = jnp.concatenate([real_a, real_b], axis=0)

        disc_on = (state.step >= loss_cfg.vq_disc_start).astype(jnp.float32)
        adv_w = loss_cfg.lambda_vq_adv * disc_on

        g_apply = (jax.checkpoint(self.generator.apply) if self._remat == "full"
                   else self.generator.apply)

        def _nll_and_adv(g_params, xb):
            recon, vq = g_apply(g_params, xb)
            rec = L.l1_loss(xb, recon)
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * self.perceptual_fn(xb, recon)
            adv = L.gan_loss_g(self.discriminator.apply(state.d_params, recon),
                               loss_cfg.gan_mode)
            return recon, vq, rec, lpips, adv

        lam_adapt = jnp.float32(1.0)
        if loss_cfg.vq_adaptive_weight:
            # canonical VQGAN (Esser et al. 2021): weight the adversarial
            # term by ||grad_last(L_nll)|| / ||grad_last(L_adv)||, grads
            # taken at the decoder's final conv kernel. Closing over the
            # rest of the params keeps the backward confined to the last
            # layer. ONE jax.vjp yields both gradients from ONE shared
            # forward (two cheap cotangent pulls) — the earlier two-closure
            # form (separate jax.grad each) was measured NOT to CSE with
            # itself or the main loss pass on this backend: the shipped
            # 512² step carried 106.4 TF vs 73.8 with adaptive off, i.e.
            # ~an extra full forward per closure (BASELINE.md round 3).
            path = self._last_kernel_path

            def _with_last(p, k):
                def sub(node, parts):
                    node = dict(node)
                    if len(parts) == 1:
                        node[parts[0]] = k
                    else:
                        node[parts[0]] = sub(node[parts[0]], parts[1:])
                    return node
                return sub(p, list(path))

            def _nll_and_adv_of(k):
                _, _, rec, lpips, adv = _nll_and_adv(
                    _with_last(state.g_params, k), x)
                return rec + lpips, adv

            last_k = self._get_last_kernel(state.g_params)
            (_, _), vjp_fn = jax.vjp(_nll_and_adv_of, last_k)
            one, zero = jnp.float32(1.0), jnp.float32(0.0)
            g_nll, = vjp_fn((one, zero))
            g_adv, = vjp_fn((zero, one))
            lam_adapt = jnp.linalg.norm(g_nll.astype(jnp.float32).ravel()) / (
                jnp.linalg.norm(g_adv.astype(jnp.float32).ravel()) + 1e-4)
            lam_adapt = jax.lax.stop_gradient(
                jnp.clip(lam_adapt, 0.0, 1e4))

        # under grad_accum>1 every scalar below is a batch mean (exact
        # accumulation) except perplexity, which becomes a mean of
        # per-microbatch perplexities — a metric-only approximation
        def g_loss_fn(g_params, xb, mb_i):
            del mb_i
            recon, vq, rec, lpips, adv = _nll_and_adv(g_params, xb)
            codebook = vq.codebook_loss + cfg.model.vq_beta * vq.commitment_loss
            total = rec + codebook + adv_w * lam_adapt * adv + lpips
            return total, {"recon": recon, "rec": rec, "codebook": codebook,
                           "g_adv": adv, "perplexity": vq.perplexity,
                           "lpips": lpips}

        (g_loss, aux), g_grads = microbatch_value_and_grad(
            g_loss_fn, state.g_params, x, self._grad_accum)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, {"a2b": g_params}, cfg.opt.ema_decay)

        fake = jax.lax.stop_gradient(aux["recon"])

        def d_loss_fn(d_params, mb, mb_i):
            del mb_i
            xb, fakeb = mb
            if cfg.model.fused_applies:
                # real/fake share D params: ONE 2B apply (same math — see
                # ModelConfig.fused_applies; equivalence tested for the
                # CycleGAN/CUT trainers which share this structure)
                r, f = jnp.split(self.discriminator.apply(
                    d_params, jnp.concatenate([xb, fakeb], 0)), 2, 0)
                return L.gan_loss_d(r, f, loss_cfg.gan_mode), {}
            return L.gan_loss_d(
                self.discriminator.apply(d_params, xb),
                self.discriminator.apply(d_params, fakeb),
                loss_cfg.gan_mode), {}

        (d_loss, _), d_grads = microbatch_value_and_grad(
            d_loss_fn, state.d_params, (x, fake), self._grad_accum)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt_new = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
        d_params_new = optax.apply_updates(state.d_params, d_updates)
        # gate the WHOLE D update (params AND optimizer state) until
        # vq_disc_start — merely zeroing grads would still advance Adam's
        # step count (spoiling bias correction at hand-off) and let adamw's
        # decay shrink D during warmup
        d_params, d_opt = _select_tree(
            disc_on, (d_params_new, d_opt_new), (state.d_params, state.d_opt))

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss * disc_on, "rec": aux["rec"],
            "codebook": aux["codebook"], "g_adv": aux["g_adv"],
            "perplexity": aux["perplexity"], "lpips": aux["lpips"],
            "lambda_adapt": lam_adapt,
            "lr": self._lr(state.step),
        }
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float32),
                                   metrics), axis)
        new_state = state.replace(
            g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt,
            ema=ema, step=state.step + 1)
        return new_state, metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        batch_spec = P(self.axis)
        names = ("g_loss", "d_loss", "rec", "codebook", "g_adv",
                 "perplexity", "lpips", "lambda_adapt", "lr")
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, batch_spec, batch_spec),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: VQGANState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            recon, _ = self.eval_generator.apply(params, x.astype(jnp.float32))
            return recon

    def translate(self, ema_params, x, direction: str = "a2b"):
        """VQGAN 'translation' is reconstruction through the shared codebook."""
        return self._eval_step(ema_params["a2b"], x)

    def decode_codes(self, ema_params, codes):
        return jax.jit(
            lambda p, c: self.eval_generator.apply(
                p, c, method=VQGANGenerator.decode_codes)
        )(ema_params["a2b"], codes)
