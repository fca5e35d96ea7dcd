"""VAE-GAN trainer (BASELINE.json rung 4 variant; SURVEY.md §0 VAE-GAN).

Same single-XLA-program / shard_map / donated-state structure as the other
trainers: recon L1 + β·KL (+ optional LPIPS) + gated hinge/LSGAN adversarial
term; one autoencoder over the union of both domains;
``sample(state, rng, n)`` is the unconditional-generation path.
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
from uig.models.vaegan import VAEGANGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class VAEGANState(struct.PyTreeNode):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": generator params}
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


class VAEGANTrainer:
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
            latent_dim=m.vq_embed_dim,
            out_channels=m.out_channels,
            attn_resolutions=m.vq_attn_resolutions,
            attn_impl=m.attn_impl,
        )
        from uig.config.config import remat_mode

        self._remat = remat_mode(m.remat)
        kw_train = dict(kw, remat_blocks=self._remat == "blocks")
        self.generator = VAEGANGenerator(dtype=dt, **kw_train)
        self.eval_generator = VAEGANGenerator(dtype=jnp.dtype(m.eval_dtype), **kw)
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'VAEGANTrainer', supported=False)
        self.kl_weight = m.vq_beta  # reuse the commitment-weight knob for KL
        self._ada = ada.ada_enabled(cfg.loss)
        self._ada_ops = ada.parse_ada_ops(cfg.loss.ada_ops) if self._ada else ()
        if cfg.loss.ada_target > 0 and cfg.loss.gan_mode == "wgan":
            raise ValueError(
                "loss.ada_target needs a GAN mode with a decision boundary; "
                "use fixed-p DiffAugment (ada_p_init>0, ada_target=0) with wgan")

        n = mesh.devices.size
        if cfg.data.batch_size % n:
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by {n} devices")
        self.local_batch = cfg.data.batch_size // n
        self.n_devices = n
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_apply)

    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        kg, kd, ks = jax.random.split(rng, 3)
        g_params = self.generator.init(kg, sample, ks)
        d_params = self.discriminator.init(kd, sample)
        return VAEGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema={"a2b": jax.tree_util.tree_map(jnp.copy, g_params)},
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(self.cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> VAEGANState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> VAEGANState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return VAEGANState(
            g_params=bc(state_like.g_params), d_params=bc(state_like.d_params),
            g_opt=bc(state_like.g_opt), d_opt=bc(state_like.d_opt),
            ema=bc(state_like.ema), rng=rep, step=rep, ada_p=rep)

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    def _device_step(self, state: VAEGANState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("aug_a", "aug_b", "latent"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)
        x = jnp.concatenate([real_a, real_b], axis=0)

        disc_on = (state.step >= loss_cfg.vq_disc_start).astype(jnp.float32)
        adv_w = loss_cfg.lambda_vq_adv * disc_on
        g_apply = (jax.checkpoint(self.generator.apply) if self._remat == "full"
                   else self.generator.apply)

        # ADA: every image D sees goes through the gated differentiable
        # augmentation pipeline (train/ada.py) — reals and reconstructions
        # (G gets gradients through its copy).
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda v, i: ada.diff_augment(
                v, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda v, i: v

        def g_loss_fn(g_params):
            out = g_apply(g_params, x, keys["latent"])
            rec = L.l1_loss(x, out.recon)
            adv = L.gan_loss_g(
                self.discriminator.apply(state.d_params, T(out.recon, 0)),
                loss_cfg.gan_mode)
            total = rec + self.kl_weight * out.kl + adv_w * adv
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * self.perceptual_fn(x, out.recon)
                total = total + lpips
            return total, {"recon": out.recon, "rec": rec, "kl": out.kl,
                           "g_adv": adv, "lpips": lpips}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, {"a2b": g_params}, cfg.opt.ema_decay)

        fake = jax.lax.stop_gradient(aux["recon"])
        dr, df = T(x, 1), T(fake, 2)

        def d_loss_fn(d_params):
            if cfg.model.fused_applies:
                # real/fake share D params: ONE 2B apply (same math — see
                # ModelConfig.fused_applies; equivalence tested for the
                # CycleGAN/CUT trainers which share this structure)
                r, f = jnp.split(self.discriminator.apply(
                    d_params, jnp.concatenate([dr, df], 0)), 2, 0)
            else:
                r = self.discriminator.apply(d_params, dr)
                f = self.discriminator.apply(d_params, df)
            daux = {}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic(r, loss_cfg.gan_mode)
            return L.gan_loss_d(r, f, loss_cfg.gan_mode), daux

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt_new = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
        d_params_new = optax.apply_updates(state.d_params, d_updates)
        # gate the whole D update during warmup (see vqgan_trainer._select_tree)
        from uig.train.vqgan_trainer import _select_tree

        d_params, d_opt = _select_tree(
            disc_on, (d_params_new, d_opt_new), (state.d_params, state.d_opt))

        # ADA controller: frozen during D warmup (the heuristic would read
        # an untrained D); identical on every device (pmean'd heuristic)
        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            new_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)
            ada_p = jnp.where(disc_on > 0, new_p, state.ada_p)

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss * disc_on, "rec": aux["rec"],
            "kl": aux["kl"], "g_adv": aux["g_adv"], "lpips": aux["lpips"],
            "lr": self._lr(state.step),
        }
        if self._ada:
            metrics["ada_p"] = ada_p
            if loss_cfg.ada_target > 0:
                metrics["ada_rt"] = d_aux["ada_rt"]
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float32),
                                   metrics), axis)
        return state.replace(
            g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt,
            ema=ema, step=state.step + 1, ada_p=ada_p), metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        names = ("g_loss", "d_loss", "rec", "kl", "g_adv", "lpips", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis), P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: VAEGANState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            mean, _ = self.eval_generator.apply(
                params, x.astype(jnp.float32),
                method=VAEGANGenerator.encode)
            return self.eval_generator.apply(
                params, mean, method=VAEGANGenerator.decode)

    def translate(self, ema_params, x, direction: str = "a2b"):
        """Deterministic reconstruction through the posterior mean."""
        return self._eval_step(ema_params["a2b"], x)

    def sample(self, ema_params, rng, n: int):
        """Unconditional generation from the prior."""
        latent_hw = self.cfg.model.image_size // (
            2 ** (len(self.cfg.model.vq_channel_mults) - 1))
        return jax.jit(
            lambda p, r: self.eval_generator.apply(
                p, r, n, latent_hw, method=VAEGANGenerator.sample)
        )(ema_params["a2b"], rng)
