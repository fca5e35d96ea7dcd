"""UNIT trainer — shared-latent VAE-GAN pair for unpaired translation.

SURVEY.md §0 names the lineage this framework covers ("CycleGAN / CUT /
UNIT / DiscoGAN"); the reference repo is an empty stub
(/root/reference/README.md:1), so the recipe follows the canonical UNIT
paper (Liu, Breuel, Kautz 2017):

  * within-domain VAE terms:   λ_rec·L1(x, G(E(x)+ε)) + λ_kl·KL(q(z|x)‖p)
  * cross-domain GAN terms:    D_b judges G_b(E_a(x_a)+ε), symmetric for a
  * cycle-consistency VAE:     λ_cc·L1(x_a, G_a(E_b(x_ab)+ε)) + λ_kl·KL
  (posterior is N(mu, I) ⇒ KL reduces to ½·mean(mu²); ε ~ N(0, I))

λ_rec = λ_cc = loss.lambda_cycle (the canonical UNIT config uses the same
weight, 10, for both); λ_kl = loss.lambda_unit_kl (0.01).

Same TPU-native structure as the other trainers: ONE jitted shard_map
program per step — all ten generator applies (2 encode + 4 decode + 2
cycle encode + 2 cycle decode) + 2 frozen-D applies, backward,
pmean(grads) over the ``data`` axis, Adam, EMA, then the D update —
donated state, bf16 compute / fp32 params-losses-optimizer. The module is
deterministic; reparameterization noise comes from the functional per-step
PRNG, so translate (posterior mean) is bit-exact by construction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from uig.config import Config
from uig.config.config import remat_mode
from uig.kernels.augment import augment
from uig.models.patch_disc import PatchDiscriminator
from uig.models.unit import UNITGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class UNITState(struct.PyTreeNode):
    g_params: dict  # one UNITGenerator tree (both domains + shared latent)
    d_params: dict  # {"a": params, "b": params}
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # EMA copy of g_params (the serving weights)
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


def _unit_kl(mu: jax.Array) -> jax.Array:
    """KL(N(mu, I) ‖ N(0, I)) per latent element = ½·mean(mu²)."""
    return 0.5 * jnp.mean(jnp.square(mu.astype(jnp.float32)))


class UNITTrainer:
    """Shared-latent UNIT: one generator module (both domains), 2 PatchGAN
    discriminators, alternating Adam updates.

    Public surface (same contract as CycleGANTrainer):
      init_state(rng)                    -> UNITState (placed on the mesh)
      train_step(state, batch)           -> (state, metrics) [jitted, donating]
      translate(ema, x, "a2b"|"b2a")     -> translated images [jitted, fp32]
    """

    directions = ("a2b", "b2a")

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        kw = dict(
            base_features=m.g_base_features,
            n_private_res=m.unit_private_res,
            n_shared_res=m.unit_shared_res,
            out_channels=m.out_channels,
            norm=m.norm,
            pad_mode=m.padding,
            pad_impl=m.pad_impl,
            conv_impl=m.conv_impl,
            stem_s2d=m.stem_s2d,
            down_s2d=m.down_s2d,
            head_s2d=m.head_s2d, stem_dx_s2d=m.stem_dx_s2d,
            upsample=m.upsample,
        )
        self.generator = UNITGenerator(
            remat_blocks=self._remat == "blocks", dtype=dt, **kw)
        self.eval_generator = UNITGenerator(
            dtype=jnp.dtype(m.eval_dtype), **kw)
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'UNITTrainer', supported=False)
        self._ada = ada.ada_enabled(cfg.loss)
        self._ada_ops = ada.parse_ada_ops(cfg.loss.ada_ops) if self._ada else ()
        if cfg.loss.ada_target > 0 and cfg.loss.gan_mode == "wgan":
            raise ValueError(
                "loss.ada_target needs a GAN mode with a decision boundary; "
                "use fixed-p DiffAugment (ada_p_init>0, ada_target=0) with wgan")

        n = mesh.devices.size
        if cfg.data.batch_size % n:
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by "
                f"{n} devices")
        self.local_batch = cfg.data.batch_size // n
        self.n_devices = n
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_apply,
                                  static_argnames=("src", "dst"))

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        kg, kda, kdb = jax.random.split(rng, 3)
        g_params = self.generator.init(kg, sample, sample)
        d_params = {
            "a": self.discriminator.init(kda, sample),
            "b": self.discriminator.init(kdb, sample),
        }
        return UNITState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema=jax.tree_util.tree_map(jnp.copy, g_params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(self.cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> UNITState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> UNITState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return UNITState(
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

    # ------------------------------------------------------------------
    def _device_step(self, state: UNITState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G, D = self.generator, self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("aug_a", "aug_b", "eps"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)

        lam_rec = loss_cfg.lambda_cycle      # within-domain VAE recon weight
        lam_cc = loss_cfg.lambda_cycle       # cycle-consistency recon weight
        lam_kl = loss_cfg.lambda_unit_kl     # all four KL terms

        # remat="full": jax.checkpoint must see array-only positional args,
        # so close over the static domain/method instead of passing them
        # through (the CUT trainer's _gen_apply pattern, cut.py)
        def _mk(dom, method):
            def f(p, x):
                return G.apply(p, x, dom, method=method)

            return jax.checkpoint(f) if self._remat == "full" else f

        enc_fns = {d: _mk(d, UNITGenerator.encode) for d in ("a", "b")}
        dec_fns = {d: _mk(d, UNITGenerator.decode) for d in ("a", "b")}

        def enc(p, x, dom):
            return enc_fns[dom](p, x)

        def dec(p, z, dom):
            return dec_fns[dom](p, z)

        # one eps key per sampling site, fixed for the whole step
        eps_keys = jax.random.split(keys["eps"], 4)

        fuse = cfg.model.fused_applies

        # ADA: every image D sees goes through the gated differentiable
        # augmentation pipeline (train/ada.py) — reals, fakes, and the fakes
        # in the G adversarial terms (G gets gradients through it).
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        def g_loss_fn(g_params):
            mu_a = enc(g_params, real_a, "a")
            mu_b = enc(g_params, real_b, "b")
            z_a = mu_a + jax.random.normal(eps_keys[0], mu_a.shape, jnp.float32)
            z_b = mu_b + jax.random.normal(eps_keys[1], mu_b.shape, jnp.float32)
            if fuse:
                # each private decoder serves TWO latents per step (its
                # domain's reconstruction + the cross-domain translation) —
                # same params, so run each decoder ONCE at 2B (InstanceNorm
                # is per-example; same math up to conv-batch reassociation)
                recon_a, x_ba = jnp.split(dec(
                    g_params, jnp.concatenate([z_a, z_b], 0), "a"), 2, 0)
                recon_b, x_ab = jnp.split(dec(
                    g_params, jnp.concatenate([z_b, z_a], 0), "b"), 2, 0)
            else:
                recon_a = dec(g_params, z_a, "a")
                recon_b = dec(g_params, z_b, "b")
                x_ab = dec(g_params, z_a, "b")
                x_ba = dec(g_params, z_b, "a")
            # cycle: re-encode the translation, sample, decode back
            mu_ab = enc(g_params, x_ab, "b")
            mu_ba = enc(g_params, x_ba, "a")
            z_ab = mu_ab + jax.random.normal(eps_keys[2], mu_ab.shape,
                                             jnp.float32)
            z_ba = mu_ba + jax.random.normal(eps_keys[3], mu_ba.shape,
                                             jnp.float32)
            x_aba = dec(g_params, z_ab, "a")
            x_bab = dec(g_params, z_ba, "b")

            adv = (L.gan_loss_g(D.apply(state.d_params["b"], T(x_ab, 0)),
                                loss_cfg.gan_mode)
                   + L.gan_loss_g(D.apply(state.d_params["a"], T(x_ba, 1)),
                                  loss_cfg.gan_mode))
            rec = lam_rec * (L.l1_loss(real_a, recon_a)
                             + L.l1_loss(real_b, recon_b))
            cyc = lam_cc * (L.l1_loss(real_a, x_aba)
                            + L.l1_loss(real_b, x_bab))
            kl = lam_kl * (_unit_kl(mu_a) + _unit_kl(mu_b)
                           + _unit_kl(mu_ab) + _unit_kl(mu_ba))
            total = adv + rec + cyc + kl
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * (
                    self.perceptual_fn(real_a, recon_a)
                    + self.perceptual_fn(real_b, recon_b))
                total = total + lpips
            aux = {"x_ab": x_ab, "x_ba": x_ba, "g_adv": adv, "g_rec": rec,
                   "g_cc": cyc, "g_kl": kl, "g_lpips": lpips}
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, g_params, cfg.opt.ema_decay)

        fake_a = jax.lax.stop_gradient(aux["x_ba"])
        fake_b = jax.lax.stop_gradient(aux["x_ab"])

        # ADA-augmented D inputs; R1 penalizes ∇ at D's ACTUAL input — the
        # augmented reals (the StyleGAN2-ADA formulation)
        dr_a, df_a = T(real_a, 2), T(fake_a, 3)
        dr_b, df_b = T(real_b, 4), T(fake_b, 5)

        def d_loss_fn(d_params):
            if cfg.model.fused_applies:
                # real/fake share D params — ONE 2B apply per D (same math;
                # see ModelConfig.fused_applies)
                ra, fa = jnp.split(D.apply(
                    d_params["a"], jnp.concatenate([dr_a, df_a], 0)), 2, 0)
                rb, fb = jnp.split(D.apply(
                    d_params["b"], jnp.concatenate([dr_b, df_b], 0)), 2, 0)
            else:
                ra = D.apply(d_params["a"], dr_a)
                fa = D.apply(d_params["a"], df_a)
                rb = D.apply(d_params["b"], dr_b)
                fb = D.apply(d_params["b"], df_b)
            la = L.gan_loss_d(ra, fa, loss_cfg.gan_mode)
            lb = L.gan_loss_d(rb, fb, loss_cfg.gan_mode)
            total = la + lb
            r1 = jnp.float32(0.0)
            if loss_cfg.r1_gamma > 0:
                r1 = loss_cfg.r1_gamma * (
                    L.r1_penalty(D.apply, d_params["a"], dr_a)
                    + L.r1_penalty(D.apply, d_params["b"], dr_b))
                total = total + r1
            daux = {"d_a": la, "d_b": lb, "d_r1": r1}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic((ra, rb), loss_cfg.gan_mode)
            return total, daux

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ADA controller: identical on every device (pmean'd heuristic)
        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss, "g_adv": aux["g_adv"],
            "g_rec": aux["g_rec"], "g_cc": aux["g_cc"], "g_kl": aux["g_kl"],
            "g_lpips": aux["g_lpips"], "d_a": d_aux["d_a"],
            "d_b": d_aux["d_b"], "d_r1": d_aux["d_r1"],
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
        names = ("g_loss", "d_loss", "g_adv", "g_rec", "g_cc", "g_kl",
                 "g_lpips", "d_a", "d_b", "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis), P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: UNITState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact path): posterior mean, no noise
    # ------------------------------------------------------------------
    def _eval_apply(self, params, x, src: str, dst: str):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(
                params, x.astype(jnp.float32), src, dst,
                method=UNITGenerator.translate)

    def translate(self, ema_params, x, direction: str = "a2b"):
        if direction not in ("a2b", "b2a"):
            raise ValueError(f"direction must be a2b|b2a, got {direction!r}")
        src, dst = direction[0], direction[-1]
        return self._eval_step(ema_params, x, src=src, dst=dst)
