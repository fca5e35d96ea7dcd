"""CycleGAN trainer — the hot path (SURVEY.md §2 "CycleGAN trainer", §3 stack 2).

TPU-native structure:

  * ONE jitted XLA program per training step: G forward (4 generator + 2
    frozen-D applies) → G backward → pmean(grads) over the ``data`` mesh axis
    (ICI collective) → Adam → EMA → replay-pool gather/scatter → D forward/
    backward → pmean → Adam. Zero host round-trips inside the step; the only
    host↔device traffic in steady state is the input batch in and throttled
    scalar metrics out (SURVEY.md §3 stack 1).
  * ``shard_map`` over a 1-D mesh: params/opt/EMA replicated, batch + replay
    pools sharded on the leading axis. Gradients reduce with
    ``jax.lax.pmean(_, "data")`` — the DP collective rides ICI within a
    slice and DCN across hosts, inserted by XLA.
  * state buffers are donated (``donate_argnums=0``) so 2G+2D+opt+EMA+pools
    fit HBM at 256²/512² (SURVEY.md §7 "Donation/aliasing").
  * model compute in bf16 (MXU native), losses/stats/optimizer in fp32.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from uig.config import Config
from uig.config.config import remat_mode
from uig.kernels.augment import augment
from uig.models import PatchDiscriminator, ResNetGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import losses as L
from uig.train import ada
from uig.train.ema import ema_update
from uig.train.microbatch import microbatch_value_and_grad, validate_grad_accum
from uig.train.pool import ImagePool, PoolState
from uig.train.state import CycleGANState, lr_schedule, make_optimizer


class CycleGANTrainer:
    """2 generators (A→B, B→A) + 2 discriminators, alternating Adam updates.

    Public surface:
      init_state(rng)            -> CycleGANState (placed on the mesh)
      train_step(state, batch)   -> (state, metrics)   [jitted, donating]
      eval_step(params, x, a2b)  -> translated images  [jitted, fp32]
    """

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        self.generator = ResNetGenerator(
            out_channels=m.out_channels,
            base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks,
            norm=m.norm,
            pad_mode=m.padding,
            upsample=m.upsample, resample=m.resample,
            head_s2d=m.head_s2d,
            stem_s2d=m.stem_s2d, stem_dx_s2d=m.stem_dx_s2d,
            down_s2d=m.down_s2d,
            remat_blocks=self._remat == "blocks",
            conv_impl=m.conv_impl, pad_impl=m.pad_impl,
            convin_pallas=m.convin_pallas,
            dtype=dt,
        )
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt,
        )
        self.eval_generator = ResNetGenerator(
            out_channels=m.out_channels,
            base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks,
            norm=m.norm,
            pad_mode=m.padding,
            upsample=m.upsample, resample=m.resample,
            head_s2d=m.head_s2d,
            stem_s2d=m.stem_s2d, stem_dx_s2d=m.stem_dx_s2d,
            down_s2d=m.down_s2d,
            conv_impl=m.conv_impl, pad_impl=m.pad_impl,
            dtype=jnp.dtype(m.eval_dtype),
        )
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.pool = ImagePool(cfg.opt.pool_size)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
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
                f"{n} devices"
            )
        self.local_batch = cfg.data.batch_size // n
        self.n_devices = n
        self._grad_accum = validate_grad_accum(
            cfg, "CycleGANTrainer", supported=True,
            local_batch=self.local_batch)
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_apply, static_argnames=("a2b",))

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> CycleGANState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> CycleGANState:
        """Broadcast the per-field specs over the actual pytree structure."""
        rep = P()
        shard0 = P(self.axis)

        def bc(spec, subtree):
            return jax.tree_util.tree_map(lambda _: spec, subtree)

        return CycleGANState(
            g_params=bc(rep, state_like.g_params),
            d_params=bc(rep, state_like.d_params),
            g_opt=bc(rep, state_like.g_opt),
            d_opt=bc(rep, state_like.d_opt),
            ema=bc(rep, state_like.ema),
            pool_a=PoolState(buffer=shard0, count=rep),
            pool_b=PoolState(buffer=shard0, count=rep),
            rng=rep,
            step=rep,
            ada_p=rep,
        )

    def state_shardings(self):
        from jax.sharding import NamedSharding

        rng = jax.random.PRNGKey(0)
        abstract = jax.eval_shape(self._abstract_state, rng)
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )

    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        ka, kb, kda, kdb = jax.random.split(rng, 4)
        g_params = {
            "a2b": self.generator.init(ka, sample),
            "b2a": self.generator.init(kb, sample),
        }
        d_params = {
            "a": self.discriminator.init(kda, sample),
            "b": self.discriminator.init(kdb, sample),
        }
        pool_dtype = jnp.dtype(cfg.model.compute_dtype)
        img_shape = (hw, hw, cfg.model.out_channels)
        global_pool = ImagePool(cfg.opt.pool_size * self.n_devices)
        return CycleGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            # copy (not alias) g_params: the state pytree is donated, and
            # aliased buffers cannot be donated twice
            ema=jax.tree_util.tree_map(jnp.copy, g_params),
            pool_a=global_pool.init(img_shape, pool_dtype),
            pool_b=global_pool.init(img_shape, pool_dtype),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32),
        )

    # ------------------------------------------------------------------
    # the per-device step (runs under shard_map)
    # ------------------------------------------------------------------
    def _device_step(self, state: CycleGANState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G, D = self.generator, self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("pool_a", "pool_b", "aug_a", "aug_b"))

        # On-device fused augmentation: raw uint8 (B, load, load, C) batches
        # are cropped/flipped/normalized INSIDE this XLA program — the north
        # star's "input pipeline moves on-device" clause. Float batches are
        # assumed pre-augmented (tests / custom pipelines).
        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)

        lam = loss_cfg.lambda_cycle
        lam_id = loss_cfg.lambda_identity * lam
        # optional remat: recompute generator forwards in the backward pass
        # (HBM for FLOPs — needed for 512²/large-batch HBM fits).
        # "blocks" granularity lives inside the generator (remat_blocks).
        g_apply = jax.checkpoint(G.apply) if self._remat == "full" else G.apply

        fuse = cfg.model.fused_applies

        # ADA: every image D sees goes through the gated differentiable
        # augmentation pipeline (train/ada.py) — reals, pool fakes, and the
        # fakes in the G loss (G gets gradients through it). Fresh per-use
        # keys derive from the step key so the step stays deterministic.
        # Under grad_accum>1 each microbatch folds its scan index in so the
        # per-image draws stay independent across microbatches (identical
        # distribution; values match grad_accum=1 only when ADA is off).
        k_accum = self._grad_accum
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)

            def make_T(mb_i):
                key = ada_key if k_accum == 1 else \
                    jax.random.fold_in(ada_key, mb_i)
                return lambda x, i: ada.diff_augment(
                    x, jax.random.fold_in(key, i), state.ada_p,
                    self._ada_ops)
        else:
            def make_T(mb_i):
                return lambda x, i: x

        T = make_T(jnp.int32(0))

        # ---------------- G update ----------------
        def g_loss_fn(g_params, mb, mb_i):
            real_a, real_b = mb
            T = make_T(mb_i)
            idt_a = idt_b = None
            if fuse and lam_id > 0:
                # fake and identity passes share params — run each
                # generator ONCE at 2B (InstanceNorm is per-example, so
                # batching is the same math; see ModelConfig.fused_applies)
                fb, idt_b = jnp.split(
                    g_apply(g_params["a2b"],
                            jnp.concatenate([real_a, real_b], 0)), 2, 0)
                fa, idt_a = jnp.split(
                    g_apply(g_params["b2a"],
                            jnp.concatenate([real_b, real_a], 0)), 2, 0)
                fake_b, fake_a = fb, fa
            else:
                fake_b = g_apply(g_params["a2b"], real_a)
                fake_a = g_apply(g_params["b2a"], real_b)
            rec_a = g_apply(g_params["b2a"], fake_b)
            rec_b = g_apply(g_params["a2b"], fake_a)

            adv = (
                L.gan_loss_g(D.apply(state.d_params["b"], T(fake_b, 0)),
                             loss_cfg.gan_mode)
                + L.gan_loss_g(D.apply(state.d_params["a"], T(fake_a, 1)),
                               loss_cfg.gan_mode)
            )
            cyc = lam * (L.cycle_loss(real_a, rec_a) + L.cycle_loss(real_b, rec_b))
            total = adv + cyc
            idt = jnp.float32(0.0)
            if lam_id > 0:
                if idt_b is None:
                    idt_b = g_apply(g_params["a2b"], real_b)
                    idt_a = g_apply(g_params["b2a"], real_a)
                idt = lam_id * (
                    L.identity_loss(real_b, idt_b) + L.identity_loss(real_a, idt_a)
                )
                total = total + idt
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * (
                    self.perceptual_fn(real_a, rec_a)
                    + self.perceptual_fn(real_b, rec_b)
                )
                total = total + lpips
            aux = {
                "fake_a": fake_a,
                "fake_b": fake_b,
                "g_adv": adv,
                "g_cycle": cyc,
                "g_idt": idt,
                "g_lpips": lpips,
            }
            return total, aux

        (g_loss, aux), g_grads = microbatch_value_and_grad(
            g_loss_fn, state.g_params, (real_a, real_b), k_accum)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, g_params, cfg.opt.ema_decay)

        # ---------------- replay pools ----------------
        pool_a, d_fake_a = self.pool.query(state.pool_a, aux["fake_a"], keys["pool_a"])
        pool_b, d_fake_b = self.pool.query(state.pool_b, aux["fake_b"], keys["pool_b"])

        # ---------------- D update ----------------
        # ADA-augmented D inputs (pure functions of the step key, so they
        # hoist out of the grad): reals and pool fakes each get independent
        # augmentation draws; R1 penalizes ∇ at D's ACTUAL input — the
        # augmented reals (the StyleGAN2-ADA formulation).
        dr_a, df_a = T(real_a, 2), T(d_fake_a, 3)
        dr_b, df_b = T(real_b, 4), T(d_fake_b, 5)

        def d_loss_fn(d_params, mb, mb_i):
            del mb_i  # D inputs were augmented at full batch above
            dr_a, df_a, dr_b, df_b = mb
            if fuse:
                ra, fa = jnp.split(
                    D.apply(d_params["a"],
                            jnp.concatenate([dr_a, df_a], 0)), 2, 0)
                rb, fb = jnp.split(
                    D.apply(d_params["b"],
                            jnp.concatenate([dr_b, df_b], 0)), 2, 0)
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
            aux = {"d_a": la, "d_b": lb, "d_r1": r1}
            if loss_cfg.ada_target > 0:
                aux["ada_rt"] = ada.ada_heuristic((ra, rb), loss_cfg.gan_mode)
            return total, aux

        (d_loss, d_aux), d_grads = microbatch_value_and_grad(
            d_loss_fn, state.d_params, (dr_a, df_a, dr_b, df_b), k_accum)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ADA controller: identical on every device (pmean'd heuristic).
        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "g_adv": aux["g_adv"],
            "g_cycle": aux["g_cycle"],
            "g_idt": aux["g_idt"],
            "g_lpips": aux["g_lpips"],
            "d_a": d_aux["d_a"],
            "d_b": d_aux["d_b"],
            "d_r1": d_aux["d_r1"],
            "lr": self._lr(state.step),
        }
        if self._ada:
            metrics["ada_p"] = ada_p
            if loss_cfg.ada_target > 0:
                metrics["ada_rt"] = d_aux["ada_rt"]
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), metrics),
            axis,
        )
        new_state = state.replace(
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            ema=ema,
            pool_a=pool_a,
            pool_b=pool_b,
            step=state.step + 1,
            ada_p=ada_p,
        )
        return new_state, metrics

    def _build_train_step(self):
        rng = jax.random.PRNGKey(0)
        abstract = jax.eval_shape(self._abstract_state, rng)
        specs = self._specs_for(abstract)
        batch_spec = P(self.axis)
        metric_names = (
            "g_loss", "d_loss", "g_adv", "g_cycle", "g_idt", "g_lpips",
            "d_a", "d_b", "d_r1", "lr",
        )
        if self._ada:
            metric_names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                metric_names += ("ada_rt",)
        out_metric_specs = {k: P() for k in metric_names}

        shmapped = jax.shard_map(
            self._device_step,
            mesh=self.mesh,
            in_specs=(specs, batch_spec, batch_spec),
            out_specs=(specs, out_metric_specs),
            check_vma=False,
        )
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: CycleGANState, batch):
        """batch: (real_a, real_b), float images in [-1,1], leading axis
        sharded over the data mesh axis."""
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact path)
    # ------------------------------------------------------------------
    def _eval_apply(self, params, x, a2b: bool = True):
        del a2b  # direction is picked by which params the caller passes
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(params, x.astype(jnp.float32))

    def translate(self, ema_params, x, direction: str = "a2b"):
        """Translate images with EMA weights — the serving path."""
        p = ema_params[direction]
        return self._eval_step(p, x)
