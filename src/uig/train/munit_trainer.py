"""MUNIT trainer — multimodal unpaired translation via content/style codes.

SURVEY.md §0 names the unpaired-translation lineage this framework covers;
the reference repo is an empty stub (/root/reference/README.md:1), so the
recipe follows the canonical MUNIT paper (Huang, Liu, Belongie, Kautz 2018):

  * image recon:    λ_x·L1(x, G(c_x, s_x))                  (λ_x = 10)
  * content recon:  λ_c·L1(c_a, C_b(x_ab))                  (λ_c = 1)
  * style recon:    λ_s·L1(s_b~N(0,I), S_b(x_ab))           (λ_s = 1)
  * adversarial:    D_b judges x_ab = G_b(c_a, s_b~N(0,I))  (multi-scale)
  * optional cycle: λ_cyc·L1(x_a, G_a(C_b(x_ab), s_a))      (λ_cyc = 0)
  (all symmetric in a/b; λ_x = loss.lambda_cycle, λ_c/λ_s/λ_cyc =
  loss.lambda_munit_c/_s/_cyc)

Same TPU-native structure as the other trainers: ONE jitted shard_map
program per step — all generator applies + frozen-D applies, backward,
pmean(grads) over the ``data`` axis, Adam, EMA, then the D update on the
multi-scale PatchGAN — donated state, bf16 compute / fp32 params-losses.
The module is deterministic; style sampling comes from the functional
per-step PRNG, so translate with a FIXED style code is bit-exact by
construction (the serving path takes the style seed / reference image as
an explicit input).
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
from uig.models.munit import MUNITGenerator
from uig.models.patch_disc import MultiScaleDiscriminator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class MUNITState(struct.PyTreeNode):
    g_params: dict  # one MUNITGenerator tree (both domains)
    d_params: dict  # {"a": params, "b": params} (multi-scale)
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # EMA copy of g_params (the serving weights)
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


class MUNITTrainer:
    """Content/style MUNIT: one generator module (both domains), two
    multi-scale PatchGAN discriminators, alternating Adam updates.

    Public surface (same contract as the other trainers):
      init_state(rng)                      -> MUNITState (placed on the mesh)
      train_step(state, batch)             -> (state, metrics) [jitted]
      translate(ema, x, "a2b"|"b2a", style=None, style_rng=None)
          -> translated images [jitted, fp32]. style: explicit (B, S) style
          codes; style_rng: sample styles ~ N(0,I) (multimodal). Default is
          the DETERMINISTIC zero style code — the distribution's mode — so
          CLI translate outputs are reproducible without flags.
    """

    directions = ("a2b", "b2a")

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        if m.fused_applies:
            raise NotImplementedError(
                "model.fused_applies is not supported for kind=munit: the "
                "decoder applies differ in STYLE input per pass, so the "
                "same-params batching identity the knob exploits does not "
                "hold; unset it (the CycleGAN-measured +2% does not "
                "transfer)")
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        kw = dict(
            base_features=m.g_base_features,
            n_content_res=m.munit_content_res,
            style_dim=m.munit_style_dim,
            mlp_dim=m.munit_mlp_dim,
            out_channels=m.out_channels,
            pad_mode=m.padding,
            pad_impl=m.pad_impl,
            conv_impl=m.conv_impl,
            stem_s2d=m.stem_s2d,
            down_s2d=m.down_s2d,
            head_s2d=m.head_s2d, stem_dx_s2d=m.stem_dx_s2d,
        )
        self.generator = MUNITGenerator(
            remat_blocks=self._remat == "blocks", dtype=dt, **kw)
        self.eval_generator = MUNITGenerator(
            dtype=jnp.dtype(m.eval_dtype), **kw)
        self.discriminator = MultiScaleDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers,
            num_scales=m.d_num_scales, norm=m.d_norm, dtype=dt)
        self.style_dim = m.munit_style_dim
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'MUNITTrainer', supported=False)
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
        return MUNITState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema=jax.tree_util.tree_map(jnp.copy, g_params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(self.cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> MUNITState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> MUNITState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return MUNITState(
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
    def _device_step(self, state: MUNITState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G, D = self.generator, self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("aug_a", "aug_b", "style"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)

        lam_x = loss_cfg.lambda_cycle     # image recon (canonical 10)
        lam_c = loss_cfg.lambda_munit_c   # content recon
        lam_s = loss_cfg.lambda_munit_s   # style recon
        lam_cyc = loss_cfg.lambda_munit_cyc

        # remat="full": jax.checkpoint needs array-only positional args, so
        # close over the static domain/method (models/unit.py pattern)
        def _mk(method, dom):
            def f(p, *xs):
                return G.apply(p, *xs, dom, method=method)

            return jax.checkpoint(f) if self._remat == "full" else f

        enc_c = {d: _mk(MUNITGenerator.encode_content, d) for d in ("a", "b")}
        enc_s = {d: _mk(MUNITGenerator.encode_style, d) for d in ("a", "b")}
        dec = {d: _mk(MUNITGenerator.decode, d) for d in ("a", "b")}

        bsz = real_a.shape[0]
        ks_a, ks_b = jax.random.split(keys["style"])
        # target-domain styles sampled from the prior N(0, I) — the
        # multimodal knob; fixed for the whole step
        s_a_rand = jax.random.normal(ks_a, (bsz, self.style_dim), jnp.float32)
        s_b_rand = jax.random.normal(ks_b, (bsz, self.style_dim), jnp.float32)

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
            c_a = enc_c["a"](g_params, real_a)
            s_a = enc_s["a"](g_params, real_a)
            c_b = enc_c["b"](g_params, real_b)
            s_b = enc_s["b"](g_params, real_b)
            # within-domain reconstruction
            recon_a = dec["a"](g_params, c_a, s_a)
            recon_b = dec["b"](g_params, c_b, s_b)
            # cross-domain translation with PRIOR-sampled target styles
            x_ab = dec["b"](g_params, c_a, s_b_rand)
            x_ba = dec["a"](g_params, c_b, s_a_rand)
            # latent reconstruction: re-encode the translations
            c_ab = enc_c["b"](g_params, x_ab)
            s_ab = enc_s["b"](g_params, x_ab)
            c_ba = enc_c["a"](g_params, x_ba)
            s_ba = enc_s["a"](g_params, x_ba)

            adv = (L.gan_loss_g(D.apply(state.d_params["b"], T(x_ab, 0)),
                                loss_cfg.gan_mode)
                   + L.gan_loss_g(D.apply(state.d_params["a"], T(x_ba, 1)),
                                  loss_cfg.gan_mode))
            rec_x = lam_x * (L.l1_loss(real_a, recon_a)
                             + L.l1_loss(real_b, recon_b))
            rec_c = lam_c * (L.l1_loss(c_a, c_ab) + L.l1_loss(c_b, c_ba))
            rec_s = lam_s * (L.l1_loss(s_b_rand, s_ab)
                             + L.l1_loss(s_a_rand, s_ba))
            total = adv + rec_x + rec_c + rec_s
            cyc = jnp.float32(0.0)
            if lam_cyc > 0:
                # explicit cycle through the reconstructed content with the
                # ORIGINAL style (x -> cross -> back)
                x_aba = dec["a"](g_params, c_ab, s_a)
                x_bab = dec["b"](g_params, c_ba, s_b)
                cyc = lam_cyc * (L.l1_loss(real_a, x_aba)
                                 + L.l1_loss(real_b, x_bab))
                total = total + cyc
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * (
                    self.perceptual_fn(real_a, recon_a)
                    + self.perceptual_fn(real_b, recon_b))
                total = total + lpips
            aux = {"x_ab": x_ab, "x_ba": x_ba, "g_adv": adv, "g_rec_x": rec_x,
                   "g_rec_c": rec_c, "g_rec_s": rec_s, "g_cyc": cyc,
                   "g_lpips": lpips}
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, g_params, cfg.opt.ema_decay)

        fake_a = jax.lax.stop_gradient(aux["x_ba"])
        fake_b = jax.lax.stop_gradient(aux["x_ab"])

        # ADA-augmented D inputs; R1 penalizes ∇ at D's ACTUAL input — the
        # augmented reals (the StyleGAN2-ADA formulation)
        dr_a, df_a = T(real_a, 2), T(fake_a, 3)
        dr_b, df_b = T(real_b, 4), T(fake_b, 5)

        def d_loss_fn(d_params):
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
                # multi-scale D: flatten both domains' logit-map tuples
                daux["ada_rt"] = ada.ada_heuristic(
                    tuple(ra) + tuple(rb), loss_cfg.gan_mode)
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
            "g_rec_x": aux["g_rec_x"], "g_rec_c": aux["g_rec_c"],
            "g_rec_s": aux["g_rec_s"], "g_cyc": aux["g_cyc"],
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
        names = ("g_loss", "d_loss", "g_adv", "g_rec_x", "g_rec_c",
                 "g_rec_s", "g_cyc", "g_lpips", "d_a", "d_b", "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis), P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: MUNITState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact for a fixed style code)
    # ------------------------------------------------------------------
    def _eval_apply(self, params, x, style, src: str, dst: str):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(
                params, x.astype(jnp.float32), src, dst,
                style.astype(jnp.float32),
                method=MUNITGenerator.translate)

    def translate(self, ema_params, x, direction: str = "a2b",
                  style=None, style_rng=None):
        """Translate with an explicit ``style`` (B, style_dim), a sampled
        style (``style_rng``), or — default — the zero style code (the prior
        mode; deterministic serving)."""
        if direction not in ("a2b", "b2a"):
            raise ValueError(f"direction must be a2b|b2a, got {direction!r}")
        src, dst = direction[0], direction[-1]
        if style is None:
            if style_rng is not None:
                style = jax.random.normal(
                    style_rng, (x.shape[0], self.style_dim), jnp.float32)
            else:
                style = jnp.zeros((x.shape[0], self.style_dim), jnp.float32)
        return self._eval_step(ema_params, x, style, src=src, dst=dst)

    def encode_style(self, ema_params, x, domain: str):
        """Extract a reference image's style code (style-guided translation:
        pass the result as ``style=`` to translate)."""
        if domain not in ("a", "b"):
            raise ValueError(f"domain must be a|b, got {domain!r}")
        return self.eval_generator.apply(
            ema_params, x.astype(jnp.float32), domain,
            method=MUNITGenerator.encode_style)
