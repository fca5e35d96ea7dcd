"""U-GAT-IT trainer — attention-guided unpaired translation with AdaLIN.

SURVEY.md §0 names the unpaired-translation lineage this framework covers;
the reference repo is an empty stub (/root/reference/README.md:1), so the
recipe follows the published U-GAT-IT paper (Kim et al. 2019) exactly:

  * adversarial (LSGAN): each fake judged by the target domain's GLOBAL
    (7-layer) and LOCAL (5-layer) spectral-normalized PatchGANs, on BOTH
    their patch logits and their CAM logits                      (weight 1)
  * cycle:    λ·L1(x, G_back(G(x)))                              (λ = 10)
  * identity: λ_idt·λ·L1(x, G_same(x))                           (= 10)
  * CAM (generator): BCE so each generator's attention classifier fires on
    its SOURCE domain and not on the other domain's images through the
    identity pass — this is what makes the attention domain-discriminative
                                                                 (λ_cam = 1000)
  * ρ-clipping: every AdaLIN/ILN blend parameter is clipped to [0, 1] after
    each optimizer step (the published RhoClipper), applied to the EMA too.

TPU-native structure (house pattern): ONE jitted shard_map program per step
— all 6 generator applies, 12 discriminator applies, both backwards,
pmean(grads) over the ``data`` axis, Adam(+weight-decay), EMA, ρ-clip —
donated state, bf16 compute / fp32 params-losses. Spectral norm is
functional: the power-iteration vectors live in the train state (``d_sn``)
and advance exactly once per step on the D-loss real passes, so resume is
bit-exact and there are no hidden buffers.
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
from uig.models.ugatit import UGATITDiscriminator, UGATITGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer

# the four discriminators: (key, judged domain, global?) — "ga" = global
# D over domain a, "la" = local D over domain a, etc.
_D_KEYS = (("ga", "a", True), ("la", "a", False),
           ("gb", "b", True), ("lb", "b", False))


def _bce_logits(logits: jax.Array, target: float) -> jax.Array:
    """Mean BCE-with-logits vs a constant 0/1 target:
    softplus(l) − t·l == −[t·logσ(l) + (1−t)·log(1−σ(l))]."""
    l = logits.astype(jnp.float32)
    return jnp.mean(jax.nn.softplus(l) - target * l)


def clip_rho(params):
    """The published RhoClipper: clamp every AdaLIN/ILN blend parameter
    (leaf name "rho") to [0, 1] after the optimizer step."""

    def f(path, leaf):
        if path and getattr(path[-1], "key", None) == "rho":
            return jnp.clip(leaf, 0.0, 1.0)
        return leaf

    return jax.tree_util.tree_map_with_path(f, params)


class UGATITState(struct.PyTreeNode):
    g_params: dict  # {"a2b", "b2a"}: UGATITGenerator params
    d_params: dict  # {"ga", "la", "gb", "lb"}: discriminator params
    d_sn: dict      # {"ga", ...}: spectral-norm power-iteration vectors
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # EMA copy of g_params (the serving weights)
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


class UGATITTrainer:
    """Two attention generators + four spectral-norm CAM discriminators.

    Public surface (same contract as the other trainers):
      init_state(rng)             -> UGATITState (placed on the mesh)
      train_step(state, batch)    -> (state, metrics) [jitted]
      translate(ema, x, "a2b")    -> translated images [jitted, fp32]
    """

    directions = ("a2b", "b2a")

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        # model.fused_applies batches each generator's translate+identity
        # passes at 2B and each discriminator's real+fake passes at 2B —
        # every per-example op (IN/AdaLIN moments, CAM pools, γ/β MLP) makes
        # the batching identity exact, and the per-pass CAM logits come back
        # out of a split. The SN power iteration is input-independent given
        # W, so one update on the combined pass is the same one update.
        self._fuse = m.fused_applies
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        gkw = dict(
            base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks,
            out_channels=m.out_channels,
            pad_mode=m.padding,
            pad_impl=m.pad_impl,
            conv_impl=m.conv_impl,
            stem_s2d=m.stem_s2d,
            down_s2d=m.down_s2d,
            head_s2d=m.head_s2d, stem_dx_s2d=m.stem_dx_s2d,
        )
        self.generator = UGATITGenerator(
            remat_blocks=self._remat == "blocks", dtype=dt, **gkw)
        self.eval_generator = UGATITGenerator(
            dtype=jnp.dtype(m.eval_dtype), **gkw)
        self.d_global = UGATITDiscriminator(
            base_features=m.d_base_features,
            n_layers=m.ugatit_d_global_layers, dtype=dt)
        self.d_local = UGATITDiscriminator(
            base_features=m.d_base_features,
            n_layers=m.ugatit_d_local_layers, dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'UGATITTrainer', supported=False)
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
        self._eval_step = jax.jit(self._eval_apply)

    def _disc(self, key: str) -> UGATITDiscriminator:
        return self.d_global if key.startswith("g") else self.d_local

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        kab, kba, *dks = jax.random.split(rng, 6)
        g_params = {
            "a2b": self.generator.init(kab, sample),
            "b2a": self.generator.init(kba, sample),
        }
        d_params, d_sn = {}, {}
        for (key, _, _), dk in zip(_D_KEYS, dks):
            v = self._disc(key).init(dk, sample)
            d_params[key] = {"params": v["params"]}
            d_sn[key] = v["sn"]
        return UGATITState(
            g_params=g_params,
            d_params=d_params,
            d_sn=d_sn,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema=jax.tree_util.tree_map(jnp.copy, g_params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> UGATITState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> UGATITState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return UGATITState(
            g_params=bc(state_like.g_params), d_params=bc(state_like.d_params),
            d_sn=bc(state_like.d_sn), g_opt=bc(state_like.g_opt),
            d_opt=bc(state_like.d_opt), ema=bc(state_like.ema), rng=rep,
            step=rep, ada_p=rep)

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------
    def _device_step(self, state: UGATITState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G = self.generator
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

        lam = loss_cfg.lambda_cycle
        lam_idt = lam * loss_cfg.lambda_identity
        lam_cam = loss_cfg.lambda_cam

        # remat="full": jax.checkpoint needs array-only positional args
        g_apply = (jax.checkpoint(G.apply) if self._remat == "full"
                   else G.apply)

        def d_frozen(key, d_params, x):
            """Frozen-SN discriminator apply -> (patch logits, cam logits)."""
            out = self._disc(key).apply(
                {"params": d_params[key]["params"], "sn": state.d_sn[key]},
                x, False)
            return out[0], out[1]

        # ADA: every image D sees goes through the gated differentiable
        # augmentation pipeline (train/ada.py); G gets gradients through it.
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        # ---------------- G update (both generators, one optimizer) --------
        def g_loss_fn(g_params):
            if self._fuse:
                # translate+identity per generator as ONE 2B apply; cycle
                # passes depend on stage-1 outputs so they stay 1B
                out_b, cam_b, _ = g_apply(
                    g_params["a2b"], jnp.concatenate([real_a, real_b], 0))
                fake_b, idt_b = jnp.split(out_b, 2, 0)
                cam_ab, cam_bb = jnp.split(cam_b, 2, 0)
                out_a, cam_a, _ = g_apply(
                    g_params["b2a"], jnp.concatenate([real_b, real_a], 0))
                fake_a, idt_a = jnp.split(out_a, 2, 0)
                cam_ba, cam_aa = jnp.split(cam_a, 2, 0)
            else:
                fake_b, cam_ab, _ = g_apply(g_params["a2b"], real_a)
                fake_a, cam_ba, _ = g_apply(g_params["b2a"], real_b)
                idt_a, cam_aa, _ = g_apply(g_params["b2a"], real_a)
                idt_b, cam_bb, _ = g_apply(g_params["a2b"], real_b)
            rec_a, _, _ = g_apply(g_params["b2a"], fake_b)
            rec_b, _, _ = g_apply(g_params["a2b"], fake_a)

            adv = jnp.float32(0.0)
            tfa, tfb = T(fake_a, 0), T(fake_b, 1)
            for key, dom, _ in _D_KEYS:
                logit, cam = d_frozen(key, state.d_params,
                                      tfa if dom == "a" else tfb)
                adv = adv + (L.gan_loss_g(logit, loss_cfg.gan_mode)
                             + L.gan_loss_g(cam, loss_cfg.gan_mode))
            cyc = lam * (L.cycle_loss(real_a, rec_a)
                         + L.cycle_loss(real_b, rec_b))
            idt = lam_idt * (L.l1_loss(real_a, idt_a)
                             + L.l1_loss(real_b, idt_b))
            # CAM: each generator's attention classifier fires on its source
            # domain (translation input -> 1) and not on the target domain
            # (identity input -> 0)
            cam_loss = lam_cam * (
                _bce_logits(cam_ab, 1.0) + _bce_logits(cam_bb, 0.0)
                + _bce_logits(cam_ba, 1.0) + _bce_logits(cam_aa, 0.0))
            total = adv + cyc + idt + cam_loss
            lpips = jnp.float32(0.0)
            if loss_cfg.lambda_lpips > 0 and self.perceptual_fn is not None:
                lpips = loss_cfg.lambda_lpips * (
                    self.perceptual_fn(real_a, rec_a)
                    + self.perceptual_fn(real_b, rec_b))
                total = total + lpips
            aux = {"fake_a": fake_a, "fake_b": fake_b, "g_adv": adv,
                   "g_cycle": cyc, "g_idt": idt, "g_cam": cam_loss,
                   "g_lpips": lpips}
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = clip_rho(optax.apply_updates(state.g_params, g_updates))
        ema = ema_update(state.ema, g_params, cfg.opt.ema_decay)

        fake_a = jax.lax.stop_gradient(aux["fake_a"])
        fake_b = jax.lax.stop_gradient(aux["fake_b"])

        # ADA-augmented D inputs; R1 penalizes ∇ at D's ACTUAL input — the
        # augmented reals (the StyleGAN2-ADA formulation)
        dr = {"a": T(real_a, 2), "b": T(real_b, 3)}
        df = {"a": T(fake_a, 4), "b": T(fake_b, 5)}

        # ---------------- D update (all four, one optimizer) ---------------
        def d_loss_fn(d_params):
            total = jnp.float32(0.0)
            cam_total = jnp.float32(0.0)
            r1 = jnp.float32(0.0)
            new_sn = {}
            real_logits = []
            for key, dom, _ in _D_KEYS:
                D = self._disc(key)
                if self._fuse:
                    # real+fake as ONE 2B apply; the power iteration is
                    # input-independent given W, so advancing it on the
                    # combined pass IS the once-per-step update
                    (logit, cam, _), upd = D.apply(
                        {"params": d_params[key]["params"],
                         "sn": state.d_sn[key]},
                        jnp.concatenate([dr[dom], df[dom]], 0), True,
                        mutable=["sn"])
                    r_logit, f_logit = jnp.split(logit, 2, 0)
                    r_cam, f_cam = jnp.split(cam, 2, 0)
                else:
                    # the real pass advances the SN power iteration (once
                    # per step per discriminator)
                    (r_logit, r_cam, _), upd = D.apply(
                        {"params": d_params[key]["params"],
                         "sn": state.d_sn[key]},
                        dr[dom], True, mutable=["sn"])
                    f_logit, f_cam, _ = D.apply(
                        {"params": d_params[key]["params"],
                         "sn": state.d_sn[key]}, df[dom], False)
                new_sn[key] = jax.lax.stop_gradient(upd["sn"])
                total = total + L.gan_loss_d(r_logit, f_logit,
                                             loss_cfg.gan_mode)
                cam_total = cam_total + L.gan_loss_d(r_cam, f_cam,
                                                     loss_cfg.gan_mode)
                real_logits.append(r_logit)
                if loss_cfg.r1_gamma > 0:
                    r1 = r1 + L.r1_penalty(
                        lambda p, x, _k=key, _D=D: _D.apply(
                            {"params": p["params"], "sn": state.d_sn[_k]},
                            x, False)[0],
                        d_params[key], dr[dom])
            total = total + cam_total
            if loss_cfg.r1_gamma > 0:
                r1 = loss_cfg.r1_gamma * r1
                total = total + r1
            daux = {"d_cam": cam_total, "d_r1": r1, "sn": new_sn}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic(tuple(real_logits),
                                                   loss_cfg.gan_mode)
            return total, daux

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        # SN vectors advance from data-independent power iteration on the
        # (pmean'd-grad) replicated weights — identical on every device
        d_sn = d_aux["sn"]

        # ADA controller: identical on every device (pmean'd heuristic)
        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss, "g_adv": aux["g_adv"],
            "g_cycle": aux["g_cycle"], "g_idt": aux["g_idt"],
            "g_cam": aux["g_cam"], "g_lpips": aux["g_lpips"],
            "d_cam": d_aux["d_cam"], "d_r1": d_aux["d_r1"],
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
            g_params=g_params, d_params=d_params, d_sn=d_sn, g_opt=g_opt,
            d_opt=d_opt, ema=ema, step=state.step + 1, ada_p=ada_p), metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        names = ("g_loss", "d_loss", "g_adv", "g_cycle", "g_idt", "g_cam",
                 "g_lpips", "d_cam", "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis), P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: UGATITState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact serving path)
    # ------------------------------------------------------------------
    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(
                params, x.astype(jnp.float32),
                method=UGATITGenerator.translate)

    def translate(self, ema_params, x, direction: str = "a2b"):
        if direction not in ("a2b", "b2a"):
            raise ValueError(f"direction must be a2b|b2a, got {direction!r}")
        return self._eval_step(ema_params[direction], x)

    def attention_heatmap(self, ema_params, x, direction: str = "a2b"):
        """The CAM attention heatmap for an input batch (B, H/4, W/4, 1) —
        the interpretability surface the paper ships."""
        if direction not in ("a2b", "b2a"):
            raise ValueError(f"direction must be a2b|b2a, got {direction!r}")
        return self.eval_generator.apply(
            ema_params[direction], x.astype(jnp.float32))[2]
