"""NICE-GAN trainer — encoder reuse + decoupled training.

SURVEY.md §0 pins the unpaired-translation lineage; the reference repo is
an empty stub (/root/reference/README.md:1), so the recipe follows the
published NICE-GAN paper (Chen et al., CVPR 2020):

  * **no generator encoders**: translation A→B is Dec_B(E_A(x)) with E_A
    the first stage of discriminator D_A = C_A ∘ E_A (models/nicegan.py);
  * **decoupled training**: the D step trains E and C (adversarial [+ R1]
    on patch AND CAM logits); the G step trains the DECODERS ONLY —
    gradients flow *through* the frozen encoders but never into their
    parameters (value_and_grad over dec params; no stop_gradient on the
    activations — the JAX-native form of the paper's requires_grad gate);
  * G losses (published weights): adversarial 1 (patch + CAM via the
    target-domain D), cycle λ_cyc·L1(x, Dec_src(E_tgt(Dec_tgt(E_src(x)))))
    with λ_cyc = 10, reconstruction λ_rec·L1(x, Dec_src(E_src(x))) with
    λ_rec = 10 (the own-encoding decode — NICE-GAN's identity analogue);
  * LSGAN mode, Adam(0.5, 0.999) lr 1e-4 + weight decay 1e-4, ρ-clipping
    of every AdaLIN/ILN blend after each decoder step (RhoClipper).

TPU-native structure (house pattern): ONE jitted shard_map program per
step — D update first, then the decoder update against the UPDATED frozen
encoders (the sequential order of the published solver), pmean(grads),
donated state, bf16 compute / fp32 params+losses. Spectral norm is
functional: power-iteration vectors for E and C live in the train state
and advance exactly once per step on the D-loss real passes. The EMA
serving weights carry {dec (EMA), e (EMA), e_sn (live copy)} so translate
needs nothing but state.ema.
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
from uig.models.nicegan import NICEClassifier, NICEDecoder, NICEEncoder
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer
from uig.train.ugatit_trainer import clip_rho

_DOMS = ("a", "b")


class NICEGANState(struct.PyTreeNode):
    dec_params: dict  # {"a", "b"}: NICEDecoder params (decode INTO domain)
    e_params: dict    # {"a", "b"}: NICEEncoder params (inside D)
    c_params: dict    # {"a", "b"}: NICEClassifier params
    e_sn: dict        # spectral-norm power-iteration vectors for E
    c_sn: dict        # ... and C
    g_opt: optax.OptState  # decoders
    d_opt: optax.OptState  # encoders + classifiers (one optimizer)
    ema: dict  # {"dec", "e", "e_sn"} — self-contained serving weights
    rng: jax.Array
    step: jax.Array
    ada_p: jax.Array = None


class NICEGANTrainer:
    """Two encoders (inside the Ds), two decoders, two classifiers.

    Public surface (house contract):
      init_state(rng)             -> NICEGANState (on the mesh)
      train_step(state, batch)    -> (state, metrics) [jitted]
      translate(ema, x, "a2b")    -> Dec_b(E_a(x)) [jitted, fp32]
    """

    directions = ("a2b", "b2a")

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        del perceptual_fn  # no perceptual term in the published recipe
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        if m.fused_applies:
            raise NotImplementedError(
                "model.fused_applies is not supported for kind=nicegan "
                "(the G and D passes share the encoders, so there are no "
                "same-params sibling applies to batch); unset it")
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        self.encoder = NICEEncoder(base_features=m.d_base_features, dtype=dt)
        deckw = dict(base_features=m.d_base_features,
                     n_res_blocks=m.n_res_blocks,
                     out_channels=m.out_channels, pad_mode=m.padding,
                     pad_impl=m.pad_impl)
        self.decoder = NICEDecoder(
            remat_blocks=self._remat == "blocks", dtype=dt, **deckw)
        self.eval_encoder = NICEEncoder(base_features=m.d_base_features,
                                        dtype=jnp.dtype(m.eval_dtype))
        self.eval_decoder = NICEDecoder(dtype=jnp.dtype(m.eval_dtype), **deckw)
        self.classifier = NICEClassifier(base_features=m.d_base_features,
                                         dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'NICEGANTrainer', supported=False)
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
        self._eval_step = jax.jit(self._eval_apply, static_argnames=("dd",))

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        ks = jax.random.split(rng, 6)
        e_params, e_sn, c_params, c_sn, dec_params = {}, {}, {}, {}, {}
        for i, d in enumerate(_DOMS):
            v = self.encoder.init(ks[i], sample)
            e_params[d] = {"params": v["params"]}
            e_sn[d] = v["sn"]
            z = jax.eval_shape(
                lambda vv: self.encoder.apply(vv, sample), v)
            zs = jnp.zeros(z.shape, jnp.float32)
            vc = self.classifier.init(ks[2 + i], zs)
            c_params[d] = {"params": vc["params"]}
            c_sn[d] = vc["sn"]
            dec_params[d] = self.decoder.init(ks[4 + i], zs)
        return NICEGANState(
            dec_params=dec_params, e_params=e_params, c_params=c_params,
            e_sn=e_sn, c_sn=c_sn,
            g_opt=self.g_tx.init(dec_params),
            d_opt=self.d_tx.init({"e": e_params, "c": c_params}),
            ema={"dec": jax.tree_util.tree_map(jnp.copy, dec_params),
                 "e": jax.tree_util.tree_map(jnp.copy, e_params),
                 "e_sn": jax.tree_util.tree_map(jnp.copy, e_sn)},
            rng=rng, step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32))

    def init_state(self, rng: jax.Array) -> NICEGANState:
        return jax.device_put(self._abstract_state(rng),
                              self.state_shardings())

    def _specs_for(self, state_like) -> NICEGANState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return NICEGANState(
            dec_params=bc(state_like.dec_params),
            e_params=bc(state_like.e_params),
            c_params=bc(state_like.c_params), e_sn=bc(state_like.e_sn),
            c_sn=bc(state_like.c_sn), g_opt=bc(state_like.g_opt),
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
    def _device_step(self, state: NICEGANState, real_a, real_b):
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
        real = {"a": real_a, "b": real_b}

        lam_cyc = loss_cfg.lambda_cycle
        lam_rec = loss_cfg.lambda_recon

        dec_apply = (jax.checkpoint(self.decoder.apply)
                     if self._remat == "full" else self.decoder.apply)

        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        def enc(e_params, e_sn, d, x, update=False):
            out = self.encoder.apply(
                {"params": e_params[d]["params"], "sn": e_sn[d]}, x, update,
                mutable=["sn"] if update else False)
            return out if update else (out, None)

        def cls(c_params, c_sn, d, z, update=False):
            out = self.classifier.apply(
                {"params": c_params[d]["params"], "sn": c_sn[d]}, z, update,
                mutable=["sn"] if update else False)
            return out if update else (out, None)

        # ---------------- D update FIRST (E + C; published order) ----------
        # fakes for the D loss come from the CURRENT decoders + encoders
        z0 = {d: enc(state.e_params, state.e_sn, d, real[d])[0]
              for d in _DOMS}
        fake0 = {"b": dec_apply(state.dec_params["b"], z0["a"]),
                 "a": dec_apply(state.dec_params["a"], z0["b"])}
        dr = {d: T(real[d], i) for i, d in enumerate(_DOMS)}
        df = {d: T(jax.lax.stop_gradient(fake0[d]), 2 + i)
              for i, d in enumerate(_DOMS)}

        def d_loss_fn(ec):
            e_p, c_p = ec["e"], ec["c"]
            total = jnp.float32(0.0)
            cam_total = jnp.float32(0.0)
            r1 = jnp.float32(0.0)
            new_e_sn, new_c_sn = {}, {}
            real_logits = []
            for d in _DOMS:
                # real pass advances both power iterations (once per step)
                z_r, upd_e = enc(e_p, state.e_sn, d, dr[d], update=True)
                (l_r, cam_r), upd_c = cls(c_p, state.c_sn, d, z_r,
                                          update=True)
                new_e_sn[d] = jax.lax.stop_gradient(upd_e["sn"])
                new_c_sn[d] = jax.lax.stop_gradient(upd_c["sn"])
                z_f = enc(e_p, state.e_sn, d, df[d])[0]
                (l_f, cam_f), _ = cls(c_p, state.c_sn, d, z_f)
                total = total + L.gan_loss_d(l_r, l_f, loss_cfg.gan_mode)
                cam_total = cam_total + L.gan_loss_d(cam_r, cam_f,
                                                     loss_cfg.gan_mode)
                real_logits.append(l_r)
                if loss_cfg.r1_gamma > 0:
                    def d_of_x(p, x, _d=d):
                        zz = self.encoder.apply(
                            {"params": p["e"][_d]["params"],
                             "sn": state.e_sn[_d]}, x, False)
                        return self.classifier.apply(
                            {"params": p["c"][_d]["params"],
                             "sn": state.c_sn[_d]}, zz, False)[0]

                    r1 = r1 + L.r1_penalty(d_of_x, ec, dr[d])
            total = total + cam_total
            if loss_cfg.r1_gamma > 0:
                r1 = loss_cfg.r1_gamma * r1
                total = total + r1
            daux = {"d_cam": cam_total, "d_r1": r1,
                    "e_sn": new_e_sn, "c_sn": new_c_sn}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic(tuple(real_logits),
                                                   loss_cfg.gan_mode)
            return total, daux

        ec = {"e": state.e_params, "c": state.c_params}
        (d_loss, d_aux), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(ec)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, ec)
        ec_new = optax.apply_updates(ec, d_updates)
        e_params, c_params = ec_new["e"], ec_new["c"]
        e_sn, c_sn = d_aux["e_sn"], d_aux["c_sn"]

        # ---------------- decoder update (decoupled: E/C frozen) -----------
        def g_loss_fn(dec_params):
            # encodings from the UPDATED, frozen encoders; gradients flow
            # through them into the decoders but e_params gets none
            z = {d: enc(e_params, e_sn, d, real[d])[0] for d in _DOMS}
            fake = {"b": dec_apply(dec_params["b"], z["a"]),
                    "a": dec_apply(dec_params["a"], z["b"])}
            adv = jnp.float32(0.0)
            for src, tgt in (("a", "b"), ("b", "a")):
                z_f = enc(e_params, e_sn, tgt, T(fake[tgt], 4))[0]
                (l_f, cam_f), _ = cls(c_params, c_sn, tgt, z_f)
                adv = adv + (L.gan_loss_g(l_f, loss_cfg.gan_mode)
                             + L.gan_loss_g(cam_f, loss_cfg.gan_mode))
            rec_a = dec_apply(dec_params["a"],
                              enc(e_params, e_sn, "b", fake["b"])[0])
            rec_b = dec_apply(dec_params["b"],
                              enc(e_params, e_sn, "a", fake["a"])[0])
            cyc = lam_cyc * (L.cycle_loss(real_a, rec_a)
                             + L.cycle_loss(real_b, rec_b))
            # NICE-GAN's reconstruction: decode the OWN-domain encoding
            rec = lam_rec * (
                L.l1_loss(real_a, dec_apply(dec_params["a"], z["a"]))
                + L.l1_loss(real_b, dec_apply(dec_params["b"], z["b"])))
            total = adv + cyc + rec
            return total, {"g_adv": adv, "g_cycle": cyc, "g_rec": rec}

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.dec_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.dec_params)
        dec_params = clip_rho(optax.apply_updates(state.dec_params,
                                                  g_updates))

        decay = cfg.opt.ema_decay
        ema = {"dec": ema_update(state.ema["dec"], dec_params, decay),
               "e": ema_update(state.ema["e"], e_params, decay),
               # power vectors are iteration state, not weights: carry the
               # live copy so the EMA dict stays self-contained for serving
               "e_sn": e_sn}

        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss, "g_adv": g_aux["g_adv"],
            "g_cycle": g_aux["g_cycle"], "g_rec": g_aux["g_rec"],
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
            dec_params=dec_params, e_params=e_params, c_params=c_params,
            e_sn=e_sn, c_sn=c_sn, g_opt=g_opt, d_opt=d_opt, ema=ema,
            step=state.step + 1, ada_p=ada_p), metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        names = ("g_loss", "d_loss", "g_adv", "g_cycle", "g_rec", "d_cam",
                 "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis), P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: NICEGANState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact serving path)
    # ------------------------------------------------------------------
    def _eval_apply(self, ema, x, dd):
        src, tgt = dd
        with jax.default_matmul_precision("highest"):
            z = self.eval_encoder.apply(
                {"params": ema["e"][src]["params"], "sn": ema["e_sn"][src]},
                x.astype(jnp.float32), False)
            return self.eval_decoder.apply(ema["dec"][tgt], z)

    def translate(self, ema, x, direction: str = "a2b"):
        """Dec_tgt(E_src(x)) with the EMA serving weights (the encoder IS
        the discriminator's first stage — NICE-GAN's reuse)."""
        if direction not in ("a2b", "b2a"):
            raise ValueError(f"direction must be a2b|b2a, got {direction!r}")
        return self._eval_step(ema, x, dd=(direction[0], direction[-1]))
