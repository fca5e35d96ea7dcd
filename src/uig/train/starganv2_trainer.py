"""StarGAN v2 trainer — style-based multi-domain multimodal translation.

SURVEY.md §0 pins the unpaired-translation domain; the reference repo is an
empty stub (/root/reference/README.md:1), so the recipe follows the
canonical StarGAN v2 paper (Choi et al. 2020) exactly:

Per iteration (all FOUR updates inside ONE compiled XLA program):
  1. D update, latent-driven:   s̃ = F(z, ỹ);        adv(x,y vs G(x,s̃),ỹ) + R1
  2. D update, reference-driven: s̃ = E(x_ref, y_ref); same objective
  3. G/F/E update, latent-driven:
       adv(D(G(x,s̃), ỹ))
       + λ_sty ‖s̃ − E(G(x,s̃), ỹ)‖₁                [style reconstruction]
       − λ_ds  ‖G(x,s̃₁) − sg(G(x,s̃₂))‖₁           [diversity-sensitive]
       + λ_cyc ‖x − G(G(x,s̃), E(x,y))‖₁            [cycle through own style]
     with λ_ds LINEARLY DECAYED to 0 over loss.ds_decay_steps (canonical).
  4. G-only update, reference-driven: same loss with s̃ᵢ = E(x_refᵢ, y_ref);
     F/E receive NO update from this pass (canonical solver order).
  5. EMA update of G, F, E (the serving weights).

Adversarial mode: non-saturating BCE ("vanilla") + R1(γ=1) — the published
recipe. Mapping network F trains at lr·opt.f_lr_ratio (canonical 1e-6 vs
1e-4); all four Adam(0, 0.99) with weight decay 1e-4 (preset).

TPU-native structure (same as the other eight trainers): one jitted
shard_map program per step over the 1-D ``data`` mesh, donated state, bf16
compute / fp32 params+losses+styles. Domain labels never cross the host↔
device tunnel: the pipeline yields THREE independent interleaved batches
(x, x_ref, x_ref2) per step (data/pipeline.py MultiDomainPipeline
streams_per_step=3), each carrying the static tile([0..N-1]) label layout;
x_ref/x_ref2 automatically agree on labels, exactly what the
reference-driven passes need. Latent target domains ỹ are sampled uniformly
from the functional per-step PRNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from uig.config import Config
from uig.config.config import remat_mode
from uig.kernels.augment import augment
from uig.models.starganv2 import (V2Discriminator, V2Generator,
                                  V2MappingNetwork, V2StyleEncoder)
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class StarGANv2State(struct.PyTreeNode):
    g_params: dict
    f_params: dict  # mapping network
    e_params: dict  # style encoder
    d_params: dict
    g_opt: optax.OptState
    f_opt: optax.OptState
    e_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"g":…, "f":…, "e":…} — the serving weights
    rng: jax.Array
    step: jax.Array
    ada_p: jax.Array = None


class StarGANv2Trainer:
    """Four networks (G, F, E, D), four optimizers, one compiled step.

    Public surface:
      init_state(rng)                 -> StarGANv2State (on the mesh)
      train_step(state, batch)        -> (state, metrics); batch is a
                                         3-tuple of interleaved arrays
                                         (x, x_ref, x_ref2)
      translate(ema, x, target, style=None, style_seed=0)
                                      -> latent-driven translation (jitted,
                                         fp32, deterministic per seed)
      encode_style(ema, x_ref, domain)-> style code of a reference image
      style_from_seed(ema, seed, target, n) -> F(z_seed, target) styles
    """

    def __init__(self, cfg: Config, mesh: Mesh, perceptual_fn=None):
        del perceptual_fn  # no perceptual term in the canonical recipe
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        if m.fused_applies:
            raise NotImplementedError(
                "model.fused_applies is not supported for kind=starganv2 "
                "(the generator applies differ in STYLE input); unset it")
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        self.num_domains = m.num_domains
        self.style_dim = m.v2_style_dim
        self.latent_dim = m.v2_latent_dim
        gkw = dict(image_size=m.image_size, style_dim=m.v2_style_dim,
                   out_channels=m.out_channels,
                   base_features=m.g_base_features,
                   max_features=m.v2_max_features)
        self.generator = V2Generator(
            remat_blocks=self._remat == "blocks", dtype=dt, **gkw)
        self.eval_generator = V2Generator(dtype=jnp.dtype(m.eval_dtype), **gkw)
        self.mapping = V2MappingNetwork(
            num_domains=m.num_domains, latent_dim=m.v2_latent_dim,
            style_dim=m.v2_style_dim)
        ekw = dict(image_size=m.image_size, num_domains=m.num_domains,
                   style_dim=m.v2_style_dim, base_features=m.d_base_features,
                   max_features=m.v2_max_features)
        self.style_enc = V2StyleEncoder(dtype=dt, **ekw)
        self.eval_style_enc = V2StyleEncoder(dtype=jnp.dtype(m.eval_dtype),
                                             **ekw)
        self.discriminator = V2Discriminator(
            image_size=m.image_size, num_domains=m.num_domains,
            base_features=m.d_base_features, max_features=m.v2_max_features,
            dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.f_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.f_lr_ratio)
        self.e_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'StarGANv2Trainer', supported=False)
        self._ada = ada.ada_enabled(cfg.loss)
        self._ada_ops = ada.parse_ada_ops(cfg.loss.ada_ops) if self._ada else ()

        n = mesh.devices.size
        if cfg.data.batch_size % n:
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by "
                f"{n} devices")
        self.local_batch = cfg.data.batch_size // n
        if self.local_batch % m.num_domains:
            raise ValueError(
                f"per-device batch {self.local_batch} must be a multiple of "
                f"model.num_domains={m.num_domains}: the pipeline interleaves "
                "domains round-robin and labels are reconstructed in-graph")
        self.n_devices = n
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_apply)
        self._eval_style = jax.jit(self._eval_style_apply)
        self._eval_map = jax.jit(self._eval_map_apply)

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        lab = jnp.zeros((1,), jnp.int32)
        z = jnp.zeros((1, self.latent_dim), jnp.float32)
        sty = jnp.zeros((1, self.style_dim), jnp.float32)
        kg, kf, ke, kd = jax.random.split(rng, 4)
        g_params = self.generator.init(kg, sample, sty)
        f_params = self.mapping.init(kf, z, lab)
        e_params = self.style_enc.init(ke, sample, lab)
        d_params = self.discriminator.init(kd, sample, lab)
        return StarGANv2State(
            g_params=g_params, f_params=f_params, e_params=e_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params), f_opt=self.f_tx.init(f_params),
            e_opt=self.e_tx.init(e_params), d_opt=self.d_tx.init(d_params),
            ema={"g": jax.tree_util.tree_map(jnp.copy, g_params),
                 "f": jax.tree_util.tree_map(jnp.copy, f_params),
                 "e": jax.tree_util.tree_map(jnp.copy, e_params)},
            rng=rng, step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(self.cfg.loss.ada_p_init, jnp.float32))

    def init_state(self, rng: jax.Array) -> StarGANv2State:
        return jax.device_put(self._abstract_state(rng),
                              self.state_shardings())

    def _specs_for(self, state_like) -> StarGANv2State:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return StarGANv2State(
            g_params=bc(state_like.g_params), f_params=bc(state_like.f_params),
            e_params=bc(state_like.e_params), d_params=bc(state_like.d_params),
            g_opt=bc(state_like.g_opt), f_opt=bc(state_like.f_opt),
            e_opt=bc(state_like.e_opt), d_opt=bc(state_like.d_opt),
            ema=bc(state_like.ema), rng=rep, step=rep, ada_p=rep)

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------
    def _lambda_ds(self, step):
        """Canonical linear decay of the diversity weight to 0 over
        loss.ds_decay_steps."""
        lam0 = self.cfg.loss.lambda_ds
        t = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(t / max(self.cfg.loss.ds_decay_steps, 1), 0.0, 1.0)
        return lam0 * (1.0 - frac)

    def _device_step(self, state: StarGANv2State, x_raw, ref_raw, ref2_raw):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G, F, E, D = (self.generator, self.mapping, self.style_enc,
                      self.discriminator)
        dt = jnp.dtype(cfg.model.compute_dtype)
        n_dom = self.num_domains

        step_key = fold_step(state.rng, state.step)
        shard_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(shard_key, ("aug_x", "aug_r", "aug_r2"))

        crop = cfg.model.image_size

        def prep(raw, k):
            if raw.dtype == jnp.uint8:
                return augment(raw, k, crop, out_dtype=dt,
                               impl=cfg.data.augment)
            return raw.astype(dt)

        x = prep(x_raw, keys["aug_x"])
        x_ref = prep(ref_raw, keys["aug_r"])
        x_ref2 = prep(ref2_raw, keys["aug_r2"])

        bsz = x.shape[0]
        # source/reference labels are STATIC: interleaved round-robin layout
        y_org = jnp.tile(jnp.arange(n_dom, dtype=jnp.int32), bsz // n_dom)
        y_ref = y_org  # both reference batches share the same layout
        # latent-pass target domains + style noise: per-EXAMPLE keys derived
        # from the GLOBAL example position (shard offset + in-shard index),
        # so the draws — and therefore the training trajectory — are
        # invariant to device count (DP-n == DP-1, asserted by the driver's
        # dryrun; an axis-folded batch draw would tie the trajectory to the
        # sharding)
        gpos = (jax.lax.axis_index(axis) * bsz
                + jnp.arange(bsz, dtype=jnp.uint32))
        ex_key = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(gpos)
        y_trg = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, n_dom, jnp.int32))(ex_key)
        z = jax.vmap(lambda k: jax.random.normal(
            jax.random.fold_in(k, 1), (self.latent_dim,), jnp.float32))(ex_key)
        z2 = jax.vmap(lambda k: jax.random.normal(
            jax.random.fold_in(k, 2), (self.latent_dim,), jnp.float32))(ex_key)

        g_apply = (jax.checkpoint(G.apply) if self._remat == "full"
                   else G.apply)
        lam_sty = loss_cfg.lambda_sty
        lam_cyc = loss_cfg.lambda_cycle
        lam_ds = self._lambda_ds(state.step)

        if self._ada:
            ada_key = jax.random.fold_in(shard_key, 0xADA)
            T = lambda im, i: ada.diff_augment(
                im, jax.random.fold_in(ada_key, i), state.ada_p,
                self._ada_ops)
        else:
            T = lambda im, i: im

        # ---------------- D updates (latent- then reference-driven) -------
        def d_update(d_params, d_opt, fake, y_fake, tag):
            dr, df = T(x, tag), T(fake, tag + 1)

            def d_loss_fn(p):
                # canonical v2 D objective is loss_real + loss_fake WITHOUT
                # the CycleGAN 0.5 factor gan_loss_d bakes in (relative
                # scale vs R1 γ=1 matters); wgan carries no such factor
                scale = 1.0 if loss_cfg.gan_mode == "wgan" else 2.0
                adv = scale * L.gan_loss_d(D.apply(p, dr, y_org),
                                           D.apply(p, df, y_fake),
                                           loss_cfg.gan_mode)
                r1 = jnp.float32(0.0)
                if loss_cfg.r1_gamma > 0:
                    r1 = loss_cfg.r1_gamma * L.r1_penalty(
                        lambda pp, im: D.apply(pp, im, y_org), p, dr)
                aux = {"adv": adv, "r1": r1}
                if loss_cfg.ada_target > 0:
                    aux["ada_rt"] = ada.ada_heuristic(
                        D.apply(p, dr, y_org), loss_cfg.gan_mode)
                return adv + r1, aux

            (d_loss, aux), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            grads = jax.lax.pmean(grads, axis)
            updates, d_opt = self.d_tx.update(grads, d_opt, d_params)
            return optax.apply_updates(d_params, updates), d_opt, d_loss, aux

        s_lat = F.apply(state.f_params, z, y_trg)
        fake_lat = jax.lax.stop_gradient(g_apply(state.g_params, x, s_lat))
        d_params, d_opt, d_loss_lat, d_aux = d_update(
            state.d_params, state.d_opt, fake_lat, y_trg, 0)

        s_ref0 = E.apply(state.e_params, x_ref, y_ref)
        fake_ref = jax.lax.stop_gradient(g_apply(state.g_params, x, s_ref0))
        d_params, d_opt, d_loss_ref, d_aux2 = d_update(
            d_params, d_opt, fake_ref, y_ref, 2)

        # ---------------- G losses (shared shape, two style sources) ------
        def g_loss_core(g_params, e_params, s1, s2, y_fake, tag):
            fake = g_apply(g_params, x, s1)
            adv = L.gan_loss_g(D.apply(d_params, T(fake, tag), y_fake),
                               loss_cfg.gan_mode)
            # NOT detached: the canonical solver lets the style-recon term
            # pull F (latent pass) through s1 as well as E through s_pred
            sty = lam_sty * L.l1_loss(s1, E.apply(e_params, fake, y_fake))
            fake2 = jax.lax.stop_gradient(g_apply(g_params, x, s2))
            ds = L.l1_loss(fake, fake2)
            s_org = E.apply(e_params, x, y_org)
            cyc = lam_cyc * L.cycle_loss(x, g_apply(g_params, fake, s_org))
            total = adv + sty - lam_ds * ds + cyc
            return total, {"adv": adv, "sty": sty, "ds": ds, "cyc": cyc}

        # 3) latent-driven: updates G, F, E
        def g_lat_loss(g_params, f_params, e_params):
            s1 = F.apply(f_params, z, y_trg)
            s2 = F.apply(f_params, z2, y_trg)
            return g_loss_core(g_params, e_params, s1, s2, y_trg, 4)

        (g_loss_lat, g_aux), (gg, gf, ge) = jax.value_and_grad(
            g_lat_loss, argnums=(0, 1, 2), has_aux=True)(
            state.g_params, state.f_params, state.e_params)
        gg, gf, ge = jax.lax.pmean((gg, gf, ge), axis)
        g_up, g_opt = self.g_tx.update(gg, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)
        f_up, f_opt = self.f_tx.update(gf, state.f_opt, state.f_params)
        f_params = optax.apply_updates(state.f_params, f_up)
        e_up, e_opt = self.e_tx.update(ge, state.e_opt, state.e_params)
        e_params = optax.apply_updates(state.e_params, e_up)

        # 4) reference-driven: updates G ONLY (canonical solver order);
        # styles come from the freshly-updated E but carry no E gradient
        def g_ref_loss(gp):
            s1 = E.apply(e_params, x_ref, y_ref)
            s2 = E.apply(e_params, x_ref2, y_ref)
            return g_loss_core(gp, e_params, s1, s2, y_ref, 5)

        (g_loss_ref, g_aux2), gg2 = jax.value_and_grad(
            g_ref_loss, has_aux=True)(g_params)
        gg2 = jax.lax.pmean(gg2, axis)
        g_up2, g_opt = self.g_tx.update(gg2, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_up2)

        # 5) EMA of the three serving networks
        decay = cfg.opt.ema_decay
        ema = {"g": ema_update(state.ema["g"], g_params, decay),
               "f": ema_update(state.ema["f"], f_params, decay),
               "e": ema_update(state.ema["e"], e_params, decay)}

        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss_lat, "g_loss_ref": g_loss_ref,
            "g_adv": g_aux["adv"], "g_sty": g_aux["sty"],
            "g_ds": g_aux["ds"], "g_cyc": g_aux["cyc"],
            "g_sty_ref": g_aux2["sty"], "g_ds_ref": g_aux2["ds"],
            "d_loss": d_loss_lat, "d_loss_ref": d_loss_ref,
            "d_r1": d_aux["r1"] + d_aux2["r1"],
            "lambda_ds": lam_ds, "lr": self._lr(state.step),
        }
        if self._ada:
            metrics["ada_p"] = ada_p
            if loss_cfg.ada_target > 0:
                metrics["ada_rt"] = d_aux["ada_rt"]
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float32),
                                   metrics), axis)
        return state.replace(
            g_params=g_params, f_params=f_params, e_params=e_params,
            d_params=d_params, g_opt=g_opt, f_opt=f_opt, e_opt=e_opt,
            d_opt=d_opt, ema=ema, step=state.step + 1, ada_p=ada_p), metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        names = ("g_loss", "g_loss_ref", "g_adv", "g_sty", "g_ds", "g_cyc",
                 "g_sty_ref", "g_ds_ref", "d_loss", "d_loss_ref", "d_r1",
                 "lambda_ds", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        b = P(self.axis)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, b, b, b),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: StarGANv2State, batch):
        """batch: (x, x_ref, x_ref2) — three independently-sampled
        interleaved arrays from the multi-domain pipeline
        (streams_per_step=3)."""
        if not isinstance(batch, (tuple, list)) or len(batch) != 3:
            raise ValueError(
                "StarGAN v2 takes a 3-tuple batch (x, x_ref, x_ref2) from "
                "the streams_per_step=3 multi-domain pipeline; got "
                f"{type(batch).__name__}"
                + (f" of length {len(batch)}"
                   if isinstance(batch, (tuple, list)) else ""))
        return self._train_step(state, *batch)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact path)
    # ------------------------------------------------------------------
    def _eval_apply(self, ema, x, labels, z):
        with jax.default_matmul_precision("highest"):
            s = self.mapping.apply(ema["f"], z, labels)
            return self.eval_generator.apply(
                ema["g"], x.astype(jnp.float32), s)

    def _eval_apply_style(self, ema, x, style):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(
                ema["g"], x.astype(jnp.float32), style)

    def _eval_style_apply(self, ema, x, labels):
        with jax.default_matmul_precision("highest"):
            return self.eval_style_enc.apply(
                ema["e"], x.astype(jnp.float32), labels)

    def _eval_map_apply(self, ema, z, labels):
        with jax.default_matmul_precision("highest"):
            return self.mapping.apply(ema["f"], z, labels)

    def translate(self, ema, x, target, style=None, style_seed: int = 0):
        """Translate images into domain ``target`` with EMA weights — the
        serving path. ``style`` (B or 1, style_dim) overrides; otherwise ONE
        latent z ~ N(0,I) from PRNGKey(style_seed) is mapped through F for
        every image (deterministic per seed; vary the seed for a different
        output mode)."""
        t = int(target)
        if not 0 <= t < self.num_domains:
            raise ValueError(
                f"target domain {t} out of range [0, {self.num_domains})")
        labels = jnp.full((x.shape[0],), t, jnp.int32)
        if style is not None:
            if style.shape[0] == 1:
                style = jnp.repeat(style, x.shape[0], 0)
            if not hasattr(self, "_eval_step_style"):
                self._eval_step_style = jax.jit(self._eval_apply_style)
            return self._eval_step_style(ema, x, style)
        z = jnp.repeat(jax.random.normal(jax.random.PRNGKey(style_seed),
                                         (1, self.latent_dim), jnp.float32),
                       x.shape[0], 0)
        return self._eval_step(ema, x, labels, z)

    def encode_style(self, ema, x_ref, domain) -> jax.Array:
        """Style code(s) of reference image(s) in integer domain ``domain``
        (EMA style encoder, fp32)."""
        t = int(domain)
        labels = jnp.full((x_ref.shape[0],), t, jnp.int32)
        return self._eval_style(ema, x_ref, labels)

    def style_from_seed(self, ema, seed: int, target, n: int = 1):
        """F(z, target) for z ~ N(0,I) from PRNGKey(seed) — n styles."""
        z = jax.random.normal(jax.random.PRNGKey(int(seed)),
                              (n, self.latent_dim), jnp.float32)
        labels = jnp.full((n,), int(target), jnp.int32)
        return self._eval_map(ema, z, labels)
