"""StarGAN trainer — N-domain translation with one G and one D.

SURVEY.md §0 pins the unpaired-translation domain; the reference repo is an
empty stub (/root/reference/README.md:1), so the recipe follows the
canonical StarGAN paper (Choi et al. 2018):

  D:  adversarial (canonical: WGAN-GP, λ_gp=10) on real vs G(x, c_trg)
      + λ_cls·CE(cls(real), c_src)                     [aux classifier]
  G:  adversarial on G(x, c_trg)
      + λ_cls·CE(cls(G(x, c_trg)), c_trg)
      + λ_rec·‖G(G(x, c_trg), c_src) − x‖₁             [cycle; λ_rec = 10
                                                        = loss.lambda_cycle]
  n_critic = opt.d_steps_per_g (canonical 5): D updates every step, G/EMA
  every n-th — gated with lax.cond so the whole schedule remains ONE
  compiled XLA program (no host-side branching, no second program).

TPU-native structure (same as the other five trainers): one jitted
shard_map program per step over the 1-D ``data`` mesh — augmentation, both
updates, pmean(grads) — donated state, bf16 compute / fp32 params+losses.

Domain labels never cross the host↔device boundary: the multi-domain
pipeline interleaves domains round-robin (data/pipeline.py
MultiDomainPipeline), so each device reconstructs its label vector
in-graph as tile([0..N-1]) — the trainer validates per-device batch %
num_domains == 0. Target labels are sampled uniformly over domains from
the functional per-step PRNG.
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
from uig.models.stargan import StarGANDiscriminator, StarGANGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class StarGANState(struct.PyTreeNode):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # EMA copy of g_params (the serving weights)
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


class StarGANTrainer:
    """One generator G(x, target_label), one discriminator with (src, cls)
    heads, canonical WGAN-GP + n_critic dynamics.

    Public surface:
      init_state(rng)             -> StarGANState (placed on the mesh)
      train_step(state, batch)    -> (state, metrics); batch is ONE
                                     interleaved (B, L, L, C) array
      translate(ema, x, target)   -> images translated to domain ``target``
                                     [jitted, fp32, deterministic]
    """

    def __init__(self, cfg: Config, mesh: Mesh, perceptual_fn=None):
        del perceptual_fn  # no perceptual term in the canonical recipe
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        if m.fused_applies:
            raise NotImplementedError(
                "model.fused_applies is not supported for kind=stargan (the "
                "two generator applies differ in LABEL input, and the D "
                "real/fake fuse is unmeasured here); unset it")
        dt = jnp.dtype(m.compute_dtype)
        self._remat = remat_mode(m.remat)
        self.num_domains = m.num_domains
        kw = dict(
            num_domains=m.num_domains,
            out_channels=m.out_channels,
            base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks,
            norm=m.norm,
            pad_mode=m.padding,
            upsample=m.upsample,
            head_s2d=m.head_s2d, stem_dx_s2d=m.stem_dx_s2d,
            stem_s2d=m.stem_s2d,
            down_s2d=m.down_s2d,
            conv_impl=m.conv_impl,
            pad_impl=m.pad_impl,
        )
        self.generator = StarGANGenerator(
            remat_blocks=self._remat == "blocks", dtype=dt, **kw)
        self.eval_generator = StarGANGenerator(
            dtype=jnp.dtype(m.eval_dtype), **kw)
        self.discriminator = StarGANDiscriminator(
            num_domains=m.num_domains, base_features=m.d_base_features,
            n_layers=m.d_layers, dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'StarGANTrainer', supported=False)
        self.n_critic = max(1, cfg.opt.d_steps_per_g)
        # FLOP-accounting probe only (scripts/perf_rungs.py): when set, the
        # n_critic lax.cond is replaced by a static Python branch so each
        # branch can be lowered/cost-analyzed SEPARATELY — XLA's static FLOP
        # count otherwise sums both cond branches and overstates the average
        # step by the 1/n_critic G-update fraction. Never set in training.
        self.flops_force_g_turn = None
        self._ada = ada.ada_enabled(cfg.loss)
        self._ada_ops = ada.parse_ada_ops(cfg.loss.ada_ops) if self._ada else ()
        if cfg.loss.ada_target > 0 and cfg.loss.gan_mode == "wgan":
            raise ValueError(
                "loss.ada_target needs a GAN mode with a decision boundary; "
                "the canonical StarGAN recipe is WGAN-GP — use fixed-p "
                "DiffAugment (ada_p_init>0, ada_target=0) there")

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

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        lab = jnp.zeros((1,), jnp.int32)
        kg, kd = jax.random.split(rng)
        g_params = self.generator.init(kg, sample, lab)
        d_params = self.discriminator.init(kd, sample)
        return StarGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema=jax.tree_util.tree_map(jnp.copy, g_params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(self.cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> StarGANState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> StarGANState:
        rep = P()

        def bc(t):
            return jax.tree_util.tree_map(lambda _: rep, t)

        return StarGANState(
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
    def _device_step(self, state: StarGANState, real, g_turn_static=None):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        G, D = self.generator, self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)
        n_dom = self.num_domains

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("aug", "trg", "gp"))

        crop = cfg.model.image_size
        if real.dtype == jnp.uint8:
            real = augment(real, keys["aug"], crop, out_dtype=dt,
                           impl=cfg.data.augment)
        else:
            real = real.astype(dt)

        bsz = real.shape[0]
        # source labels are STATIC: the pipeline interleaves domains
        # round-robin (position i holds domain i % N)
        src_labels = jnp.tile(jnp.arange(n_dom, dtype=jnp.int32),
                              bsz // n_dom)
        # target labels: uniform over domains, fresh each step
        trg_labels = jax.random.randint(keys["trg"], (bsz,), 0, n_dom,
                                        jnp.int32)

        lam_cls = loss_cfg.lambda_cls
        lam_rec = loss_cfg.lambda_cycle  # canonical λ_rec = 10, same value
        g_apply = (jax.checkpoint(G.apply) if self._remat == "full"
                   else G.apply)

        # ADA: every image D sees goes through the gated differentiable
        # augmentation pipeline (train/ada.py). The label-preserving op set
        # (color/translation/cutout/xflip) keeps the aux-classifier target
        # valid on augmented reals; the WGAN gradient penalty interpolates
        # between D's ACTUAL inputs — the augmented real/fake pair.
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        # ---------------- D update (every step) ----------------
        fake = jax.lax.stop_gradient(g_apply(state.g_params, real, trg_labels))
        dr, df = T(real, 0), T(fake, 1)

        def d_loss_fn(d_params):
            src_real, cls_real = D.apply(d_params, dr)
            src_fake, _ = D.apply(d_params, df)
            adv = L.gan_loss_d(src_real, src_fake, loss_cfg.gan_mode)
            cls = lam_cls * L.domain_cls_loss(cls_real, src_labels)
            total = adv + cls
            gp = jnp.float32(0.0)
            if loss_cfg.gan_mode == "wgan" and loss_cfg.lambda_gp > 0:
                gp = loss_cfg.lambda_gp * L.gradient_penalty(
                    lambda x: D.apply(d_params, x)[0], dr, df, keys["gp"])
                total = total + gp
            r1 = jnp.float32(0.0)
            if loss_cfg.r1_gamma > 0:
                r1 = loss_cfg.r1_gamma * L.r1_penalty(
                    lambda p, x: D.apply(p, x)[0], d_params, dr)
                total = total + r1
            daux = {"d_adv": adv, "d_cls": cls, "d_gp": gp, "d_r1": r1}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic(src_real, loss_cfg.gan_mode)
            return total, daux

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G update (every n_critic-th step) ----------------
        def g_loss_fn(g_params):
            fake_g = g_apply(g_params, real, trg_labels)
            src_fake, cls_fake = D.apply(d_params, T(fake_g, 2))  # updated D
            adv = L.gan_loss_g(src_fake, loss_cfg.gan_mode)
            cls = lam_cls * L.domain_cls_loss(cls_fake, trg_labels)
            rec = lam_rec * L.cycle_loss(
                real, g_apply(g_params, fake_g, src_labels))
            return adv + cls + rec, {"g_adv": adv, "g_cls": cls, "g_rec": rec}

        def g_update(_):
            (g_loss, g_aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            g_grads = jax.lax.pmean(g_grads, axis)
            g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                                state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)
            ema = ema_update(state.ema, g_params, cfg.opt.ema_decay)
            return (g_params, g_opt, ema, g_loss, g_aux["g_adv"],
                    g_aux["g_cls"], g_aux["g_rec"], jnp.float32(1.0))

        def g_skip(_):
            z = jnp.float32(0.0)
            return (state.g_params, state.g_opt, state.ema, z, z, z, z, z)

        # canonical n_critic schedule; metrics g_* read 0 on skipped steps.
        # ``g_turn_static`` (the period-fused program, build_period_step)
        # and ``flops_force_g_turn`` (FLOP-accounting probe) both replace
        # the lax.cond with a static Python branch.
        force = (g_turn_static if g_turn_static is not None
                 else self.flops_force_g_turn)
        if force is None:
            g_turn = (state.step % self.n_critic) == (self.n_critic - 1)
            (g_params, g_opt, ema, g_loss, g_adv, g_cls, g_rec,
             g_active) = jax.lax.cond(g_turn, g_update, g_skip, None)
        else:  # static branch
            (g_params, g_opt, ema, g_loss, g_adv, g_cls, g_rec,
             g_active) = (g_update(None) if force else g_skip(None))

        # ADA controller: identical on every device (pmean'd heuristic)
        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss, "g_adv": g_adv, "g_cls": g_cls, "g_rec": g_rec,
            "g_active": g_active, "d_loss": d_loss, "d_adv": d_aux["d_adv"],
            "d_cls": d_aux["d_cls"], "d_gp": d_aux["d_gp"],
            "d_r1": d_aux["d_r1"], "lr": self._lr(state.step),
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
        names = ("g_loss", "g_adv", "g_cls", "g_rec", "g_active", "d_loss",
                 "d_adv", "d_cls", "d_gp", "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, P(self.axis)),
            out_specs=(specs, {k: P() for k in names}), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def build_period_step(self):
        """One statically-UNROLLED n_critic period — (n−1) D-only sub-steps
        + one D+G sub-step — as ONE jitted program consuming n_critic
        batches (VERDICT r4 item 7).

        Why: at 128² 4 of 5 steps run a 0.36 TF D-only program in ~8 ms —
        fixed-overhead-bound (round-4 budget). Unrolling the natural
        schedule unit (the period) removes the lax.cond ENTIRELY (each
        sub-step's branch is static) and amortizes per-dispatch fixed
        overhead 5×. This is NOT the measured steps_per_dispatch negative:
        that scanned k IDENTICAL cond-carrying steps and paid a (k·B)
        stack + reshard for no branch elimination.

        Semantics are IDENTICAL to n_critic aligned single steps: sub-step
        i's PRNG folds the carried state.step (which increments inside),
        and the static g-turn positions match the cond schedule exactly
        when the entry step is period-aligned (loop.fit enforces cadence
        alignment; tests/integration/test_stargan.py asserts bit-level
        equivalence). Returned metrics are the LAST sub-step's (the G
        turn), matching what aligned single-stepping would log."""
        k = self.n_critic
        if k < 2:
            raise ValueError(
                f"n_critic period fusion needs opt.d_steps_per_g >= 2, "
                f"got {k}")
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        names = ("g_loss", "g_adv", "g_cls", "g_rec", "g_active", "d_loss",
                 "d_adv", "d_cls", "d_gp", "d_r1", "lr")
        if self._ada:
            names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                names += ("ada_rt",)

        def device_period(state, real_k):
            m = None
            for i in range(k):  # static unroll: no cond anywhere
                state, m = self._device_step(state, real_k[i],
                                             g_turn_static=(i == k - 1))
            return state, m

        shmapped = jax.shard_map(
            device_period, mesh=self.mesh,
            in_specs=(specs, P(None, self.axis)),
            out_specs=(specs, {n: P() for n in names}), check_vma=False)
        jitted = jax.jit(shmapped, donate_argnums=(0,))
        from jax.sharding import NamedSharding

        stacked = NamedSharding(self.mesh, P(None, self.axis))

        def step_period(state, batches):
            """batches: list of n_critic interleaved (B, L, L, C) arrays."""
            if len(batches) != k:
                raise ValueError(f"expected {k} batches, got {len(batches)}")
            arrs = [b[0] if isinstance(b, (tuple, list)) else b
                    for b in batches]
            real_k = jax.device_put(jnp.stack(arrs), stacked)
            return jitted(state, real_k)

        return step_period

    def train_step(self, state: StarGANState, batch):
        """batch: ONE interleaved (B, load, load, C) array (uint8 from the
        multi-domain pipeline, or float pre-augmented in tests)."""
        if isinstance(batch, (tuple, list)):
            if len(batch) != 1:
                raise ValueError(
                    "StarGAN takes a single interleaved batch array (the "
                    f"multi-domain pipeline), got a {len(batch)}-tuple")
            batch = batch[0]
        return self._train_step(state, batch)

    # ------------------------------------------------------------------
    # eval / inference (fp32, bit-exact path)
    # ------------------------------------------------------------------
    def _eval_apply(self, params, x, labels):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(
                params, x.astype(jnp.float32), labels)

    def translate(self, ema_params, x, target):
        """Translate images to domain ``target`` (int) with EMA weights —
        the serving path."""
        t = int(target)
        if not 0 <= t < self.num_domains:
            raise ValueError(
                f"target domain {t} out of range [0, {self.num_domains})")
        labels = jnp.full((x.shape[0],), t, jnp.int32)
        return self._eval_step(ema_params, x, labels)
