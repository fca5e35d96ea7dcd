"""DCLGAN trainer — dual contrastive learning for unpaired translation
(Han et al. 2021, "Dual Contrastive Learning for Unsupervised Image-to-Image
Translation"; the dual-generator successor of CUT in the lineage SURVEY.md §0
derives the capability surface from; reference repo is an empty stub —
/root/reference/README.md:1).

The idea vs CUT: TWO generators (A→B and B→A, as in CycleGAN) but NO cycle
loss — each direction is constrained by PatchNCE instead, and crucially the
two NCE views come from DIFFERENT embeddings: for A→B the keys are patches of
``real_a`` through G_a2b's encoder (+ its projection heads F1) while the
queries are patches of ``fake_b`` through G_b2a's encoder (+ its heads F2) —
each encoder only ever embeds images of its own input domain. This "dual"
asymmetric embedding is the paper's contribution; the rest of the objective
is LSGAN adversarial terms both ways plus an L1 identity regularizer.

Published recipe (paper defaults): λ_GAN=1, λ_NCE=2, identity L1; built on
the CUT codebase (Adam 2e-4, β1 0.5, 256 patches, τ=0.07). In this trainer
``loss.lambda_identity`` is the ABSOLUTE identity weight (there is no
lambda_cycle to scale by — unlike the CycleGAN trainer's canonical
λ_id·λ_cyc coupling); the dclgan256 preset sets the published values.

TPU structure mirrors CycleGANTrainer: ONE jitted XLA program per step under
``shard_map`` (G+heads update → replay pools → D update → EMA), pmean'd
grads over the ``data`` axis, donated state, bf16 compute / fp32 losses.
``model.fused_applies`` is rejected loudly: the NCE encoder passes are CSE'd
against the full generator applies exactly as in CUT, where batching them
measured −12% (BASELINE.md round 3).
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
from uig.models import PatchDiscriminator, ResNetGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.cut import ProjectionHead, _sample_patches, sample_patch_ids
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.pool import ImagePool, PoolState
from uig.train.state import lr_schedule, make_optimizer


class DCLGANState(struct.PyTreeNode):
    # {"a2b": {"gen": ..., "heads": [...]}, "b2a": {...}} — each direction
    # owns its generator AND the projection heads over ITS encoder's taps
    g_params: dict
    d_params: dict  # {"a": ..., "b": ...}
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": gen params, "b2a": gen params} — serving weights
    pool_a: PoolState  # historical fake-A images (feed D_A)
    pool_b: PoolState  # historical fake-B images (feed D_B)
    rng: jax.Array
    step: jax.Array
    ada_p: jax.Array = None


class DCLGANTrainer:
    directions = ("a2b", "b2a")

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)
        from uig.config.config import remat_mode

        self._remat = remat_mode(m.remat)
        if m.fused_applies:
            raise ValueError(
                "model.fused_applies is not supported for kind=dclgan: "
                "batching the NCE encoder passes with the generator applies "
                "defeats XLA's CSE of the shared encoder half (measured -12% "
                "for CUT, BASELINE.md round 3)")
        self.generator = ResNetGenerator(
            out_channels=m.out_channels, base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks, norm=m.norm, pad_mode=m.padding,
            upsample=m.upsample, resample=m.resample, head_s2d=m.head_s2d,
            stem_s2d=m.stem_s2d, down_s2d=m.down_s2d,
            remat_blocks=self._remat == "blocks", conv_impl=m.conv_impl,
            pad_impl=m.pad_impl, dtype=dt)
        self.eval_generator = self.generator.copy(
            dtype=jnp.dtype(m.eval_dtype), remat_blocks=False)
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt)
        n_layers = self.generator.num_layers
        self.taps = tuple(i for i in m.nce_layers if i < n_layers)
        if len(self.taps) != len(m.nce_layers) or not self.taps:
            raise ValueError(
                f"model.nce_layers={m.nce_layers} contains out-of-range "
                f"taps; valid feature-tap indices: 0..{n_layers - 1}")
        self.n_patches = m.nce_patches
        self.head = ProjectionHead(m.nce_proj_dim, dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.pool = ImagePool(cfg.opt.pool_size)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, "DCLGANTrainer", supported=False)
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

    # ------------------------------------------------------------------
    def _abstract_state(self, rng):
        cfg = self.cfg
        hw = cfg.model.image_size
        sample = jnp.zeros((1, hw, hw, cfg.model.in_channels), jnp.float32)
        ka, kb, kda, kdb, kh = jax.random.split(rng, 5)
        g_params = {}
        for d, kg in (("a2b", ka), ("b2a", kb)):
            gen_params = self.generator.init(kg, sample)
            _, feats = self.generator.apply(
                gen_params, sample, self.taps,
                method=ResNetGenerator.with_features)
            heads = [
                self.head.init(
                    jax.random.fold_in(jax.random.fold_in(kh, i),
                                       d == "b2a"),
                    jnp.zeros((1, 1, f.shape[-1])))
                for i, f in enumerate(feats)
            ]
            g_params[d] = {"gen": gen_params, "heads": heads}
        d_params = {"a": self.discriminator.init(kda, sample),
                    "b": self.discriminator.init(kdb, sample)}
        pool_dtype = jnp.dtype(cfg.model.compute_dtype)
        img_shape = (hw, hw, cfg.model.out_channels)
        global_pool = ImagePool(cfg.opt.pool_size * self.n_devices)
        return DCLGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema={d: jax.tree_util.tree_map(jnp.copy, g_params[d]["gen"])
                 for d in self.directions},
            pool_a=global_pool.init(img_shape, pool_dtype),
            pool_b=global_pool.init(img_shape, pool_dtype),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> DCLGANState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> DCLGANState:
        rep, shard0 = P(), P(self.axis)

        def bc(spec, subtree):
            return jax.tree_util.tree_map(lambda _: spec, subtree)

        return DCLGANState(
            g_params=bc(rep, state_like.g_params),
            d_params=bc(rep, state_like.d_params),
            g_opt=bc(rep, state_like.g_opt),
            d_opt=bc(rep, state_like.d_opt),
            ema=bc(rep, state_like.ema),
            pool_a=PoolState(buffer=shard0, count=rep),
            pool_b=PoolState(buffer=shard0, count=rep),
            rng=rep, step=rep, ada_p=rep)

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------
    def _gen_apply(self, gen_params, x):
        fn = lambda p, v: self.generator.apply(p, v)
        if self._remat == "full":
            fn = jax.checkpoint(fn)
        return fn(gen_params, x)

    def _enc(self):
        enc = lambda p, v: self.generator.apply(
            p, v, self.taps, method=ResNetGenerator.encode_features)
        if self._remat == "full":
            enc = jax.checkpoint(enc)
        return enc

    def _nce_dual(self, src_branch, dst_branch, src_img, dst_img, key):
        """The DCL cross-embedding PatchNCE: keys = patches of ``src_img``
        through ``src_branch``'s encoder + heads, queries = patches of
        ``dst_img`` (the translation, an image of the OTHER domain) through
        ``dst_branch``'s encoder + heads. Matched spatial ids per tap, mean
        over taps (CUT weighting)."""
        cfg = self.cfg
        enc = self._enc()
        f_k = enc(src_branch["gen"], src_img)
        f_q = enc(dst_branch["gen"], dst_img)
        total = jnp.float32(0.0)
        for i, (fk, fq) in enumerate(zip(f_k, f_q)):
            b, h, w, _ = fk.shape
            n = min(self.n_patches, h * w)
            idx = sample_patch_ids(jax.random.fold_in(key, i), b, h * w, n)
            q = self.head.apply(dst_branch["heads"][i],
                                _sample_patches(fq, idx))
            k = self.head.apply(src_branch["heads"][i],
                                _sample_patches(fk, idx))
            total = total + L.patch_nce_loss(q, k, cfg.loss.nce_temperature)
        return total / len(self.taps)

    # ------------------------------------------------------------------
    def _device_step(self, state: DCLGANState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        D = self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("pool_a", "pool_b", "aug_a", "aug_b",
                                      "nce_a", "nce_b"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)

        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        lam_id = loss_cfg.lambda_identity  # ABSOLUTE weight (no cycle term)

        # ---------------- G update (both generators + both head sets) ----
        def g_loss_fn(g_params):
            fake_b = self._gen_apply(g_params["a2b"]["gen"], real_a)
            fake_a = self._gen_apply(g_params["b2a"]["gen"], real_b)
            adv = (
                L.gan_loss_g(D.apply(state.d_params["b"], T(fake_b, 0)),
                             loss_cfg.gan_mode)
                + L.gan_loss_g(D.apply(state.d_params["a"], T(fake_a, 1)),
                               loss_cfg.gan_mode))
            # dual cross-embedding NCE (the encoder halves of the full
            # generator applies above are CSE'd by XLA — the same structural
            # free-features property the CUT trainer relies on)
            nce_a = self._nce_dual(g_params["a2b"], g_params["b2a"],
                                   real_a, fake_b, keys["nce_a"])
            nce_b = self._nce_dual(g_params["b2a"], g_params["a2b"],
                                   real_b, fake_a, keys["nce_b"])
            total = adv + loss_cfg.lambda_nce * (nce_a + nce_b)
            idt = jnp.float32(0.0)
            if lam_id > 0:
                idt_b = self._gen_apply(g_params["a2b"]["gen"], real_b)
                idt_a = self._gen_apply(g_params["b2a"]["gen"], real_a)
                idt = lam_id * (L.identity_loss(real_b, idt_b)
                                + L.identity_loss(real_a, idt_a))
                total = total + idt
            return total, {"fake_a": fake_a, "fake_b": fake_b, "g_adv": adv,
                           "nce_a": nce_a, "nce_b": nce_b, "g_idt": idt}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(
            state.ema,
            {d: g_params[d]["gen"] for d in self.directions},
            cfg.opt.ema_decay)

        # ---------------- replay pools ----------------
        pool_a, d_fake_a = self.pool.query(state.pool_a, aux["fake_a"],
                                           keys["pool_a"])
        pool_b, d_fake_b = self.pool.query(state.pool_b, aux["fake_b"],
                                           keys["pool_b"])

        dr_a, df_a = T(real_a, 2), T(d_fake_a, 3)
        dr_b, df_b = T(real_b, 4), T(d_fake_b, 5)

        # ---------------- D update ----------------
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
                daux["ada_rt"] = ada.ada_heuristic((ra, rb), loss_cfg.gan_mode)
            return total, daux

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        ada_p = state.ada_p
        if loss_cfg.ada_target > 0:
            rt = jax.lax.pmean(d_aux["ada_rt"], axis)
            ada_p = ada.ada_update_p(
                state.ada_p, rt, loss_cfg.ada_target,
                loss_cfg.ada_speed_kimg, cfg.data.batch_size)

        metrics = {
            "g_loss": g_loss, "d_loss": d_loss, "g_adv": aux["g_adv"],
            "nce_a": aux["nce_a"], "nce_b": aux["nce_b"],
            "g_idt": aux["g_idt"], "d_a": d_aux["d_a"], "d_b": d_aux["d_b"],
            "d_r1": d_aux["d_r1"], "lr": self._lr(state.step),
        }
        if self._ada:
            metrics["ada_p"] = ada_p
            if loss_cfg.ada_target > 0:
                metrics["ada_rt"] = d_aux["ada_rt"]
        metrics = jax.lax.pmean(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                   metrics), axis)
        new_state = state.replace(
            g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt,
            ema=ema, pool_a=pool_a, pool_b=pool_b, step=state.step + 1,
            ada_p=ada_p)
        return new_state, metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        batch_spec = P(self.axis)
        metric_names = ("g_loss", "d_loss", "g_adv", "nce_a", "nce_b",
                        "g_idt", "d_a", "d_b", "d_r1", "lr")
        if self._ada:
            metric_names += ("ada_p",)
            if self.cfg.loss.ada_target > 0:
                metric_names += ("ada_rt",)
        out_metric_specs = {k: P() for k in metric_names}
        shmapped = jax.shard_map(
            self._device_step, mesh=self.mesh,
            in_specs=(specs, batch_spec, batch_spec),
            out_specs=(specs, out_metric_specs), check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    def train_step(self, state: DCLGANState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(params, x.astype(jnp.float32))

    def translate(self, ema_params, x, direction: str = "a2b"):
        if direction not in self.directions:
            raise ValueError(f"direction must be one of {self.directions}")
        return self._eval_step(ema_params[direction], x)
