"""GcGAN trainer — geometry-consistent one-sided unpaired translation
(Fu et al. CVPR 2019, "Geometry-Consistent Generative Adversarial Networks
for One-Sided Unsupervised Domain Mapping"; twelfth family of the lineage
SURVEY.md §0 derives the capability surface from; the reference repo is an
empty stub — /root/reference/README.md:1).

The idea vs CUT/DCLGAN: content is held in place by a GEOMETRIC consistency
instead of a cycle or a contrastive term. Pick a fixed geometric transform
``f`` (90° rotation or vertical flip — deliberately NOT horizontal flip,
which is a data-augmentation symmetry of most domains) and require the
translator to commute with it:

    G(f(x)) == f(G(x))

Both streams are adversarially trained — D_b judges G(x) against real y,
and a SECOND discriminator D_bgc judges G(f(x)) against f(y) — and the
geometry-consistency L1 is enforced in both directions
(``f(G(x)) vs G(f(x))`` and ``f⁻¹(G(f(x))) vs G(x)``). One generator, no
inverse mapping, no cycle.

TPU structure: the two generator streams share parameters and shapes, so
they run as ONE 2B-batch apply inside the single jitted shard_map step —
unlike CUT's NCE encoder passes (where batching defeats XLA's CSE against
the full applies, measured −12%, BASELINE.md round 3) the two gc streams
are different images, so there is nothing to CSE and the 2B batching is the
idiomatic lowering (InstanceNorm is per-example, so the math is exact).
``model.fused_applies=True`` additionally folds the optional identity pass
G(y) into the same apply (3B). Grads pmean over the ``data`` axis, donated
state, bf16 compute / fp32 losses; the gc L1 itself is computed in fp32.

Knobs: ``model.gc_transform`` (rot90 | vflip), ``loss.lambda_gc`` (weight of
the summed two-direction gc L1), ``loss.lambda_identity`` (ABSOLUTE L1
identity weight, as in the DCLGAN trainer — there is no cycle weight to
scale by). R1, ADA, pools and EMA work exactly as in the other trainers.
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
from uig.train.ema import ema_update
from uig.train.microbatch import validate_grad_accum
from uig.train.pool import ImagePool, PoolState
from uig.train.state import lr_schedule, make_optimizer

GC_TRANSFORMS = ("rot90", "vflip")


def gc_apply(x: jax.Array, transform: str) -> jax.Array:
    """The geometric transform f over NHWC images (static, XLA-free-ish:
    rot90 is a transpose+reverse, vflip a reverse — both fuse)."""
    if transform == "rot90":
        return jnp.rot90(x, k=1, axes=(1, 2))
    if transform == "vflip":
        return x[:, ::-1, :, :]
    raise ValueError(f"gc_transform must be one of {GC_TRANSFORMS}")


def gc_inverse(x: jax.Array, transform: str) -> jax.Array:
    """f⁻¹ (rot90 inverts with k=-1; vflip is an involution)."""
    if transform == "rot90":
        return jnp.rot90(x, k=-1, axes=(1, 2))
    if transform == "vflip":
        return x[:, ::-1, :, :]
    raise ValueError(f"gc_transform must be one of {GC_TRANSFORMS}")


class GcGANState(struct.PyTreeNode):
    g_params: dict  # {"a2b": generator params} — one-sided
    d_params: dict  # {"b": D on y/G(x), "b_gc": D on f(y)/G(f(x))}
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": gen params} — serving weights
    pool_b: PoolState  # historical fake-B images (feed D_b)
    pool_bgc: PoolState  # historical transformed-stream fakes (feed D_bgc)
    rng: jax.Array
    step: jax.Array
    ada_p: jax.Array = None


class GcGANTrainer:
    directions = ("a2b",)

    def __init__(self, cfg: Config, mesh: Mesh,
                 perceptual_fn: Callable | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = cfg.parallel.data_axis
        m = cfg.model
        dt = jnp.dtype(m.compute_dtype)
        from uig.config.config import remat_mode

        self._remat = remat_mode(m.remat)
        if m.gc_transform not in GC_TRANSFORMS:
            raise ValueError(
                f"model.gc_transform={m.gc_transform!r} — must be one of "
                f"{GC_TRANSFORMS} (GcGAN needs an exact invertible transform "
                "that is NOT an augmentation symmetry; hflip is excluded)")
        self.transform = m.gc_transform
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
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.pool = ImagePool(cfg.opt.pool_size)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, "GcGANTrainer", supported=False)
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
        kg, kd, kdg = jax.random.split(rng, 3)
        g_params = {"a2b": self.generator.init(kg, sample)}
        d_params = {"b": self.discriminator.init(kd, sample),
                    "b_gc": self.discriminator.init(kdg, sample)}
        pool_dtype = jnp.dtype(cfg.model.compute_dtype)
        img_shape = (hw, hw, cfg.model.out_channels)
        global_pool = ImagePool(cfg.opt.pool_size * self.n_devices)
        return GcGANState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema={"a2b": jax.tree_util.tree_map(jnp.copy, g_params["a2b"])},
            pool_b=global_pool.init(img_shape, pool_dtype),
            pool_bgc=global_pool.init(img_shape, pool_dtype),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> GcGANState:
        return jax.device_put(self._abstract_state(rng), self.state_shardings())

    def _specs_for(self, state_like) -> GcGANState:
        rep, shard0 = P(), P(self.axis)

        def bc(spec, subtree):
            return jax.tree_util.tree_map(lambda _: spec, subtree)

        return GcGANState(
            g_params=bc(rep, state_like.g_params),
            d_params=bc(rep, state_like.d_params),
            g_opt=bc(rep, state_like.g_opt),
            d_opt=bc(rep, state_like.d_opt),
            ema=bc(rep, state_like.ema),
            pool_b=PoolState(buffer=shard0, count=rep),
            pool_bgc=PoolState(buffer=shard0, count=rep),
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

    # ------------------------------------------------------------------
    def _device_step(self, state: GcGANState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        D = self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)
        f, f_inv = (lambda x: gc_apply(x, self.transform),
                    lambda x: gc_inverse(x, self.transform))

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("pool_b", "pool_bgc", "aug_a", "aug_b"))

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
        b = real_a.shape[0]

        # ---------------- G update ----------------
        def g_loss_fn(g_params):
            # the two gc streams (and, under fused_applies, the identity
            # pass) share params and shapes: ONE batched apply
            streams = [real_a, f(real_a)]
            fold_idt = lam_id > 0 and cfg.model.fused_applies
            if fold_idt:
                streams.append(real_b)
            out = self._gen_apply(g_params["a2b"], jnp.concatenate(streams))
            fake_b, fake_b_gc = out[:b], out[b:2 * b]
            adv = (
                L.gan_loss_g(D.apply(state.d_params["b"], T(fake_b, 0)),
                             loss_cfg.gan_mode)
                + L.gan_loss_g(D.apply(state.d_params["b_gc"],
                                       T(fake_b_gc, 1)),
                               loss_cfg.gan_mode))
            # geometry consistency, both directions, fp32.  NOTE: because f
            # is a pixel permutation, the two terms are mathematically
            # identical (value AND gradient): mean|f(G(x)) - G(f(x))| ==
            # mean|f_inv(G(f(x))) - G(x)|.  The sum therefore equals 2x a
            # single direction — the EFFECTIVE weight is 2*lambda_gc.  This
            # matches the GcGAN paper's written formulation; kept as the
            # two-term sum for parity, but tuners of loss.lambda_gc should
            # know about the implicit factor of 2.
            fb32, fbgc32 = (fake_b.astype(jnp.float32),
                            fake_b_gc.astype(jnp.float32))
            gc = (jnp.abs(f(fb32) - fbgc32).mean()
                  + jnp.abs(f_inv(fbgc32) - fb32).mean())
            total = adv + loss_cfg.lambda_gc * gc
            idt = jnp.float32(0.0)
            if lam_id > 0:
                idt_b = out[2 * b:] if fold_idt else \
                    self._gen_apply(g_params["a2b"], real_b)
                idt = lam_id * L.identity_loss(real_b, idt_b)
                total = total + idt
            return total, {"fake_b": fake_b, "fake_b_gc": fake_b_gc,
                           "g_adv": adv, "g_gc": gc, "g_idt": idt}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, {"a2b": g_params["a2b"]},
                         cfg.opt.ema_decay)

        # ---------------- replay pools ----------------
        pool_b, d_fake_b = self.pool.query(state.pool_b, aux["fake_b"],
                                           keys["pool_b"])
        pool_bgc, d_fake_bgc = self.pool.query(state.pool_bgc,
                                               aux["fake_b_gc"],
                                               keys["pool_bgc"])

        # D_bgc's real distribution is the TRANSFORMED target domain
        dr_b, df_b = T(real_b, 2), T(d_fake_b, 3)
        dr_bgc, df_bgc = T(f(real_b), 4), T(d_fake_bgc, 5)

        # ---------------- D update ----------------
        def d_loss_fn(d_params):
            rb = D.apply(d_params["b"], dr_b)
            fb = D.apply(d_params["b"], df_b)
            rg = D.apply(d_params["b_gc"], dr_bgc)
            fg = D.apply(d_params["b_gc"], df_bgc)
            lb = L.gan_loss_d(rb, fb, loss_cfg.gan_mode)
            lg = L.gan_loss_d(rg, fg, loss_cfg.gan_mode)
            total = lb + lg
            r1 = jnp.float32(0.0)
            if loss_cfg.r1_gamma > 0:
                r1 = loss_cfg.r1_gamma * (
                    L.r1_penalty(D.apply, d_params["b"], dr_b)
                    + L.r1_penalty(D.apply, d_params["b_gc"], dr_bgc))
                total = total + r1
            daux = {"d_b": lb, "d_bgc": lg, "d_r1": r1}
            if loss_cfg.ada_target > 0:
                daux["ada_rt"] = ada.ada_heuristic((rb, rg), loss_cfg.gan_mode)
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
            "g_gc": aux["g_gc"], "g_idt": aux["g_idt"],
            "d_b": d_aux["d_b"], "d_bgc": d_aux["d_bgc"],
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
            ema=ema, pool_b=pool_b, pool_bgc=pool_bgc, step=state.step + 1,
            ada_p=ada_p)
        return new_state, metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        batch_spec = P(self.axis)
        metric_names = ("g_loss", "d_loss", "g_adv", "g_gc", "g_idt",
                        "d_b", "d_bgc", "d_r1", "lr")
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

    def train_step(self, state: GcGANState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(params, x.astype(jnp.float32))

    def translate(self, ema_params, x, direction: str = "a2b"):
        if direction != "a2b":
            raise ValueError("GcGAN is single-direction (a2b)")
        return self._eval_step(ema_params["a2b"], x)
