"""CUT trainer — contrastive unpaired translation (SURVEY.md §2
"CUT/contrastive variant"; BASELINE.json config rung 4).

Single generator + single discriminator; cycle consistency is replaced by
PatchNCE: multilayer encoder features of the input x and of the translation
G(x) are compared contrastively at matched spatial locations (positives) vs
other locations in the same image (internal negatives), through per-layer
2-layer MLP projection heads trained jointly with G. An identity NCE term
(y vs G(y)) regularizes the target domain.

TPU structure mirrors CycleGANTrainer: ONE jitted XLA program per step
(G+heads update → optional replay pool → D update → EMA), shard_mapped over
the ``data`` axis with pmean'd grads; patch sampling is a batched gather and
each per-layer NCE is one (N×N) matmul per image — MXU-friendly.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn, struct
from jax.sharding import Mesh, PartitionSpec as P

from uig.config import Config
from uig.kernels.augment import augment
from uig.models import PatchDiscriminator, ResNetGenerator
from uig.runtime.prng import fold_step, split_named
from uig.train import ada
from uig.train import losses as L
from uig.train.ema import ema_update
from uig.train.pool import ImagePool, PoolState
from uig.train.microbatch import validate_grad_accum
from uig.train.state import lr_schedule, make_optimizer


class ProjectionHead(nn.Module):
    """Per-tap 2-layer MLP: C -> dim -> dim (unit-norm happens in the loss)."""

    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)


class CUTState(struct.PyTreeNode):
    g_params: dict  # {"gen": ..., "heads": [...]}
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": generator params}
    pool_b: PoolState
    rng: jax.Array
    step: jax.Array
    # ADA augmentation probability (train/ada.py); () f32 carried state
    ada_p: jax.Array = None


def _sample_patches(feat: jax.Array, idx: jax.Array) -> jax.Array:
    """feat (B, H, W, C), idx (B, N) flat spatial ids -> (B, N, C)."""
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def sample_patch_ids(key: jax.Array, batch: int, hw: int, n: int) -> jax.Array:
    """(batch, n) flat spatial ids sampled WITHOUT replacement per image
    (canonical CUT uses randperm[:n]): top-n of per-image uniform keys is a
    uniform random n-subset of distinct locations. Duplicate ids would put
    the positive key in the negative set (identical logits) and inflate the
    NCE loss floor — ~8 expected collisions at 256 draws on a 64² map."""
    scores = jax.random.uniform(key, (batch, hw))
    _, idx = jax.lax.top_k(scores, n)
    return idx


class CUTTrainer:
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
        self.generator = ResNetGenerator(
            out_channels=m.out_channels, base_features=m.g_base_features,
            n_res_blocks=m.n_res_blocks, norm=m.norm, pad_mode=m.padding,
            upsample=m.upsample, resample=m.resample, head_s2d=m.head_s2d, stem_s2d=m.stem_s2d, stem_dx_s2d=m.stem_dx_s2d,
            down_s2d=m.down_s2d,
            remat_blocks=self._remat == "blocks", conv_impl=m.conv_impl, pad_impl=m.pad_impl,
            dtype=dt,
        )
        self.eval_generator = self.generator.copy(
            dtype=jnp.dtype(m.eval_dtype), remat_blocks=False)
        self.discriminator = PatchDiscriminator(
            base_features=m.d_base_features, n_layers=m.d_layers, norm=m.norm,
            dtype=dt,
        )
        n_layers = self.generator.num_layers
        self.taps = tuple(i for i in m.nce_layers if i < n_layers)
        if not self.taps:
            raise ValueError(
                f"model.nce_layers={m.nce_layers} are all out of range for "
                f"this generator (valid feature-tap indices: 0..{n_layers - 1})"
            )
        if len(self.taps) != len(m.nce_layers):
            dropped = tuple(i for i in m.nce_layers if i >= n_layers)
            raise ValueError(
                f"model.nce_layers contains out-of-range taps {dropped}; "
                f"valid feature-tap indices for this generator: "
                f"0..{n_layers - 1}"
            )
        self.n_patches = m.nce_patches
        self.head = ProjectionHead(m.nce_proj_dim, dtype=dt)
        self.g_tx = make_optimizer(cfg.opt)
        self.d_tx = make_optimizer(cfg.opt, lr_scale=cfg.opt.d_lr_ratio)
        self.pool = ImagePool(cfg.opt.pool_size)
        self.perceptual_fn = perceptual_fn
        self._lr = lr_schedule(cfg.opt)
        validate_grad_accum(cfg, 'CUTTrainer', supported=False)
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
        kg, kd, kh = jax.random.split(rng, 3)
        gen_params = self.generator.init(kg, sample)
        # head init needs per-tap channel dims from a real forward
        _, feats = self.generator.apply(
            gen_params, sample, self.taps,
            method=ResNetGenerator.with_features)
        heads = []
        for i, f in enumerate(feats):
            heads.append(self.head.init(jax.random.fold_in(kh, i),
                                        jnp.zeros((1, 1, f.shape[-1]))))
        g_params = {"gen": gen_params, "heads": heads}
        d_params = self.discriminator.init(kd, sample)
        pool_dtype = jnp.dtype(cfg.model.compute_dtype)
        img_shape = (hw, hw, cfg.model.out_channels)
        global_pool = ImagePool(cfg.opt.pool_size * self.n_devices)
        return CUTState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            ema={"a2b": jax.tree_util.tree_map(jnp.copy, gen_params)},
            pool_b=global_pool.init(img_shape, pool_dtype),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ada_p=jnp.asarray(cfg.loss.ada_p_init, jnp.float32),
        )

    def init_state(self, rng: jax.Array) -> CUTState:
        state = self._abstract_state(rng)
        return jax.device_put(state, self.state_shardings())

    def _specs_for(self, state_like) -> CUTState:
        rep, shard0 = P(), P(self.axis)

        def bc(spec, subtree):
            return jax.tree_util.tree_map(lambda _: spec, subtree)

        return CUTState(
            g_params=bc(rep, state_like.g_params),
            d_params=bc(rep, state_like.d_params),
            g_opt=bc(rep, state_like.g_opt),
            d_opt=bc(rep, state_like.d_opt),
            ema=bc(rep, state_like.ema),
            pool_b=PoolState(buffer=shard0, count=rep),
            rng=rep,
            step=rep,
            ada_p=rep,
        )

    def state_shardings(self):
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------
    def _gen_apply(self, gen_params, x):
        """Full generator forward; model.remat="full" wraps it in
        jax.checkpoint (CycleGAN/VQGAN/VAE-GAN honor "full" the same way —
        without this, "full" was silently a no-op for CUT)."""
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

    def _enc_taps(self, g_params, imgs):
        """Encoder features for several same-shape images in ONE len(imgs)·B
        apply (they all share generator params — model.fused_applies).
        Returns per-tap lists of per-image features."""
        feats = self._enc()(g_params["gen"], jnp.concatenate(imgs, 0))
        return [jnp.split(f, len(imgs), 0) for f in feats]

    def _nce_from_feats(self, g_params, f_src, f_dst, key, flip_q=None):
        """``flip_q``: FastCUT flip-equivariance — () bool; where true, the
        QUERY features (f_dst, from G's output on the flipped input) are
        flipped back along W before patch matching while the keys stay
        as-is (the published q/k misalignment that regularizes G toward
        flip-equivariance)."""
        cfg = self.cfg
        total = jnp.float32(0.0)
        for i, (fs, fd) in enumerate(zip(f_src, f_dst)):
            if flip_q is not None:
                fd = jnp.where(flip_q, fd[:, :, ::-1, :], fd)
            b, h, w, _ = fs.shape
            n = min(self.n_patches, h * w)
            idx = sample_patch_ids(jax.random.fold_in(key, i), b, h * w, n)
            q = self.head.apply(g_params["heads"][i], _sample_patches(fd, idx))
            k = self.head.apply(g_params["heads"][i], _sample_patches(fs, idx))
            total = total + L.patch_nce_loss(q, k, cfg.loss.nce_temperature)
        return total / len(self.taps)

    def _nce(self, g_params, src_img, dst_img, key, flip_q=None):
        """PatchNCE between encoder features of src and dst images
        (encoder-only forwards — the decoder half is skipped)."""
        enc = self._enc()
        f_src = enc(g_params["gen"], src_img)
        f_dst = enc(g_params["gen"], dst_img)
        return self._nce_from_feats(g_params, f_src, f_dst, key, flip_q)

    def _device_step(self, state: CUTState, real_a, real_b):
        cfg = self.cfg
        loss_cfg = cfg.loss
        axis = self.axis
        D = self.discriminator
        dt = jnp.dtype(cfg.model.compute_dtype)

        step_key = fold_step(state.rng, state.step)
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        keys = split_named(step_key, ("pool", "aug_a", "aug_b", "nce", "nce_idt"))

        crop = cfg.model.image_size
        if real_a.dtype == jnp.uint8:
            real_a = augment(real_a, keys["aug_a"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
            real_b = augment(real_b, keys["aug_b"], crop, out_dtype=dt,
                             impl=cfg.data.augment)
        else:
            real_a = real_a.astype(dt)
            real_b = real_b.astype(dt)

        fuse = cfg.model.fused_applies

        # FastCUT flip-equivariance: with p=0.5 the WHOLE batch (both
        # domains — the canonical implementation flips its concatenated
        # real tensor) is mirrored for this step; the NCE query features
        # are flipped back inside _nce_from_feats. D trains on the
        # flipped images — mirroring is domain-preserving.
        flip_q = None
        if loss_cfg.nce_flip_equivariance:
            flip_q = jax.random.bernoulli(jax.random.fold_in(step_key, 0xF11))
            real_a = jnp.where(flip_q, real_a[:, :, ::-1, :], real_a)
            real_b = jnp.where(flip_q, real_b[:, :, ::-1, :], real_b)

        # ADA: augment every D input (train/ada.py) — the fake in the G
        # adversarial term, and the real/pool-fake pair in the D loss.
        if self._ada:
            ada_key = jax.random.fold_in(step_key, 0xADA)
            T = lambda x, i: ada.diff_augment(
                x, jax.random.fold_in(ada_key, i), state.ada_p, self._ada_ops)
        else:
            T = lambda x, i: x

        def g_loss_fn(g_params):
            if fuse and loss_cfg.nce_include_identity:
                # all same-params passes batched (model.fused_applies):
                # fake+identity generator passes as ONE 2B apply, then the
                # FOUR nce encoder passes as ONE 4B encoder apply
                fake_b, idt_b = jnp.split(self._gen_apply(
                    g_params["gen"],
                    jnp.concatenate([real_a, real_b], 0)), 2, 0)
                taps = self._enc_taps(
                    g_params, [real_a, fake_b, real_b, idt_b])
                nce = self._nce_from_feats(
                    g_params, [t[0] for t in taps], [t[1] for t in taps],
                    keys["nce"], flip_q)
                nce_idt = self._nce_from_feats(
                    g_params, [t[2] for t in taps], [t[3] for t in taps],
                    keys["nce_idt"], flip_q)
            else:
                fake_b = self._gen_apply(g_params["gen"], real_a)
                if fuse:
                    taps = self._enc_taps(g_params, [real_a, fake_b])
                    nce = self._nce_from_feats(
                        g_params, [t[0] for t in taps], [t[1] for t in taps],
                        keys["nce"], flip_q)
                else:
                    nce = self._nce(g_params, real_a, fake_b, keys["nce"],
                                    flip_q)
                nce_idt = jnp.float32(0.0)
                if loss_cfg.nce_include_identity:
                    idt_b = self._gen_apply(g_params["gen"], real_b)
                    nce_idt = self._nce(g_params, real_b, idt_b,
                                        keys["nce_idt"], flip_q)
            adv = L.gan_loss_g(D.apply(state.d_params, T(fake_b, 0)),
                               loss_cfg.gan_mode)
            total = adv + loss_cfg.lambda_nce * nce
            if loss_cfg.nce_include_identity:
                total = total + loss_cfg.lambda_nce * nce_idt
            return total, {"fake_b": fake_b, "g_adv": adv, "nce": nce,
                           "nce_idt": nce_idt}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema = ema_update(state.ema, {"a2b": g_params["gen"]}, cfg.opt.ema_decay)

        pool_b, d_fake_b = self.pool.query(state.pool_b, aux["fake_b"],
                                           keys["pool"])

        # R1 penalizes grad at D's ACTUAL input — the augmented reals.
        dr_b, df_b = T(real_b, 1), T(d_fake_b, 2)

        def d_loss_fn(d_params):
            if fuse:
                rb, fb = jnp.split(D.apply(
                    d_params, jnp.concatenate([dr_b, df_b], 0)), 2, 0)
            else:
                rb = D.apply(d_params, dr_b)
                fb = D.apply(d_params, df_b)
            total = L.gan_loss_d(rb, fb, loss_cfg.gan_mode)
            if loss_cfg.r1_gamma > 0:
                total = total + loss_cfg.r1_gamma * L.r1_penalty(
                    D.apply, d_params, dr_b)
            aux = {}
            if loss_cfg.ada_target > 0:
                aux["ada_rt"] = ada.ada_heuristic(rb, loss_cfg.gan_mode)
            return total, aux

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
            "nce": aux["nce"], "nce_idt": aux["nce_idt"],
            "lr": self._lr(state.step),
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
            ema=ema, pool_b=pool_b, step=state.step + 1, ada_p=ada_p)
        return new_state, metrics

    def _build_train_step(self):
        abstract = jax.eval_shape(self._abstract_state, jax.random.PRNGKey(0))
        specs = self._specs_for(abstract)
        batch_spec = P(self.axis)
        metric_names = ("g_loss", "d_loss", "g_adv", "nce", "nce_idt", "lr")
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

    def train_step(self, state: CUTState, batch):
        real_a, real_b = batch
        return self._train_step(state, real_a, real_b)

    # ------------------------------------------------------------------
    def _eval_apply(self, params, x):
        with jax.default_matmul_precision("highest"):
            return self.eval_generator.apply(params, x.astype(jnp.float32))

    def translate(self, ema_params, x, direction: str = "a2b"):
        if direction != "a2b":
            raise ValueError("CUT is single-direction (a2b)")
        return self._eval_step(ema_params["a2b"], x)
