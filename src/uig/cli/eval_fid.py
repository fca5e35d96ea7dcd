"""`uig eval-fid` — SURVEY.md §3 call stack 4: restore EMA generator,
translate the eval stream, extract features (jitted), stream mean/cov,
Fréchet distance vs the real target-domain statistics."""

from __future__ import annotations

import numpy as np


def run_eval_fid(run_dir: str, direction: str = "a2b",
                 num_samples: int | None = None, step: int | None = None,
                 batch_size: int = 16, overrides=(), kid: bool = False,
                 prdc: bool = False, prdc_k: int = 5,
                 inception_score: bool = False, is_splits: int = 10,
                 ref_stats: str | None = None, diversity: int = 0,
                 target_domain: int | None = None):
    """Returns FID, or (KID mean, KID std) when ``kid`` — the unbiased
    small-sample metric (polynomial-kernel MMD over the same features) —
    or a {precision, recall, density, coverage} dict when ``prdc`` (the
    fidelity-vs-diversity decomposition, k-NN manifold estimate).

    Multi-domain runs (kind=stargan/starganv2): reals are the
    ``target_domain`` (default 0) eval images; fakes are every OTHER
    domain's eval images translated into it (round-robin; v2 uses its
    deterministic seed-0 mapping-network style). ``direction`` is
    ignored."""
    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.data import eval_datasets
    from uig.eval.fid import FIDStats, compute_fid, compute_kid, make_feature_fn
    from uig.kernels import center_crop_normalize

    if ref_stats and (kid or prdc or inception_score or diversity):
        raise ValueError("--ref-stats is FID-only: KID/PRDC need the raw "
                         "real features and IS/diversity never look at reals")
    cfg, trainer, state = load_run(run_dir, step, overrides)
    crop = cfg.model.image_size
    if cfg.model.kind in ("stargan", "starganv2"):
        from uig.data import multidomain_eval_datasets

        domains = multidomain_eval_datasets(cfg)
        t = target_domain or 0
        tgt = domains[t]
        sources = [d for i, d in enumerate(domains) if i != t]
        n = num_samples or cfg.eval.fid_num_samples
        n = min(n, *[len(d) for d in domains])
        direction = f"->domain{t}"

        def real_batches():
            for s in range(0, n, batch_size):
                raw = np.stack(
                    [tgt[i] for i in range(s, min(s + batch_size, n))])
                yield center_crop_normalize(jnp.asarray(raw), crop)

        def source_batches():
            for s in range(0, n, batch_size):
                raw = np.stack(
                    [sources[i % len(sources)][i]
                     for i in range(s, min(s + batch_size, n))])
                yield center_crop_normalize(jnp.asarray(raw), crop)

        def fake_batches():
            for x in source_batches():
                yield trainer.translate(state.ema, x, t)
    else:
        ds_a, ds_b = eval_datasets(cfg)
        src, tgt = (ds_a, ds_b) if direction == "a2b" else (ds_b, ds_a)

        n = num_samples or cfg.eval.fid_num_samples
        n = min(n, len(src), len(tgt))

        def real_batches():
            for s in range(0, n, batch_size):
                raw = np.stack(
                    [tgt[i] for i in range(s, min(s + batch_size, n))])
                yield center_crop_normalize(jnp.asarray(raw), crop)

        def source_batches():
            for s in range(0, n, batch_size):
                raw = np.stack(
                    [src[i] for i in range(s, min(s + batch_size, n))])
                yield center_crop_normalize(jnp.asarray(raw), crop)

        def fake_batches():
            for x in source_batches():
                yield trainer.translate(state.ema, x, direction)

    if diversity:
        # Multimodal output diversity (the MUNIT / StarGAN-v2 papers'
        # LPIPS-diversity protocol): the SAME sources translated under
        # `diversity` different style seeds, mean pairwise LPIPS across
        # seeds. Higher = more distinct output modes; a collapsed
        # style pathway scores ~0. Deterministic families have one output
        # mode by construction — loud error, not a meaningless 0.
        import jax

        from uig.eval.lpips import make_lpips

        if diversity < 2:
            raise ValueError("--diversity needs >=2 style seeds")
        kind = cfg.model.kind
        if kind == "munit":
            def tr_fn(x, s):
                return trainer.translate(
                    state.ema, x, direction,
                    style_rng=jax.random.PRNGKey(s))
        elif kind == "starganv2":
            tt = target_domain or 0

            def tr_fn(x, s):
                return trainer.translate(state.ema, x, tt, style_seed=s)
        else:
            raise ValueError(
                f"--diversity needs a multimodal family (munit|starganv2); "
                f"kind={kind!r} is deterministic per input")
        w = cfg.eval.vgg_weights or None
        lp = jax.jit(make_lpips(cfg, weights_path=w))
        dname = "lpips_vgg" if w else "lpips_untrained"
        tot, cnt = 0.0, 0
        for x in source_batches():
            ys = [tr_fn(x, s) for s in range(diversity)]
            for i in range(len(ys)):
                for j in range(i + 1, len(ys)):
                    tot += float(lp(ys[i], ys[j]))
                    cnt += 1
        div = tot / cnt
        print(f"diversity[{dname}] over {n} samples x {diversity} seeds "
              f"({direction}): {div:.4f}")
        return div

    if inception_score:
        # IS scores the translated stream alone — class probabilities from
        # the fc head (never part of the FID feature path).
        import jax

        from uig.eval.inception import init_inception
        from uig.eval.is_score import compute_inception_score

        w = cfg.eval.inception_weights or None
        if not w:
            raise ValueError(
                "Inception Score needs eval.inception_weights (exported "
                "with scripts/export_weights.py inception --fc 1000); the "
                "random-feature fallback has no class head")
        loaded = np.load(w)
        if "params/fc/kernel" not in loaded:
            raise ValueError(
                f"{w} has no fc head — re-export with --fc 1000")
        nc = int(loaded["params/fc/kernel"].shape[1])
        apply_fn, variables = init_inception(w, num_classes=nc)
        logits_fn = jax.jit(lambda x: apply_fn(variables, x))
        mean, std = compute_inception_score(fake_batches(), logits_fn,
                                            splits=is_splits, num_classes=nc)
        print(f"IS[inception_fc{nc}] over {n} samples ({direction}, "
              f"{is_splits} splits): {mean:.4f} ± {std:.4f}")
        return mean, std

    feature_fn, name = make_feature_fn(cfg)
    if prdc:
        from uig.eval.prdc import compute_prdc

        out = compute_prdc(real_batches(), fake_batches(), feature_fn,
                           k=prdc_k)
        print(f"PRDC[{name}] over {n} samples ({direction}, k={prdc_k}): "
              + " ".join(f"{k_}={v:.4f}" for k_, v in out.items()))
        return out
    if kid:
        mean, std = compute_kid(real_batches(), fake_batches(), feature_fn)
        print(f"KID[{name}] over {n} samples ({direction}): "
              f"{mean:.6f} ± {std:.6f}")
        return mean, std
    if ref_stats:
        st, st_name, st_size = FIDStats.load(ref_stats)
        if st_name != name:
            raise ValueError(
                f"--ref-stats {ref_stats} was computed with extractor "
                f"{st_name!r} but this run resolves to {name!r} — recompute "
                "with `uig fid-stats` under the same eval settings")
        if st_size != crop:
            raise ValueError(
                f"--ref-stats {ref_stats} was computed at image_size "
                f"{st_size}, this run evaluates at {crop}")
        fid = compute_fid(None, fake_batches(), feature_fn, real_stats=st)
        print(f"FID[{name}] over {n} samples vs precomputed real stats "
              f"(n={st.n}) ({direction}): {fid:.4f}")
        return fid
    fid = compute_fid(real_batches(), fake_batches(), feature_fn)
    print(f"FID[{name}] over {n} samples ({direction}): {fid:.4f}")
    return fid
