"""uig CLI — L7 (SURVEY.md §1, §3 call stacks 1/3/4).

    python -m uig.cli train --preset cyclegan128 --set opt.lr=1e-4 ...
    python -m uig.cli translate --run-dir ... --input-dir ... --output-dir ...
    python -m uig.cli eval-fid --run-dir ... [--num-samples 500]

``--set section.field=value`` implements the dotted-override surface; every
run dumps its resolved config to <workdir>/<name>/config.json.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE", help="dotted config override")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="uig")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model from a preset config")
    t.add_argument("--preset", required=True)
    t.add_argument("--config", help="JSON config file (overrides preset)")
    t.add_argument("--max-steps", type=int, default=None)
    _add_common(t)

    tr = sub.add_parser("translate", help="translate a directory of images")
    tr.add_argument("--run-dir", required=True,
                    help="training workdir (contains config.json + ckpt/)")
    tr.add_argument("--input-dir", required=True)
    tr.add_argument("--output-dir", required=True)
    tr.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    tr.add_argument("--batch-size", type=int, default=8)
    tr.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default latest)")
    tr.add_argument("--style-seed", type=int, default=None,
                    help="multimodal (kind=munit/starganv2) runs: sample ONE "
                         "style code from this seed for all images (munit: "
                         "N(0,I); starganv2: mapping network); vary it for a "
                         "different output mode")
    tr.add_argument("--style-ref", default=None,
                    help="multimodal (kind=munit/starganv2) runs: path to a "
                         "TARGET-domain reference image whose style guides "
                         "the translation")
    tr.add_argument("--target-domain", type=int, default=None,
                    help="multi-domain (kind=stargan/starganv2) runs: "
                         "integer domain to translate INTO (default 0); "
                         "--direction is ignored there")
    tr.add_argument("--source", default="auto",
                    choices=["auto", "folders", "packed", "tfrecord", "webdataset"],
                    help="input format (auto-detected by default)")
    tr.add_argument("--attention-dir", default=None,
                    help="attention (kind=ugatit) runs: also write each "
                         "image's CAM attention heatmap (grayscale PNG, "
                         "per-image normalized) to this directory")
    _add_common(tr)

    ev = sub.add_parser("eval-fid", help="FID of translated eval images")
    ev.add_argument("--run-dir", required=True)
    ev.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    ev.add_argument("--num-samples", type=int, default=None)
    ev.add_argument("--step", type=int, default=None)
    ev.add_argument("--kid", action="store_true",
                    help="report KID (unbiased small-sample metric) instead")
    ev.add_argument("--prdc", action="store_true",
                    help="report precision/recall/density/coverage (k-NN "
                         "manifold fidelity-vs-diversity) instead")
    ev.add_argument("--prdc-k", type=int, default=5,
                    help="k for the PRDC k-NN radius estimate (default 5)")
    ev.add_argument("--inception-score", action="store_true",
                    help="report Inception Score of the translated stream "
                         "instead (needs weights exported with --fc)")
    ev.add_argument("--is-splits", type=int, default=10,
                    help="IS split count (default 10)")
    ev.add_argument("--diversity", type=int, default=0, metavar="N_SEEDS",
                    help="multimodal (kind=munit|starganv2) runs: report "
                         "mean pairwise LPIPS over N style seeds of the "
                         "same sources instead (the papers' diversity "
                         "protocol)")
    ev.add_argument("--ref-stats", default=None,
                    help="precomputed real-domain statistics npz (from "
                         "`uig fid-stats`) — skips streaming the reals; "
                         "FID only")
    ev.add_argument("--target-domain", type=int, default=None,
                    help="multi-domain (kind=stargan) runs: domain whose "
                         "reals anchor the metric (default 0)")
    _add_common(ev)

    fs = sub.add_parser(
        "fid-stats", help="precompute a dataset's FID reference statistics "
                          "(reusable via eval-fid --ref-stats)")
    fs.add_argument("--data-dir", required=True,
                    help="image folder / packed .npy / tfrecord")
    fs.add_argument("--output", required=True, help="output .npz path")
    fs.add_argument("--image-size", type=int, required=True,
                    help="center-crop size — must match the eval run's "
                         "model.image_size")
    fs.add_argument("--num-samples", type=int, default=None)
    fs.add_argument("--batch-size", type=int, default=16)
    fs.add_argument("--load-size", type=int, default=None,
                    help="host resize before crop (default: config "
                         "data.load_size)")
    fs.add_argument("--source", default="auto",
                    choices=["auto", "folders", "packed", "tfrecord", "webdataset"])
    _add_common(fs)

    pk = sub.add_parser(
        "pack", help="pre-decode an image folder into a memmapped .npy")
    pk.add_argument("--input-dir", required=True)
    pk.add_argument("--output", required=True, help=".npy output path")
    pk.add_argument("--load-size", type=int, required=True)

    ex = sub.add_parser(
        "export", help="freeze the EMA translate path into a standalone "
                       "StableHLO serving artifact (jax.export)")
    ex.add_argument("--run-dir", required=True)
    ex.add_argument("--output-dir", required=True)
    ex.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    ex.add_argument("--batch-size", type=int, default=8)
    ex.add_argument("--step", type=int, default=None)
    ex.add_argument("--target-domain", type=int, default=None,
                    help="multi-domain (kind=stargan/starganv2) runs: bake "
                         "this target domain into the artifact")
    ex.add_argument("--style-seed", type=int, default=0,
                    help="kind=starganv2 runs: bake the mapping-network "
                         "style from this seed into the artifact (one "
                         "artifact per output mode)")
    ex.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering platforms baked into "
                         "the artifact (default: tpu,cpu)")
    _add_common(ex)

    sv = sub.add_parser(
        "serve", help="HTTP micro-batching server over an exported artifact "
                      "(POST /translate image bytes -> PNG)")
    sv.add_argument("--artifact", required=True,
                    help="directory written by `uig export`")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="micro-batching window: max wait after the first "
                         "queued request before dispatching a partial batch")

    sm = sub.add_parser(
        "sample", help="unconditional generation (vaegan prior / vqgan codes)")
    sm.add_argument("--run-dir", required=True)
    sm.add_argument("--output-dir", required=True)
    sm.add_argument("-n", type=int, default=16)
    sm.add_argument("--seed", type=int, default=0)
    sm.add_argument("--step", type=int, default=None)
    _add_common(sm)

    bm = sub.add_parser(
        "bench", help="per-rung throughput + roofline on this accelerator "
                      "(uig.metrics.perf_rungs; no args = every rung)")
    bm.add_argument("rungs", nargs="*", metavar="RUNG",
                    help="rung names (see --list); default: all")
    bm.add_argument("--list", action="store_true", help="list rung names")
    bm.add_argument("--steps", type=int, default=12)
    bm.add_argument("--repeats", type=int, default=3)
    bm.add_argument("--json", action="store_true", dest="as_json",
                    help="one JSON line per rung instead of the table")
    return p


def load_cfg(args):
    from uig.config import apply_overrides, config_from_dict, get_preset

    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = config_from_dict(json.load(f))
    else:
        cfg = get_preset(args.preset)
    return apply_overrides(cfg, args.overrides)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "train":
        from uig.train.loop import fit

        cfg = load_cfg(args)
        metrics = fit(cfg, max_steps=args.max_steps)
        print(json.dumps({"final_metrics": metrics}))
        return 0
    if args.cmd == "translate":
        from uig.cli.translate import run_translate

        n = run_translate(args.run_dir, args.input_dir, args.output_dir,
                          direction=args.direction, batch_size=args.batch_size,
                          step=args.step, overrides=args.overrides,
                          source=args.source, style_seed=args.style_seed,
                          style_ref=args.style_ref,
                          target_domain=args.target_domain,
                          attention_dir=args.attention_dir)
        print(json.dumps({"translated": n, "output_dir": args.output_dir}))
        return 0
    if args.cmd == "export":
        from uig.serving import export_translate

        meta = export_translate(
            args.run_dir, args.output_dir, direction=args.direction,
            batch_size=args.batch_size, step=args.step,
            overrides=args.overrides, target_domain=args.target_domain,
            style_seed=args.style_seed,
            platforms=tuple(p for p in args.platforms.split(",") if p))
        print(json.dumps({"exported": args.output_dir, "meta": meta}))
        return 0
    if args.cmd == "serve":
        from uig.serve import run_serve

        return run_serve(args.artifact, host=args.host, port=args.port,
                         max_delay_ms=args.max_delay_ms)
    if args.cmd == "pack":
        from uig.data.datasets import FolderDataset, PackedDataset

        src = FolderDataset(args.input_dir, args.load_size)
        n = PackedDataset.pack(src, args.output)
        print(json.dumps({"packed": n, "output": args.output}))
        return 0
    if args.cmd == "bench":
        from uig.metrics.perf_rungs import RUNGS, measure_rung

        if args.list:
            for name, (preset, _, batch) in RUNGS.items():
                print(f"{name:<22s} preset={preset} batch={batch}")
            return 0
        names = args.rungs or list(RUNGS)
        unknown = [n for n in names if n not in RUNGS]
        if unknown:
            print(f"unknown rung(s) {unknown}; `uig bench --list` shows "
                  f"the registry", file=sys.stderr)
            return 2
        rc = 0
        for name in names:
            try:
                r = measure_rung(name, steps=args.steps,
                                 repeats=args.repeats)
                if args.as_json:
                    print(json.dumps(r))
                else:
                    print(f"{name:<22s} {r['ms_step']:7.1f} ms/step  "
                          f"{r['img_s']:7.1f} img/s  {r['tf_step']:6.2f} "
                          f"TF/step  roofline {r['roofline']:.3f}",
                          flush=True)
            except Exception as e:
                print(f"{name:<22s} FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)
                rc = 1
        return rc
    if args.cmd == "sample":
        from uig.cli.sample import run_sample

        n = run_sample(args.run_dir, args.output_dir, n=args.n,
                       seed=args.seed, step=args.step, overrides=args.overrides)
        print(json.dumps({"sampled": n, "output_dir": args.output_dir}))
        return 0
    if args.cmd == "eval-fid":
        from uig.cli.eval_fid import run_eval_fid

        res = run_eval_fid(args.run_dir, direction=args.direction,
                           num_samples=args.num_samples, step=args.step,
                           overrides=args.overrides, kid=args.kid,
                           prdc=args.prdc, prdc_k=args.prdc_k,
                           inception_score=args.inception_score,
                           is_splits=args.is_splits,
                           ref_stats=args.ref_stats,
                           diversity=args.diversity,
                           target_domain=args.target_domain)
        if args.diversity:
            print(json.dumps({"diversity": res, "seeds": args.diversity}))
        elif args.inception_score:
            print(json.dumps({"is": res[0], "is_std": res[1]}))
        elif args.prdc:
            print(json.dumps(res))
        elif args.kid:
            print(json.dumps({"kid": res[0], "kid_std": res[1]}))
        else:
            print(json.dumps({"fid": res}))
        return 0
    if args.cmd == "fid-stats":
        from uig.cli.fid_stats import run_fid_stats

        extractor = run_fid_stats(
            args.data_dir, args.output, args.image_size,
            num_samples=args.num_samples, batch_size=args.batch_size,
            source=args.source, load_size=args.load_size,
            overrides=args.overrides)
        print(json.dumps({"stats": args.output, "extractor": extractor}))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
