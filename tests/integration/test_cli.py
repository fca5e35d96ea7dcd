"""End-to-end CLI flows (SURVEY.md §3 call stacks 1, 3, 4) on tiny shapes."""

import json
import os

import numpy as np
import pytest

from uig.cli.main import main
from uig.data.datasets import SyntheticUnpairedDataset


@pytest.fixture(scope="module")
def png_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    syn = SyntheticUnpairedDataset(n=8, load_size=20, seed=0)
    return syn.write_png_dirs(str(root))


def _overrides(tmp_path, name, dir_a, dir_b):
    return [
        "--set", "model.image_size=16", "--set", "model.n_res_blocks=1",
        "--set", "model.d_layers=2", "--set", "data.batch_size=2",
        "--set", "data.load_size=20", "--set", "data.source=folders",
        "--set", f"data.dir_a={dir_a}", "--set", f"data.dir_b={dir_b}",
        "--set", "data.num_workers=1", "--set", "opt.pool_size=4",
        "--set", "parallel.num_devices=2",
        "--set", f"run.workdir={tmp_path}", "--set", f"run.name={name}",
        "--set", "run.ckpt_every=2", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=4", "--set", "eval.sample_grid_n=2",
        "--set", "eval.fid_num_samples=8",
    ]


def test_train_translate_evalfid_cli(tmp_path, png_dirs, capsys):
    dir_a, dir_b = png_dirs
    run_dir = os.path.join(tmp_path, "clirun")

    rc = main(["train", "--preset", "smoke64", "--max-steps", "4"]
              + _overrides(tmp_path, "clirun", dir_a, dir_b))
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "g_loss" in out["final_metrics"]
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    # sample grid written at step 4
    samples = os.listdir(os.path.join(run_dir, "samples"))
    assert any(s.endswith(".png") for s in samples)

    out_dir = os.path.join(tmp_path, "translated")
    rc = main(["translate", "--run-dir", run_dir, "--input-dir", dir_a,
               "--output-dir", out_dir, "--direction", "a2b",
               "--batch-size", "4"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["translated"] == 8
    pngs = sorted(os.listdir(out_dir))
    assert len(pngs) == 8
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out_dir, pngs[0])))
    assert img.shape == (16, 16, 3)

    rc = main(["eval-fid", "--run-dir", run_dir, "--num-samples", "8"])
    assert rc == 0
    fid = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["fid"]
    assert np.isfinite(fid) and fid >= 0

    rc = main(["eval-fid", "--run-dir", run_dir, "--num-samples", "8",
               "--kid"])
    assert rc == 0
    kid = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(kid["kid"]) and np.isfinite(kid["kid_std"])

    rc = main(["eval-fid", "--run-dir", run_dir, "--num-samples", "8",
               "--prdc", "--prdc-k", "2"])
    assert rc == 0
    prdc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(prdc) == {"precision", "recall", "density", "coverage"}
    assert all(np.isfinite(v) and v >= 0 for v in prdc.values())

    # IS needs a class head — the random-feature fallback must refuse
    # loudly rather than print a meaningless number.
    import pytest

    with pytest.raises(ValueError, match="Inception Score needs"):
        main(["eval-fid", "--run-dir", run_dir, "--num-samples", "8",
              "--inception-score"])
    capsys.readouterr()

    # diversity is for multimodal families only — cyclegan is deterministic
    # per input, so the answer is a loud error, not a meaningless 0
    with pytest.raises(ValueError, match="multimodal family"):
        main(["eval-fid", "--run-dir", run_dir, "--num-samples", "4",
              "--diversity", "2"])
    capsys.readouterr()

    # Precomputed reference statistics (fid-stats → eval-fid --ref-stats)
    # reproduce the streamed-reals FID number exactly.
    stats_path = os.path.join(tmp_path, "ref_stats.npz")
    rc = main(["fid-stats", "--data-dir", dir_b, "--output", stats_path,
               "--image-size", "16", "--load-size", "20"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["eval-fid", "--run-dir", run_dir, "--num-samples", "8",
               "--ref-stats", stats_path])
    assert rc == 0
    fid2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["fid"]
    assert fid2 == fid

    # mismatched provenance and non-FID metrics refuse loudly
    stats20 = os.path.join(tmp_path, "ref_stats20.npz")
    rc = main(["fid-stats", "--data-dir", dir_b, "--output", stats20,
               "--image-size", "20", "--load-size", "20"])
    assert rc == 0
    with pytest.raises(ValueError, match="image_size"):
        main(["eval-fid", "--run-dir", run_dir, "--ref-stats", stats20])
    with pytest.raises(ValueError, match="FID-only"):
        main(["eval-fid", "--run-dir", run_dir, "--ref-stats", stats_path,
              "--kid"])
    capsys.readouterr()


def test_translate_deterministic(tmp_path, png_dirs, capsys):
    """Same ckpt + same inputs -> byte-identical outputs (eval-mode fidelity,
    BASELINE.json north star)."""
    dir_a, dir_b = png_dirs
    run_dir = os.path.join(tmp_path, "fid_run")
    rc = main(["train", "--preset", "smoke64", "--max-steps", "2"]
              + _overrides(tmp_path, "fid_run", dir_a, dir_b))
    assert rc == 0
    capsys.readouterr()

    outs = []
    for sub in ("t1", "t2"):
        out_dir = os.path.join(tmp_path, sub)
        main(["translate", "--run-dir", run_dir, "--input-dir", dir_a,
              "--output-dir", out_dir, "--batch-size", "8"])
        capsys.readouterr()
        from PIL import Image

        outs.append(np.stack([
            np.asarray(Image.open(os.path.join(out_dir, f)))
            for f in sorted(os.listdir(out_dir))
        ]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_translate_packed_and_tfrecord_sources(tmp_path, png_dirs, capsys):
    """Every trainable source is servable: translating a packed .npy (and a
    tfrecord dir when tf is present) matches the folder-source outputs
    byte-for-byte (VERDICT round-1 "translate accepts folders only" gap)."""
    dir_a, dir_b = png_dirs
    run_dir = os.path.join(tmp_path, "src_run")
    rc = main(["train", "--preset", "smoke64", "--max-steps", "2"]
              + _overrides(tmp_path, "src_run", dir_a, dir_b))
    assert rc == 0
    capsys.readouterr()

    packed = os.path.join(tmp_path, "a.npy")
    rc = main(["pack", "--input-dir", dir_a, "--output", packed,
               "--load-size", "20"])
    assert rc == 0
    capsys.readouterr()

    from PIL import Image

    def translate(inp, sub):
        out_dir = os.path.join(tmp_path, sub)
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", inp,
                   "--output-dir", out_dir, "--batch-size", "8"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["translated"] == 8
        return np.stack([
            np.asarray(Image.open(os.path.join(out_dir, f)))
            for f in sorted(os.listdir(out_dir))
        ])

    from_folder = translate(dir_a, "out_folder")
    from_packed = translate(packed, "out_packed")  # auto-detected by .npy
    np.testing.assert_array_equal(from_folder, from_packed)

    tf = pytest.importorskip("tensorflow")
    tfdir = os.path.join(tmp_path, "tfrec")
    os.makedirs(tfdir)
    with tf.io.TFRecordWriter(os.path.join(tfdir, "a.tfrecord")) as w:
        for f in sorted(os.listdir(dir_a)):
            with open(os.path.join(dir_a, f), "rb") as fh:
                raw = fh.read()
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[raw]))}))
            w.write(ex.SerializeToString())
    from_tfrecord = translate(tfdir, "out_tfrecord")
    np.testing.assert_array_equal(from_folder, from_tfrecord)

    # webdataset (.tar of encoded images) — stdlib tar, no extra deps
    import tarfile

    wds_dir = os.path.join(tmp_path, "wds")
    os.makedirs(wds_dir)
    with tarfile.open(os.path.join(wds_dir, "shard-000.tar"), "w") as tw:
        for f in sorted(os.listdir(dir_a)):
            tw.add(os.path.join(dir_a, f), arcname=f)
    from_wds = translate(wds_dir, "out_wds")  # auto-detected by .tar
    np.testing.assert_array_equal(from_folder, from_wds)


def test_bench_cli_list_and_validation(capsys):
    """`uig bench --list` prints the rung registry; unknown rungs are a
    loud usage error (rc=2) without touching the accelerator."""
    from uig.cli.main import main

    assert main(["bench", "--list"]) == 0
    out = capsys.readouterr().out
    assert "cyclegan256" in out and "vqgan512" in out
    assert main(["bench", "not-a-rung"]) == 2
