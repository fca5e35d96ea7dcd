import json
import os

import numpy as np

from uig.data.datasets import PackedDataset, SyntheticUnpairedDataset


def test_pack_and_read(tmp_path):
    syn = SyntheticUnpairedDataset(n=6, load_size=24, seed=0)
    out = os.path.join(tmp_path, "a.npy")
    n = PackedDataset.pack(syn.domain_a, out)
    assert n == 6
    ds = PackedDataset(out, load_size=24)
    assert len(ds) == 6
    np.testing.assert_array_equal(ds[3], syn.domain_a[3])
    batch = ds.get_batch([0, 2, 4])
    assert batch.shape == (3, 24, 24, 3)
    np.testing.assert_array_equal(batch[1], syn.domain_a[2])


def test_load_size_mismatch_raises(tmp_path):
    import pytest

    syn = SyntheticUnpairedDataset(n=2, load_size=16, seed=0)
    out = os.path.join(tmp_path, "b.npy")
    PackedDataset.pack(syn.domain_a, out)
    with pytest.raises(ValueError):
        PackedDataset(out, load_size=32)


def test_pack_cli_and_train_on_packed(tmp_path, capsys):
    from uig.cli.main import main

    syn = SyntheticUnpairedDataset(n=6, load_size=20, seed=0)
    dir_a, dir_b = syn.write_png_dirs(str(tmp_path))
    pa = os.path.join(tmp_path, "a.npy")
    pb = os.path.join(tmp_path, "b.npy")
    for d, p in ((dir_a, pa), (dir_b, pb)):
        rc = main(["pack", "--input-dir", d, "--output", p,
                   "--load-size", "20"])
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip())["packed"] == 6

    rc = main([
        "train", "--preset", "smoke64", "--max-steps", "2",
        "--set", "model.image_size=16", "--set", "model.n_res_blocks=1",
        "--set", "model.d_layers=2", "--set", "data.batch_size=2",
        "--set", "data.load_size=20", "--set", "data.source=packed",
        "--set", f"data.dir_a={pa}", "--set", f"data.dir_b={pb}",
        "--set", "data.num_workers=1", "--set", "opt.pool_size=2",
        "--set", "parallel.num_devices=2",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=packedrun",
        "--set", "run.ckpt_every=2", "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_metrics"]["g_loss"])


def test_resolve_dataset_error_paths(tmp_path):
    """'auto' dispatch fails loudly and accurately: .npy directories and
    unrecognized-format files are distinguished from missing paths."""
    import pytest

    from uig.data.datasets import resolve_dataset

    npy_dir = tmp_path / "shards"
    npy_dir.mkdir()
    (npy_dir / "part0.npy").write_bytes(b"x")
    with pytest.raises(ValueError, match="directory of packed .npy shards"):
        resolve_dataset(str(npy_dir), 64)

    weird = tmp_path / "data.npz"
    weird.write_bytes(b"x")
    with pytest.raises(ValueError, match="unrecognized format"):
        resolve_dataset(str(weird), 64)

    with pytest.raises(FileNotFoundError, match="does not exist"):
        resolve_dataset(str(tmp_path / "missing"), 64)
