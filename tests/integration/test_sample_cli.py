import json
import os

import numpy as np
import pytest

from uig.cli.main import main

BASE = [
    "--set", "model.image_size=32", "--set", "model.vq_base_features=8",
    "--set", "model.vq_channel_mults=1,2", "--set", "model.vq_embed_dim=8",
    "--set", "model.vq_codebook_size=16", "--set",
    "model.vq_attn_resolutions=16", "--set", "model.d_layers=2",
    "--set", "model.compute_dtype=float32", "--set", "data.batch_size=2",
    "--set", "data.load_size=36", "--set", "data.synthetic_len=6",
    "--set", "data.num_workers=1", "--set", "parallel.num_devices=1",
    "--set", "parallel.multihost=false", "--set", "run.ckpt_every=2",
    "--set", "eval.sample_grid_every=0",
]


@pytest.mark.parametrize("kind", ["vaegan", "vqgan"])
def test_sample_cli(tmp_path, capsys, kind):
    name = f"samp_{kind}"
    rc = main(["train", "--preset", "vqgan512", "--max-steps", "2",
               "--set", f"model.kind={kind}",
               "--set", f"run.workdir={tmp_path}", "--set", f"run.name={name}"]
              + BASE)
    assert rc == 0
    capsys.readouterr()
    out_dir = os.path.join(tmp_path, "gen")
    rc = main(["sample", "--run-dir", os.path.join(tmp_path, name),
               "--output-dir", out_dir, "-n", "3"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["sampled"] == 3
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out_dir, "00000.png")))
    assert img.shape == (32, 32, 3)


def test_sample_rejects_cyclegan(tmp_path, capsys):
    rc = main(["train", "--preset", "smoke64", "--max-steps", "1",
               "--set", "model.image_size=16", "--set", "model.n_res_blocks=1",
               "--set", "model.d_layers=2", "--set", "data.batch_size=1",
               "--set", "data.load_size=20", "--set", "data.synthetic_len=4",
               "--set", "data.num_workers=1", "--set", "parallel.num_devices=1",
               "--set", f"run.workdir={tmp_path}", "--set", "run.name=cg",
               "--set", "run.ckpt_every=1", "--set", "eval.sample_grid_every=0"])
    assert rc == 0
    capsys.readouterr()
    with pytest.raises(ValueError):
        main(["sample", "--run-dir", os.path.join(tmp_path, "cg"),
              "--output-dir", os.path.join(tmp_path, "x")])
