"""WebDataset-style .tar shard reader: random access vs the source images,
multi-shard ordering, resize, and training-pipeline integration."""

import os
import tarfile

import numpy as np
import pytest

from uig.data.datasets import (SyntheticUnpairedDataset,
                               WebDatasetImageDataset, resolve_dataset)


@pytest.fixture(scope="module")
def tar_shards(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wds")
    syn = SyntheticUnpairedDataset(n=6, load_size=24, seed=0)
    dir_a, _ = syn.write_png_dirs(str(tmp / "png"))
    files = sorted(os.listdir(dir_a))
    # two shards, deliberately written with shard-1's names FIRST to prove
    # ordering comes from (shard, member name), not write order
    for shard, names in (("shard-001.tar", files[3:]),
                         ("shard-000.tar", files[:3])):
        with tarfile.open(tmp / shard, "w") as tw:
            for f in names:
                tw.add(os.path.join(dir_a, f), arcname=f)
    return str(tmp), syn


def test_random_access_matches_source(tar_shards):
    root, syn = tar_shards
    ds = WebDatasetImageDataset(root, load_size=24)
    assert len(ds) == 6
    # shards sort by path; members by name inside each shard
    for i in (5, 0, 3, 2):
        np.testing.assert_array_equal(ds[i], syn.domain_a[i])


def test_resize_and_single_shard(tar_shards):
    root, _ = tar_shards
    one = os.path.join(root, "shard-000.tar")
    ds = WebDatasetImageDataset(one, load_size=16)
    assert len(ds) == 3 and ds[0].shape == (16, 16, 3)


def test_resolve_dataset_detects_tar(tar_shards):
    root, _ = tar_shards
    assert isinstance(resolve_dataset(root, 24), WebDatasetImageDataset)
    assert isinstance(
        resolve_dataset(os.path.join(root, "shard-000.tar"), 24),
        WebDatasetImageDataset)


def test_empty_tar_sources_are_loud(tmp_path):
    with pytest.raises(FileNotFoundError, match="no .tar shards"):
        WebDatasetImageDataset(str(tmp_path), load_size=24)
    empty = tmp_path / "empty.tar"
    with tarfile.open(empty, "w"):
        pass
    with pytest.raises(ValueError, match="no image members"):
        WebDatasetImageDataset(str(empty), load_size=24)


def test_pipeline_trains_from_webdataset(tar_shards, tmp_path):
    """data.source=webdataset feeds the training pipeline (both domains)."""
    import dataclasses

    from uig.config import get_preset
    from uig.data import make_input_pipeline
    from uig.runtime import make_mesh

    root, _ = tar_shards
    cfg = get_preset("smoke64")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, source="webdataset", dir_a=root, dir_b=root,
            batch_size=2, load_size=24, num_workers=1),
    )
    mesh = make_mesh(1)
    pipe = make_input_pipeline(cfg, mesh)
    a, b = next(pipe)
    pipe.stop()
    assert a.shape == (2, 24, 24, 3) and a.dtype == np.uint8
    assert b.shape == (2, 24, 24, 3)


def test_item_names_fall_back_on_cross_shard_collisions(tmp_path):
    """Two shards containing the same member name must not produce
    colliding translate output stems."""
    from uig.data.datasets import item_names

    syn = SyntheticUnpairedDataset(n=2, load_size=24, seed=0)
    dir_a, _ = syn.write_png_dirs(str(tmp_path / "png"))
    f = sorted(os.listdir(dir_a))[0]
    for shard in ("s0.tar", "s1.tar"):
        with tarfile.open(tmp_path / shard, "w") as tw:
            tw.add(os.path.join(dir_a, f), arcname=f)
    ds = WebDatasetImageDataset(str(tmp_path), load_size=24)
    names = item_names(ds)
    assert len(set(names)) == len(ds) == 2
