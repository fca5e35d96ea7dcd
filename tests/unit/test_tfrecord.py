"""TFRecord random-access reader vs images written through tf itself."""

import io
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from uig.data.datasets import SyntheticUnpairedDataset, TFRecordImageDataset


@pytest.fixture(scope="module")
def tfrecord_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tfr")
    syn = SyntheticUnpairedDataset(n=5, load_size=24, seed=0)
    from PIL import Image

    path = os.path.join(tmp, "shard-00000.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        for i in range(5):
            buf = io.BytesIO()
            Image.fromarray(syn.domain_a[i]).save(buf, format="PNG")
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[buf.getvalue()])),
            }))
            w.write(ex.SerializeToString())
    return path, syn


def test_random_access_matches_source(tfrecord_path):
    path, syn = tfrecord_path
    ds = TFRecordImageDataset(path, load_size=24)
    assert len(ds) == 5
    # out-of-order access (the pure-function sampler will do this)
    for i in (3, 0, 4, 1):
        np.testing.assert_array_equal(ds[i], syn.domain_a[i])


def test_resize_applied(tfrecord_path):
    path, _ = tfrecord_path
    ds = TFRecordImageDataset(path, load_size=16)
    assert ds[0].shape == (16, 16, 3)


def test_directory_of_shards(tfrecord_path):
    path, _ = tfrecord_path
    ds = TFRecordImageDataset(os.path.dirname(path), load_size=24)
    assert len(ds) == 5


def test_missing_feature_key_raises(tfrecord_path):
    path, _ = tfrecord_path
    ds = TFRecordImageDataset(path, load_size=24, feature_key="nope")
    with pytest.raises(KeyError):
        ds[0]
