import jax.numpy as jnp
import numpy as np

from uig.data.datasets import SyntheticUnpairedDataset
from uig.data.pipeline import UnpairedPipeline, _DomainStream
from uig.train.ema import ema_update


def test_ema_math():
    ema = {"w": jnp.ones((3,))}
    new = {"w": jnp.zeros((3,))}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)


def test_synthetic_deterministic_and_distinct():
    ds = SyntheticUnpairedDataset(n=10, load_size=32, seed=0)
    a0 = ds.domain_a[0]
    a0_again = ds.domain_a[0]
    np.testing.assert_array_equal(a0, a0_again)
    assert a0.shape == (32, 32, 3) and a0.dtype == np.uint8
    assert not np.array_equal(ds.domain_a[0], ds.domain_a[1])
    assert not np.array_equal(ds.domain_a[0], ds.domain_b[0])


def test_synthetic_domain_is_a_finite_sequence():
    # iter() on a __getitem__-only class uses the legacy sequence protocol,
    # which terminates ONLY on IndexError — regression for the infinite
    # `for img in domain` loop (caught by a hung U-GAT-IT CLI test).
    ds = SyntheticUnpairedDataset(n=4, load_size=16, seed=0)
    imgs = list(ds.domain_a)
    assert len(imgs) == 4
    np.testing.assert_array_equal(imgs[3], ds.domain_a[3])
    try:
        ds.domain_a[4]
    except IndexError:
        pass
    else:
        raise AssertionError("out-of-range index did not raise")


def test_domain_stream_pure_function_of_position():
    s = _DomainStream(n=7, seed=3, host_index=0, host_count=1)
    first = s.indices_at(0, 20)
    s2 = _DomainStream(n=7, seed=3, host_index=0, host_count=1)
    assert s2.indices_at(5, 10) == first[5:15]
    # epoch boundary: each full epoch is a permutation of range(7)
    assert sorted(first[:7]) == list(range(7))
    assert sorted(first[7:14]) == list(range(7))
    assert first[:7] != first[7:14]  # reshuffled across epochs


def test_host_sharding_partitions_data():
    a = _DomainStream(n=8, seed=1, host_index=0, host_count=2)
    b = _DomainStream(n=8, seed=1, host_index=1, host_count=2)
    ia = set(a.indices_at(0, a.epoch_len))
    ib = set(b.indices_at(0, b.epoch_len))
    assert ia | ib == set(range(8)) and not (ia & ib)


def test_pipeline_producer_death_raises_not_hangs():
    """A corrupt record must surface as an exception at next(), not a hang."""

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise IOError("corrupt image")

    p = UnpairedPipeline(Broken(), Broken(), batch_size_local=1, seed=0,
                         num_workers=1, prefetch=2).start()
    import pytest

    with pytest.raises(RuntimeError, match="producer died"):
        next(p)
    p.stop()


def test_pipeline_resume_exact_with_prefetch():
    ds = SyntheticUnpairedDataset(n=12, load_size=16, seed=0)

    def fresh():
        return UnpairedPipeline(ds.domain_a, ds.domain_b, batch_size_local=2,
                                seed=0, num_workers=1, prefetch=3)

    p = fresh().start()
    seen = [next(p) for _ in range(4)]
    st = p.state_dict()
    cont = [next(p) for _ in range(3)]
    p.stop()

    q = fresh()
    q.load_state_dict(st)
    q.start()
    resumed = [next(q) for _ in range(3)]
    q.stop()
    for (a1, b1), (a2, b2) in zip(cont, resumed):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


def test_domain_stream_rejects_empty_host_shard():
    # a domain with fewer images than hosts must fail at construction with a
    # clear error, not ZeroDivisionError deep in the producer thread
    import pytest

    with pytest.raises(ValueError, match="at least one image per host"):
        _DomainStream(n=1, seed=0, host_index=1, host_count=2)
    with pytest.raises(ValueError, match="at least one image per host"):
        _DomainStream(n=0, seed=0, host_index=0, host_count=1)
