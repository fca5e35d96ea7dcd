"""Multi-producer pipeline (data.producer_threads > 1): ordering, stream
equivalence with the single-producer path, and exact resume.

The batch stream is a pure function of (seed, batch_counter), so k
producers claiming counters from a shared lock + a consumer-side reorder
buffer must deliver EXACTLY the same batch sequence as one producer —
overlap changes wall-clock, never data.
"""

import numpy as np
import pytest

from uig.config import apply_overrides, get_preset
from uig.data import make_input_pipeline


def _cfg(producers, batch=4):
    return apply_overrides(get_preset("smoke64"), [
        "data.source=synthetic", "data.synthetic_len=16",
        f"data.batch_size={batch}", "data.load_size=32",
        f"data.producer_threads={producers}", "data.prefetch=3",
    ])


def _take(pipe, n):
    out = []
    for _ in range(n):
        a, b = next(pipe)
        out.append((np.asarray(a), np.asarray(b)))
    return out


@pytest.mark.smoke
def test_multi_producer_matches_single_producer_stream():
    p1 = make_input_pipeline(_cfg(1), mesh=None, start=True)
    p3 = make_input_pipeline(_cfg(3), mesh=None, start=True)
    try:
        seq1 = _take(p1, 12)
        seq3 = _take(p3, 12)
    finally:
        p1.stop()
        p3.stop()
    for (a1, b1), (a3, b3) in zip(seq1, seq3):
        np.testing.assert_array_equal(a1, a3)
        np.testing.assert_array_equal(b1, b3)


def test_multi_producer_resume_is_exact():
    ref = make_input_pipeline(_cfg(1), mesh=None, start=True)
    try:
        ref_seq = _take(ref, 10)
    finally:
        ref.stop()

    pipe = make_input_pipeline(_cfg(3), mesh=None, start=True)
    try:
        got = _take(pipe, 4)
        state = pipe.state_dict()
        assert state == {"t_consumed": 4}
        # resume into a FRESH multi-producer pipeline
        pipe2 = make_input_pipeline(_cfg(3), mesh=None, start=True)
        try:
            pipe2.load_state_dict(state)
            got += _take(pipe2, 6)
        finally:
            pipe2.stop()
    finally:
        pipe.stop()
    for (ar, br), (ag, bg) in zip(ref_seq, got):
        np.testing.assert_array_equal(ar, ag)
        np.testing.assert_array_equal(br, bg)


def test_multi_producer_error_propagates():
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise IOError("decode failed")

    from uig.data.pipeline import UnpairedPipeline

    pipe = UnpairedPipeline(Boom(), Boom(), 2, mesh=None,
                            producer_threads=3).start()
    try:
        with pytest.raises(RuntimeError, match="producer died"):
            next(pipe)
    finally:
        pipe.stop()
