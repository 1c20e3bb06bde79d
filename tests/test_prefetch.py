"""Threaded batch prefetcher: ordering, fallback, and iterator wiring."""

import numpy as np

from im23d_tpu.data.prefetch import prefetched_batches


def test_order_preserved_across_workers():
    batches = [np.array([i]) for i in range(37)]
    out = list(prefetched_batches(batches, lambda b: b * 2, num_workers=4))
    assert len(out) == 37
    for i, b in enumerate(out):
        assert b[0] == 2 * i


def test_single_worker_is_serial():
    calls = []

    def build(idx):
        calls.append(idx)
        return idx

    out = list(prefetched_batches([1, 2, 3], build, num_workers=1))
    assert out == [1, 2, 3] and calls == [1, 2, 3]


def test_exceptions_propagate():
    def build(idx):
        if idx == 2:
            raise ValueError("boom")
        return idx

    it = prefetched_batches([0, 1, 2, 3], build, num_workers=2)
    got = [next(it), next(it)]
    assert got == [0, 1]
    try:
        next(it)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_cmr_batch_iterator_threaded_matches_serial():
    from im23d_tpu.data.cmr import batch_iterator

    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    serial = list(batch_iterator(DS(), 4, seed=7, num_workers=1))
    threaded = list(batch_iterator(DS(), 4, seed=7, num_workers=4))
    assert len(serial) == len(threaded) == 5
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["x"], b["x"])
