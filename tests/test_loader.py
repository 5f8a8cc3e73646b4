"""Input-pipeline tests: prefetching batch iterator parity with the
sequential loop, scan-cache correctness, and prefetch_map ordering."""

from __future__ import annotations

import numpy as np
import pytest

from insmos_tpu.data.loader import ScanCache, iter_batches, prefetch_map
from insmos_tpu.data.sample import WindowSample


class FakeDataset:
    """Deterministic per-index samples (no disk)."""

    def __init__(self, n=13, window=3, capacity=32):
        self.n, self.window, self.capacity = n, window, capacity

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng(idx)
        return WindowSample(
            points=rng.normal(size=(self.window, self.capacity, 4)).astype(np.float32),
            num_points=np.full((self.window,), 5, np.int32),
            scan_mask=np.ones((self.window,), bool),
            labels=np.zeros((self.window, self.capacity), np.int32),
            gt_boxes=np.zeros((4, 8), np.float32),
            num_boxes=np.int32(0),
            meta=idx,
        )


@pytest.mark.parametrize("shuffle", [False, True])
def test_iter_batches_matches_sequential(shuffle):
    ds = FakeDataset()
    seq = list(iter_batches(ds, 2, shuffle, seed=7, num_workers=0))
    par = list(iter_batches(ds, 2, shuffle, seed=7, num_workers=4))
    assert len(seq) == len(par) == 6  # drop_last
    for a, b in zip(seq, par):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_scan_cache_hit_and_copy():
    cache = ScanCache(max_bytes=1 << 20)
    loads = []

    def load():
        loads.append(1)
        return np.arange(8, dtype=np.float32)

    a = cache.get(("k", "pc"), load)
    a[0] = 99.0  # mutate the returned copy
    b = cache.get(("k", "pc"), load)
    assert len(loads) == 1  # second get was a hit
    assert b[0] == 0.0  # cache entry unaffected by caller mutation
    st = cache.stats()
    assert st["hits"] == 1 and st["misses"] == 1


def test_scan_cache_eviction():
    cache = ScanCache(max_bytes=100)
    for i in range(10):
        cache.get((i, "pc"), lambda i=i: np.full(8, i, np.float32))  # 32 B each
    st = cache.stats()
    assert st["bytes"] <= 100
    assert st["entries"] <= 3


def test_prefetch_map_order():
    out = list(prefetch_map(lambda x: x * x, range(20), num_workers=4))
    assert out == [x * x for x in range(20)]
