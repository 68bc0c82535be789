"""Native C++ union-find: build, parity with Python, scale."""

import numpy as np
import pytest

from deepmerge_tpu.infer.merge import UnionFind
from deepmerge_tpu.native import unionfind


pytestmark = pytest.mark.skipif(
    not unionfind.available(), reason="native toolchain unavailable"
)


def test_native_matches_python(rng):
    n = 500
    edges = np.stack([rng.randint(0, n, 800), rng.randint(0, n, 800)], 1)
    nl, nk = unionfind.connected_labels(n, edges)
    uf = UnionFind(n)
    uf.union_edges(edges)
    pl_, pk = uf.labels()
    assert nk == pk
    np.testing.assert_array_equal(nl, pl_)


def test_native_empty_edges():
    nl, nk = unionfind.connected_labels(5, np.zeros((0, 2), np.int64))
    assert nk == 5
    np.testing.assert_array_equal(nl, np.arange(5))


def test_native_out_of_range_edge():
    with pytest.raises(ValueError):
        unionfind.connected_labels(3, np.array([[0, 7]], np.int64))


def test_native_scale():
    """A million edges in well under a second (the reason it exists)."""
    import time

    r = np.random.RandomState(0)
    n = 200_000
    edges = np.stack([r.randint(0, n, 1_000_000), r.randint(0, n, 1_000_000)], 1)
    t0 = time.perf_counter()
    labels, k = unionfind.connected_labels(n, edges)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native UF too slow: {dt:.3f}s"
    assert labels.shape == (n,)
    assert 1 <= k < n
