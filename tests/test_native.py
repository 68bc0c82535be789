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


class TestRasterCodec:
    """Native TIFF LZW/PackBits: bit-parity with the pure-Python decoders."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from deepmerge_tpu.native import rastercodec

        if not rastercodec.available():
            pytest.skip("native toolchain unavailable")

    def test_lzw_parity_on_pil_strips(self, tmp_path, rng):
        """Decode PIL-encoded LZW strips with both decoders, byte-for-byte."""
        from PIL import Image

        from deepmerge_tpu.geodata import geotiff as gt
        from deepmerge_tpu.native import rastercodec

        arr = rng.randint(0, 256, (173, 211, 3)).astype(np.uint8)
        arr[:, :100] = 9  # compressible half exercises long runs
        p = tmp_path / "lzw.tif"
        Image.fromarray(arr).save(p, format="TIFF", compression="tiff_lzw")
        # reader end-to-end with native ON then OFF must agree exactly
        native_img = gt.read_geotiff(str(p)).array
        orig = gt._HAVE_NATIVE
        gt._HAVE_NATIVE = False
        try:
            py_img = gt.read_geotiff(str(p)).array
        finally:
            gt._HAVE_NATIVE = orig
        np.testing.assert_array_equal(native_img, py_img)
        np.testing.assert_array_equal(native_img, arr)

    def test_unpackbits_fuzz_parity(self, rng):
        from deepmerge_tpu.geodata import geotiff as gt
        from deepmerge_tpu.native import rastercodec

        for trial in range(50):
            n = int(rng.randint(1, 2000))
            raw = bytes(rng.randint(0, 256, n).astype(np.uint8))
            expected = int(rng.randint(1, 3000))
            assert gt._unpackbits(raw, expected) == rastercodec.unpackbits(
                raw, expected
            ), trial

    def test_lzw_truncated_stream_no_crash(self):
        """Corrupt/truncated input must return gracefully, not crash."""
        from deepmerge_tpu.native import rastercodec

        out = rastercodec.lzw_decode(b"\x80\x00\xff\xff", 100)
        assert isinstance(out, bytes)
        assert rastercodec.lzw_decode(b"", 10) == b""

    def test_lzw_faster_than_python(self, rng):
        """The reason it exists: >=10x over the Python byte loop."""
        import io
        import time

        from PIL import Image

        from deepmerge_tpu.geodata import geotiff as gt
        from deepmerge_tpu.native import rastercodec

        base = (np.indices((512, 512)).sum(0) % 251).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(base).save(buf, format="TIFF", compression="tiff_lzw")
        import struct

        # grab the biggest strip out of the file via the public reader path:
        # easier and robust — time whole-image reads instead
        import tempfile

        p = tempfile.mktemp(suffix=".tif")
        with open(p, "wb") as f:
            f.write(buf.getvalue())
        t0 = time.perf_counter()
        gt.read_geotiff(p)
        t_native = time.perf_counter() - t0
        orig = gt._HAVE_NATIVE
        gt._HAVE_NATIVE = False
        try:
            t0 = time.perf_counter()
            gt.read_geotiff(p)
            t_py = time.perf_counter() - t0
        finally:
            gt._HAVE_NATIVE = orig
        import os

        os.unlink(p)
        assert t_py / t_native > 10, (t_py, t_native)
