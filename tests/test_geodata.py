"""Shapefile + GeoTIFF round-trips and reference I/O semantics."""

import numpy as np
import pytest

from deepmerge_tpu.geodata.geotiff import GeoTiff, read_geotiff, write_geotiff
from deepmerge_tpu.geodata.shapefile import (
    DbfField,
    Shape,
    ShapefileTable,
    SHP_POINT,
    SHP_POLYLINE,
)


def test_shapefile_point_roundtrip(tmp_path, rng):
    n = 25
    xy = rng.rand(n, 2) * 1000
    shapes = [Shape(SHP_POINT, xy[i : i + 1].copy()) for i in range(n)]
    fields = [
        DbfField("inner", "N", 10),
        DbfField("object", "N", 10),
        DbfField("area", "N", 19, 6),
        DbfField("name", "C", 16),
    ]
    records = [
        {"inner": int(i + 4), "object": int(2 * i + 8),
         "area": float(i) * 1.5 + 0.25, "name": f"pt{i}"}
        for i in range(n)
    ]
    t = ShapefileTable(SHP_POINT, shapes, fields, records)
    path = str(tmp_path / "points.shp")
    t.save(path)

    r = ShapefileTable.read(path)
    assert len(r) == n
    assert r.shape_type == SHP_POINT
    np.testing.assert_allclose(
        np.array([[s.x, s.y] for s in r.shapes]), xy, rtol=1e-12
    )
    assert r.get_field("inner") == [int(i + 4) for i in range(n)]
    np.testing.assert_allclose(
        r.get_field("area"), [i * 1.5 + 0.25 for i in range(n)], atol=1e-6
    )
    assert r.get_field("name") == [f"pt{i}" for i in range(n)]


def test_shapefile_polyline_and_field_writeback(tmp_path, rng):
    """The reference's simi write-back flow (ExtractFeatures.py:182-219)."""
    lines = [
        Shape(SHP_POLYLINE, rng.rand(4, 2) * 100, np.array([0], np.int32))
        for _ in range(6)
    ]
    fields = [DbfField("LEFT_FID", "N", 10), DbfField("RIGHT_FID", "N", 10)]
    records = [{"LEFT_FID": i, "RIGHT_FID": i + 1} for i in range(6)]
    t = ShapefileTable(SHP_POLYLINE, lines, fields, records)
    path = str(tmp_path / "lines.shp")
    t.save(path)

    r = ShapefileTable.read(path)
    r.add_field(DbfField("simi", "F", 19, 6))          # CreateField
    for i in range(len(r)):
        r.set_field(i, "simi", float(i) * 0.125)       # SetField
    r.save(path)                                       # SetFeature/flush

    r2 = ShapefileTable.read(path)
    assert "simi" in r2.field_names()
    np.testing.assert_allclose(
        r2.get_field("simi"), [i * 0.125 for i in range(6)], atol=1e-6
    )
    assert r2.get_field("LEFT_FID") == [i for i in range(6)]
    # geometry survived the attribute rewrite
    np.testing.assert_allclose(r2.shapes[3].points, lines[3].points, rtol=1e-12)


def test_geotiff_roundtrip(tmp_path, rng):
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    gt = (500000.0, 0.5, 0.0, 4100000.0, 0.0, -0.5)
    path = str(tmp_path / "scene.tif")
    write_geotiff(path, img, gt)
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.array, img)
    np.testing.assert_allclose(r.geotransform, gt, rtol=1e-12)


def test_geotiff_single_band(tmp_path, rng):
    img = (rng.rand(16, 16) * 255).astype(np.uint8)
    path = str(tmp_path / "gray.tif")
    write_geotiff(path, img)
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.array[..., 0], img)


def test_geo_to_pixel_reference_semantics():
    """XPixel = |gt0 − X|/gt1 + 1 (MyUtils1.py:70-72), truncated to int."""
    g = GeoTiff(
        array=np.zeros((10, 10, 1), np.uint8),
        geotransform=(100.0, 2.0, 0.0, 200.0, 0.0, -2.0),
    )
    y, x = g.geo_to_pixel(110.0, 190.0)
    assert (y, x) == (int(abs((200.0 - 190.0) / -2.0) + 1),
                      int(abs((100.0 - 110.0) / 2.0) + 1))
    assert (y, x) == (6, 6)


def test_read_window_zero_padded_clipping(rng):
    arr = (rng.rand(8, 8, 2) * 255).astype(np.uint8)
    g = GeoTiff(array=arr)
    win = g.read_window(-2, -3, 6, 6)
    assert win.shape == (6, 6, 2)
    assert (win[:3].sum(), win[:, :2].sum()) == (0, 0)
    np.testing.assert_array_equal(win[3:, 2:], arr[:3, :4])
    # fully outside -> all zeros
    assert g.read_window(100, 100, 4, 4).sum() == 0


def _craft_tiff(img: np.ndarray, compression: int, payload: bytes) -> bytes:
    """Handcraft a minimal single-strip TIFF with the given compression."""
    import struct

    h, w, c = img.shape
    entries = []
    n = 9
    header = 8
    ifd_size = 2 + n * 12 + 4
    data_off = header + ifd_size

    def e(tag, typ, count, val):
        if typ == 3:
            return struct.pack("<HHIHH", tag, typ, count, val, 0)
        return struct.pack("<HHII", tag, typ, count, val)

    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 8),
        e(259, 3, 1, compression), e(262, 3, 1, 2),
        e(273, 4, 1, data_off), e(277, 3, 1, c), e(278, 4, 1, h),
        e(279, 4, 1, len(payload)),
    ]
    return (
        b"II" + np.uint16(42).tobytes() + np.uint32(8).tobytes()
        + np.uint16(n).tobytes() + b"".join(entries)
        + np.uint32(0).tobytes() + payload
    )


def test_geotiff_deflate_read(tmp_path, rng):
    import zlib

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(9, 11, 3) * 255).astype(np.uint8)
    raw = _craft_tiff(img, 8, zlib.compress(img.tobytes()))
    p = tmp_path / "deflate.tif"
    p.write_bytes(raw)
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out.array, img)


def test_geotiff_packbits_read(tmp_path, rng):
    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = np.repeat((rng.rand(6, 8, 1) * 255).astype(np.uint8), 1, 2)

    def packbits(data: bytes) -> bytes:  # simple all-literal encoding
        out = bytearray()
        i = 0
        while i < len(data):
            chunk = data[i : i + 128]
            out.append(len(chunk) - 1)
            out += chunk
            i += 128
        return bytes(out)

    raw = _craft_tiff(img, 32773, packbits(img.tobytes()))
    p = tmp_path / "packbits.tif"
    p.write_bytes(raw)
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out.array, img)


def test_geotiff_lzw_read(tmp_path, rng):
    """LZW decode vs an in-test TIFF-LZW encoder (MSB codes, early change)."""
    from deepmerge_tpu.geodata.geotiff import read_geotiff

    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        nbits = 9
        out_bits = []

        def emit(code, n):
            out_bits.append((code, n))

        emit(CLEAR, nbits)
        w = b""
        for byte in data:
            c = bytes([byte])
            if w + c in table:
                w = w + c
            else:
                emit(table[w], nbits)
                table[w + c] = next_code
                next_code += 1
                # early change: bump width when next_code+1 overflows
                if next_code + 1 > (1 << nbits) and nbits < 12:
                    nbits += 1
                if next_code >= 4094:
                    emit(CLEAR, nbits)
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    nbits = 9
                w = c
        if w:
            emit(table[w], nbits)
        emit(EOI, nbits)
        bits = ""
        for code, n in out_bits:
            bits += format(code, f"0{n}b")
        bits += "0" * ((8 - len(bits) % 8) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    img = (rng.rand(12, 16, 3) * 255).astype(np.uint8)
    raw = _craft_tiff(img, 5, lzw_encode(img.tobytes()))
    p = tmp_path / "lzw.tif"
    p.write_bytes(raw)
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out.array, img)


def test_geotiff_lzma_read(tmp_path, rng):
    """LZMA (34925) — GDAL COMPRESS=LZMA; decoded with stdlib lzma."""
    import lzma

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(7, 13, 3) * 255).astype(np.uint8)
    raw = _craft_tiff(img, 34925, lzma.compress(img.tobytes()))
    p = tmp_path / "lzma.tif"
    p.write_bytes(raw)
    np.testing.assert_array_equal(read_geotiff(str(p)).array, img)


def test_geotiff_zstd_read(tmp_path, rng):
    """ZSTD (50000) — GDAL COMPRESS=ZSTD."""
    zstandard = pytest.importorskip("zstandard")

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(10, 6, 3) * 255).astype(np.uint8)
    payload = zstandard.ZstdCompressor().compress(img.tobytes())
    raw = _craft_tiff(img, 50000, payload)
    p = tmp_path / "zstd.tif"
    p.write_bytes(raw)
    np.testing.assert_array_equal(read_geotiff(str(p)).array, img)


def test_geotiff_jpeg_read(tmp_path, rng):
    """JPEG-in-TIFF (7) produced by an INDEPENDENT writer (Pillow/libtiff,
    which emits shared JPEGTables + abbreviated per-strip streams — the
    layout GDAL also writes for COMPRESS=JPEG aerial mosaics)."""
    Image = pytest.importorskip("PIL.Image")

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = np.zeros((48, 64, 3), np.uint8)
    img[:, :32] = (40, 90, 200)
    img[24:, 32:] = (220, 60, 10)
    p = tmp_path / "jpeg.tif"
    Image.fromarray(img).save(str(p), compression="jpeg", quality=95)
    out = read_geotiff(str(p))
    assert out.meta["compression"] == 7
    assert out.array.shape == img.shape
    # lossy codec: flat-color blocks must round-trip within JPEG error
    assert np.abs(out.array.astype(int) - img.astype(int)).max() <= 12
    # and our decode must agree with Pillow's own whole-file decode
    theirs = np.asarray(Image.open(str(p)))
    np.testing.assert_array_equal(out.array, theirs)


def test_geotiff_webp_read(tmp_path, rng):
    """WebP-in-TIFF (50001) — GDAL COMPRESS=WEBP."""
    Image = pytest.importorskip("PIL.Image")

    import io

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = np.zeros((32, 40, 3), np.uint8)
    img[:16] = (10, 180, 30)
    img[16:] = (200, 20, 120)
    # TIFF-WebP stores one complete RIFF/WebP bitstream per strip/tile —
    # encode the strip with Pillow's WebP codec and craft the TIFF shell
    # (this libtiff build can't WRITE compression 50001 itself)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", lossless=True)
    raw = _craft_tiff(img, 50001, buf.getvalue())
    p = tmp_path / "webp.tif"
    p.write_bytes(raw)
    out = read_geotiff(str(p))
    assert out.meta["compression"] == 50001
    np.testing.assert_array_equal(out.array, img)


def test_shapefile_multipart_polygon_roundtrip(tmp_path, rng):
    from deepmerge_tpu.geodata.shapefile import SHP_POLYGON

    ring1 = rng.rand(5, 2) * 50
    ring2 = rng.rand(4, 2) * 50 + 100
    shape = Shape(SHP_POLYGON, np.concatenate([ring1, ring2]),
                  np.array([0, 5], np.int32))
    t = ShapefileTable(SHP_POLYGON, [shape], [DbfField("id", "N", 10)],
                       [{"id": 1}])
    path = str(tmp_path / "multi.shp")
    t.save(path)
    r = ShapefileTable.read(path)
    np.testing.assert_array_equal(r.shapes[0].parts, [0, 5])
    np.testing.assert_allclose(r.shapes[0].points,
                               np.concatenate([ring1, ring2]), rtol=1e-12)


def _craft_planar_tiff(
    img: np.ndarray,
    *,
    rows_per_strip: int | None = None,
    tile: int | None = None,
    compressor=None,
    predictor: int = 1,
) -> bytes:
    """Handcraft a PlanarConfiguration=2 (band-interleaved) TIFF.

    Blocks are ordered all-of-band-0 first (TIFF 6.0) — GDAL's
    INTERLEAVE=BAND layout. Either striped (``rows_per_strip``) or tiled
    (``tile``, square, multiple of 16; partial edge tiles padded to full
    size as the spec requires). Optional per-block ``compressor`` and
    horizontal-difference predictor 2.
    """
    import struct

    h, w, c = img.shape
    compression = 1 if compressor is None else 8

    def encode_plane_block(block: np.ndarray) -> bytes:
        # block: (rows, cols) of ONE band
        if predictor == 2:
            b16 = block.astype(np.int16)
            block = np.concatenate(
                [b16[:, :1], np.diff(b16, axis=1)], axis=1
            ).astype(np.uint8)
        raw = block.tobytes()
        return compressor(raw) if compressor else raw

    payloads: list[bytes] = []
    if tile is None:
        rps = rows_per_strip or h
        for band in range(c):
            for row in range(0, h, rps):
                payloads.append(
                    encode_plane_block(img[row : row + rps, :, band])
                )
    else:
        for band in range(c):
            for ty in range(0, h, tile):
                for tx in range(0, w, tile):
                    blk = np.zeros((tile, tile), np.uint8)
                    part = img[ty : ty + tile, tx : tx + tile, band]
                    blk[: part.shape[0], : part.shape[1]] = part
                    payloads.append(encode_plane_block(blk))

    n = 11 if tile is None else 12
    header = 8
    ifd_size = 2 + n * 12 + 4
    extra: list[bytes] = []
    extra_off = header + ifd_size

    def add_extra(b: bytes) -> int:
        nonlocal extra_off
        off = extra_off
        extra.append(b)
        extra_off += len(b)
        return off

    def e(tag, typ, count, val):
        if typ == 3 and count == 1:
            return struct.pack("<HHIHH", tag, typ, count, val, 0)
        return struct.pack("<HHII", tag, typ, count, val)

    bps_off = add_extra(struct.pack(f"<{c}H", *([8] * c)))
    counts = [len(p) for p in payloads]
    cnt_off = add_extra(struct.pack(f"<{len(counts)}I", *counts))
    off_pos = add_extra(struct.pack(f"<{len(counts)}I", *([0] * len(counts))))
    data_start = extra_off
    offs = []
    pos = data_start
    for cn in counts:
        offs.append(pos)
        pos += cn
    extra[-1] = struct.pack(f"<{len(offs)}I", *offs)

    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, c, bps_off),
        e(259, 3, 1, compression), e(262, 3, 1, 2),
        e(277, 3, 1, c), e(284, 3, 1, 2), e(317, 3, 1, predictor),
    ]
    if tile is None:
        entries += [
            e(273, 4, len(offs), off_pos),
            e(278, 4, 1, rows_per_strip or h),
            e(279, 4, len(counts), cnt_off),
        ]
        entries.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
        assert len(entries) == n
    else:
        entries += [
            e(322, 4, 1, tile), e(323, 4, 1, tile),
            e(324, 4, len(offs), off_pos), e(325, 4, len(counts), cnt_off),
        ]
        entries.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
        assert len(entries) == n
    return (
        b"II" + np.uint16(42).tobytes() + np.uint32(8).tobytes()
        + np.uint16(n).tobytes() + b"".join(entries)
        + np.uint32(0).tobytes() + b"".join(extra) + b"".join(payloads)
    )


def test_geotiff_planar_striped_read(tmp_path, rng):
    """Band-interleaved (PlanarConfiguration=2) striped TIFF — GDAL's
    INTERLEAVE=BAND layout — with deflate + predictor 2 per band plane."""
    import zlib

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(13, 11, 3) * 255).astype(np.uint8)
    raw = _craft_planar_tiff(
        img, rows_per_strip=5, compressor=zlib.compress, predictor=2
    )
    p = tmp_path / "planar.tif"
    p.write_bytes(raw)
    np.testing.assert_array_equal(read_geotiff(str(p)).array, img)


def test_geotiff_planar_tiled_read(tmp_path, rng):
    """Band-interleaved TILED TIFF with partial edge tiles."""
    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(24, 20, 4) * 255).astype(np.uint8)
    raw = _craft_planar_tiff(img, tile=16)
    p = tmp_path / "planar_tiled.tif"
    p.write_bytes(raw)
    np.testing.assert_array_equal(read_geotiff(str(p)).array, img)


def test_writer_deflate_multistrip_roundtrip(tmp_path, rng):
    """Deflate multi-strip writer (GDAL COMPRESS=DEFLATE shape): our reader
    AND an independent consumer (PIL) both recover the array exactly, in
    classic and BigTIFF containers."""
    from PIL import Image

    from deepmerge_tpu.geodata.geotiff import read_geotiff, write_geotiff

    arr = rng.randint(0, 256, (600, 41, 3)).astype(np.uint8)
    for big in (False, True):
        p = tmp_path / f"deflate_{big}.tif"
        write_geotiff(str(p), arr, (100.0, 0.5, 0, 200.0, 0, -0.5),
                      bigtiff=big, compression="deflate", rows_per_strip=128)
        out = read_geotiff(str(p))
        np.testing.assert_array_equal(out.array, arr)
        assert abs(out.geotransform[0] - 100.0) < 1e-9
        assert abs(out.geotransform[5] + 0.5) < 1e-9
        if not big:
            pil = np.asarray(Image.open(str(p)))
            np.testing.assert_array_equal(pil, arr)


def test_writer_unknown_compression_rejected(tmp_path):
    from deepmerge_tpu.geodata.geotiff import write_geotiff

    with pytest.raises(NotImplementedError):
        write_geotiff(str(tmp_path / "x.tif"), np.zeros((4, 4), np.uint8),
                      compression="jpeg")


def test_shapefile_z_and_m_variants(tmp_path):
    """PointZ(11)/PolygonZ(15)/PointM(21) records read as their 2-D base
    types — GDAL-produced layers are often Z-typed, and OGR (the reference's
    vector substrate) normalizes them the same way. The XY payload sits at
    the 2-D offsets; z/m blocks trail the record."""
    import struct

    from deepmerge_tpu.geodata.shapefile import _read_shp

    def write_shp(path, shape_type, recs):
        body = b""
        for i, rec in enumerate(recs):
            body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
        total_words = (100 + len(body)) // 2
        hdr = struct.pack(">i", 9994) + b"\0" * 20 + struct.pack(
            ">i", total_words
        ) + struct.pack("<ii", 1000, shape_type) + struct.pack("<8d", *([0.0] * 8))
        path.write_bytes(hdr + body)

    # PointZ: x, y, z, m
    rec_pz = struct.pack("<idddd", 11, 3.5, 4.5, 99.0, -1.0)
    p = tmp_path / "pz.shp"
    write_shp(p, 11, [rec_pz])
    stype, shapes = _read_shp(str(p))
    assert stype == 1 and shapes[0].shape_type == 1
    assert (shapes[0].x, shapes[0].y) == (3.5, 4.5)

    # PointM: x, y, m
    rec_pm = struct.pack("<iddd", 21, 7.0, 8.0, 5.0)
    pm = tmp_path / "pm.shp"
    write_shp(pm, 21, [rec_pm])
    stype, shapes = _read_shp(str(pm))
    assert stype == 1 and (shapes[0].x, shapes[0].y) == (7.0, 8.0)

    # PolygonZ: bbox + nparts/npoints + parts + xy + zrange + z + mrange + m
    xy = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    z = np.array([9.0, 9.0, 9.0, 9.0])
    rec_gz = (
        struct.pack("<i", 15)
        + struct.pack("<4d", 0, 0, 1, 1)               # bbox
        + struct.pack("<ii", 1, len(xy))               # nparts, npoints
        + struct.pack("<i", 0)                         # part index
        + xy.astype("<f8").tobytes()
        + struct.pack("<2d", z.min(), z.max()) + z.astype("<f8").tobytes()
        + struct.pack("<2d", 0, 0) + np.zeros(4).astype("<f8").tobytes()
    )
    gz = tmp_path / "gz.shp"
    write_shp(gz, 15, [rec_gz])
    stype, shapes = _read_shp(str(gz))
    assert stype == 5 and shapes[0].shape_type == 5
    np.testing.assert_array_equal(shapes[0].points, xy)
    np.testing.assert_array_equal(shapes[0].parts, [0])


def test_pil_producer_matrix_cross_read(tmp_path, rng):
    """Independent-producer matrix: PIL-written TIFFs across codec x band
    count x strip layout all decode bit-exactly.

    This is the closest stand-in for GDAL variety in a zero-egress image:
    PIL's TIFF encoder shares none of our code, and shrinking its
    STRIP_SIZE forces the many-small-strips layout GDAL uses on tall
    rasters (the reference's substrate, ``MyUtils1.py:309-323``)."""
    Image = pytest.importorskip("PIL.Image")
    from PIL import TiffImagePlugin

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    old_strip = TiffImagePlugin.STRIP_SIZE
    try:
        # default STRIP_SIZE -> one big strip; 256 bytes -> many strips
        for strip_size in (old_strip, 256):
            TiffImagePlugin.STRIP_SIZE = strip_size
            for comp in (None, "tiff_lzw", "packbits", "tiff_adobe_deflate"):
                for mode, ch in (("L", 1), ("RGB", 3), ("RGBA", 4)):
                    img = (rng.rand(29, 37, ch) * 255).astype(np.uint8)
                    pim = Image.fromarray(img if ch > 1 else img[..., 0])
                    p = tmp_path / f"m_{strip_size}_{comp}_{mode}.tif"
                    pim.save(str(p), compression=comp)
                    out = read_geotiff(str(p)).array
                    np.testing.assert_array_equal(
                        out.squeeze(), img.squeeze(),
                        err_msg=f"strip={strip_size} comp={comp} mode={mode}",
                    )
    finally:
        TiffImagePlugin.STRIP_SIZE = old_strip

    # 16-bit single band: raw sample values survive (deep_pixels policy
    # applies at load_scene, not in the reader)
    a16 = (rng.rand(21, 17) * 65535).astype(np.uint16)
    p16 = tmp_path / "m16.tif"
    Image.fromarray(a16).save(str(p16))
    out = read_geotiff(str(p16)).array
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out.squeeze(), a16)


def test_pil_consumer_matrix_cross_read(tmp_path, rng):
    """Independent-consumer matrix: PIL decodes OUR writer's output across
    compression x container x band count (1/3/4 — the modes PIL can
    represent) bit-exactly."""
    Image = pytest.importorskip("PIL.Image")

    from deepmerge_tpu.geodata.geotiff import write_geotiff

    for comp in ("none", "deflate"):
        for big in (False, True):
            for ch in (1, 3, 4):
                arr = rng.randint(0, 256, (33, 27, ch)).astype(np.uint8)
                p = tmp_path / f"w_{comp}_{big}_{ch}.tif"
                write_geotiff(str(p), arr, (0.0, 1.0, 0, 0.0, 0, -1.0),
                              bigtiff=big, compression=comp,
                              rows_per_strip=8)
                theirs = np.asarray(Image.open(str(p)))
                np.testing.assert_array_equal(
                    theirs.reshape(arr.shape), arr,
                    err_msg=f"comp={comp} big={big} ch={ch}",
                )


def test_geotiff_model_transformation_tag(tmp_path, rng):
    """GDAL writes ModelTransformation(34264) instead of scale+tiepoint for
    rotated/sheared rasters; the geotransform comes from the 4x4 matrix."""
    import struct

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(5, 7, 3) * 255).astype(np.uint8)
    h, w, c = img.shape
    # X = 2*col - 0.5*row + 1000 ; Y = 0.25*col - 3*row + 2000
    mat = [2.0, -0.5, 0.0, 1000.0,
           0.25, -3.0, 0.0, 2000.0,
           0.0, 0.0, 0.0, 0.0,
           0.0, 0.0, 1.0, 0.0]

    def e(tag, typ, count, val):
        if typ == 3:
            return struct.pack("<HHIHH", tag, typ, count, val, 0)
        return struct.pack("<HHII", tag, typ, count, val)

    n = 10
    ifd_size = 2 + n * 12 + 4
    mat_off = 8 + ifd_size
    data_off = mat_off + 16 * 8
    payload = img.tobytes()
    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 8),
        e(259, 3, 1, 1), e(262, 3, 1, 2),
        e(273, 4, 1, data_off), e(277, 3, 1, c), e(278, 4, 1, h),
        e(279, 4, 1, len(payload)),
        e(34264, 12, 16, mat_off),
    ]
    raw = (
        b"II" + np.uint16(42).tobytes() + np.uint32(8).tobytes()
        + np.uint16(n).tobytes() + b"".join(entries)
        + np.uint32(0).tobytes()
        + struct.pack("<16d", *mat) + payload
    )
    p = tmp_path / "modeltransform.tif"
    p.write_bytes(raw)
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out.array, img)
    assert out.geotransform == (1000.0, 2.0, -0.5, 2000.0, 0.25, -3.0)


def test_write_simi_preserves_z_geometry(tmp_path):
    """Read-modify-write of ATTRIBUTES (write_simi's add-a-field cycle) must
    not strip Z/M geometry or downgrade the layer type: a PolylineZ(13)
    lines.shp keeps type 13 and its z payload byte-for-byte."""
    import struct

    from deepmerge_tpu.geodata.shapefile import (
        DbfField, ShapefileTable, _write_dbf,
    )

    xy = np.array([[0.0, 0.0], [2.0, 1.0]])
    z = np.array([5.0, 6.0])
    rec = (
        struct.pack("<i", 13)
        + struct.pack("<4d", 0, 0, 2, 1)
        + struct.pack("<ii", 1, len(xy))
        + struct.pack("<i", 0)
        + xy.astype("<f8").tobytes()
        + struct.pack("<2d", z.min(), z.max()) + z.astype("<f8").tobytes()
        + struct.pack("<2d", 0, 0) + np.zeros(2).astype("<f8").tobytes()
    )
    body = struct.pack(">ii", 1, len(rec) // 2) + rec
    hdr = (
        struct.pack(">i", 9994) + b"\0" * 20
        + struct.pack(">i", (100 + len(body)) // 2)
        + struct.pack("<ii", 1000, 13)
        + struct.pack("<8d", 0, 0, 2, 1, 5, 6, 0, 0)
    )
    shp = tmp_path / "lines.shp"
    shp.write_bytes(hdr + body)
    (tmp_path / "lines.shx").write_bytes(hdr)
    _write_dbf(str(tmp_path / "lines.dbf"),
               [DbfField("LEFT_FID", "N", 10), DbfField("RIGHT_FID", "N", 10)],
               [{"LEFT_FID": 0, "RIGHT_FID": 1}])

    t = ShapefileTable.read(str(shp))
    t.add_field(DbfField("simi", "F", 19, 6))
    t.set_field(0, "simi", 0.5)
    t.save(str(shp))

    out = shp.read_bytes()
    assert struct.unpack("<i", out[32:36])[0] == 13      # layer stays Z
    assert struct.unpack("<8d", out[36:100])[4:6] == (5.0, 6.0)  # z range
    assert out.endswith(rec)                             # record verbatim
    t2 = ShapefileTable.read(str(shp))
    assert t2.get_field("simi") == [0.5]
    np.testing.assert_array_equal(t2.shapes[0].points, xy)


def test_dbf_deleted_record_drops_its_shape(tmp_path):
    """A dBase deletion-flagged record (editors that don't repack) must drop
    its GEOMETRY too, keeping shapes[] and records[] index-aligned."""
    from deepmerge_tpu.geodata.shapefile import (
        DbfField, Shape, ShapefileTable,
    )

    shapes = [Shape(1, np.array([[float(i), 0.0]])) for i in range(3)]
    t = ShapefileTable(1, shapes, [DbfField("id", "N", 10)],
                       [{"id": i} for i in range(3)])
    t.save(str(tmp_path / "pts.shp"))
    # flag record 1 deleted in the dbf
    dbf = bytearray((tmp_path / "pts.dbf").read_bytes())
    header_size = int.from_bytes(dbf[8:10], "little")
    record_size = int.from_bytes(dbf[10:12], "little")
    dbf[header_size + record_size] = ord("*")
    (tmp_path / "pts.dbf").write_bytes(bytes(dbf))

    t2 = ShapefileTable.read(str(tmp_path / "pts.shp"))
    assert len(t2.shapes) == len(t2.records) == 2
    assert t2.get_field("id") == [0, 2]
    assert [s.x for s in t2.shapes] == [0.0, 2.0]


def test_dbf_numeric_overflow_raises(tmp_path):
    """Over-length numeric values raise instead of silently right-truncating
    (which changes the value); float fields first shrink decimals to fit."""
    from deepmerge_tpu.geodata.shapefile import DbfField, _format_value

    with pytest.raises(ValueError):
        _format_value(DbfField("id", "N", 5), 123456789)
    # 1e15 fits F(19,6) only after shrinking decimals — value preserved
    out = _format_value(DbfField("simi", "F", 19, 6), 1.25e15)
    assert float(out) == 1.25e15


def test_geotiff_predictor3_rejected(tmp_path, rng):
    """Predictor=3 (float differencing) must fail loudly, not decode
    garbage."""
    import struct
    import zlib

    from deepmerge_tpu.geodata.geotiff import read_geotiff

    img = (rng.rand(4, 5, 1) * 255).astype(np.uint8)
    raw = bytearray(_craft_tiff(img, 8, zlib.compress(img.tobytes())))
    # append a predictor=3 entry is complex; instead patch n/a — craft anew
    # with an extra SHORT tag 317=3 appended in ascending order
    h, w, c = img.shape

    def e(tag, typ, count, val):
        if typ == 3:
            return struct.pack("<HHIHH", tag, typ, count, val, 0)
        return struct.pack("<HHII", tag, typ, count, val)

    payload = zlib.compress(img.tobytes())
    n = 10
    data_off = 8 + 2 + n * 12 + 4
    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 8),
        e(259, 3, 1, 8), e(262, 3, 1, 2),
        e(273, 4, 1, data_off), e(277, 3, 1, c), e(278, 4, 1, h),
        e(279, 4, 1, len(payload)), e(317, 3, 1, 3),
    ]
    raw = (
        b"II" + np.uint16(42).tobytes() + np.uint32(8).tobytes()
        + np.uint16(n).tobytes() + b"".join(entries)
        + np.uint32(0).tobytes() + payload
    )
    p = tmp_path / "pred3.tif"
    p.write_bytes(raw)
    with pytest.raises(NotImplementedError):
        read_geotiff(str(p))


def test_write_simi_dbf_only_update(tmp_path):
    """write_simi must behave like OGR SetField: the .shp/.shx bytes are
    untouched, deletion-flagged rows keep their flag (and get blank simi),
    invalid edges (FID -1) get 0, and a repeat write patches in place."""
    import struct

    from deepmerge_tpu.geodata.ingest import write_simi
    from deepmerge_tpu.geodata.shapefile import (
        DbfField, Shape, ShapefileTable, read_dbf_columns, update_dbf_field,
    )

    shapes = [Shape(3, np.array([[float(i), 0.0], [float(i), 1.0]]))
              for i in range(4)]
    t = ShapefileTable(
        3, shapes,
        [DbfField("LEFT_FID", "N", 10), DbfField("RIGHT_FID", "N", 10)],
        [{"LEFT_FID": 0, "RIGHT_FID": 1},
         {"LEFT_FID": -1, "RIGHT_FID": 2},   # invalid edge -> simi 0
         {"LEFT_FID": 1, "RIGHT_FID": 2},    # deleted below -> blank
         {"LEFT_FID": 2, "RIGHT_FID": 3}],
    )
    shp = tmp_path / "lines.shp"
    t.save(str(shp))
    dbf = tmp_path / "lines.dbf"
    raw = bytearray(dbf.read_bytes())
    header_size, record_size = struct.unpack("<HH", raw[8:12])
    raw[header_size + 2 * record_size] = ord("*")  # flag record 2 deleted
    dbf.write_bytes(bytes(raw))
    shp_before = shp.read_bytes()
    shx_before = (tmp_path / "lines.shx").read_bytes()

    # valid, non-deleted edges in order: records 0 and 3
    write_simi(str(shp), np.array([0.25, 0.75], np.float32))
    assert shp.read_bytes() == shp_before
    assert (tmp_path / "lines.shx").read_bytes() == shx_before
    cols, deleted = read_dbf_columns(str(dbf),
                                     ["LEFT_FID", "RIGHT_FID", "simi"])
    assert deleted == [False, False, True, False]
    assert cols["simi"] == [0.25, 0.0, None, 0.75]
    assert cols["LEFT_FID"] == [0, -1, 1, 2]  # other columns verbatim

    # repeat write = in-place column patch (no field duplication)
    write_simi(str(shp), np.array([0.5, 1.5], np.float32))
    cols2, _ = read_dbf_columns(str(dbf), ["simi"])
    assert cols2["simi"] == [0.5, 0.0, None, 1.5]
    t2 = ShapefileTable.read(str(shp))
    assert [f.name for f in t2.fields].count("simi") == 1
    assert len(t2) == 3  # deleted record still dropped by the Table read

    # score-count mismatch is loud
    with pytest.raises(ValueError):
        write_simi(str(shp), np.array([0.5], np.float32))
    # existing field with a different length is loud, not corrupting
    with pytest.raises(ValueError):
        update_dbf_field(str(dbf), DbfField("simi", "F", 12, 6), [None] * 4)


def test_dbf_bigint_column_exact(tmp_path):
    """N columns up to 19 digits must round-trip exactly: the vectorized
    cell parser takes the float64 fast path only for float-typed cells —
    2**53+1 would silently round through it."""
    from deepmerge_tpu.geodata.shapefile import (
        DbfField, _read_dbf_full, _write_dbf,
    )

    big = 9007199254740993  # 2**53 + 1
    p = str(tmp_path / "t.dbf")
    _write_dbf(p, [DbfField("id", "N", 19)],
               [{"id": big}, {"id": None}, {"id": 7}])
    _, recs, _ = _read_dbf_full(p)
    assert recs[0]["id"] == big and isinstance(recs[0]["id"], int)
    assert recs[1]["id"] is None
    assert recs[2]["id"] == 7


def test_read_point_coords_matches_record_walk(tmp_path, rng):
    """The strided fast parse equals the general per-record walk, and the
    attribute-only read carries the full table without geometry."""
    from deepmerge_tpu.geodata.shapefile import read_point_coords

    n = 37
    xy = rng.rand(n, 2) * 1000 - 500
    shapes = [Shape(SHP_POINT, xy[i : i + 1].copy()) for i in range(n)]
    fields = [DbfField("PointID", "N", 10), DbfField("tag", "C", 8)]
    records = [{"PointID": i, "tag": f"t{i}"} for i in range(n)]
    path = str(tmp_path / "pts.shp")
    ShapefileTable(SHP_POINT, shapes, fields, records).save(path)

    coords = read_point_coords(path)
    np.testing.assert_allclose(coords, xy, rtol=1e-12)

    t = ShapefileTable.read(path, with_geometry=False)
    assert len(t) == n and t.shapes == []
    assert t.shape_type == SHP_POINT
    assert t.get_field("PointID") == list(range(n))
    assert t.get_field("tag") == [f"t{i}" for i in range(n)]


def test_read_point_coords_pointz_strided(tmp_path):
    """PointZ layers have a bigger uniform record, but x/y sit at the 2-D
    offsets — the strided view must step the full record."""
    import struct

    from deepmerge_tpu.geodata.shapefile import read_point_coords

    xy = [(3.5, 4.5), (-2.0, 9.0), (0.25, -0.75)]
    body = b""
    for i, (x, y) in enumerate(xy):
        rec = struct.pack("<idddd", 11, x, y, 99.0 + i, -1.0)
        body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
    hdr = (
        struct.pack(">i", 9994) + b"\0" * 20
        + struct.pack(">i", (100 + len(body)) // 2)
        + struct.pack("<ii", 1000, 11) + struct.pack("<8d", *([0.0] * 8))
    )
    p = tmp_path / "pz.shp"
    p.write_bytes(hdr + body)
    np.testing.assert_array_equal(read_point_coords(str(p)), np.array(xy))


def test_read_point_coords_null_shape_raises(tmp_path):
    """Null shapes (type 0) raise the same loud error on both the uniform-
    stride path and the mixed-size fallback walk."""
    import struct

    from deepmerge_tpu.geodata.shapefile import read_point_coords

    def layer(recs):
        body = b""
        for i, rec in enumerate(recs):
            body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
        return (
            struct.pack(">i", 9994) + b"\0" * 20
            + struct.pack(">i", (100 + len(body)) // 2)
            + struct.pack("<ii", 1000, 1) + struct.pack("<8d", *([0.0] * 8))
            + body
        )

    point = struct.pack("<idd", 1, 1.0, 2.0)
    null = struct.pack("<i", 0)
    # uniform stride: every record null-typed but point-sized
    null_padded = struct.pack("<idd", 0, 0.0, 0.0)
    u = tmp_path / "u.shp"
    u.write_bytes(layer([point, null_padded]))
    with pytest.raises(ValueError, match="null shape"):
        read_point_coords(str(u))
    # mixed record sizes: falls back to the general walk, same error
    m = tmp_path / "m.shp"
    m.write_bytes(layer([point, null]))
    with pytest.raises(ValueError, match="null shape"):
        read_point_coords(str(m))


def test_read_point_coords_null_shape_on_deleted_record_ok(tmp_path):
    """A null shape is tolerated when its record is deletion-flagged in the
    dbf (OGR filters deleted records before geometry is ever surfaced); the
    loud error stays for null shapes on live records."""
    import struct

    from deepmerge_tpu.geodata.shapefile import read_point_coords

    def layer(recs):
        body = b""
        for i, rec in enumerate(recs):
            body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
        return (
            struct.pack(">i", 9994) + b"\0" * 20
            + struct.pack(">i", (100 + len(body)) // 2)
            + struct.pack("<ii", 1000, 1) + struct.pack("<8d", *([0.0] * 8))
            + body
        )

    point = struct.pack("<idd", 1, 1.0, 2.0)
    null = struct.pack("<i", 0)
    null_padded = struct.pack("<idd", 0, 7.0, 7.0)
    deleted = np.array([False, True, False])

    # uniform-stride fast path: null coords come back zero-filled
    u = tmp_path / "u.shp"
    u.write_bytes(layer([point, null_padded, point]))
    coords = read_point_coords(str(u), deleted_mask=deleted)
    np.testing.assert_array_equal(
        coords, [[1.0, 2.0], [0.0, 0.0], [1.0, 2.0]]
    )
    np.testing.assert_array_equal(coords[~deleted], [[1.0, 2.0], [1.0, 2.0]])

    # mixed-size general walk: same behavior
    m = tmp_path / "m.shp"
    m.write_bytes(layer([point, null, point]))
    coords = read_point_coords(str(m), deleted_mask=deleted)
    np.testing.assert_array_equal(coords[~deleted], [[1.0, 2.0], [1.0, 2.0]])

    # the null on a LIVE record still raises, mask or not
    with pytest.raises(ValueError, match="null shape"):
        read_point_coords(str(m), deleted_mask=np.array([True, False, False]))


def test_truncated_shp_header_raises(tmp_path):
    """A <100-byte .shp gives the descriptive error, not a struct.error."""
    from deepmerge_tpu.geodata.shapefile import (
        _read_shp_header,
        read_point_coords,
    )

    p = tmp_path / "t.shp"
    p.write_bytes(b"\x00\x00\x27\x0a" + b"\0" * 20)  # valid magic, cut short
    with pytest.raises(ValueError, match="truncated shapefile header"):
        _read_shp_header(str(p))
    with pytest.raises(ValueError, match="truncated shapefile header"):
        read_point_coords(str(p))


def test_attribute_only_read_deleted_mask_realigns_coords(tmp_path, rng):
    """load_scene reads attributes and geometry separately; the deleted_mask
    left by read() must realign read_point_coords with the filtered records
    (dBase deletion flags drop records, not .shp geometry)."""
    from deepmerge_tpu.geodata.shapefile import read_point_coords

    n = 5
    xy = rng.rand(n, 2) * 100
    shapes = [Shape(SHP_POINT, xy[i : i + 1].copy()) for i in range(n)]
    fields = [DbfField("PointID", "N", 10)]
    records = [{"PointID": i} for i in range(n)]
    path = str(tmp_path / "pts.shp")
    ShapefileTable(SHP_POINT, shapes, fields, records).save(path)

    # flag record 2 deleted in the dbf (header 32 + field desc 32 + 1)
    dbf = tmp_path / "pts.dbf"
    raw = bytearray(dbf.read_bytes())
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + 10
    raw[header_size + 2 * record_size] = ord("*")
    dbf.write_bytes(bytes(raw))

    t = ShapefileTable.read(path, with_geometry=False)
    assert len(t) == n - 1
    assert t.deleted_mask is not None
    coords = read_point_coords(path)[~t.deleted_mask]
    keep = [0, 1, 3, 4]
    np.testing.assert_allclose(coords, xy[keep], rtol=1e-12)
    assert t.get_field("PointID") == keep


def test_attribute_only_table_save_rejected(tmp_path, rng):
    """Writing an attribute-only table would silently drop geometry."""
    xy = rng.rand(3, 2)
    shapes = [Shape(SHP_POINT, xy[i : i + 1].copy()) for i in range(3)]
    path = str(tmp_path / "p.shp")
    ShapefileTable(SHP_POINT, shapes, [DbfField("id", "N", 10)],
                   [{"id": i} for i in range(3)]).save(path)
    t = ShapefileTable.read(path, with_geometry=False)
    with pytest.raises(ValueError, match="attribute-only"):
        t.save(str(tmp_path / "out.shp"))


def test_geotiff_uint16_roundtrip_and_pil_cross_read(tmp_path, rng):
    """uint16 writer: our reader + an independent consumer (PIL) agree."""
    img = (rng.rand(23, 31, 3) * 65535).astype(np.uint16)
    gt = (500000.0, 0.5, 0.0, 4100000.0, 0.0, -0.5)
    path = str(tmp_path / "deep.tif")
    write_geotiff(path, img, gt)
    r = read_geotiff(path)
    assert r.array.dtype == np.uint16
    np.testing.assert_array_equal(r.array, img)
    np.testing.assert_allclose(r.geotransform, gt, rtol=1e-12)

    # PIL reads single-band 16-bit TIFFs (mode I;16) — cross-check layout
    gray = (rng.rand(17, 19) * 65535).astype(np.uint16)
    gpath = str(tmp_path / "deep_gray.tif")
    write_geotiff(gpath, gray, gt)
    PIL = pytest.importorskip("PIL.Image")
    with PIL.open(gpath) as im:
        np.testing.assert_array_equal(np.asarray(im), gray)


def test_geotiff_uint16_deflate_strips(tmp_path, rng):
    img = (rng.rand(40, 22, 3) * 65535).astype(np.uint16)
    path = str(tmp_path / "deep_z.tif")
    write_geotiff(path, img, compression="deflate", rows_per_strip=16)
    np.testing.assert_array_equal(read_geotiff(path).array, img)
