"""Minimal ``osgeo`` stand-in so the reference DATA-LAYER code imports.

Same trick as ``tests/timm_shim.py``: GDAL/OGR are absent in this image, but
the reference's patch pipeline (``MyUtils1.py:60-223``,
``MyUtils2.py:225-247``) only touches a handful of dataset/feature methods.
Faking those over numpy lets the reference's OWN ``get_all_features`` /
``cut_image`` / ``resize_data`` run VERBATIM as the parity oracle for
``ops/patches.extract_multiscale_patches`` — closing the one gap where the
framework was previously tested only against a re-implemented oracle.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class FakeGeometry:
    def __init__(self, x: float, y: float):
        self._x, self._y = float(x), float(y)

    def GetX(self):
        return self._x

    def GetY(self):
        return self._y


class FakeFeature:
    """Duck-typed OGR feature: attribute fields + a point geometry."""

    def __init__(self, fields: dict, x_geo: float, y_geo: float):
        self._fields = dict(fields)
        self._geom = FakeGeometry(x_geo, y_geo)

    def GetField(self, name: str):
        return self._fields[name]

    def GetGeometryRef(self):
        return self._geom


class FakeLayer:
    """OGR layer exposing ``GetFeature(fid)`` over a dict of FakeFeatures."""

    def __init__(self, features: dict):
        self._features = dict(features)

    def GetFeature(self, fid):
        return self._features[int(fid)]

    def GetFeatureCount(self):
        return len(self._features)


class FakeRasterDataset:
    """GDAL raster dataset over an (H, W, C) numpy array.

    ``ReadAsArray(x, y, w, h)`` returns (C, h, w) for multi-band rasters,
    exactly like GDAL (the layout ``cut_image`` assumes,
    ``MyUtils1.py:188-193``).
    """

    def __init__(self, array_hwc: np.ndarray,
                 geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)):
        assert array_hwc.ndim == 3
        self._a = array_hwc
        self._gt = tuple(geotransform)

    @property
    def RasterCount(self):
        return self._a.shape[2]

    @property
    def RasterXSize(self):
        return self._a.shape[1]

    @property
    def RasterYSize(self):
        return self._a.shape[0]

    def GetGeoTransform(self):
        return self._gt

    def ReadAsArray(self, xoff=0, yoff=0, xsize=None, ysize=None):
        xoff, yoff = int(xoff), int(yoff)
        xsize = self._a.shape[1] - xoff if xsize is None else int(xsize)
        ysize = self._a.shape[0] - yoff if ysize is None else int(ysize)
        out = self._a[yoff : yoff + ysize, xoff : xoff + xsize]
        return np.ascontiguousarray(out.transpose(2, 0, 1))


_REGISTRY: dict[str, FakeRasterDataset] = {}


def register_raster(path: str, ds: FakeRasterDataset) -> None:
    """Make ``gdal.Open(path)`` return ``ds``."""
    _REGISTRY[path] = ds


def install() -> None:
    if "osgeo" in sys.modules:
        return

    gdal = types.ModuleType("osgeo.gdal")
    gdal.GA_ReadOnly = 0
    gdal.GA_Update = 1

    def Open(path, mode=0):
        return _REGISTRY.get(path)

    gdal.Open = Open

    ogr = types.ModuleType("osgeo.ogr")

    class _Driver:
        def Open(self, path, mode=0):
            return None

    def GetDriverByName(name):
        return _Driver()

    ogr.GetDriverByName = GetDriverByName

    osgeo = types.ModuleType("osgeo")
    osgeo.gdal = gdal
    osgeo.ogr = ogr
    sys.modules["osgeo"] = osgeo
    sys.modules["osgeo.gdal"] = gdal
    sys.modules["osgeo.ogr"] = ogr


def import_reference_data_layer(ref_root: str = "/root/reference"):
    """Import the reference's MyUtils1/MyUtils2 with the shim installed.

    Returns (MyUtils1, MyUtils2) modules, or raises ImportError when the
    reference tree is unavailable (tests then skip).
    """
    import importlib
    import os

    if not os.path.isdir(ref_root):
        raise ImportError(f"reference tree not found at {ref_root}")
    install()
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    mu1 = importlib.import_module("MyUtils1")
    mu2 = importlib.import_module("MyUtils2")
    return mu1, mu2
