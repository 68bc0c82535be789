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

    def __init__(self, fields: dict, x_geo: float = 0.0, y_geo: float = 0.0,
                 fid: int = 0):
        self._fields = dict(fields)
        self._geom = FakeGeometry(x_geo, y_geo)
        self._fid = int(fid)

    def GetField(self, name: str):
        return self._fields[name]

    def SetField(self, name: str, value):
        self._fields[name] = value

    def GetFID(self):
        return self._fid

    def GetGeometryRef(self):
        return self._geom


class FakeLayerDefn:
    """OGR layer definition: field-index lookup for CreateField checks."""

    def __init__(self, layer: "FakeLayer"):
        self._layer = layer

    def GetFieldIndex(self, name: str):
        return self._layer._field_names.index(name) \
            if name in self._layer._field_names else -1


class FakeLayer:
    """OGR layer: ``GetFeature(fid)`` random access plus the streaming
    ``ResetReading``/``GetNextFeature`` protocol and attribute write-back
    (``SetFeature``), as consumed by the reference's datasets and
    ``test_for_shp`` (``MyUtils2.py:177-193``, ``ExtractFeatures.py:
    182-186,216-219``)."""

    def __init__(self, features: dict, field_names=()):
        self._features = dict(features)
        self._order = sorted(self._features)
        self._cursor = 0
        self._field_names = list(field_names)

    def GetFeature(self, fid):
        return self._features[int(fid)]

    def GetFeatureCount(self):
        return len(self._features)

    def ResetReading(self):
        self._cursor = 0

    def GetNextFeature(self):
        if self._cursor >= len(self._order):
            return None
        f = self._features[self._order[self._cursor]]
        self._cursor += 1
        return f

    def GetLayerDefn(self):
        return FakeLayerDefn(self)

    def CreateField(self, field_defn, approx_ok=0):
        if field_defn.name not in self._field_names:
            self._field_names.append(field_defn.name)

    def SetFeature(self, feature):
        self._features[feature.GetFID()] = feature


class FakeVectorDataSource:
    """OGR datasource wrapping one FakeLayer (``GetLayer(0)``)."""

    def __init__(self, layer: FakeLayer):
        self._layer = layer

    def GetLayer(self, index=0):
        return self._layer


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
_VECTOR_REGISTRY: dict[str, FakeLayer] = {}


def register_raster(path: str, ds: FakeRasterDataset) -> None:
    """Make ``gdal.Open(path)`` return ``ds``."""
    _REGISTRY[path] = ds


def register_vector(path: str, layer: FakeLayer) -> None:
    """Make ``ogr.GetDriverByName(...).Open(path, mode)`` return a
    datasource whose ``GetLayer(0)`` is ``layer``."""
    _VECTOR_REGISTRY[path] = layer


class _FieldDefn:
    def __init__(self, name: str, field_type=None):
        self.name = name
        self.type = field_type


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
            layer = _VECTOR_REGISTRY.get(path)
            return None if layer is None else FakeVectorDataSource(layer)

    def GetDriverByName(name):
        return _Driver()

    ogr.GetDriverByName = GetDriverByName
    ogr.FieldDefn = _FieldDefn
    ogr.OFTReal = 2  # OGR's real-field enum value

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
