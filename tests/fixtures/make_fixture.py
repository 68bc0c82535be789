"""Generate the vendored real-data fixture (run once; output is committed).

The raster is written by PIL (an INDEPENDENT TIFF producer: LZW-compressed,
with GeoTIFF ModelPixelScale/ModelTiepoint tags) so the fixture exercises
our pure-Python reader against a file we did not write ourselves — the
closest available stand-in for a real GDAL-produced scene in a zero-egress
image (GDAL and tifffile are absent; PIL is the independent producer this
environment has). A BigTIFF variant of the same pixels is written by our
writer and cross-checked by PIL in the tests.

  python tests/fixtures/make_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from PIL import Image, TiffImagePlugin  # noqa: E402

from deepmerge_tpu.geodata.geotiff import write_geotiff  # noqa: E402
from deepmerge_tpu.geodata.ingest import export_scene  # noqa: E402
from deepmerge_tpu.geodata.synthetic import generate_scene  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "scene")
GT = (500000.0, 2.0, 0.0, 4100000.0, 0.0, -2.0)


def main():
    scene = generate_scene(h=96, w=96, n_regions=12, n_objects=4, seed=42,
                           points_per_region=2)
    scene.meta["geotransform"] = GT
    paths = export_scene(scene, OUT)
    np.save(os.path.join(OUT, "labels.npy"), scene.labels)
    np.save(os.path.join(OUT, "object_of_region.npy"),
            scene.object_of_region)

    # overwrite the raster with the PIL-produced LZW GeoTIFF (independent
    # producer, same pixels + geotransform)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (GT[1], -GT[5], 0.0)
    info.tagtype[33550] = 12  # DOUBLE
    info[33922] = (0.0, 0.0, 0.0, GT[0], GT[3], 0.0)
    info.tagtype[33922] = 12
    Image.fromarray(scene.image).save(
        paths["image"], compression="tiff_lzw", tiffinfo=info
    )

    # BigTIFF sibling (our writer; PIL cross-reads it in the tests)
    write_geotiff(os.path.join(OUT, "synthetic_big.tif"), scene.image, GT,
                  bigtiff=True)
    print("fixture written to", OUT)


if __name__ == "__main__":
    main()
