"""Shared fixtures for rasterio_spark tests.

Pure-grid tests need no Spark; Spark-backed operator tests share one
local session (module-scoped creation is too slow — session-scoped).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rasterio_spark.grid.affine import Affine

# The canonical "RGB.byte-like" layer descriptor (profile printed in
# reference rasterio/io.py:85-95): 791x718, 3 bands, EPSG:32618.
RGB_TRANSFORM = Affine(300.0379266750948, 0.0, 101985.0, 0.0, -300.041782729805, 2826915.0)
RGB_WIDTH = 791
RGB_HEIGHT = 718


@pytest.fixture(scope="session")
def rgb_descriptor():
    from rasterio_spark.sources.layers import LayerDescriptor

    return LayerDescriptor(
        width=RGB_WIDTH,
        height=RGB_HEIGHT,
        count=3,
        dtype="uint8",
        crs="EPSG:32618",
        transform=RGB_TRANSFORM,
        nodata=0.0,
        block_shape=(256, 256),
    )


@pytest.fixture(scope="session")
def spark():
    from rasterio_spark.plans.session import get_session

    spark = get_session(app_name="rasterio_spark_tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
