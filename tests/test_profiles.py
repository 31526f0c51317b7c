"""Creation profiles (reference rasterio/profiles.py:8-51 +
tests/test_profile.py asserts)."""

import json

import pytest

from rasterio_spark.grid.affine import Affine
from rasterio_spark.sources.profiles import (
    DefaultLayerProfile,
    Profile,
    default_layer_profile,
    layer_from_profile,
    writer_options,
)


def test_base_profile_overlay_order():
    """defaults < data < kwargs (reference Profile.__init__)."""

    class P(Profile):
        defaults = {"a": 1, "b": 2}

    p = P({"b": 3, "c": 4}, c=5)
    assert p == {"a": 1, "b": 3, "c": 5}


def test_affine_key_prohibited():
    """reference profiles.py:31-33 + tests/test_profile.py."""
    with pytest.raises(TypeError):
        Profile({"affine": "x"})
    p = Profile()
    with pytest.raises(TypeError):
        p["affine"] = "x"
    p["transform"] = (1, 0, 0, 0, 1, 0)  # the allowed spelling


def test_default_layer_profile_mirrors_gtiff_defaults():
    """DefaultGTiffProfile: tiled 256x256, band-interleaved, LZW,
    uint8, nodata 0 -> block_shape (256,256), zstd, uint8, nodata 0."""
    p = default_layer_profile
    assert p["dtype"] == "uint8"
    assert p["count"] == 1
    assert p["nodata"] == 0.0
    assert (p["blockysize"], p["blockxsize"]) == (256, 256)


def test_default_layer_profile_count_override():
    """reference tests/test_profile.py: DefaultGTiffProfile(count=3)."""
    assert DefaultLayerProfile(count=3)["count"] == 3


def test_layer_from_profile_roundtrip():
    prof = DefaultLayerProfile(
        count=2, dtype="float32", crs="EPSG:32618",
        transform=(300.0, 0.0, 101985.0, 0.0, -300.0, 2826915.0),
        blockxsize=128, blockysize=64,
    )
    d = layer_from_profile(prof, 791, 718)
    assert (d.width, d.height, d.count, d.dtype) == (791, 718, 2, "float32")
    assert d.crs == "EPSG:32618"
    assert d.block_shape == (64, 128)
    assert d.transform == Affine(300.0, 0.0, 101985.0, 0.0, -300.0, 2826915.0)
    assert d.nodata == 0.0


def test_layer_from_profile_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown profile keys"):
        layer_from_profile({"tiled": True}, 4, 4)


def test_writer_options_split():
    assert writer_options(default_layer_profile) == {
        "compression": "zstd",
        "maxRecordsPerFile": "4000000",
    }
    assert writer_options({}) == {}


def test_cli_create_with_profile(spark, tmp_path):
    from rasterio_spark import cli
    from rasterio_spark.sources.layers import read_descriptor

    out = tmp_path / "layer"
    rc = cli.main([
        "create", "--output", str(out), "--width", "32", "--height", "16",
        "--profile", json.dumps({"count": 3, "dtype": "int16", "crs": "EPSG:3857"}),
    ])
    assert rc == 0
    d = read_descriptor(str(out))
    assert (d.width, d.height, d.count, d.dtype) == (32, 16, 3, "int16")
    assert d.crs == "EPSG:3857"
    assert d.nodata == 0.0  # DefaultLayerProfile beneath
    assert spark.read.parquet(str(out)).count() == 0


def test_cli_create_bad_profile_leaves_nothing(spark, tmp_path):
    """A bad profile must fail BEFORE the parquet write so the retry
    with a corrected profile isn't blocked by a half-created dataset."""
    import pytest

    from rasterio_spark.cli import main

    out = tmp_path / "bad_layer"
    with pytest.raises(ValueError, match="unknown profile keys"):
        main([
            "create", "--output", str(out),
            "--width", "8", "--height", "8",
            "--profile", '{"tiled": true}',
        ])
    assert not out.exists()
    # and the corrected retry succeeds on the same path
    rc = main([
        "create", "--output", str(out),
        "--width", "8", "--height", "8",
        "--profile", '{"count": 2}',
    ])
    assert rc == 0 and (out / "_descriptor.json").exists()
