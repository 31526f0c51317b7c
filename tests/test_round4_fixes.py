"""Round-4 regression pins for the r3 ADVICE items.

- write_window replace semantics when a patch leaves an affected tile
  empty (stale partition files must not survive), and session-conf
  hygiene (partitionOverwriteMode set per-write, never on the session).
- `cli rm` refuses to delete directories that are not layer tables.
"""

import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _layer(spark, table, tile_h=128, n=512):
    cells = spark.range(0, n).select(
        (F.col("id") / 2).cast("int").alias("row"),
        (F.col("id") % 2).cast("int").alias("col"),
        F.lit(1).cast("int").alias("band"),
        F.col("id").cast("double").alias("value"),
        F.lit(True).alias("valid"),
    ).withColumn("tile_i", F.expr(f"row DIV {tile_h}").cast("int"))
    cells.write.partitionBy("tile_i").parquet(table)
    return cells


def test_write_window_erase_to_empty_removes_stale_partition(spark, tmp_path):
    """If the patched frame contributes zero rows to an affected tile
    (sparse model: the window erased everything in it), that tile's
    partition directory must be deleted — dynamic overwrite alone would
    leave its stale files readable."""
    from rasterio_spark.grid.windows import Window
    from rasterio_spark.plans.lineage import write_window

    table = str(tmp_path / "layer")
    cells = _layer(spark, table)
    conf_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")

    # erase tile 1 (rows 128..255, both cols) with an empty patch
    empty = cells.where(F.lit(False)).drop("tile_i")
    res = write_window(spark, table, empty, Window(0, 128, 2, 128), tile_height=128)
    assert res["partitions"] == [1]
    assert not os.path.isdir(os.path.join(table, "tile_i=1"))
    # tile 0 intact: 128 rows x 2 cols
    left = spark.read.parquet(table)
    assert left.count() == 256
    assert left.select(F.max("row")).first()[0] == 127
    # session conf untouched (per-write option, ADVICE low #3)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == conf_before


def test_write_window_partial_erase_keeps_partition(spark, tmp_path):
    """A patch that leaves some rows in the tile keeps the partition."""
    from rasterio_spark.grid.windows import Window
    from rasterio_spark.plans.lineage import write_window

    table = str(tmp_path / "layer")
    cells = _layer(spark, table)
    # erase only rows 128..191 of tile 1
    empty = cells.where(F.lit(False)).drop("tile_i")
    write_window(spark, table, empty, Window(0, 128, 2, 64), tile_height=128)
    assert os.path.isdir(os.path.join(table, "tile_i=1"))
    left = spark.read.parquet(table)
    assert left.count() == 256 + 128  # tile0 full + tile1 rows 192..255


def _run_cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "rasterio_spark.cli", *argv],
        cwd=REPO, capture_output=True, text=True,
    )


def test_cli_rm_refuses_non_layer_dir(tmp_path):
    bogus = tmp_path / "not_a_layer"
    bogus.mkdir()
    (bogus / "precious.txt").write_text("x")
    r = _run_cli("rm", "--input", str(bogus))
    assert r.returncode == 2
    assert "refusing to delete" in r.stderr
    assert bogus.is_dir() and (bogus / "precious.txt").exists()


def test_cli_rm_requires_input_and_existing_dir(tmp_path):
    assert _run_cli("rm").returncode == 2
    assert _run_cli("rm", "--input", str(tmp_path / "nope")).returncode == 2


def test_calc_infers_bands_without_plan_time_job(spark):
    """calc(bands=None) parses b<N> refs from the expression — pure plan
    construction. A mapInPandas source that raises on execution proves no
    job runs at plan time (the old behavior collected distinct bands)."""
    import pytest

    from rasterio_spark.operators.calc import calc

    cells = spark.range(0, 8).select(
        (1 + F.col("id") % 2).cast("int").alias("band"),
        F.lit(0).cast("int").alias("row"),
        (F.col("id") / 2).cast("int").alias("col"),
        F.col("id").cast("double").alias("value"),
        F.lit(True).alias("valid"),
    )

    def boom(_it):
        raise RuntimeError("plan-time job executed")
        yield  # pragma: no cover

    lazy = cells.mapInPandas(boom, schema=cells.schema)
    out = calc(lazy, "0.5 * b1 + 0.5 * b2")  # must not trigger a job
    assert set(out.columns) == {"band", "row", "col", "value", "valid"}

    # inferred == explicit on real data
    inferred = calc(cells, "0.5 * b1 + 0.5 * b2").orderBy("row", "col").collect()
    explicit = calc(cells, "0.5 * b1 + 0.5 * b2", bands=[1, 2]).orderBy("row", "col").collect()
    assert inferred == explicit

    # discover opt-in still scans the table; band-free expression errors
    assert calc(cells, "b1 * 2", bands="discover").count() == 4
    with pytest.raises(ValueError, match="references no b<N> bands"):
        calc(cells, "1 + 1")


def test_kmeans_seed_centroids_no_window(spark):
    """Seed ranking uses collect_list+posexplode, not WindowExec — the
    physical plan must contain no Window operator, and seeds stay the k
    smallest vec_ids in order."""
    from rasterio_spark.operators.similarity import kmeans_fit

    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5).cast("float"), (F.col("id") % 3).cast("float")
        ).alias("embedding"),
    )
    assign, cent = kmeans_fit(emb, k=4, iters=2)
    assert "Window" not in assign._jdf.queryExecution().executedPlan().toString()
    rows = {r["cluster"] for r in cent.collect()}
    assert rows == {0, 1, 2, 3}
    assert assign.count() == 40


def _grid_cells(spark, arr):
    rows = [
        (int(r), int(c), float(arr[r, c]), True)
        for r in range(arr.shape[0])
        for c in range(arr.shape[1])
    ]
    return spark.createDataFrame(rows, "row int, col int, value double, valid boolean")


def test_sieve_gdal_distributed_matches_driver_sparse(spark):
    """driver_threshold=0 forces the distributed region-graph path; on
    non-contended inputs (isolated small regions — the common
    sparse-noise case) it must equal the exact sequential driver path,
    including a contended same-size cluster the round-synchronous
    local-min schedule resolves in the sequential order."""
    import numpy as np

    from rasterio_spark.operators.shapes import sieve

    # isolated specks in a background + one 2x2 cluster of distinct values
    a = np.zeros((12, 12))
    a[2, 2] = 1
    a[2, 3] = 2
    a[3, 2] = 3
    a[3, 3] = 4
    a[7, 9] = 7
    a[10, 1] = 5
    cells = _grid_cells(spark, a)
    drv = [
        (r["row"], r["col"], r["value"])
        for r in sieve(cells, 5, 4, "gdal").orderBy("row", "col").collect()
    ]
    dist = [
        (r["row"], r["col"], r["value"])
        for r in sieve(cells, 5, 4, "gdal", driver_threshold=0).orderBy("row", "col").collect()
    ]
    assert drv == dist
    # everything merged into the zero background
    assert {v for _, _, v in dist} == {0.0}


def test_sieve_gdal_distributed_postcondition_and_determinism(spark):
    """On contended inputs GDAL's own result depends on its sequential
    processing order, which no parallel schedule reproduces in general;
    the distributed path must still (a) be deterministic and (b) satisfy
    the shared post-condition: no under-threshold region with a live
    neighbor remains."""
    import numpy as np

    from rasterio_spark.operators.shapes import sieve

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 3, (10, 10)).astype(float)
    cells = _grid_cells(spark, arr)
    out1 = sieve(cells, 3, 4, "gdal", driver_threshold=0)
    got1 = [(r["row"], r["col"], r["value"]) for r in out1.orderBy("row", "col").collect()]
    out2 = sieve(cells, 3, 4, "gdal", driver_threshold=0)
    got2 = [(r["row"], r["col"], r["value"]) for r in out2.orderBy("row", "col").collect()]
    assert got1 == got2  # deterministic schedule

    # post-condition: every remaining under-threshold region is isolated
    # (no neighbor) — same invariant the sequential driver guarantees
    from rasterio_spark.operators.shapes import connected_components

    res = spark.createDataFrame(
        [(r, c, v, True) for r, c, v in got1],
        "row int, col int, value double, valid boolean",
    )
    lab = {
        (r["row"], r["col"]): r["label"]
        for r in connected_components(res, 4).collect()
    }
    from collections import Counter

    region_n = Counter(lab.values())
    for (r, c), l in lab.items():
        if region_n[l] >= 3:
            continue
        for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            p = (r + dr, c + dc)
            if p in lab:
                assert lab[p] == l, (
                    f"under-threshold region {l} at ({r},{c}) still has a "
                    f"live neighbor at {p}"
                )


def _synthetic_polygons(n, seed=11):
    import numpy as np

    rng = np.random.RandomState(seed)
    polys = []
    for i in range(n):
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-80, 80))
        w = float(rng.uniform(0.5, 3.0))
        h = float(rng.uniform(0.5, 3.0))
        polys.append(
            {
                "polygon_id": i,
                "value": float(i % 7),
                "geom": {
                    "type": "Polygon",
                    "coordinates": [[
                        [cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h],
                        [cx - w, cy + h], [cx - w, cy - h],
                    ]],
                },
            }
        )
    return polys


def test_distributed_cover_matches_serial(spark):
    """_polygon_cover_distributed (mapInPandas batches) must produce the
    exact same cover row set as the serial driver build."""
    from rasterio_spark.operators.join import (
        _polygon_cover,
        _polygon_cover_distributed,
    )
    from rasterio_spark.sources.polygons import prepare_layer

    polys = _synthetic_polygons(300)
    entries, rings_by_id = prepare_layer(polys)
    serial = _polygon_cover(entries, res=6, rings_by_id=rings_by_id)
    dist = _polygon_cover_distributed(spark, polys, res=6).toPandas()
    key = ["cell_id", "polygon_id"]
    s = serial.sort_values(key).reset_index(drop=True)
    d = dist.sort_values(key).reset_index(drop=True)
    assert len(s) == len(d)
    assert (s["cell_id"].values == d["cell_id"].values).all()
    assert (s["polygon_id"].values == d["polygon_id"].values).all()
    assert (s["poly_value"].values == d["poly_value"].values).all()
    assert (s["interior"].values == d["interior"].values).all()


def test_pip_join_distributed_cover_equivalence(spark, monkeypatch):
    """pip_join output is identical whether the cover was built serially
    or distributed (threshold forced to 0), for both the broadcast-join
    and the worker-resident probe strategies."""
    from rasterio_spark.operators import join as J

    polys = _synthetic_polygons(40, seed=5)
    pages = spark.range(0, 3000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.pmod(F.col("id") * F.lit(2654435761), F.lit(340000)) / 1000.0 - 170).alias("lon"),
        (F.pmod(F.col("id") * F.lit(40503), F.lit(160000)) / 1000.0 - 80).alias("lat"),
    )

    def run(strategy):
        out = J.pip_join(pages, polys, res=5, strategy=strategy)
        cols = ["url", "polygon_id", "poly_value"]
        return sorted(tuple(r[c] for c in cols) for r in out.select(cols).collect())

    base_b = run("broadcast")
    base_p = run("probe")
    # force the distributed build (fresh caches so it actually runs)
    monkeypatch.setattr(J, "COVER_DISTRIBUTED_THRESHOLD", 0)
    monkeypatch.setattr(J, "_LAYER_CACHE", {})
    monkeypatch.setattr(J, "_COVER_ARRAY_CACHE", {})
    assert run("broadcast") == base_b
    assert run("probe") == base_p
    assert len(base_b) > 0


def test_colormap_roundtrip(tmp_path):
    """write_colormap/colormap parity with the reference round-trip
    (reference tests/test_colormap.py): 3-tuples get alpha 255, the
    table survives the descriptor sidecar, absent tables raise
    ValueError, bad bands IndexError."""
    import pytest

    from rasterio_spark.sources.layers import (
        LayerDescriptor,
        colormap,
        read_descriptor,
        write_colormap,
        write_descriptor,
    )

    desc = LayerDescriptor(width=10, height=10, count=2)
    desc = write_colormap(desc, 1, {0: (255, 0, 0, 255), 255: (0, 0, 0, 0), 7: (1, 2, 3)})
    cmap = colormap(desc, 1)
    assert cmap[0] == (255, 0, 0, 255)
    assert cmap[255] == (0, 0, 0, 0)
    assert cmap[7] == (1, 2, 3, 255)  # 3-tuple -> alpha 255 (reference rule)
    with pytest.raises(ValueError, match="NULL color table"):
        colormap(desc, 2)
    with pytest.raises(IndexError):
        colormap(desc, 3)
    with pytest.raises(IndexError):
        write_colormap(desc, 0, {0: (1, 2, 3)})
    with pytest.raises(ValueError):
        write_colormap(desc, 1, {0: (300, 0, 0)})

    table_dir = tmp_path / "layer"
    table_dir.mkdir()
    write_descriptor(str(table_dir), desc)
    back = read_descriptor(str(table_dir))
    assert colormap(back, 1) == cmap
    # write replaces the band's whole table
    desc2 = write_colormap(back, 1, {4: (9, 9, 9, 9)})
    assert colormap(desc2, 1) == {4: (9, 9, 9, 9)}


def test_colormap_cli_and_apply(spark, tmp_path):
    """edit-info --colormap persists the table; apply_colormap expands
    cells to RGBA via a broadcast lookup-join."""
    import json

    from rasterio_spark import cli
    from rasterio_spark.sources.layers import (
        LayerDescriptor,
        apply_colormap,
        read_descriptor,
        write_descriptor,
    )

    table_dir = tmp_path / "layer"
    table_dir.mkdir()
    write_descriptor(str(table_dir), LayerDescriptor(width=4, height=1))
    rc = cli.main([
        "edit-info", "--input", str(table_dir),
        "--colormap", json.dumps({"0": [255, 0, 0], "2": [0, 0, 255, 128]}),
        "--band", "1",
    ])
    assert rc == 0
    desc = read_descriptor(str(table_dir))

    cells = spark.createDataFrame(
        [(1, 0, c, float(c), True) for c in range(4)],
        "band int, row int, col int, value double, valid boolean",
    )
    out = {r["col"]: (r["r"], r["g"], r["b"], r["a"])
           for r in apply_colormap(cells, desc, 1).collect()}
    assert out[0] == (255, 0, 0, 255)
    assert out[2] == (0, 0, 255, 128)
    assert out[1] == (None, None, None, None)  # unmapped -> NULL components


def test_synth_documents_deterministic_and_shardable(spark):
    """Bench corpus generator: deterministic, disjoint offset shards
    compose to the full corpus, and every dup_mod-th doc repeats its
    predecessor (real duplicate structure for the dedup scaling job)."""
    from rasterio_spark.sources.documents import synth_documents

    full = {r["doc_id"]: r["text"] for r in synth_documents(spark, 40).collect()}
    again = {r["doc_id"]: r["text"] for r in synth_documents(spark, 40).collect()}
    assert full == again
    s0 = {r["doc_id"]: r["text"] for r in synth_documents(spark, 20, offset=0).collect()}
    s1 = {r["doc_id"]: r["text"] for r in synth_documents(spark, 20, offset=20).collect()}
    assert set(s0) == set(range(20)) and set(s1) == set(range(20, 40))
    assert {**s0, **s1} == full
    for i in range(7, 40, 7):
        assert full[i] == full[i - 1]  # dup structure
    assert full[1] != full[2]


def test_build_pyramid_cascade_equals_from_base(spark):
    """The cascading pyramid (weighted state carried factor-to-factor)
    must equal the from-base downsample_stats at every level, including
    avg/rms where avg-of-avgs would be wrong (valid-cell counts vary
    between blocks here by construction)."""
    from rasterio_spark.operators.warp import build_pyramid, downsample_stats

    cells = spark.range(0, 64 * 64).select(
        F.lit(1).alias("band"),
        F.expr("CAST(id DIV 64 AS INT)").alias("row"),
        (F.col("id") % 64).cast("int").alias("col"),
        ((F.col("id") * 37 % 97) / 7.0).alias("value"),
        (F.col("id") % 5 != 0).alias("valid"),  # uneven valid counts
    )
    pyr = build_pyramid(cells, [2, 4, 8])
    methods = ("average", "min", "max", "sum", "count", "rms")
    for f in (2, 4, 8):
        base = {
            (r["band"], r["row"], r["col"]): (
                r["avg_v"], r["min_v"], r["max_v"], r["sum_v"], r["cnt_v"], r["rms_v"]
            )
            for r in downsample_stats(cells, f, methods).collect()
        }
        casc = {
            (r["band"], r["row"], r["col"]): (
                r["avg_v"], r["min_v"], r["max_v"], r["sum_v"], r["cnt_v"], r["rms_v"]
            )
            for r in pyr[f].collect()
        }
        assert set(base) == set(casc)
        for k in base:
            for b, c in zip(base[k], casc[k]):
                assert abs(b - c) < 1e-6, (f, k, base[k], casc[k])

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        build_pyramid(cells, [2, 5])
    with pytest.raises(ValueError, match="divisible"):
        build_pyramid(cells, [4, 2])
    # non-power-of-two chains are fine as long as each divides the next
    assert set(build_pyramid(cells, [2, 6])) == {2, 6}


def test_build_pyramid_resumable_write(spark, tmp_path):
    """out_dir writes each level via checkpointed_write: kill the job
    mid-level, re-run, and only the missing partitions are written —
    the north-rule lineage contract applied to the pyramid build."""
    from rasterio_spark.operators.warp import build_pyramid
    from rasterio_spark.plans.lineage import read_lineage, verify_lineage

    cells = spark.range(0, 4 * 2048).select(
        F.lit(1).alias("band"),
        F.expr("CAST(id DIV 4 AS INT)").alias("row"),
        (F.col("id") % 4).cast("int").alias("col"),
        (F.col("id") % 11).cast("double").alias("value"),
        F.lit(True).alias("valid"),
    )
    out = str(tmp_path / "pyr")
    build_pyramid(cells, [2, 4], out_dir=out, tile_height=256)
    for f in (2, 4):
        lin = read_lineage(spark, out, f"overview_{f}")
        assert lin is not None and lin.count() > 0
        assert verify_lineage(spark, out, f"overview_{f}", "tile_i").count() == 0
        written = spark.read.parquet(f"{out}/overview_{f}")
        assert written.count() == (2048 // f) * max(4 // f, 1)
    # re-run = pure resume: every level's partitions already committed
    from rasterio_spark.plans import lineage as L

    before = {f: read_lineage(spark, out, f"overview_{f}").count() for f in (2, 4)}
    build_pyramid(cells, [2, 4], out_dir=out, tile_height=256)
    after = {f: read_lineage(spark, out, f"overview_{f}").count() for f in (2, 4)}
    assert before == after  # no partitions rewritten, no lineage rows appended
    assert L is not None


def test_zonal_stats_percentiles(spark):
    """percentiles=(0.5, 0.9) adds exact p50/p90 in the same shuffle;
    values match numpy's linear-interpolation percentile (Spark's
    percentile()) per zone, and the base columns are unchanged."""
    import numpy as np

    from rasterio_spark.operators.stats import zonal_stats

    cells = spark.createDataFrame(
        [(1, r, c, float(r * 10 + c), True) for r in range(10) for c in range(10)],
        "band int, row int, col int, value double, valid boolean",
    )
    shapes = [
        {"type": "Polygon", "coordinates": [[(0, 0), (0, 5), (5, 5), (5, 0), (0, 0)]]},
        {"type": "Polygon", "coordinates": [[(5, 5), (5, 10), (10, 10), (10, 5), (5, 5)]]},
    ]
    out = {
        r["shape_id"]: r
        for r in zonal_stats(cells, shapes, (10, 10), percentiles=(0.5, 0.9)).collect()
    }
    base = {
        r["shape_id"]: r for r in zonal_stats(cells, shapes, (10, 10)).collect()
    }
    # recompute zone cell sets directly from the cover rule (cell center in box)
    for sid, lo, hi in ((0, 0, 5), (1, 5, 10)):
        vals = np.array([
            float(r * 10 + c) for r in range(lo, hi) for c in range(lo, hi)
        ])
        assert abs(out[sid]["p50"] - round(float(np.percentile(vals, 50)), 6)) < 1e-9
        assert abs(out[sid]["p90"] - round(float(np.percentile(vals, 90)), 6)) < 1e-9
        assert out[sid]["vmean"] == base[sid]["vmean"]
        assert out[sid]["n_cells"] == base[sid]["n_cells"] == (hi - lo) ** 2


def test_make_rowcol_udf_rotated_transform(spark):
    """The generic affine UDF (rotated-transform fallback the JVM
    expression path can't express) must match the driver-side
    linear-solve on the same points."""
    from rasterio_spark.functions.udfs import make_rowcol_udf
    from rasterio_spark.grid.affine import Affine
    from rasterio_spark.grid.transform import rowcol_arrays

    import math

    th = math.radians(30)
    t = Affine(2 * math.cos(th), -2 * math.sin(th), 10.0,
               2 * math.sin(th), 2 * math.cos(th), -5.0)
    pts = [(float(x), float(y)) for x in range(-3, 4) for y in range(-3, 4)]
    df = spark.createDataFrame(pts, "x double, y double")
    udf = make_rowcol_udf(t)
    got = {
        (r["x"], r["y"]): (r["rc"]["row"], r["rc"]["col"])
        for r in df.withColumn("rc", udf("x", "y")).collect()
    }
    import numpy as np

    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    rows, cols = rowcol_arrays(t, xs, ys)
    for (x, y), rr, cc in zip(pts, rows, cols):
        assert got[(x, y)] == (rr, cc)


def test_resize_images_plumbing(spark):
    """resize plumbing: deterministic output dims/pixel counts, values
    stable across runs, block-mean preserves the global mean of the
    fake decode (exact for block-aligned shapes)."""
    import numpy as np

    from rasterio_spark.operators.multimodal import resize_images

    blobs = [("a", b"x" * 100), ("b", b"y" * 3000), ("c", None)]
    df = spark.createDataFrame(blobs, "url string, content binary")
    out1 = {r["url"]: r for r in resize_images(df, (16, 16)).collect()}
    out2 = {r["url"]: r for r in resize_images(df, (16, 16)).collect()}
    for u in ("a", "b", "c"):
        assert (out1[u]["height"], out1[u]["width"]) == (16, 16)
        assert len(out1[u]["pixels"]) == 256
        assert out1[u]["pixels"] == out2[u]["pixels"]  # deterministic
        assert all(0.0 <= p <= 255.0 for p in out1[u]["pixels"])
    assert out1["a"]["pixels"] != out1["b"]["pixels"]


def test_audio_chunk_features_plumbing(spark):
    """audio chunking: one row per chunk_ms window (count from blob
    size), vectorized assembly, deterministic per-chunk features."""
    from rasterio_spark.operators.multimodal import audio_chunk_features, decode_audio

    import pytest

    with pytest.raises(NotImplementedError, match="audio codecs"):
        decode_audio(b"RIFF")

    # 1000 ms * 32 B/ms = 32000 B per chunk: 80k bytes -> 3 chunks
    df = spark.createDataFrame(
        [("a", b"z" * 80_000), ("b", b"q" * 10), ("c", None)],
        "url string, content binary",
    )
    out = audio_chunk_features(df).groupBy("url").count().collect()
    counts = {r["url"]: r["count"] for r in out}
    assert counts == {"a": 3, "b": 1, "c": 1}
    rows = audio_chunk_features(df).where("url = 'a'").orderBy("chunk_idx").collect()
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert all(len(r["feat"]) == 8 and r["chunk_ms"] == 1000 for r in rows)
    assert rows[0]["feat"] != rows[1]["feat"]  # chunk index enters the feature


def test_multimodal_decode_stub_and_descriptors():
    import pytest

    from rasterio_spark.operators.multimodal import decode_image
    from rasterio_spark.sources.layers import doc_layer_descriptor, identity_layer

    with pytest.raises(NotImplementedError, match="codecs"):
        decode_image(b"\x89PNG")
    d = doc_layer_descriptor(100)
    assert (d.width, d.height, d.nodata) == (32, 4, 0.0)
    from rasterio_spark.grid.windows import shape as win_shape

    assert win_shape(identity_layer(5, 7).window()) == (7, 5)


def test_cli_rm_deletes_layer_table(tmp_path):
    layer = tmp_path / "layer"
    layer.mkdir()
    (layer / "_SUCCESS").write_text("")
    (layer / "part-00000.parquet").write_text("")
    r = _run_cli("rm", "--input", str(layer))
    assert r.returncode == 0, r.stderr
    assert not layer.exists()


def test_review_fixes_misc(spark):
    """Review fixes r4: calc case-insensitive band refs; multimodal dim
    validation; cascade CLI clean error; zonal fractional-percentile
    aliases distinct."""
    import pytest

    from rasterio_spark.operators.calc import calc
    from rasterio_spark.operators.multimodal import (
        audio_chunk_features,
        extract_image_features,
    )
    from rasterio_spark.operators.stats import zonal_stats

    cells = spark.createDataFrame(
        [(1, 0, c, float(c), True) for c in range(4)]
        + [(2, 0, c, float(c * 2), True) for c in range(4)],
        "band int, row int, col int, value double, valid boolean",
    )
    upper = calc(cells, "B1 + B2").orderBy("col").collect()
    lower = calc(cells, "b1 + b2").orderBy("col").collect()
    assert [r["value"] for r in upper] == [r["value"] for r in lower]

    blobs = spark.createDataFrame([("a", b"x")], "url string, content binary")
    with pytest.raises(ValueError, match="dim must be in 1..8"):
        extract_image_features(blobs, dim=16)
    with pytest.raises(ValueError, match="dim must be in 1..8"):
        audio_chunk_features(blobs, dim=9)

    from rasterio_spark import cli

    assert cli.main([
        "overview", "--input", "/nonexistent", "--cascade", "--method", "med",
    ]) == 2  # clean error before any read

    shapes = [{"type": "Polygon", "coordinates": [[(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]]}]
    z = zonal_stats(cells, shapes, (4, 4), percentiles=(0.12, 0.125))
    assert "p12" in z.columns and "p12_5" in z.columns  # no collision
