"""Round-3 additions: zonal_stats, downsample_stats, multiband stack,
knn DataFrame-input path, kmeans oracle determinism, geocode skew
signal."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


def _cells(spark):
    """Small deterministic 2-band cell grid."""
    return spark.range(0, 256).select(
        (1 + F.col("id") % 2).cast("int").alias("band"),
        F.expr("CAST((id DIV 2) DIV 8 AS INT)").alias("row"),
        F.expr("CAST((id DIV 2) % 8 AS INT)").alias("col"),
        ((F.col("id") * 37) % 101).cast("double").alias("value"),
        (F.col("id") % 7 != 0).alias("valid"),
    )


def test_downsample_stats_matches_per_method(spark):
    """Every column of the fused query equals the standalone method."""
    from rasterio_spark.operators.warp import downsample, downsample_stats

    cells = _cells(spark)
    fused = {
        (r["band"], r["row"], r["col"]): r
        for r in downsample_stats(cells, factor=4).collect()
    }
    col_of = {
        "average": "avg_v", "min": "min_v", "max": "max_v", "sum": "sum_v",
        "count": "cnt_v", "rms": "rms_v", "med": "med_v", "q1": "q1_v", "q3": "q3_v",
    }
    for method, col in col_of.items():
        solo = downsample(cells, factor=4, method=method).collect()
        assert solo, method
        for r in solo:
            got = fused[(r["band"], r["row"], r["col"])][col]
            want = r["value"]
            if method == "sum":
                assert abs(got - want) < 1e-9, (method, r)
            else:
                assert got == pytest.approx(want, abs=1e-6), (method, r)


def test_stack_multiband_offsets(spark):
    """A 2-band source followed by a 1-band source: bands 1,2,3."""
    from rasterio_spark.operators.merge import stack

    two_band = _cells(spark)  # bands 1,2
    one_band = _cells(spark).where(F.col("band") == 1)
    out = stack([two_band, one_band], band_counts=[2, 1])
    bands = sorted(r["band"] for r in out.select("band").distinct().collect())
    assert bands == [1, 2, 3]
    # band 3 content == source band 1 content
    b3 = {(r["row"], r["col"]): r["value"] for r in out.where("band = 3").collect()}
    b1 = {(r["row"], r["col"]): r["value"] for r in one_band.collect()}
    assert b3 == b1


def test_stack_band_counts_mismatch(spark):
    from rasterio_spark.operators.merge import stack

    with pytest.raises(ValueError):
        stack([_cells(spark)], band_counts=[1, 2])


def test_zonal_stats_square(spark):
    """Hand-checked zone: a square over a constant-ish grid."""
    from rasterio_spark.operators.stats import zonal_stats

    cells = spark.range(0, 64).select(
        F.lit(1).cast("int").alias("band"),
        F.expr("CAST(id DIV 8 AS INT)").alias("row"),
        (F.col("id") % 8).cast("int").alias("col"),
        F.col("id").cast("double").alias("value"),
        F.lit(True).alias("valid"),
    )
    square = {
        "type": "Polygon",
        "coordinates": [[(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)]],
    }
    rows = zonal_stats(cells, [square], (8, 8)).collect()
    assert len(rows) == 1
    r = rows[0]
    # center rule: cells (2,2),(2,3),(3,2),(3,3) -> ids 18,19,26,27
    assert r["n_cells"] == 4
    assert r["vmin"] == 18.0 and r["vmax"] == 27.0
    assert r["vsum"] == pytest.approx(90.0)
    assert r["vmean"] == pytest.approx(22.5)


def test_zonal_stats_overlapping_shapes_counted_separately(spark):
    """Overlapping zones each see their full cover (not REPLACE'd)."""
    from rasterio_spark.operators.stats import zonal_stats

    cells = spark.range(0, 64).select(
        F.lit(1).cast("int").alias("band"),
        F.expr("CAST(id DIV 8 AS INT)").alias("row"),
        (F.col("id") % 8).cast("int").alias("col"),
        F.lit(1.0).alias("value"),
        F.lit(True).alias("valid"),
    )
    sq = lambda x0, y0, x1, y1: {
        "type": "Polygon",
        "coordinates": [[(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]],
    }
    out = {
        r["shape_id"]: r["n_cells"]
        for r in zonal_stats(cells, [sq(0, 0, 4, 4), sq(2, 2, 6, 6)], (8, 8)).collect()
    }
    assert out == {0: 16, 1: 16}


def test_zonal_stats_multipart_dedup(spark):
    """A MultiPolygon whose parts overlap: cover deduplicated."""
    from rasterio_spark.operators.stats import zonal_stats

    cells = spark.range(0, 16).select(
        F.lit(1).cast("int").alias("band"),
        F.expr("CAST(id DIV 4 AS INT)").alias("row"),
        (F.col("id") % 4).cast("int").alias("col"),
        F.lit(2.0).alias("value"),
        F.lit(True).alias("valid"),
    )
    ring = lambda x0, y0, x1, y1: [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
    mp = {
        "type": "MultiPolygon",
        "coordinates": [[ring(0, 0, 2, 2)], [ring(1, 1, 3, 3)]],
    }
    rows = zonal_stats(cells, [mp], (4, 4)).collect()
    assert len(rows) == 1
    # union cover: 4 + 4 - 1 overlap = 7 cells
    assert rows[0]["n_cells"] == 7


def test_knn_df_input_equals_list_path(spark):
    """DataFrame query input returns exactly the list path's rows."""
    from rasterio_spark.operators.join import knn_join
    from rasterio_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 3000)
    queries = [(0, 10.0, 10.0), (1, -170.0, 80.0), (2, 100.5, 40.5)]
    base = {
        (r["query_id"], r["rank"]): (r["url"], r["dist2"])
        for r in knn_join(pages, queries, k=4).collect()
    }
    qdf = spark.createDataFrame(queries, "query_id long, qlon double, qlat double")
    dfp = {
        (r["query_id"], r["rank"]): (r["url"], r["dist2"])
        for r in knn_join(pages, qdf, k=4).collect()
    }
    assert dfp == base
    from rasterio_spark.plans.cache import release_persisted

    release_persisted()


def test_kmeans_oracle_matches_duckdb(spark, tmp_path):
    """The unrolled-CTE DuckDB twin reproduces kmeans_fit exactly on a
    small synthetic embedding table."""
    import duckdb
    import numpy as np

    from rasterio_spark.operators.similarity import kmeans_assign_sql, kmeans_fit

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assign, _ = kmeans_fit(emb, k=4, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}

    import pandas as pd

    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    con = duckdb.connect()
    con.register("embeddings", pdf)
    want = dict(con.execute(kmeans_assign_sql(k=4, iters=2)).fetchall())
    assert got == want


def test_geocode_auto_skew_warns(spark):
    from rasterio_spark.sources.pages import synth_pages, with_geocode

    stored = with_geocode(synth_pages(spark, 10))  # materialize lon/lat
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = with_geocode(stored, skew=True, method="auto")
    assert any("skew" in str(w.message) for w in rec)
    assert out is stored


def test_cli_env_edit_info(spark, tmp_path, capsys):
    """The last two rio analogues: env report + descriptor header edit."""
    import json

    from pyspark.sql import functions as F

    from rasterio_spark import cli
    from rasterio_spark.sources.layers import (
        LayerDescriptor,
        read_descriptor,
        write_descriptor,
    )

    assert cli.main(["env", "--cores", "4"]) == 0
    env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert env["pyspark"] and env["adaptive_enabled"] == "true"

    table = str(tmp_path / "layer")
    _cells(spark).write.parquet(table)
    write_descriptor(table, LayerDescriptor(width=8, height=16, count=2, nodata=0.0))
    assert cli.main([
        "edit-info", "--input", table, "--nodata", "-1", "--tag", "owner=me",
    ]) == 0
    desc = read_descriptor(table)
    assert desc.nodata == -1.0 and desc.tags == {"owner": "me"}
    # untouched fields survive the edit round-trip
    assert (desc.width, desc.height, desc.count) == (8, 16, 2)

    assert cli.main(["info", "--input", table, "--descriptor", "--cores", "4"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["descriptor"]["nodata"] == -1.0

    # create + rm round-trip
    new_table = str(tmp_path / "created")
    assert cli.main([
        "create", "--output", new_table, "--width", "32", "--height", "16",
        "--cores", "4",
    ]) == 0
    assert read_descriptor(new_table).width == 32
    assert spark.read.parquet(new_table).count() == 0
    assert cli.main(["rm", "--input", new_table]) == 0
    import os

    assert not os.path.exists(new_table)


def _kernel_np(method, t):
    import numpy as np

    t = np.abs(t)
    if method == "cubic":
        a = -0.5
        return np.where(
            t <= 1.0, (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2.0, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )
    if method == "cubic_spline":
        return np.where(
            t <= 1.0, (4 - 6 * t**2 + 3 * t**3) / 6,
            np.where(t < 2.0, (2 - t) ** 3 / 6, 0.0),
        )
    if method == "lanczos":
        import numpy as np

        out = np.where(t < 3.0, np.sinc(t) * np.sinc(t / 3.0), 0.0)
        return out
    raise ValueError(method)


@pytest.mark.parametrize("method", ["cubic", "cubic_spline", "lanczos"])
def test_kernel_reproject_matches_numpy(spark, method):
    """2x upsample of a random grid == independent numpy convolution
    (interior cells, fully-valid stencils)."""
    import numpy as np

    from rasterio_spark.grid.affine import Affine
    from rasterio_spark.operators.warp import reproject

    rng = np.random.default_rng(3)
    H = W_ = 12
    grid = rng.uniform(0, 100, size=(H, W_))
    rows = [
        (1, r, c, float(grid[r, c]), True) for r in range(H) for c in range(W_)
    ]
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )
    out = reproject(
        cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(0.5, 0.0, 0.0, 0.0, 0.5, 0.0),
        dst_crs="EPSG:4326",
        dst_width=2 * W_,
        dst_height=2 * H,
        resampling=method,
        src_nodata=-1.0,
    )
    got = {(r["row"], r["col"]): (r["value"], r["valid"]) for r in out.collect()}
    support = 3 if method == "lanczos" else 2
    checked = 0
    for dr in range(2 * H):
        for dc in range(2 * W_):
            gx = 0.5 * (dc + 0.5) - 0.5  # src fractional col of dst center
            gy = 0.5 * (dr + 0.5) - 0.5
            c0, r0 = int(np.floor(gx)), int(np.floor(gy))
            if (
                r0 - support + 1 < 0 or r0 + support >= H
                or c0 - support + 1 < 0 or c0 + support >= W_
            ):
                continue  # stencil leaves the grid: engine renormalizes
            num = tw = 0.0
            for odr in range(1 - support, support + 1):
                for odc in range(1 - support, support + 1):
                    w = _kernel_np(method, odr - (gy - r0)) * _kernel_np(
                        method, odc - (gx - c0)
                    )
                    num += w * grid[r0 + odr, c0 + odc]
                    tw += w
            want = round(num / tw, 6)
            val, valid = got[(dr, dc)]
            assert valid
            assert val == pytest.approx(want, abs=2e-6), (method, dr, dc)
            checked += 1
    assert checked > 100


def test_cubic_reproduces_linear_field(spark):
    """Keys cubic interpolates linear functions exactly (interior)."""
    from rasterio_spark.grid.affine import Affine
    from rasterio_spark.operators.warp import reproject

    rows = [
        (1, r, c, float(2.0 * r + 3.0 * c + 5.0), True)
        for r in range(10)
        for c in range(10)
    ]
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )
    out = reproject(
        cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(0.5, 0.0, 0.0, 0.0, 0.5, 0.0),
        dst_crs="EPSG:4326",
        dst_width=20,
        dst_height=20,
        resampling="cubic",
        src_nodata=-1.0,
    )
    for r in out.where("row >= 4 AND row < 16 AND col >= 4 AND col < 16").collect():
        gy = 0.5 * (r["row"] + 0.5) - 0.5
        gx = 0.5 * (r["col"] + 0.5) - 0.5
        assert r["value"] == pytest.approx(2.0 * gy + 3.0 * gx + 5.0, abs=1e-5)


def test_gauss_downsample_hand_checked(spark):
    """factor-2 gauss: 3x3 [1,2,1] kernel around the block center."""
    import numpy as np

    from rasterio_spark.operators.warp import downsample

    H = W_ = 8
    grid = np.arange(H * W_, dtype="float64").reshape(H, W_)
    rows = [(1, r, c, float(grid[r, c]), True) for r in range(H) for c in range(W_)]
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )
    got = {
        (r["row"], r["col"]): r["value"]
        for r in downsample(cells, 2, "gauss").collect()
    }
    wts = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype="float64")
    for br in range(4):
        for bc in range(4):
            cr, cc = 2 * br + 1, 2 * bc + 1
            num = tw = 0.0
            for i, odr in enumerate((-1, 0, 1)):
                for j, odc in enumerate((-1, 0, 1)):
                    rr, cc2 = cr + odr, cc + odc
                    if 0 <= rr < H and 0 <= cc2 < W_:
                        num += wts[i, j] * grid[rr, cc2]
                        tw += wts[i, j]
            assert got[(br, bc)] == pytest.approx(round(num / tw, 6), abs=1e-6)


def test_ivf_build_end_to_end_recall(spark):
    """Train-from-scratch IVF: ivf_build labels + full-probe ivf_topk
    == brute-force cosine_topk."""
    import numpy as np

    from rasterio_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 12)).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    indexed = ivf_build(emb, k=4, iters=2)
    assert "label" in indexed.columns
    assert indexed.count() == 80
    qids = [0, 17, 63]
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    full_probe = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(indexed, qids, k=5, nprobe=4).collect()
    }
    assert full_probe == brute


def test_downsample_approx_quantile(spark):
    """exact=False med/q1/q3: the sketch returns a nearest-rank member
    of the block (no interpolation), so it must be an actual block
    value bracketing the exact interpolated quantile."""
    from collections import defaultdict

    from rasterio_spark.operators.warp import downsample

    cells = _cells(spark)
    blocks = defaultdict(list)
    for r in cells.where("valid").collect():
        blocks[(r["band"], r["row"] // 4, r["col"] // 4)].append(r["value"])
    for m in ("med", "q1", "q3"):
        exact = {
            (r["band"], r["row"], r["col"]): r["value"]
            for r in downsample(cells, 4, m).collect()
        }
        approx = {
            (r["band"], r["row"], r["col"]): r["value"]
            for r in downsample(cells, 4, m, exact=False).collect()
        }
        assert set(exact) == set(approx)
        for k in exact:
            vals = sorted(blocks[k])
            # a real member of the block...
            assert approx[k] in [round(v, 6) for v in vals], (m, k)
            # ...adjacent to the exact quantile in the sorted order
            lo = max((v for v in vals if v <= exact[k]), default=vals[0])
            hi = min((v for v in vals if v >= exact[k]), default=vals[-1])
            assert round(lo, 6) <= approx[k] <= round(hi, 6), (m, k)


def test_spark_submit_pyfiles_package(tmp_path):
    """north_rule packaging clause: the zip built by
    tools/package_pyfiles.py runs under a real `spark-submit
    --py-files` with no repo on sys.path."""
    import os
    import shutil
    import subprocess
    import sys

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "rasterio_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.appName('pyfiles_test')\n"
        "         .config('spark.sql.shuffle.partitions', '4')\n"
        "         .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "from rasterio_spark.operators.tile import tile_counts\n"
        "from rasterio_spark.sources.pages import synth_pages\n"
        "n = tile_counts(synth_pages(spark, 2000)).count()\n"
        "print('SUBMIT_OK', n)\n"
        "spark.stop()\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path, str(job),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env=env,
    )
    assert "SUBMIT_OK" in out.stdout, out.stderr[-2000:]


def test_read_resample_properties_ported(spark):
    """Ported reference tests/test_read_resample.py properties over a
    synthetic grid: integer-factor nearest upsample preserves the mean;
    distinct resampling algorithms produce distinct outputs."""
    import numpy as np

    from rasterio_spark.grid.affine import Affine
    from rasterio_spark.operators.warp import downsample, reproject

    rng = np.random.default_rng(5)
    H = W_ = 16
    grid = rng.uniform(0, 255, size=(H, W_)).round()
    rows = [(1, r, c, float(grid[r, c]), True) for r in range(H) for c in range(W_)]
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )

    def vals(df):
        return {(r["row"], r["col"]): r["value"] for r in df.where("valid").collect()}

    # 2x nearest upsample: each src cell appears 4x -> mean preserved
    up = reproject(
        cells, Affine.identity(), "EPSG:4326",
        Affine(0.5, 0.0, 0.0, 0.0, 0.5, 0.0), "EPSG:4326",
        2 * W_, 2 * H, resampling="nearest", src_nodata=-1.0,
    )
    upv = vals(up)
    assert len(upv) == 4 * H * W_
    assert np.mean(list(upv.values())) == pytest.approx(grid.mean(), abs=1e-9)

    # test_resample_alg_effect: nearest != cubic, average != bilinear
    half = dict(
        dst_transform=Affine(2.0, 0.0, 0.0, 0.0, 2.0, 0.0),
        dst_crs="EPSG:4326", dst_width=W_ // 2, dst_height=H // 2,
        src_nodata=-1.0,
    )
    near = vals(reproject(cells, Affine.identity(), "EPSG:4326", resampling="nearest", **half))
    cub = vals(reproject(cells, Affine.identity(), "EPSG:4326", resampling="cubic", **half))
    assert any(near[k] != cub.get(k) for k in near)
    # average vs bilinear: at an EXACT aligned 2:1 ratio bilinear equals
    # the 4-cell average (wx = wy = 0.5), so like the reference's odd
    # 791x718 dims, use a non-integer ratio to expose the difference
    ratio = 16.0 / 7.0
    uneven = dict(
        dst_transform=Affine(ratio, 0.0, 0.0, 0.0, ratio, 0.0),
        dst_crs="EPSG:4326", dst_width=7, dst_height=7, src_nodata=-1.0,
    )
    avg = vals(reproject(cells, Affine.identity(), "EPSG:4326", resampling="average", **uneven))
    bil = vals(reproject(cells, Affine.identity(), "EPSG:4326", resampling="bilinear", **uneven))
    assert any(avg[k] != bil.get(k) for k in avg)

    # test_resampling_rms analogue: rms downsample equals the numpy rms
    rmsv = {
        (r["row"], r["col"]): r["value"]
        for r in downsample(cells, 8, "rms").collect()
    }
    for br in range(2):
        for bc in range(2):
            block = grid[8 * br: 8 * br + 8, 8 * bc: 8 * bc + 8]
            want = round(float(np.sqrt((block ** 2).mean())), 6)
            assert rmsv[(br, bc)] == pytest.approx(want, abs=1e-6)

    # test_resampling_alg_error analogue: warp-only vs read-only sets
    with pytest.raises(ValueError):
        reproject(cells, Affine.identity(), "EPSG:4326", resampling="not_an_alg", **half)
    with pytest.raises(ValueError):
        downsample(cells, 2, "not_an_alg")


def test_dedup_paragraphs_vs_duckdb(spark):
    """C4-style paragraph dedup: engine == DuckDB twin at sf0.01."""
    import duckdb

    from rasterio_spark.operators.dedup import dedup_paragraphs, dedup_paragraphs_sql

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    eng = (
        dedup_paragraphs(docs, max_df=2)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = (
        con.execute(dedup_paragraphs_sql(max_df=2))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(eng) == len(ora) == docs.count()
    for c in ("clean_text", "n_paragraphs", "n_dropped"):
        assert (eng[c].astype(str) == ora[c].astype(str)).all(), c


def test_dedup_paragraphs_hand_checked(spark):
    from rasterio_spark.operators.dedup import dedup_paragraphs

    rows = [
        (0, "unique a\nBOILER\nunique b"),
        (1, "BOILER\nonly here"),
        (2, "BOILER\nalso unique"),
        (3, "all mine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs, max_df=1).collect()}
    assert out[0]["clean_text"] == "unique a\nunique b"
    assert out[0]["n_dropped"] == 1 and out[0]["n_paragraphs"] == 3
    assert out[1]["clean_text"] == "only here"
    assert out[3]["clean_text"] == "all mine" and out[3]["n_dropped"] == 0
    # max_df=2: BOILER appears in 3 docs -> still dropped
    out2 = {r["doc_id"]: r for r in dedup_paragraphs(docs, max_df=2).collect()}
    assert out2[0]["n_dropped"] == 1
    # max_df=3 keeps it
    out3 = {r["doc_id"]: r for r in dedup_paragraphs(docs, max_df=3).collect()}
    assert out3[0]["clean_text"] == rows[0][1]


@pytest.mark.parametrize(
    "m_left,m_top,m_right,m_bot", [(1, 1, 1, 1), (3, 0, 2, 4), (0, 5, 0, 0)]
)
def test_outer_boundless_pixel_fidelity_ported(spark, m_left, m_top, m_right, m_bot):
    """Ported reference tests/test_boundless_read.py property: an outer
    boundless read changes no interior pixel; the border is fill +
    invalid."""
    from pyspark.sql import functions as F

    from rasterio_spark.grid.windows import Window
    from rasterio_spark.operators.window_read import read_boundless

    H = W_ = 6
    cells = spark.range(0, H * W_).select(
        F.lit(1).cast("int").alias("band"),
        F.expr(f"CAST(id DIV {W_} AS INT)").alias("row"),
        (F.col("id") % W_).cast("int").alias("col"),
        (F.col("id") + 1.0).alias("value"),
        F.lit(True).alias("valid"),
    )
    w = Window(-m_left, -m_top, W_ + m_left + m_right, H + m_top + m_bot)
    out = {
        (r["row"], r["col"]): (r["value"], r["valid"])
        for r in read_boundless(cells, w, fill_value=-5.0).collect()
    }
    assert len(out) == (H + m_top + m_bot) * (W_ + m_left + m_right)
    for r in range(-m_top, H + m_bot):
        for c in range(-m_left, W_ + m_right):
            v, valid = out[(r, c)]
            if 0 <= r < H and 0 <= c < W_:
                assert valid and v == r * W_ + c + 1.0
            else:
                assert not valid and v == -5.0
