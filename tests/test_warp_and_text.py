"""Warp/CRS + training-data op tests: mercator round-trip and bounds
(port of reference test_warp.py transform/bounds subset), downsample vs
NumPy, dedup sanity, similarity identity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasterio_spark.grid.affine import Affine
from rasterio_spark.grid.crs import (
    MAX_X,
    transform_bounds,
    transform_geom,
    transform_points,
)
from rasterio_spark.operators.warp import (
    aligned_target,
    calculate_default_transform,
    downsample,
    reproject,
)


def test_mercator_roundtrip():
    lon = np.array([-179.0, -45.5, 0.0, 90.25, 179.9])
    lat = np.array([-80.0, -10.0, 0.0, 45.0, 84.9])
    x, y = transform_points("EPSG:4326", "EPSG:3857", lon, lat)
    lon2, lat2 = transform_points("EPSG:3857", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # golden: 180 degrees -> MAX_X
    x180, _ = transform_points("EPSG:4326", "EPSG:3857", [180.0], [0.0])
    assert x180[0] == pytest.approx(MAX_X)


def test_transform_points_unsupported():
    # 32618 became a supported UTM code in round 5; NY state plane
    # (Lambert conformal conic) stays out of the shipped surface
    with pytest.raises(ValueError):
        transform_points("EPSG:4326", "EPSG:2263", [0.0], [0.0])


def test_transform_bounds_densification():
    """Web-mercator bbox of a wide box: corners alone underestimate
    nothing for this pair (linear in lon), but the clamp at +/-85.05
    must hold and output must contain the corner transforms."""
    l, b, r, t = transform_bounds("EPSG:4326", "EPSG:3857", -10, -20, 30, 40)
    x0, y0 = transform_points("EPSG:4326", "EPSG:3857", [-10.0], [-20.0])
    x1, y1 = transform_points("EPSG:4326", "EPSG:3857", [30.0], [40.0])
    assert l == pytest.approx(x0[0]) and r == pytest.approx(x1[0])
    assert b == pytest.approx(y0[0]) and t == pytest.approx(y1[0])
    # poles clamp instead of inf
    _, _, _, top = transform_bounds("EPSG:4326", "EPSG:3857", -10, -90, 30, 90)
    assert np.isfinite(top)


def test_transform_geom_precision():
    g = {"type": "Point", "coordinates": (10.0, 20.0)}
    out = transform_geom("EPSG:4326", "EPSG:3857", g, precision=3)
    x, y = transform_points("EPSG:4326", "EPSG:3857", [10.0], [20.0])
    assert out["coordinates"] == (round(float(x[0]), 3), round(float(y[0]), 3))


def test_calculate_default_transform_identity_pair():
    t, w, h = calculate_default_transform(
        "EPSG:4326", "EPSG:4326", 100, 50, 0.0, 0.0, 10.0, 5.0
    )
    assert (w, h) == (100, 50)
    assert t.a == pytest.approx(0.1) and t.e == pytest.approx(-0.1)
    t2, w2, h2 = calculate_default_transform(
        "EPSG:4326", "EPSG:4326", 100, 50, 0.0, 0.0, 10.0, 5.0, resolution=0.5
    )
    assert (w2, h2) == (20, 10)
    t3, w3, h3 = calculate_default_transform(
        "EPSG:4326", "EPSG:4326", 100, 50, 0.0, 0.0, 10.0, 5.0, dst_width=40, dst_height=20
    )
    assert (w3, h3) == (40, 20)
    assert t3.a == pytest.approx(0.25)


def test_aligned_target():
    t = Affine.translation(0.3, 9.7) * Affine.scale(1.0, -1.0)
    t2, w, h = aligned_target(t, 10, 10, 2.0)
    assert t2.c % 2.0 == 0 and t2.f % 2.0 == 0
    assert w * 2.0 >= 10


@pytest.fixture(scope="module")
def small_cells(spark):
    # 8x8 grid, value = row*8+col, (0,0) invalid
    return spark.range(0, 64).select(
        F.lit(1).alias("band"),
        F.expr("CAST(id DIV 8 AS INT)").alias("row"),
        (F.col("id") % 8).cast("int").alias("col"),
        F.col("id").cast("double").alias("value"),
        (F.col("id") != 0).alias("valid"),
    )


def test_downsample_average_vs_numpy(spark, small_cells):
    got = {(r["row"], r["col"]): r["value"] for r in downsample(small_cells, 2, "average").collect()}
    arr = np.arange(64, dtype="float64").reshape(8, 8)
    for pr in range(4):
        for pc in range(4):
            block = arr[2 * pr : 2 * pr + 2, 2 * pc : 2 * pc + 2].ravel()
            if (pr, pc) == (0, 0):
                block = block[1:]  # (0,0) invalid
            assert got[(pr, pc)] == pytest.approx(round(float(block.mean()), 6))


def test_downsample_mode_deterministic(spark):
    cells = spark.createDataFrame(
        [(1, 0, 0, 5.0, True), (1, 0, 1, 7.0, True), (1, 1, 0, 7.0, True), (1, 1, 1, 5.0, True)],
        "band int, row int, col int, value double, valid boolean",
    )
    got = downsample(cells, 2, "mode").collect()
    assert len(got) == 1 and got[0]["value"] == 5.0  # tie -> smallest value


def test_reproject_nearest_upscale(spark, small_cells):
    # upscale x2: dst 16x16, each src cell replicated 2x2
    out = reproject(
        small_cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(0.5, 0, 0, 0, 0.5, 0),
        dst_crs="EPSG:4326",
        dst_width=16,
        dst_height=16,
        resampling="nearest",
    )
    got = {(r["row"], r["col"]): r["value"] for r in out.collect()}
    assert got[(2, 2)] == 9.0  # src (1,1)
    assert got[(15, 15)] == 63.0
    assert got[(0, 0)] == 0.0  # invalid src -> nodata 0


def test_reproject_bilinear_midpoint(spark, small_cells):
    out = reproject(
        small_cells.where("valid"),
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(0.5, 0, 0, 0, 0.5, 0),
        dst_crs="EPSG:4326",
        dst_width=16,
        dst_height=16,
        resampling="bilinear",
    )
    got = {(r["row"], r["col"]): r["value"] for r in out.collect()}
    # dst (3,3) center = src grid (1.75, 1.75): bilinear of 9,10,17,18
    arr = np.arange(64, dtype="float64").reshape(8, 8)
    expected = (
        arr[1, 1] * 0.25 * 0.25 * 16
        + 0  # placeholder; compute directly:
    )
    gx = gy = 0.5 * 3.5 - 0.5  # = 1.25
    w = np.array([[1 - 0.25, 0.25]])
    exp = (
        arr[1, 1] * 0.75 * 0.75
        + arr[1, 2] * 0.75 * 0.25
        + arr[2, 1] * 0.25 * 0.75
        + arr[2, 2] * 0.25 * 0.25
    )
    assert got[(3, 3)] == pytest.approx(round(exp, 6))


def test_text_and_dedup(spark):
    from rasterio_spark.functions.text import with_lang_id, with_text_features
    from rasterio_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog of to is in a"),
            (1, "the cat and the dog of to is in a"),
            (2, "der hund und die katze ist zu"),
            (3, "completely different words here entirely"),
        ],
        "doc_id long, text string",
    )
    feats = {r["doc_id"]: r for r in with_text_features(docs).collect()}
    assert feats[0]["n_tokens"] == 10
    assert feats[0]["stopword_ratio"] > 0.5
    langs = {r["doc_id"]: r["pred_lang"] for r in with_lang_id(docs).collect()}
    assert langs[0] == "en" and langs[2] == "de"

    d = dedup_exact(docs).collect()
    by_hash = {r["text_hash"]: r for r in d}
    assert any(r["n_docs"] == 2 and r["keeper_id"] == 0 for r in d)

    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, n=2).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert (0, 3) not in pairs


def test_similarity_ivf_equals_bruteforce(spark, sf_dir):
    from rasterio_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bf = cosine_topk(emb, [0, 1], k=5).orderBy("query_id", "rank").collect()
    ivf = ivf_topk(emb, [0, 1], k=5, nprobe=10).orderBy("query_id", "rank").collect()
    assert [(r["query_id"], r["vec_id"]) for r in bf] == [
        (r["query_id"], r["vec_id"]) for r in ivf
    ]
    # nprobe=1 is approximate: recall <= 1 but same shape
    approx = ivf_topk(emb, [0, 1], k=5, nprobe=1)
    assert approx.count() == 10


def test_repetition_features_vs_duckdb(spark, sf_dir):
    """Gopher-style repetition signals: engine == DuckDB twin on the
    real documents table (test-level oracle; the driver registry is at
    its 50-query cap)."""
    import duckdb

    from rasterio_spark.functions.text import (
        repetition_features_sql,
        top_bigram_features,
        top_bigram_sql,
        with_repetition_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eng1 = (
        with_repetition_features(docs)
        .select("doc_id", "dup_line_frac", "dup_line_char_frac")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    eng2 = top_bigram_features(docs).toPandas().sort_values("doc_id", ignore_index=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rf = repetition_features_sql()
    ora1 = con.execute(
        f"SELECT doc_id, {rf['dup_line_frac']} AS dup_line_frac, "
        f"{rf['dup_line_char_frac']} AS dup_line_char_frac FROM documents"
    ).df().sort_values("doc_id", ignore_index=True)
    ora2 = con.execute(top_bigram_sql()).df().sort_values("doc_id", ignore_index=True)

    assert (abs(eng1["dup_line_frac"] - ora1["dup_line_frac"]) < 1e-9).all()
    assert (abs(eng1["dup_line_char_frac"] - ora1["dup_line_char_frac"]) < 1e-9).all()
    assert (eng2["top_bigram"] == ora2["top_bigram"]).all()
    assert (eng2["top_bigram_n"].astype(int) == ora2["top_bigram_n"].astype(int)).all()
    assert (
        abs(eng2["top_bigram_char_frac"] - ora2["top_bigram_char_frac"]) < 1e-9
    ).all()


def test_repetition_features_hand_checked(spark):
    from rasterio_spark.functions.text import (
        top_bigram_features,
        with_repetition_features,
    )

    rows = [
        (0, "a b\na b\nc d"),        # 3 lines, 2 distinct
        (1, "x y x y x y"),           # top bigram "x y" x3
        (2, "one"),                   # < 2 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["doc_id"]: r for r in with_repetition_features(docs).collect()}
    assert rep[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # chars: lines 'a b'(3) x2 + 'c d'(3) = 9 total, distinct = 6 -> 3/9
    assert rep[0]["dup_line_char_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert rep[1]["dup_line_frac"] == 0.0

    bg = {r["doc_id"]: r for r in top_bigram_features(docs).collect()}
    assert bg[1]["top_bigram"] == "x y" and bg[1]["top_bigram_n"] == 3
    # char frac: len('x y')=3, n=3, chars=11 -> 9/11
    assert bg[1]["top_bigram_char_frac"] == pytest.approx(9 / 11, abs=1e-6)
    assert bg[2]["top_bigram"] == "" and bg[2]["top_bigram_n"] == 0


def test_url_features_vs_duckdb(spark, sf_dir):
    import duckdb

    from rasterio_spark.functions.text import url_features_sql, with_url_features
    from rasterio_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).limit(0).sparkSession.createDataFrame(
        [
            ("https://example.com/a/b/c", ),
            ("http://sub.host.org/page", ),
            ("https://xn--short.io/", ),
            ("https://bare.net", ),
        ],
        "url string",
    )
    eng = (
        with_url_features(pages)
        .select("url", "host", "tld", "path_depth", "url_len")
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("pages", eng[["url"]])
    uf = url_features_sql()
    ora = con.execute(
        f"SELECT url, {uf['host']} AS host, {uf['tld']} AS tld, "
        f"{uf['path_depth']} AS path_depth, {uf['url_len']} AS url_len FROM pages"
    ).df().sort_values("url", ignore_index=True)
    for c in ("host", "tld", "path_depth", "url_len"):
        assert (eng[c].astype(str) == ora[c].astype(str)).all(), c
    row = eng[eng["url"] == "https://example.com/a/b/c"].iloc[0]
    assert row["host"] == "example.com" and row["tld"] == "com" and row["path_depth"] == 3
