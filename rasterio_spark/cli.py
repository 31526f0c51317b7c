"""spark-submit CLI — the engine's `rio` (SURVEY.md §2.12).

    python -m rasterio_spark.cli <op> [args...]

Ops mirror the reference subcommand set that matters for the web-table
engine (reference rasterio/rio/main.py:9-17 registers 21 subcommands;
each of ours wraps the same operator the matching rio command wraps):

    info        layer/table summary                 (rio info)
    tile        pages -> cell assignments            (block grid)
    rasterize   polygons -> cells                    (rio rasterize)
    shapes      cells -> region polygons             (rio shapes)
    merge       multi-source composite               (rio merge)
    warp        reproject a cell table               (rio warp)
    calc        band math expression                 (rio calc)
    sample      point probes                         (rio sample)
    join        pages x polygons PIP join
    knn         k nearest pages per query point
    bench       run the benchmark suite

All ops read/write parquet paths. Ship with
``spark-submit --py-files rasterio_spark.zip -m rasterio_spark.cli``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    """Reuse an active session (tests, notebooks) or create one we own."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    from rasterio_spark.plans.session import get_session

    return get_session(app_name=f"rasterio_spark.cli.{args.op}", cores=args.cores), True


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rasterio_spark.cli")
    p.add_argument("op", choices=[
        "info", "tile", "rasterize", "shapes", "merge", "warp", "calc",
        "sample", "join", "knn", "bench",
    ])
    p.add_argument("--input", help="input parquet path (pages or cells table)")
    p.add_argument("--output", help="output parquet path")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--res", type=int, default=7)
    p.add_argument("--expression", help="calc: SQL expression over b1..bN")
    p.add_argument("--method", default="first", help="merge/downsample method")
    p.add_argument("--factor", type=int, default=2, help="warp: downsample factor")
    p.add_argument("--k", type=int, default=10, help="knn: neighbors per query")
    p.add_argument("--points", help="JSON [[id, x, y], ...] for sample/knn")
    p.add_argument("--polygons", help="JSON polygon layer [{polygon_id, geom, value}]")
    p.add_argument("--size", type=int, default=2, help="shapes: sieve threshold")
    p.add_argument("--connectivity", type=int, default=4, choices=[4, 8])
    p.add_argument("--limit", type=int, default=20, help="rows to show without --output")
    args = p.parse_args(argv)

    spark, owned = _session(args)
    out = None

    if args.op == "info":
        df = spark.read.parquet(args.input)
        print(json.dumps({
            "rows": df.count(),
            "columns": [(f.name, f.dataType.simpleString()) for f in df.schema.fields],
            "files_partitions": df.rdd.getNumPartitions(),
        }))
        if owned:
            spark.stop()
        return 0

    if args.op == "tile":
        from rasterio_spark.operators.tile import tile_pages

        out = tile_pages(spark.read.parquet(args.input), res=args.res)
    elif args.op == "rasterize":
        from rasterio_spark.operators.rasterize import rasterize

        layer = json.loads(args.polygons)
        shapes_in = [(pol["geom"], pol.get("value", 1.0)) for pol in layer]
        df = spark.read.parquet(args.input)
        height = df.agg({"row": "max"}).first()[0] + 1
        width = df.agg({"col": "max"}).first()[0] + 1
        out = rasterize(spark, shapes_in, (height, width))
    elif args.op == "shapes":
        from rasterio_spark.operators.shapes import shapes

        out = shapes(spark.read.parquet(args.input), connectivity=args.connectivity)
    elif args.op == "merge":
        from rasterio_spark.operators.merge import merge

        out = merge(spark.read.parquet(args.input), method=args.method)
    elif args.op == "warp":
        from rasterio_spark.operators.warp import downsample

        out = downsample(spark.read.parquet(args.input), args.factor, args.method if args.method != "first" else "average")
    elif args.op == "calc":
        from rasterio_spark.operators.calc import calc

        out = calc(spark.read.parquet(args.input), args.expression)
    elif args.op == "sample":
        from rasterio_spark.grid.affine import Affine
        from rasterio_spark.operators.join import sample_points

        pts = [tuple(x) for x in json.loads(args.points)]
        out = sample_points(spark.read.parquet(args.input), pts, Affine.identity())
    elif args.op == "join":
        from rasterio_spark.operators.join import pip_join

        layer = json.loads(args.polygons)
        out = pip_join(spark.read.parquet(args.input), layer, res=args.res)
    elif args.op == "knn":
        from rasterio_spark.operators.join import knn_join

        pts = [tuple(x) for x in json.loads(args.points)]
        out = knn_join(spark.read.parquet(args.input), pts, k=args.k, res=args.res)
    elif args.op == "bench":
        if owned:
            spark.stop()
        import bench  # repo-root harness

        bench.main()
        return 0

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"written": args.output}))
    else:
        for row in out.limit(args.limit).collect():
            print(row)
    if owned:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
