"""Structured-Streaming face of the tiling pipeline (SURVEY.md §2.10).

The reference has no streaming; the north rule asks for batch +
resumability (plans/lineage.py). This module is the optional stretch:
the same tiling operators over ``readStream``, with event-time
watermarks on ``warc_ts`` for late pages — so a crawl feed can be tiled
incrementally with exactly-once sinks via ``foreachBatch`` +
checkpointed_write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def streaming_tile_counts(
    pages_stream: DataFrame,
    res: int = 7,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (event-time window, cell) page counts with late-data handling:
    the streaming twin of tile_counts. Append-mode-safe (watermarked)."""
    from rasterio_spark.functions import cell_exprs as CE
    from rasterio_spark.sources.pages import with_geocode

    geo = with_geocode(pages_stream)
    cell = CE.encode_cols(F.col("lon"), F.col("lat"), res)
    return (
        geo.withColumn("cell_id", cell)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell_id"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n_pages")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str = "stream_out") -> DataFrame:
    """Drive a streaming plan to completion over a static directory
    (local smoke-test harness): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def streaming_pip_join_foreach_batch(
    pages_stream: DataFrame,
    polygons: list[dict],
    out_dir: str,
    checkpoint_dir: str,
    res: int = 7,
):
    """Exactly-once streaming PIP join: each micro-batch runs the batch
    pip_join and lands via the lineage-checkpointed idempotent writer —
    a restart replays the batch into the same partitions with the same
    digests."""
    from rasterio_spark.operators.join import pip_join
    from rasterio_spark.plans.lineage import checkpointed_write

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        joined = pip_join(batch_df, polygons, res=res)
        out = joined.select("url", "cell_id", "tile_i", "polygon_id", "poly_value")
        checkpointed_write(out, out_dir, f"pip_epoch_{epoch_id}", "tile_i")

    return (
        pages_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
