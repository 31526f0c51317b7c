"""Synthetic Common-Crawl-style documents for benches.

The driver's documents.parquet tables are fixed-size (5k rows at
sf0.1) — fine for correctness oracles, far too small to measure a
shuffle-heavy dedup job's throughput. ``synth_documents`` generates an
arbitrarily large deterministic corpus with the same (doc_id, text)
shape, entirely in JVM expressions (no Python on the generate path),
and supports disjoint shards via ``offset`` for the multi-process
scaling harness (tools/scaling_hunt.py --multiproc --job dedup).

Content model: ~``words_per_doc`` tokens drawn from a ``vocab``-sized
vocabulary by xxhash64(base_id * 1009 + position); every
``dup_mod``-th document reuses the previous document's token stream, so
MinHash/LSH finds real duplicate structure (bucket collisions, verify
work) instead of hashing unique noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_documents(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    offset: int = 0,
    words_per_doc: int = 60,
    vocab: int = 50_000,
    dup_mod: int = 7,
) -> DataFrame:
    """Deterministic (doc_id, text, n_chars) corpus of ``n`` docs with
    ids in [offset, offset + n)."""
    ids = spark.range(
        offset, offset + n, 1, partitions or spark.sparkContext.defaultParallelism
    )
    base = F.when(
        (F.col("id") % dup_mod == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base * 1009 + j), F.lit(vocab))
        ),
    )
    text = F.array_join(words, " ")
    return ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.length(text).alias("n_chars"),
    )
