"""PII redaction + benchmark decontamination — engine == DuckDB twin
on the real documents table plus synthetic PII/contamination fixtures
(test-level oracles; the driver registry is at its 50-query cap)."""

import duckdb
import pytest

from pyspark.sql import functions as F


PII_DOCS = [
    (0, "contact me at alice.smith+spam@example.co.uk for details"),
    (1, "server at 192.168.1.254 responded; backup 10.0.0.1 did not"),
    (2, "call +1 555 867-5309 or (020) 7946 0958 now"),
    (3, "no pii here, just text with numbers 42 and 7"),
    (4, "mixed: bob@test.io from 8.8.8.8 dialed 555-123-4567 twice"),
]


def test_redact_pii_matches_duckdb(spark, sf_dir):
    from rasterio_spark.functions.text import redact_pii, redact_pii_sql

    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string").unionByName(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("doc_id", F.col("doc_id") + 1000)
    )
    eng = (
        redact_pii(docs)
        .select("doc_id", "text_redacted")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW real_docs AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW docs AS "
        + " UNION ALL ".join(
            f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in PII_DOCS
        )
        + " UNION ALL SELECT doc_id + 1000, text FROM real_docs"
    )
    ora = con.execute(
        f"SELECT doc_id, {redact_pii_sql()} AS text_redacted FROM docs ORDER BY doc_id"
    ).df()
    assert list(eng["text_redacted"]) == list(ora["text_redacted"])
    # the synthetic rows actually got scrubbed
    by_id = dict(zip(eng["doc_id"], eng["text_redacted"]))
    assert by_id[0] == "contact me at [EMAIL] for details"
    assert by_id[1] == "server at [IP] responded; backup [IP] did not"
    assert "[PHONE]" in by_id[2]
    assert by_id[3] == PII_DOCS[3][1]  # untouched
    assert "[EMAIL]" in by_id[4] and "[IP]" in by_id[4] and "[PHONE]" in by_id[4]


@pytest.fixture()
def contam_tables(spark):
    # 12-word docs; doc 3 and doc 7 embed a verbatim 8-gram from the
    # "benchmark"; doc 5 shares only a 7-gram (below n) and must stay
    bench_sent = "the quick brown fox jumps over the lazy"
    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (1, "one two three four five six seven eight nine ten eleven twelve"),
        (2, "red orange yellow green blue indigo violet white black grey pink teal"),
        (3, f"intro words {bench_sent} trailing text"),
        (5, "quick brown fox jumps over the lazy cat extra words here now"),
        (7, f"{bench_sent} dog and more"),
        (9, "totally unrelated content goes in this row of the corpus table"),
        (11, "short doc"),  # < n words: must survive, not crash slice()
    ]
    ev = [(100, f"{bench_sent} dog is a pangram prefix")]
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(ev, "doc_id long, text string"),
        docs,
        ev,
    )


def test_decontaminate_matches_duckdb(spark, contam_tables):
    from rasterio_spark.functions.text import decontaminate, decontaminate_sql

    docs, ev, docs_rows, ev_rows = contam_tables
    kept_string = sorted(
        r["doc_id"]
        for r in decontaminate(docs, ev, n=8, use_hash=False).select("doc_id").collect()
    )
    kept_hash = sorted(
        r["doc_id"]
        for r in decontaminate(docs, ev, n=8, use_hash=True).select("doc_id").collect()
    )
    assert kept_string == kept_hash  # hash keying changes bytes, not the verdict
    assert kept_string == [0, 1, 2, 5, 9, 11]  # 3 and 7 dropped; 7-gram overlap + short doc kept

    con = duckdb.connect()
    for name, rows in (("documents", docs_rows), ("eval_docs", ev_rows)):
        con.execute(
            f"CREATE VIEW {name} AS "
            + " UNION ALL ".join(
                f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
            )
        )
    ora = sorted(
        r[0] for r in con.execute(decontaminate_sql(n=8)).fetchall()
    )
    assert ora == kept_string


def test_decontaminate_min_hits(spark, contam_tables):
    from rasterio_spark.functions.text import decontaminate

    docs, ev, _, _ = contam_tables
    # doc 7 shares 2 distinct 8-grams with the eval text, doc 3 only 1
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(docs, ev, n=8, min_hits=2).select("doc_id").collect()
    )
    assert 3 in kept and 7 not in kept


def test_redact_pii_idempotent(spark):
    """redact(redact(x)) == redact(x): placeholder tokens contain no
    digits or @, so a second pass never rewrites them."""
    from rasterio_spark.functions.text import redact_pii

    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    once = redact_pii(docs, out_col="r1")
    twice = redact_pii(once, text_col="r1", out_col="r2")
    rows = twice.select("r1", "r2").collect()
    assert all(r["r1"] == r["r2"] for r in rows)
