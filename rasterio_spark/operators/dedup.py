"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Scale design: every method is shuffle-bounded by (doc, shingle/band)
cardinality, never O(n^2) over documents — candidate pairs only emerge
from shared buckets. Shingle/token hashes go through sha2 so the exact
same integers are computable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# deterministic (a, b) per permutation; a odd, < 2^31
MINHASH_COEFFS = [(2 * j + 1, (j * j + j + 41) % MINHASH_P) for j in range(16)]
LSH_BANDS = 4  # 16 perms / 4 rows per band


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the
    keeper (min id) and the duplicate count."""
    h = F.sha2(F.col(text_col), 256)
    return (
        docs.select(h.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_exact_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
        SELECT sha256({text_col}) AS text_hash,
               min({id_col}) AS keeper_id,
               count(*) AS n_docs
        FROM {table} GROUP BY 1
    """


def _shingles_expr(text_col: str, n: int) -> str:
    """Spark SQL: array of n-gram shingles over space tokens."""
    return (
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    )


def _shingles_sql(text_col: str, n: int) -> str:
    """DuckDB: same shingle array (1-based inclusive list slicing)."""
    toks = f"string_split({text_col}, ' ')"
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def shingle_docs(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.expr(_shingles_expr(text_col, n))).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard >= threshold.

    Plan: shingle -> self-join on shingle (candidates share >= 1) ->
    count shared -> jaccard with per-doc distinct counts. The self-join
    key is the shingle, so cost ~ sum over shingles of df^2 — bounded
    for natural text; a frequency cap (drop shingles in > 1% of docs)
    keeps the worst case linear at 100 TB.
    """
    sh = shingle_docs(docs, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6))
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.5, table: str = "documents") -> str:
    sh = f"""
        SELECT DISTINCT doc_id, unnest({_shingles_sql("text", n)}) AS shingle
        FROM {table}
    """
    return f"""
        WITH sh AS ({sh}),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT s.doc_a, s.doc_b,
               round(s.shared / (sa.n_sh + sb.n_sh - s.shared), 6) AS jaccard
        FROM shared s
        JOIN sizes sa ON sa.doc_id = s.doc_a
        JOIN sizes sb ON sb.doc_id = s.doc_b
        WHERE round(s.shared / (sa.n_sh + sb.n_sh - s.shared), 6) >= {threshold}
    """


def _shingle_hash_expr() -> str:
    """Spark: shingle -> 60-bit int via sha2 (portable to DuckDB)."""
    return "conv(substring(sha2(shingle, 256), 1, 15), 16, 10)"


def minhash_signatures(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig array<long>) — MinHash signature with 16 universal-
    hash permutations over 60-bit shingle hashes mod p."""
    sh = shingle_docs(docs, n, text_col, id_col)
    hp = (F.expr(_shingle_hash_expr()).cast("long") % MINHASH_P).alias("hp")
    sh = sh.select("doc_id", hp)
    aggs = [
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % MINHASH_P).alias(f"s{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket
    (16 perms -> 4 bands x 4 rows). Pure groupBy/join — the standard
    shingle -> minhash -> band -> bucket-join pipeline."""
    sig = minhash_signatures(docs, n, text_col, id_col)
    rows_per_band = len(MINHASH_COEFFS) // LSH_BANDS
    band_frames = []
    for band in range(LSH_BANDS):
        cols = [f"s{band * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.concat_ws("_", F.lit(str(band)), *[F.col(c).cast("string") for c in cols])
        band_frames.append(sig.select("doc_id", key.alias("bucket")))
    buckets = band_frames[0]
    for bf in band_frames[1:]:
        buckets = buckets.unionByName(bf)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_sql(n: int = 3, table: str = "documents") -> str:
    sh = f"""
        SELECT DISTINCT doc_id, unnest({_shingles_sql("text", n)}) AS shingle
        FROM {table}
    """
    hp = f"(CAST(concat('0x', substr(sha256(shingle), 1, 15)) AS BIGINT) % {MINHASH_P})"
    sig_cols = ", ".join(
        f"min(({a} * {hp} + {b}) % {MINHASH_P}) AS s{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    rows_per_band = len(MINHASH_COEFFS) // LSH_BANDS
    band_selects = []
    for band in range(LSH_BANDS):
        cols = [f"s{band * rows_per_band + r}" for r in range(rows_per_band)]
        key = " || '_' || ".join([f"'{band}'"] + [f"CAST({c} AS VARCHAR)" for c in cols])
        band_selects.append(f"SELECT doc_id, {key} AS bucket FROM sig")
    buckets = " UNION ALL ".join(band_selects)
    return f"""
        WITH sh AS ({sh}),
        sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
        buckets AS ({buckets})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash long): 32-bit SimHash over distinct-token 60-bit
    sha2 hashes; bit j set iff sum over tokens of (bit_j ? +1 : -1) > 0
    (ties at 0 -> bit clear, deterministic)."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .distinct()
        .withColumn("h", F.expr("conv(substring(sha2(tok, 256), 1, 15), 16, 10)").cast("long"))
    )
    aggs = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sig = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_sql(table: str = "documents") -> str:
    h = "CAST(concat('0x', substr(sha256(tok), 1, 15)) AS BIGINT)"
    sums = ", ".join(
        f"sum(((({h} >> {j}) & 1) * 2 - 1)) AS b{j}" for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {2**j}::BIGINT ELSE 0::BIGINT END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM {table}
        ),
        sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
        SELECT doc_id, ({sig}) AS simhash FROM sums
    """
