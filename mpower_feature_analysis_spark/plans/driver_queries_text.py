"""Driver-contract queries for the training-data-pipeline extras:
text analysis, dedup, similarity search — over the ``documents`` and
``embeddings`` tables (TESTDATA.md).

Queries without an exact SQL twin (MinHash-LSH, SimHash — hash-function
semantics aren't portable to DuckDB) are registered WITHOUT an oracle: the
driver records a rows-only check, and tests/test_text_dedup.py verifies
their semantics against planted near-duplicates instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.dedup_text import (
    exact_text_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from ..functions.similarity import cosine_topk_bruteforce
from ..functions.text import fingerprint, text_quality_features, token_count


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_with_dups(docs: DataFrame) -> DataFrame:
    """Deterministic duplicate planting: every 10th doc re-ingested under a
    shifted id (same text → exact dup; the MinHash/SimHash tests plant
    *near*-dups separately)."""
    dup = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return docs.unionByName(dup)


_DUPDOCS_SQL = """
WITH dupdocs AS (
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 10 = 0
),
fps AS (
    SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM dupdocs
)
"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc count, token totals, exact char avg."""
    d = _docs(spark, sf_dir).withColumn("n_tokens", token_count("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


SQL_DOC_TOKEN_STATS = r"""
SELECT lang, count(*) AS n_docs,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
           AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents GROUP BY lang
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (length, punctuation, whitespace)."""
    d = text_quality_features(_docs(spark, sf_dir))
    return d.select("doc_id", "n_chars_f", "n_tokens", "n_punct", "punct_ratio", "space_ratio")


SQL_DOC_QUALITY = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_f,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
       CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio,
       CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
           / greatest(length(text), 1) AS space_ratio
FROM documents
"""


def q_doc_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups by normalized fingerprint (planted dups)."""
    d = _docs_with_dups(_docs(spark, sf_dir)).withColumn("fp", fingerprint("text", "fp"))
    return (
        d.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


SQL_DOC_FP_DUPS = _DUPDOCS_SQL + """
SELECT fp, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM fps GROUP BY fp HAVING count(*) > 1
"""


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the smallest doc_id per content fingerprint."""
    out = exact_text_dedup(_docs_with_dups(_docs(spark, sf_dir)))
    return out.select("doc_id", "lang", "source", "n_chars")


SQL_DOC_EXACT_DEDUP = _DUPDOCS_SQL + """
SELECT f.doc_id, f.lang, f.source, f.n_chars
FROM fps f
JOIN (SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY fp) k
  ON f.fp = k.fp AND f.doc_id = k.doc_id
"""

KNN_K, KNN_NQ = 3, 5


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for the first few vectors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < KNN_NQ)
    return cosine_topk_bruteforce(emb, q, k=KNN_K).select(
        "query_id", "neighbor_id", F.round("cos_sim", 9).alias("cos_sim"), "rank"
    )


SQL_KNN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {KNN_NQ}
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_sim
  FROM c JOIN q ON neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= {KNN_K}
"""


# --- no-oracle entries (hash semantics not portable; rows-only check) ------

def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_dups(_docs(spark, sf_dir))
    return minhash_lsh_candidates(d, num_hashes=32, bands=8)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_dups(_docs(spark, sf_dir))
    return simhash_near_dups(d, max_hamming=3)


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_dups(_docs(spark, sf_dir))
    cands = minhash_lsh_candidates(d, num_hashes=32, bands=8)
    return ngram_jaccard_pairs(cands, d, min_jaccard=0.7)


def q_window_kernel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/W7-W8: Arrow window kernel over per-conversation gap series
    (rows-only: per-window percentile/entropy math is not SQL-portable)."""
    from ..operators import windowed_summary_features
    from ..transcripts import load_transcripts
    return windowed_summary_features(load_transcripts(spark, sf_dir), window=8)


def q_signal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8-W10: detrend + FIR band-pass + moments/ACF over the events value
    signal per user (rows-only)."""
    from ..operators.signal import signal_summary_features
    from ..transcripts import load_transcripts
    from ..transcripts import events_df
    from pyspark.sql import functions as FF
    ev = events_df(spark, sf_dir)
    t = load_transcripts(spark, sf_dir).alias("t")
    withval = t.join(
        ev.select(FF.concat(FF.lit("c"), FF.col("user_id").cast("string")).alias("conv_id"),
                  FF.col("ts"), FF.col("value")),
        ["conv_id", "ts"],
    )
    return signal_summary_features(
        withval, value_col="value", window=32, overlap=0.5,
        detrend=True, band=(0.1, 0.4),
    )


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: LSH-bucketed cosine top-k (rows-only; approximate by
    design — recall vs the exact oracle is tested in tests/test_similarity)."""
    from ..functions.similarity import lsh_bucketed_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < KNN_NQ)
    return lsh_bucketed_topk(emb, q, k=KNN_K, bits=4)


MEDIA_N = 128


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload → mapInPandas feature kernel with
    error channel. The array<float> feature vector is exploded to one
    (media_id, dim, feat_u16) row per dimension — a canonicalizable shape —
    and the float is reported as its exact u16 source integer
    (round(f*65535) round-trips float32(u/65535) exactly for u < 2^16),
    so the DuckDB oracle can re-derive it in integer arithmetic."""
    from ..functions.multimodal import extract_media_features, synth_media
    feats = extract_media_features(synth_media(spark, n=MEDIA_N))
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.posexplode_outer("feat").alias("dim", "val"),
        "error",
    ).select(
        "media_id", "kind", "n_bytes",
        F.col("dim").cast("int").alias("dim"),
        F.round(F.col("val") * 65535).cast("int").alias("feat_u16"),
        "error",
    )


# Re-derivation of multimodal._decode_bytes in SQL: payload is the ASCII hex
# of sha256(str(i)) repeated 8x; features are the first 16 little-endian u16
# words of sha256(payload). hexmap turns hex byte-pairs into ints portably.
SQL_MEDIA = f"""
WITH hexmap AS (
    SELECT i AS b, lower(format('{{:02x}}', i)) AS hx FROM range(256) t(i)
),
media AS (
    SELECT i AS media_id,
           ['image', 'audio', 'video', 'hologram'][CAST(i % 4 AS INT) + 1] AS kind,
           sha256(repeat(sha256(CAST(i AS VARCHAR)), 8)) AS digest,
           CAST(512 AS BIGINT) AS n_bytes
    FROM range({MEDIA_N}) t(i)
),
ok AS (
    SELECT m.media_id, m.kind, m.n_bytes,
           CAST(d.dim AS INT) AS dim,
           CAST(lo.b + 256 * hi.b AS INT) AS feat_u16,
           CAST(NULL AS VARCHAR) AS error
    FROM media m
    CROSS JOIN range(16) d(dim)
    JOIN hexmap lo ON lo.hx = substr(m.digest, CAST(4 * d.dim + 1 AS INT), 2)
    JOIN hexmap hi ON hi.hx = substr(m.digest, CAST(4 * d.dim + 3 AS INT), 2)
    WHERE m.kind <> 'hologram'
)
SELECT * FROM ok
UNION ALL
SELECT media_id, kind, n_bytes,
       CAST(NULL AS INT) AS dim, CAST(NULL AS INT) AS feat_u16,
       'NotImplementedError: no decoder for kind=''hologram''' AS error
FROM media WHERE kind = 'hologram'
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_fingerprint_dups": q_doc_fingerprint_dups,
    "doc_exact_dedup": q_doc_exact_dedup,
    "knn_cosine": q_knn_cosine,
    "minhash_lsh_candidates": q_minhash_lsh_candidates,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "window_kernel_features": q_window_kernel_features,
    "signal_features": q_signal_features,
    "lsh_ann_topk": q_lsh_ann_topk,
    "media_features": q_media_features,
}

ORACLES: dict[str, str] = {
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_fingerprint_dups": SQL_DOC_FP_DUPS,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "knn_cosine": SQL_KNN,
    "media_features": SQL_MEDIA,
}
