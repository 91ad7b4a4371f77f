"""Near-duplicate detection at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

All candidate generation is shuffle-bounded (band-bucket equi-joins), never
O(n²); the only pairwise work happens inside buckets. Hash functions are
``xxhash64`` with integer seeds — deterministic across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, rolling_hash_shingles


def exact_text_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by normalized-content fingerprint: keeps the smallest id
    per group (deterministic canonical representative). One shuffle."""
    withf = df.withColumn("fp", fingerprint(text_col, "fp"))
    keep = withf.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return withf.join(keep, [id_col, "fp"], "left_semi").drop("fp")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """num_hashes MinHash values per document over k-word shingles.

    minhash_i(doc) = min over shingles of xxhash64(shingle_hash, seed=i) —
    all JVM array exprs (transform + array_min), no UDF.
    """
    sh = df.select(
        F.col(id_col), rolling_hash_shingles(text_col, k=shingle_k, out="sh")
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return sh.select(id_col, sig.alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows-per-band chunks,
    hash each chunk to a bucket, equi-join within (band, bucket) → candidate
    pairs (a < b). Shuffle cost = one exchange on the bucket key; hot buckets
    are handled by AQE skew splitting."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("minhash", b * r + j + 1).cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sign of the sum of ±1 votes
    from each token's xxhash64 bit. Computed via aggregate over the token
    array per bit — JVM-only."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bit_sum(i: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = sum(
        (
            F.when(bit_sum(i) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
            for i in range(63)  # bit 63 excluded: keep the value non-negative
        ),
        F.lit(0).cast("long"),
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dups by SimHash: pigeonhole on ``blocks`` 16-bit chunks (any pair
    within hamming<=3 shares at least one exact chunk when blocks=4),
    equi-join per chunk, verify hamming distance via bit_count(xor)."""
    sims = simhash64(df, id_col, text_col)
    chunks = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.blk", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    ``candidates`` has (id_a, id_b); shingle sets are joined in (broadcast
    when small) and Jaccard computed with array_intersect/array_union on
    DISTINCT shingle hashes."""
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(rolling_hash_shingles(text_col, k=shingle_k, out="sh")).alias("sh"),
    )
    j = (
        candidates.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= min_jaccard)
