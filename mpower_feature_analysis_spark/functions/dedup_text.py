"""Near-duplicate detection at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

All candidate generation is shuffle-bounded (band-bucket equi-joins), never
O(n²); the only pairwise work happens inside buckets. Hash functions are
``xxhash64`` with integer seeds — deterministic across runs and engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import materialize
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
    max_bucket_size: int | None = None,
    hot_bucket_mode: str = "star",
    cache_signatures: bool | str = "persist",
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows-per-band chunks,
    hash each chunk to a bucket, equi-join within (band, bucket) → candidate
    pairs (a < b). Shuffle cost = one exchange on the bucket key.

    Hot buckets (boilerplate/template corpora put thousands of docs in one
    bucket) go QUADRATIC inside the self-join — AQE skew-splitting spreads
    the work but cannot shrink it. ``max_bucket_size`` bounds it: buckets
    larger than the cap switch to ``hot_bucket_mode``:

    * ``'star'`` (default) — every member pairs with the bucket's min-id
      canonical only: O(n) pairs per bucket, and transitive closure over
      candidate pairs (how dedup consumes them) still connects the whole
      bucket;
    * ``'skip'`` — drop oversized buckets entirely (they are near-always
      boilerplate; verify-stage Jaccard would reject most pairs anyway).

    ``max_bucket_size=None`` keeps exact all-pairs semantics.

    ``cache_signatures`` shares one computation of the signature frame
    across the plan branches that consume it (both self-join sides and, in
    capped mode, the bucket-stats aggregate) — see
    :func:`..utils.materialize` for the modes. Default ``'persist'``
    (non-eager, lineage-preserving: no barrier job, cluster-safe);
    ``'checkpoint'`` is the single-box fast path; ``False`` recomputes the
    ``num_hashes``-hash signature scan per branch.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = materialize(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k),
        cache_signatures,
    )
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

    def _all_pairs(frame: DataFrame) -> DataFrame:
        a, b = frame.alias("a"), frame.alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )

    if max_bucket_size is None:
        return _all_pairs(banded).distinct()
    if hot_bucket_mode not in ("star", "skip"):
        raise ValueError("hot_bucket_mode must be 'star' or 'skip'")

    # one aggregation on the same (band, bucket) key the join shuffles on —
    # the exchange is shared, not an extra pass over the corpus
    stats = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__sz"), F.min(id_col).alias("__canon")
    )
    tagged = banded.join(stats, ["band", "bucket"])
    small = tagged.filter(F.col("__sz") <= max_bucket_size).select(
        id_col, "band", "bucket"
    )
    pairs = _all_pairs(small)
    if hot_bucket_mode == "star":
        hot = tagged.filter(
            (F.col("__sz") > max_bucket_size) & (F.col(id_col) != F.col("__canon"))
        ).select(F.col("__canon").alias("id_a"), F.col(id_col).alias("id_b"))
        pairs = pairs.unionByName(hot)
    return pairs.distinct()


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "arrow",
) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sign of the sum of ±1 votes
    from each token's xxhash64 bit (bit 63 excluded — keeps the value
    non-negative).

    Token hashes stay JVM-side (xxhash64 in codegen); the 63-bit vote fold
    runs in a numpy-batched pandas UDF (``strategy='arrow'``, default): one
    (tokens × 63) bit matrix per batch, segment-summed with
    ``np.add.reduceat``. The all-JVM fold (``strategy='jvm'``) is kept as
    the equality reference — 63 interpreted higher-order ``aggregate``
    lambdas per row, measured 3x slower (BENCH_NOTES.md §3), don't use it
    at corpus scale.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    if strategy == "jvm":
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
                for i in range(63)
            ),
            F.lit(0).cast("long"),
        )
        return df.select(F.col(id_col), sim.alias("simhash"))
    if strategy != "arrow":
        raise ValueError("strategy must be 'arrow' or 'jvm'")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fold(hs: pd.Series) -> pd.Series:
        vals = hs.to_numpy(dtype=object)
        out = np.zeros(len(vals), dtype="int64")
        valid = [i for i, v in enumerate(vals) if v is not None and len(v)]
        if valid:
            lens = np.array([len(vals[i]) for i in valid], dtype="int64")
            flat = np.concatenate(
                [np.asarray(vals[i], dtype="int64") for i in valid]
            ).view(np.uint64)
            offs = np.zeros(len(valid), dtype="int64")
            offs[1:] = np.cumsum(lens)[:-1]
            shifts = np.arange(63, dtype=np.uint64)
            bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int8)
            ones = np.add.reduceat(bits, offs, axis=0, dtype=np.int64)
            setbits = (2 * ones) > lens[:, None]  # votes = 2*ones - n > 0
            sims = (setbits.astype(np.int64) << np.arange(63, dtype=np.int64)).sum(axis=1)
            out[np.asarray(valid)] = sims
        return pd.Series(out)

    return df.select(F.col(id_col), fold(hashes).alias("simhash"))


def simhash_block_layout(blocks: int, max_hamming: int):
    """Pigeonhole layout for 64-bit SimHash: split the hash into ``blocks``
    contiguous bit-chunks and enumerate every ``blocks - max_hamming``-sized
    block subset as one compound join key (Manku/Jain/Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW'07 — the permuted-table scheme,
    re-expressed as subset keys so each table is one equi-join key value).

    Guarantee: a pair within ``max_hamming`` differs in at most
    ``max_hamming`` blocks, so at least ``blocks - max_hamming`` blocks are
    IDENTICAL, and some enumerated subset consists entirely of identical
    blocks — the pair shares that subset's key. Wider ``blocks`` therefore
    trades more keys per doc (``C(blocks, max_hamming)``) for exponentially
    larger key spaces (``(blocks - max_hamming) * 64/blocks`` bits), which
    is what keeps candidate generation sub-quadratic past ~262k docs where
    the minimal ``blocks = max_hamming + 1`` layout's 16-bit chunk space
    saturates (round-3 verdict: 262 s at 1M docs, quadratic beyond).

    Returns ``(offsets, widths, combos)``.
    """
    from itertools import combinations

    if blocks <= max_hamming:
        raise ValueError(
            f"blocks ({blocks}) must exceed max_hamming ({max_hamming}): the "
            "pigeonhole guarantee needs at least one identical block"
        )
    if blocks > 16:
        raise ValueError("blocks > 16 explodes C(blocks, max_hamming) keys")
    w, rem = divmod(64, blocks)
    widths = [w + 1 if i < rem else w for i in range(blocks)]
    offsets = [sum(widths[:i]) for i in range(blocks)]
    combos = list(combinations(range(blocks), blocks - max_hamming))
    return offsets, widths, combos


def auto_simhash_blocks(
    n: int, max_hamming: int = 3, target_occupancy: int = 4, max_keys: int = 64
) -> int:
    """Corpus-adaptive block count: the smallest ``B >= max_hamming + 1``
    whose minimum compound-key width ``(B - max_hamming) * floor(64/B)``
    gives expected bucket occupancy ``n / 2^width <= target_occupancy``,
    capped where ``C(B, max_hamming)`` keys per doc would exceed
    ``max_keys``. At ``h=3``: B=4 (4 keys, 16-bit space) up to ~262k docs,
    B=5 (10 keys, 24-bit) to ~67M, B=6 (20 keys, 30-bit) to ~4B.
    """
    import math

    best = None
    for b in range(max_hamming + 1, 17):
        if math.comb(b, max_hamming) > max_keys:
            break
        best = b
        key_bits = (b - max_hamming) * (64 // b)
        if key_bits >= 62 or n <= target_occupancy * (1 << key_bits):
            return b
    if best is None:
        raise ValueError(
            f"no block layout with <= {max_keys} keys for max_hamming={max_hamming}"
        )
    return best


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int | str = "auto",
    max_bucket_size: int | None = None,
    hot_bucket_mode: str = "star",
    cache_signatures: bool | str = "persist",
) -> DataFrame:
    """Near-dups by SimHash: pigeonhole candidate generation over compound
    block keys (see :func:`simhash_block_layout`), equi-join per key, verify
    exact hamming distance via ``bit_count(xor)`` on the full 64-bit hash.

    ``blocks`` picks the layout: ``max_hamming + 1`` is the classic minimal
    pigeonhole (fewest keys, smallest key space), larger values scale the
    key space past chunk-space saturation at the cost of ``C(blocks,
    max_hamming)`` keys per doc. ``'auto'`` (default) derives it from a
    corpus count at plan build (one count job — the same documented
    driver-action contract as the ANN index parameters) via
    :func:`auto_simhash_blocks`; output pairs are IDENTICAL for any valid
    layout (the verify stage is exact; layouts only change candidate cost).

    Degenerate corpora make one bucket quadratic: every empty/whitespace doc
    folds to simhash=0, so ALL of them share ALL compound keys and the
    self-join emits n² verified pairs. ``max_bucket_size`` bounds it exactly
    like :func:`minhash_lsh_candidates`: oversized (cid, key) buckets switch
    to ``hot_bucket_mode`` —

    * ``'star'`` (default) — members pair with the bucket's min-id canonical
      only (hamming still verified against the canonical's full simhash):
      O(n) pairs, and transitive closure over pairs — how dedup clustering
      consumes them — still connects every true dup to the canonical;
    * ``'skip'`` — drop the oversized bucket from candidate generation.

    ``max_bucket_size=None`` keeps exact all-pairs semantics (the oracle
    path).
    """
    if blocks == "auto":
        blocks = auto_simhash_blocks(df.count(), max_hamming)
    offsets, widths, combos = simhash_block_layout(blocks, max_hamming)
    # both self-join sides (plus the capped mode's bucket-stats agg)
    # consume the signatures; materialize so the Arrow vote fold runs ONCE
    # per corpus, not once per plan branch (O(n) tiny rows). Default
    # 'persist': non-eager and lineage-preserving — see utils.materialize.
    sims = materialize(simhash64(df, id_col, text_col), cache_signatures)

    def chunk_expr(i: int):
        return F.shiftright("simhash", offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    # one compound key per block subset: xxhash64 over the subset's chunk
    # values (multi-arg, JVM codegen). Hash collisions only ADD candidates;
    # the exact verify stage removes them.
    keyed = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("cid"),
                        F.xxhash64(*[chunk_expr(i) for i in combo]).alias("key"),
                    )
                    for ci, combo in enumerate(combos)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.cid", "c.key")

    def _verified_pairs(frame: DataFrame) -> DataFrame:
        a, b = frame.alias("a"), frame.alias("b")
        return (
            a.join(
                b,
                (F.col("a.cid") == F.col("b.cid"))
                & (F.col("a.key") == F.col("b.key"))
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
        )

    if max_bucket_size is None:
        return _verified_pairs(keyed).distinct()
    if hot_bucket_mode not in ("star", "skip"):
        raise ValueError("hot_bucket_mode must be 'star' or 'skip'")

    # aggregation on the same (cid, key) key the self-join shuffles on —
    # the exchange is shared, not an extra corpus pass. min_by carries the
    # canonical's simhash so star pairs verify without a re-join.
    stats = keyed.groupBy("cid", "key").agg(
        F.count(F.lit(1)).alias("__sz"),
        F.min(id_col).alias("__canon"),
        F.min_by("simhash", F.col(id_col)).alias("__canon_sim"),
    )
    tagged = keyed.join(stats, ["cid", "key"])
    small = tagged.filter(F.col("__sz") <= max_bucket_size).select(
        id_col, "simhash", "cid", "key"
    )
    pairs = _verified_pairs(small)
    if hot_bucket_mode == "star":
        hot = (
            tagged.filter(
                (F.col("__sz") > max_bucket_size)
                & (F.col(id_col) != F.col("__canon"))
            )
            .select(
                F.col("__canon").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.bit_count(
                    F.col("__canon_sim").bitwiseXOR(F.col("simhash"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )
        pairs = pairs.unionByName(hot)
    return pairs.distinct()


def exploded_word_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """(id, shingle) rows — DISTINCT k-word shingles per doc, built in an
    Arrow kernel. Output-equal to
    ``explode(array_distinct(text.word_shingles(...)))`` (pinned by a
    test) but ~10x faster: the per-shingle slice+concat_ws expression tree
    evaluates interpreted at ~2 ms/doc, while Python string slicing over
    an Arrow batch is microseconds."""

    def run(batches):
        for pdf in batches:
            ids, gs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                w = ("" if t is None else t).strip().lower().split()
                if len(w) < k:
                    ss = {" ".join(w)}
                else:
                    ss = {" ".join(w[j:j + k]) for j in range(len(w) - k + 1)}
                ids.extend([i] * len(ss))
                gs.extend(ss)
            yield pd.DataFrame({id_col: ids, "g": gs})

    # id type follows the input schema (round-2 advice: hardcoding long
    # broke string doc ids with an Arrow cast failure)
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(run, f"{id_col} {id_type}, g string")


def ngram_jaccard_exact_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_jaccard: float = 0.7,
    max_shingle_freq: int | None = None,
    cache_shingles: bool | str = False,
    exact: bool = False,
) -> DataFrame:
    """Deterministic near-dup pairs: Jaccard >= ``min_jaccard`` over k-word
    shingle sets — exact up to xxhash64 join-key collisions (~2⁻⁶⁴ per
    shingle pair; see the join-key note below), or bit-exact with
    ``exact=True``, which keeps full shingle STRINGS as join keys (no hash
    epsilon, ~5x more shuffle bytes). Either way recall is structurally
    100%, unlike the MinHash-LSH candidate path, which is probabilistic.
    Any pair with Jaccard > 0 shares at least one shingle, so candidates =
    equi-join on exploded DISTINCT shingles — a bounded shuffle, never a
    cross join. Verification is exact set Jaccard.

    Scale note: a corpus-frequent shingle is a hot join key (same failure
    mode as an LSH hot bucket); ``max_shingle_freq`` drops shingles shared
    by more than that many docs from candidate generation — sacrificing
    recall only for pairs whose EVERY common shingle is boilerplate-frequent.

    Join-key layout (round-5, verdict item 5): the self-join shuffles on
    ``xxhash64(shingle)`` — an 8-byte long — instead of the full k-word
    shingle STRING (~40 bytes/row x ~36 rows/doc), cutting exchange bytes
    ~5x. Distinct strings map to distinct hashes except xxhash64
    collisions, so a collision can only (a) merge two shingles in the
    intersection/size counts or (b) surface a spurious candidate; with
    ~36·n distinct shingles the expected number of colliding pairs is
    ``(36n)²/2^65`` ≈ 7e-5 at n=1M docs — the same epsilon the
    rolling-hash verify path (:func:`ngram_jaccard_pairs`) already
    carries. The capped path verifies survivors against TRUE string
    shingle sets, so it is exact regardless; ``exact=True`` removes the
    epsilon from the uncapped path too.

    ``cache_shingles`` materializes the hashed (id, gh) frame consumed by
    three plan branches (sizes/freq aggregate + both self-join sides) —
    see :func:`..utils.materialize`. Default FALSE: the 1M-doc bench
    measured recomputing the Arrow shingle kernel per branch FASTER than
    materializing the old string frame (93 s vs 204 s); re-measure with
    the narrow hashed frame before enabling.
    """
    ex = exploded_word_shingles(docs, id_col, text_col, shingle_k)
    # hash JVM-side right after the Arrow kernel: the Python->JVM transfer
    # is partition-local; what matters is that every SHUFFLE downstream
    # moves 8-byte keys (exact=True keeps the strings and pays the bytes)
    key = F.col("g") if exact else F.xxhash64("g")
    exh = materialize(
        ex.select(id_col, key.alias("gh")), cache_shingles
    )
    sizes = exh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    if max_shingle_freq is None:
        # one aggregation of the exploded self-join gives the intersection
        # size directly — no per-pair shingle-array re-join/materialization
        # (jaccard = isz / (|A| + |B| - isz), same shape as the SQL oracle)
        a, b = exh.alias("a"), exh.alias("b")
        inter = (
            a.join(b, (F.col("a.gh") == F.col("b.gh"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("isz"))
        )
        j = (
            inter
            .join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sa"), "id_a")
            .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sb"), "id_b")
            .withColumn(
                "jaccard",
                F.col("isz").cast("double")
                / F.greatest(F.col("sa") + F.col("sb") - F.col("isz"), F.lit(1)),
            )
            .select("id_a", "id_b", "jaccard")
        )
        return j.filter(F.col("jaccard") >= min_jaccard)

    # capped path: hot shingles leave candidate generation, but the TRUE
    # jaccard of surviving pairs must still count every shared shingle —
    # verify against the full shingle sets (candidates are few by design)
    from .text import word_shingles

    sh = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, k=shingle_k, out="sh")).alias("sh"),
    )
    freq = exh.groupBy("gh").agg(F.count(F.lit(1)).alias("__f"))
    exc = (
        exh.join(freq.filter(F.col("__f") <= max_shingle_freq), "gh")
        .select(id_col, "gh")
    )
    a, b = exc.alias("a"), exc.alias("b")
    cands = (
        a.join(b, (F.col("a.gh") == F.col("b.gh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= min_jaccard)


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
