"""Sources & sinks (SURVEY.md §2.1).

Reference mapping:

* S1/S2 Synapse SQL table scan → :func:`read_table` (parquet/Iceberg-style
  directory + optional pushed-down predicate; the WHERE-string of
  utils/helper_utils.R:22-27 becomes a Catalyst filter that reaches the
  scan).
* S5 TSV read (fread/read.delim) → :func:`read_tsv` with explicit schema
  (never inferSchema at scale).
* S3 JSON blob scan → :func:`read_json_lines` with explicit schema.
* S6 TSV sink + provenance → :func:`write_stable_parquet` (stable
  (key, seq) ordering, O3) and lineage.checkpointed_write for the
  provenance-manifest analog.
* S8 delete-then-insert table overwrite → :func:`overwrite_partitions`
  (dynamic partition overwrite — the transactional version of
  analysis/mpower_study_burst_summary.R:136-143's synDelete+synStore).

Iceberg itself needs its runtime jar (not in this sandbox); read_table
falls back to parquet directories, which share the directory-partition
layout Iceberg would manage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    path: str,
    where: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan with predicate + projection pushed into the source. Try an
    Iceberg catalog table name first, else a parquet path."""
    try:
        df = spark.read.format("iceberg").load(path)
    except Exception:
        df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    if where:
        df = df.filter(where)
    return df


def read_tsv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", header=True, schema=schema)


def read_json_lines(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_stable_parquet(
    df: DataFrame,
    path: str,
    key_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    n_partitions: int | None = None,
) -> None:
    """O3 deterministic sink: hash-repartition on the key, sort within
    partitions — byte-stable row order per file across reruns."""
    parts = df.repartition(n_partitions, key_col) if n_partitions else df.repartition(key_col)
    parts.sortWithinPartitions(*order_cols).write.mode("overwrite").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 64,
    key: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx", "ts"),
) -> None:
    """Planner-visible bucketed layout (the session-catalog analog of an
    Iceberg bucket-transform partition spec): ``bucketBy(key)`` +
    per-file ``sortBy`` metadata lets Catalyst satisfy a downstream
    hash-partitioning requirement on ``key`` straight from the scan — the
    whole per-turn feature pipeline then runs with ZERO Exchange nodes
    (asserted in tests/test_plans.py). Same physical bytes as
    :func:`write_stable_parquet`; the difference is the catalog metadata
    the planner can trust."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .option("path", path)
        .saveAsTable(table)
    )


def write_bucketed_union_table(
    turns: DataFrame,
    states: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 64,
    on: str = "conv_id",
    turn_ts: str = "ts",
    state_ts: str = "state_ts",
    payload: tuple[str, ...] = ("label",),
    state_seq: str | None = "state_seq",
) -> list[str]:
    """Stage the turns+states AS-OF UNION as one bucketed, per-file-sorted
    table — the zero-exchange flagship layout (round-5 verdict item 6).

    The as-of join's only shuffle is the union's clustering on the
    conversation key; paying it ONCE at ingest (the Iceberg analog: a
    bucket-transform partition spec on the union) lets every subsequent
    feature pass — dedup, as-of fill, gap/rolling/count windows,
    sessionize — plan with ZERO Exchange nodes via
    ``plans.pipeline.extract_turn_features_presorted``. ``sortBy``
    matches the as-of window ordering so the scan also feeds the first
    window pre-sorted. Returns the original turn column names (callers
    pass them to the presorted route)."""
    from ..operators.asof import _union_marked

    import json
    import os

    unioned, turn_cols = _union_marked(
        turns, states, on, turn_ts, state_ts, list(payload), state_seq
    )
    (
        unioned.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, "__k")
        .sortBy("__k", "__ts", "__kind", "__seq")
        .option("path", path)
        .saveAsTable(table)
    )
    # layout manifest for fresh-session re-registration: a bare
    # CREATE TABLE ... LOCATION would lose the bucket spec (it lives in
    # the catalog, not the files) and silently reintroduce Exchanges.
    # The leading underscore keeps the parquet reader from touching it.
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in unioned.schema.fields
    )
    with open(os.path.join(path, "_layout.json"), "w") as f:
        json.dump({
            "n_buckets": n_buckets, "bucket_col": "__k",
            "sort_cols": ["__k", "__ts", "__kind", "__seq"],
            "schema_ddl": ddl, "turn_cols": turn_cols,
        }, f)
    return turn_cols


def register_bucketed_union_table(spark, table: str, path: str) -> dict:
    """Re-register a staged union layout in a FRESH session's catalog with
    its bucket spec intact (read from the ``_layout.json`` manifest
    :func:`write_bucketed_union_table` wrote) — the zero-exchange plan
    depends on the catalog-side ``CLUSTERED BY``, which plain
    ``CREATE TABLE ... LOCATION`` does not recover from parquet files.
    Returns the manifest."""
    import json
    import os

    with open(os.path.join(path, "_layout.json")) as f:
        m = json.load(f)
    sort_cols = ", ".join(m["sort_cols"])
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({m['schema_ddl']}) "
        f"USING parquet "
        f"CLUSTERED BY ({m['bucket_col']}) SORTED BY ({sort_cols}) "
        f"INTO {m['n_buckets']} BUCKETS "
        f"LOCATION '{os.path.abspath(path)}'"
    )
    return m


def overwrite_partitions(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """S8 delete-then-insert, transactionally per directory partition."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
