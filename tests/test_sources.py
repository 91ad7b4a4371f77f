"""Sources (S3 JSON, S5 TSV), J3 right join, U6 composite keys, and the
nested-struct JSON access path (the ``.$rotationRate$x`` idiom of
/root/reference/utils/curation_utils.R:115-118) — each previously claimed
in COVERAGE.md without a verifying test."""

import json

from pyspark.sql import functions as F

from mpower_feature_analysis_spark.sources.io import read_json_lines, read_tsv


def test_read_tsv_with_schema(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("id\tname\tscore\n1\talice\t2.5\n2\tbob\t\n")
    df = read_tsv(spark, str(p), "id int, name string, score double")
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("alice", 2.5), 2: ("bob", None)}
    assert dict(df.dtypes) == {"id": "int", "name": "string", "score": "double"}


def test_read_json_lines_nested_array_of_struct(spark, tmp_path):
    """Sensor-blob shape: an array of samples, each with a nested struct —
    read with an explicit schema, explode, reach fields by dot path."""
    p = tmp_path / "blobs.jsonl"
    recs = [
        {
            "record_id": "r1",
            "samples": [
                {"ts": 0.01, "rotationRate": {"x": 1.5, "y": -0.25, "z": 0.0}},
                {"ts": 0.02, "rotationRate": {"x": 1.25, "y": 0.5, "z": 0.125}},
            ],
        },
        {"record_id": "r2", "samples": []},
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    schema = (
        "record_id string, samples array<struct<ts double, "
        "rotationRate struct<x double, y double, z double>>>"
    )
    df = read_json_lines(spark, str(p), schema)
    flat = df.select(
        "record_id", F.explode("samples").alias("s")
    ).select("record_id", "s.ts", F.col("s.rotationRate.x").alias("rx"))
    got = [(r.record_id, r.ts, r.rx) for r in flat.orderBy("ts").collect()]
    assert got == [("r1", 0.01, 1.5), ("r1", 0.02, 1.25)]
    # empty array → no rows for r2 (explode), but record survives the scan
    assert df.count() == 2


def test_from_json_dot_path_on_string_column(spark):
    """from_json over an embedded JSON string column + nested dot path —
    the in-query analog of the blob scan."""
    df = spark.createDataFrame(
        [("a", '{"rotationRate": {"x": 3.5, "y": 1.0}}'), ("b", "not json")],
        "k string, payload string",
    )
    schema = "rotationRate struct<x double, y double>"
    out = df.select(
        "k", F.from_json("payload", schema).alias("p")
    ).select("k", F.col("p.rotationRate.x").alias("rx"))
    got = {r.k: r.rx for r in out.collect()}
    assert got == {"a": 3.5, "b": None}  # malformed → NULL, never a failure


def test_right_join_semantics(spark):
    """J3: right join keeps every right-side row; missing left side → NULL."""
    left = spark.createDataFrame([(1, "x"), (2, "y")], "k int, lv string")
    right = spark.createDataFrame([(2, "b"), (3, "c")], "k int, rv string")
    out = {r.k: (r.lv, r.rv) for r in left.join(right, "k", "right").collect()}
    assert out == {2: ("y", "b"), 3: (None, "c")}


def test_composite_key_concat_split_roundtrip(spark):
    """U6: build a composite key with concat_ws, split it back, recover the
    original parts exactly (keys with no separator collisions)."""
    df = spark.createDataFrame(
        [("conv9", 13, "purchase"), ("conv10", 0, "view")],
        "conv_id string, turn_idx int, role string",
    )
    keyed = df.withColumn(
        "ckey", F.concat_ws("||", "conv_id", F.col("turn_idx").cast("string"), "role")
    )
    back = keyed.select(
        "ckey",
        F.split("ckey", r"\|\|").getItem(0).alias("c2"),
        F.split("ckey", r"\|\|").getItem(1).cast("int").alias("t2"),
        F.split("ckey", r"\|\|").getItem(2).alias("r2"),
    )
    joined = keyed.join(back, "ckey")
    assert joined.filter(
        (F.col("conv_id") != F.col("c2"))
        | (F.col("turn_idx") != F.col("t2"))
        | (F.col("role") != F.col("r2"))
    ).count() == 0
    assert joined.count() == 2
