"""Property test of the file-skipping SAFETY invariant (no Spark).

The contract `sources/snapshots.py` pruning rests on: for ANY predicate
string and ANY file whose manifest stats were derived from its rows, if
``_file_may_match`` returns False then NO row of that file satisfies the
predicate.  (The converse — True for non-matching files — is allowed:
that is the conservative direction, paid in bytes.)

Hypothesis generates random row sets, splits them into "files", derives
stats the way ``_footer_entry`` would, and generates predicates from a
grammar that deliberately includes everything that has bitten before:
OR / NOT / parentheses, string literals containing ``' AND '`` and
escaped quotes, numeric and string comparisons, unknown columns.  Ground
truth is DuckDB evaluating the same predicate over the same rows — real
SQL semantics (NULL comparisons, numeric coercion), not a re-derivation
of our own parser's model.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mpower_feature_analysis_spark.sources.snapshots import (
    _file_may_match,
    _parse_conjuncts,
)

COLS = ("a", "b", "s")

_num = st.one_of(
    st.integers(min_value=-50, max_value=50),
    st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
)
_strval = st.sampled_from(
    ["", "x", "z", "a AND b", "it's", "OR", "not here", "1", "w AND v OR u",
     # quoting forms the scanner must refuse to model (round-6 advice):
     # embedded double quotes and backslashes disable pruning outright
     'x AND y = 3 AND "z', "a\\", '"quoted"', "back\\slash AND b = 1"]
)
_row = st.tuples(
    st.one_of(st.none(), _num),
    st.one_of(st.none(), _num),
    st.one_of(st.none(), _strval),
)


def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(float(v)) if isinstance(v, float) else repr(v)


_comparison = st.tuples(
    st.sampled_from(COLS + ("missing_col",)),
    st.sampled_from(["=", "<", "<=", ">", ">="]),
    st.one_of(_num, _strval),
).map(lambda t: f"{t[0]} {t[1]} {_lit(t[2])}")


def _exprs(children):
    return st.one_of(
        st.tuples(children, st.sampled_from([" AND ", " OR "]), children).map(
            lambda t: f"{t[0]}{t[1]}{t[2]}"
        ),
        children.map(lambda c: f"NOT ({c})"),
        children.map(lambda c: f"({c})"),
    )


_predicate = st.recursive(_comparison, _exprs, max_leaves=5)


def _stats_for(rows: list[tuple]) -> dict:
    """Per-column stats exactly as _footer_entry derives them from a
    parquet footer: min/max over non-null values, null counts, type tag."""
    out: dict[str, dict] = {}
    for i, col in enumerate(COLS):
        vals = [r[i] for r in rows if r[i] is not None]
        nulls = sum(1 for r in rows if r[i] is None)
        if not vals:
            out[col] = {"nulls": nulls}
            continue
        typ = "str" if isinstance(vals[0], str) else "num"
        out[col] = {
            "type": typ,
            "min": min(vals),
            "max": max(vals),
            "nulls": nulls,
        }
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(_row, min_size=0, max_size=12),
    n_files=st.integers(min_value=1, max_value=3),
    pred=_predicate,
)
def test_prune_never_drops_a_matching_row(duck, rows, n_files, pred):
    conjuncts = _parse_conjuncts(pred)
    files = [rows[i::n_files] for i in range(n_files)]
    for frows in files:
        entry = {"path": "f", "rows": len(frows), "stats": _stats_for(frows)}
        if _file_may_match(entry, conjuncts):
            continue  # conservative direction: always allowed
        if not frows:
            continue
        duck.execute("DROP TABLE IF EXISTS t")
        duck.execute(
            "CREATE TABLE t (a DOUBLE, b DOUBLE, s VARCHAR)"
        )
        duck.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [
                (
                    None if r[0] is None else float(r[0]),
                    None if r[1] is None else float(r[1]),
                    r[2],
                )
                for r in frows
            ],
        )
        try:
            n = duck.execute(f"SELECT count(*) FROM t WHERE {pred}").fetchone()[0]
        except duckdb.Error:
            # a predicate DuckDB itself rejects (e.g. type clash) can't
            # define matching rows; the skip decision is then vacuous
            continue
        assert n == 0, (
            f"pruned a file with {n} matching rows: pred={pred!r} "
            f"conjuncts={conjuncts} rows={frows}"
        )


def test_unmodeled_quoting_disables_pruning():
    """Round-6 advice (high): Spark SQL double-quoted string literals and
    backslash-escaped quotes must not be split into phantom conjuncts —
    one embedded ``AND y = 3`` inside such a literal used to prune files
    whose y-range excludes 3, silently dropping their rows.  Either
    character anywhere now disables pruning for the whole predicate."""
    assert _parse_conjuncts('s = "x AND y = 3 AND z"') == []
    assert _parse_conjuncts("s = 'a\\' AND y = 3 AND z\\''") == []
    assert _parse_conjuncts('"s" = 1 AND y = 3') == []
    # the single-quoted-only forms keep pruning
    assert _parse_conjuncts("s = 'a AND b' AND y = 3") == [
        ("s", "=", "a AND b"), ("y", "=", 3)]
