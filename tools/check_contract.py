"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $SF_DIR), then compares
row count, column-name set, and order-insensitive values (exact for
ints/strings/timestamps, bit-exact-with-tolerance-report for floats).

Usage: python tools/check_contract.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mpower_feature_analysis_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv).to_numpy(dtype="float64")
            b = pd.to_numeric(ov).to_numpy(dtype="float64")
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                idx = int(np.argmax(~eq))
                problems.append(
                    f"float col {c}: {int((~eq).sum())} mismatch, first@{idx}: "
                    f"{a[idx]!r} vs {b[idx]!r} (absdiff={abs(a[idx]-b[idx]):.3e})"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                idx = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c} ({sv.dtype} vs {ov.dtype}): first mismatch@{idx}: "
                    f"{sv.iloc[idx]!r} vs {ov.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_contract.py [query ...] --json OUT.json", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    results: dict[str, dict] = {}
    spark = get_spark("local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name:26s} rows={len(sdf):7d}  (no oracle — rows-only) {time.time()-t0:5.1f}s")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        odf = con.sql(oracles[name]).df()
        problems = compare(name, sdf, odf)
        status = "OK " if not problems else "FAIL"
        print(f"  {name:26s} rows={len(sdf):7d} {status} {time.time()-t0:5.1f}s")
        for p in problems:
            print(f"      - {p}")
        failures += bool(problems)
        ok = not problems
        results[name] = {
            "rows_match": ok or len(sdf) == len(odf),
            "schema_match": ok or sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": ok,
            "spark_rows": len(sdf), "oracle_rows": len(odf),
            "err": None if ok else "; ".join(problems)[:500],
        }

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_path} ({len(results)} queries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
