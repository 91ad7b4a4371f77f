"""Driver-contract query registry: Spark implementations + DuckDB oracles.

Each entry exercises one operator family from SURVEY.md §2 on the driver's
parquet tables (TESTDATA.md). The transcript-shaped inputs are derived from
``events`` with the shared mapping in transcripts.py so both engines see the
same rows.

Cross-engine exactness rules (the driver hash-compares values):

* time features are BIGINT epoch-milliseconds (integer-exact);
* sums/avgs of 2-decimal doubles go through DECIMAL(18,2) (exact associative
  sum) and are cast back to DOUBLE — immune to partial-aggregation order;
* medians/IQRs interpolate between two integers in double — deterministic;
* count-like outputs are cast to BIGINT on both sides (DuckDB SUM(int) is
  HUGEINT otherwise);
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import (
    asof_join,
    backward_fill,
    burst_membership_counts,
    burst_schedule,
    dedup_last_wins,
    forward_fill,
    interval_join,
    per_role_running_counts,
    rolling_stats,
    sessionize,
    session_summary,
    top_k_per_group,
    turn_gaps,
    user_aggregate,
    zero_base_ts,
)
from ..transcripts import (
    STATES_CTE,
    TRANSCRIPTS_CTE,
    load_states,
    load_transcripts,
)
from ..utils import ts_ms

ROLES = ["click", "error", "purchase", "signup", "view"]  # event_type domain

_CTE = f"WITH {TRANSCRIPTS_CTE.strip()}, {STATES_CTE.strip()}"


# ---------------------------------------------------------------------------
# transcript-pipeline queries
# ---------------------------------------------------------------------------

def _with_dups(t: DataFrame) -> DataFrame:
    """Deterministic duplicate injection: every 13th turn resent 1 s later
    (mirrors the 108-duplicate-records situation the reference dedups,
    utils/helper_utils.R:41-43).

    Single-pass explode (round-7): the old ``t UNION ALL filter(t)``
    evaluated the transcripts row_number window once per branch — two
    sorts of the events shuffle for one logical pass. Emitting a
    2-element copy array on every 13th row produces the identical row
    multiset from ONE window evaluation."""
    is_resent = F.col("__copy") == 1
    return (
        t.withColumn(
            "__copy",
            F.explode(
                F.when(F.col("turn_idx") % 13 == 0,
                       F.array(F.lit(0), F.lit(1)))
                .otherwise(F.array(F.lit(0)))
            ),
        )
        .select(
            "conv_id", "turn_idx", "role",
            F.when(is_resent, F.concat(F.col("text"), F.lit(" (resent)")))
            .otherwise(F.col("text")).alias("text"),
            "tool",
            F.when(is_resent, F.col("ts") + F.expr("INTERVAL 1 SECOND"))
            .otherwise(F.col("ts")).alias("ts"),
        )
    )


_DUPS_SQL = """
dups AS (
    SELECT * FROM transcripts
    UNION ALL
    SELECT conv_id, turn_idx, role, text || ' (resent)' AS text, tool,
           ts + INTERVAL 1 SECOND AS ts
    FROM transcripts WHERE turn_idx % 13 = 0
)
"""


def q_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: last-record-wins dedup per (conv_id, turn_idx)."""
    return dedup_last_wins(
        _with_dups(load_transcripts(spark, sf_dir)),
        keys=["conv_id", "turn_idx"],
        order_by=["ts"],
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")


SQL_DEDUP = f"""{_CTE}, {_DUPS_SQL.strip()}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ts DESC) AS rn
  FROM dups
) WHERE rn = 1
"""


def q_asof_state_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: sort-merge as-of join — latest state with state_ts <= ts."""
    t = load_transcripts(spark, sf_dir)
    s = load_states(spark, sf_dir)
    return asof_join(t, s, payload=["label"]).select(
        "conv_id", "turn_idx", "ts", "label"
    )


SQL_ASOF = f"""{_CTE},
u AS (
    SELECT conv_id, ts, 1 AS kind, NULL::BIGINT AS seq,
           turn_idx, NULL::VARCHAR AS label
    FROM transcripts
    UNION ALL
    SELECT conv_id, state_ts AS ts, 0 AS kind, state_seq AS seq,
           NULL::INT AS turn_idx, label
    FROM states
)
SELECT conv_id, turn_idx, ts, label FROM (
  SELECT conv_id, turn_idx, ts, kind,
         last_value(label IGNORE NULLS) OVER (
             PARTITION BY conv_id ORDER BY ts, kind, seq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS label
  FROM u
) WHERE kind = 1
"""


def q_forward_fill_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    return forward_fill(t, ["tool"], ["conv_id"], ["turn_idx"]).select(
        "conv_id", "turn_idx", "tool", "tool_ffill"
    )


SQL_FFILL = f"""{_CTE}
SELECT conv_id, turn_idx, tool,
       last_value(tool IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tool_ffill
FROM transcripts
"""


def q_backward_fill_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    return backward_fill(t, ["tool"], ["conv_id"], ["turn_idx"]).select(
        "conv_id", "turn_idx", "tool", "tool_bfill"
    )


SQL_BFILL = f"""{_CTE}
SELECT conv_id, turn_idx, tool,
       first_value(tool IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tool_bfill
FROM transcripts
"""


def q_turn_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: lag/lead inter-turn gaps in integer ms."""
    return turn_gaps(load_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "gap_ms", "lead_gap_ms"
    )


SQL_GAPS = f"""{_CTE}
SELECT conv_id, turn_idx,
       epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms,
       lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS lead_gap_ms
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
"""

SESSION_GAP_S = 3600.0


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: gap-threshold sessionization + per-session rollup."""
    t = load_transcripts(spark, sf_dir)
    return session_summary(sessionize(t, gap_s=SESSION_GAP_S)).select(
        "conv_id", "session_id", "n_turns", "session_start", "session_end", "duration_ms"
    )


SQL_SESSIONS = f"""{_CTE},
g AS (
    SELECT conv_id, turn_idx, ts,
           CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {int(SESSION_GAP_S * 1000)}
                THEN 1 ELSE 0 END AS is_new
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
),
s AS (
    SELECT conv_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
    FROM g
)
SELECT conv_id, session_id, count(*) AS n_turns,
       min(ts) AS session_start, max(ts) AS session_end,
       epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
FROM s GROUP BY conv_id, session_id
"""

ROLL_K = 5


def q_rolling_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: trailing-k rolling stats over the gap series."""
    g = turn_gaps(load_transcripts(spark, sf_dir))
    r = rolling_stats(g, "gap_ms", k=ROLL_K, prefix="roll")
    return r.select(
        "conv_id", "turn_idx",
        F.col("roll_mean").alias("gap_roll_mean"),
        F.col("roll_min").alias("gap_roll_min"),
        F.col("roll_max").alias("gap_roll_max"),
        F.col("roll_n").alias("gap_roll_n"),
    )


SQL_ROLLING = f"""{_CTE},
g AS (
    SELECT conv_id, turn_idx, ts,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx, ts) AS gap_ms
    FROM transcripts
)
SELECT conv_id, turn_idx,
       avg(gap_ms) OVER w AS gap_roll_mean,
       min(gap_ms) OVER w AS gap_roll_min,
       max(gap_ms) OVER w AS gap_roll_max,
       count(gap_ms) OVER w AS gap_roll_n
FROM g
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts
             ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW)
"""


def q_role_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-role leak-free cumulative counts."""
    t = load_transcripts(spark, sf_dir)
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx", "ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = t
    for r in ROLES:
        out = out.withColumn(
            f"n_{r}_so_far", F.count(F.when(F.col("role") == r, 1)).over(w)
        )
    return out.select("conv_id", "turn_idx", *[f"n_{r}_so_far" for r in ROLES])


SQL_RUNNING = f"""{_CTE}
SELECT conv_id, turn_idx,
       {', '.join(
           f"count(CASE WHEN role = '{r}' THEN 1 END) OVER w AS n_{r}_so_far"
           for r in ROLES)}
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_user_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: per-entity distinct count + exact type-7 median/IQR of gaps."""
    g = turn_gaps(load_transcripts(spark, sf_dir)).filter(F.col("gap_ms").isNotNull())
    # records_unique: turn_idx is a row_number per conv_id by derivation,
    # so count == countDistinct here (skips the distinct agg's Expand)
    return user_aggregate(g, value_cols=["gap_ms"], records_unique=True).select(
        "conv_id", "nrecords", "gap_ms_md", "gap_ms_iqr"
    )


SQL_USER_AGG = f"""{_CTE},
g AS (
    SELECT conv_id, turn_idx,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx, ts) AS gap_ms
    FROM transcripts
)
SELECT conv_id, count(DISTINCT turn_idx) AS nrecords,
       quantile_cont(gap_ms, 0.5) AS gap_ms_md,
       quantile_cont(gap_ms, 0.75) - quantile_cont(gap_ms, 0.25) AS gap_ms_iqr
FROM g WHERE gap_ms IS NOT NULL
GROUP BY conv_id
"""

N_BURSTS, BURST_STRIDE_D, BURST_WIDTH_D = 9, 2, 1


def q_burst_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/EP3: burst-window membership counts (replaces the rowwise
    getBurstInfo loop). Round-7: the fixed-grid schedule needs no
    schedule table or interval join — membership is integer arithmetic
    off a first-turn window sharing the count's exchange
    (:func:`..operators.asof.burst_membership_counts`, row-equal to the
    burst_schedule + interval_join form, pinned by test; the generic
    interval_join stays the J8 operator for arbitrary interval tables)."""
    t = load_transcripts(spark, sf_dir)
    return burst_membership_counts(
        t, n_bursts=N_BURSTS, stride_days=BURST_STRIDE_D,
        width_days=BURST_WIDTH_D,
    )


SQL_BURSTS = f"""{_CTE},
firsts AS (SELECT conv_id, min(ts) AS first_ts FROM transcripts GROUP BY conv_id),
sched AS (
    SELECT f.conv_id, CAST(r.range AS INT) AS burst_idx,
           f.first_ts + INTERVAL {BURST_STRIDE_D} DAY * r.range AS burst_start,
           f.first_ts + INTERVAL {BURST_STRIDE_D} DAY * r.range
                      + INTERVAL {BURST_WIDTH_D} DAY AS burst_end
    FROM firsts f CROSS JOIN range({N_BURSTS}) r
)
SELECT t.conv_id, s.burst_idx, count(*) AS n_turns_in_burst
FROM transcripts t JOIN sched s
  ON t.conv_id = s.conv_id AND t.ts >= s.burst_start AND t.ts <= s.burst_end
GROUP BY t.conv_id, s.burst_idx
"""


def q_topk_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/W12: top-2 roles per conversation by turn count."""
    t = load_transcripts(spark, sf_dir)
    counts = t.groupBy("conv_id", "role").agg(F.count(F.lit(1)).alias("n"))
    return top_k_per_group(
        counts, ["conv_id"], [F.col("n").desc(), F.col("role").asc()], k=2
    ).select("conv_id", "role", "n", F.col("rank").cast("long").alias("rank"))


SQL_TOPK = f"""{_CTE},
counts AS (SELECT conv_id, role, count(*) AS n FROM transcripts GROUP BY conv_id, role)
SELECT conv_id, role, n, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY conv_id ORDER BY n DESC, role ASC) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 2
"""


def q_pivot_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: long→wide pivot of per-role turn counts."""
    t = load_transcripts(spark, sf_dir)
    out = (
        t.groupBy("conv_id")
        .pivot("role", ROLES)
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=ROLES)
    )
    return out.select(
        "conv_id", *[F.col(r).cast("long").alias(f"n_{r}") for r in ROLES]
    )


SQL_PIVOT = f"""{_CTE}
SELECT conv_id,
       {', '.join(f"count(CASE WHEN role = '{r}' THEN 1 END) AS n_{r}" for r in ROLES)}
FROM transcripts GROUP BY conv_id
"""


def q_zero_base_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-conversation zero-based time axis."""
    return zero_base_ts(load_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "t_rel_ms"
    )


SQL_ZERO_BASE = f"""{_CTE}
SELECT conv_id, turn_idx,
       epoch_ms(ts) - min(epoch_ms(ts)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx, ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_rel_ms
FROM transcripts
"""

ENROLL_DAYS = 2


def q_enrollment_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: first-N-days activity per entity (get_baseline_activity.R:16-42)."""
    t = load_transcripts(spark, sf_dir)
    w = W.partitionBy("conv_id")
    kept = t.withColumn("__first", F.min("ts").over(w)).filter(
        F.col("ts") <= F.col("__first") + F.expr(f"INTERVAL {ENROLL_DAYS} DAYS")
    )
    return kept.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_enroll_turns"))


SQL_ENROLL = f"""{_CTE},
f AS (SELECT *, min(ts) OVER (PARTITION BY conv_id) AS first_ts FROM transcripts)
SELECT conv_id, count(*) AS n_enroll_turns
FROM f WHERE ts <= first_ts + INTERVAL {ENROLL_DAYS} DAY
GROUP BY conv_id
"""

# ---------------------------------------------------------------------------
# metadata / relational queries (EP2 shapes on the star schema)
# ---------------------------------------------------------------------------

SEGMENT_LEVELS = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "BUILDING", "HOUSEHOLD"]


def q_customer_meta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + §1.2 ordered-factor max: per nation, customer count, exact avg
    acctbal (via DECIMAL), max market segment under a custom level order."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lv = F.array(*[F.lit(x) for x in SEGMENT_LEVELS])
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    return c.groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_acctbal"),
        F.element_at(lv, F.max(F.array_position(lv, F.col("c_mktsegment"))).cast("int"))
        .alias("top_segment"),
    )


_SEG_RANK = "CASE c_mktsegment " + " ".join(
    f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(SEGMENT_LEVELS)
) + " END"
_SEG_DECODE = "CASE max(" + _SEG_RANK + ") " + " ".join(
    f"WHEN {i + 1} THEN '{s}'" for i, s in enumerate(SEGMENT_LEVELS)
) + " END"

SQL_CUSTOMER_META = f"""
SELECT CAST(c_nationkey AS INT) AS c_nationkey,
       count(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_acctbal,
       {_SEG_DECODE} AS top_segment
FROM customer GROUP BY c_nationkey
"""


def q_orders_last_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 arrange-then-last semantics: latest order status per customer
    (max_by on a unique ordering key)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
        F.max("o_orderdate").alias("last_order_ts"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_ORDERS_LAST = """
SELECT o_custkey,
       arg_max(o_orderstatus, o_orderkey) AS last_status,
       max(o_orderdate) AS last_order_ts,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation with exact decimal sums."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9: per nation, customers WITH orders (semi) vs WITHOUT (anti)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = o.select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(keys, "c_custkey", "left_semi").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    anti = c.join(keys, "c_custkey", "left_anti").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return (
        semi.join(anti, "c_nationkey", "full")
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


SQL_SEMI_ANTI = """
WITH with_orders AS (
  SELECT c_nationkey, count(*) AS n_with_orders FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_nationkey
), without_orders AS (
  SELECT c_nationkey, count(*) AS n_without_orders FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY c_nationkey
)
SELECT CAST(COALESCE(w.c_nationkey, wo.c_nationkey) AS INT) AS c_nationkey,
       COALESCE(n_with_orders, 0) AS n_with_orders,
       COALESCE(n_without_orders, 0) AS n_without_orders
FROM with_orders w FULL JOIN without_orders wo ON w.c_nationkey = wo.c_nationkey
"""

def q_full_outer_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: reduce(full_join) across per-assay tables + coverage booleans
    (get_predicted_prob.R:151-152; has_all/has_atleast logic
    get_mpower_predicted_prob_burst.R:289-301). Here: per-role median gap
    tables full-outer-joined on the entity."""
    from functools import reduce

    g = turn_gaps(load_transcripts(spark, sf_dir)).filter(F.col("gap_ms").isNotNull())
    per_role = [
        g.filter(F.col("role") == r)
        .groupBy("conv_id")
        .agg(F.percentile(F.col("gap_ms"), F.lit(0.5)).alias(f"md_{r}"))
        for r in ("click", "view", "error")
    ]
    joined = reduce(lambda a, b: a.join(b, "conv_id", "full"), per_role)
    nn = sum(
        (F.when(F.col(f"md_{r}").isNotNull(), 1).otherwise(0) for r in ("click", "view", "error")),
        F.lit(0),
    )
    return joined.select(
        "conv_id", "md_click", "md_view", "md_error",
        (nn == 3).alias("has_all_three"),
        (nn >= 2).alias("has_atleast_two"),
    )


SQL_FULL_OUTER = f"""{_CTE},
g AS (
    SELECT conv_id, role,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx, ts) AS gap_ms
    FROM transcripts
),
mc AS (SELECT conv_id, quantile_cont(gap_ms, 0.5) AS md_click FROM g
       WHERE gap_ms IS NOT NULL AND role = 'click' GROUP BY conv_id),
mv AS (SELECT conv_id, quantile_cont(gap_ms, 0.5) AS md_view FROM g
       WHERE gap_ms IS NOT NULL AND role = 'view' GROUP BY conv_id),
me AS (SELECT conv_id, quantile_cont(gap_ms, 0.5) AS md_error FROM g
       WHERE gap_ms IS NOT NULL AND role = 'error' GROUP BY conv_id)
SELECT COALESCE(mc.conv_id, mv.conv_id, me.conv_id) AS conv_id,
       md_click, md_view, md_error,
       (CASE WHEN md_click IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN md_view IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN md_error IS NOT NULL THEN 1 ELSE 0 END) = 3 AS has_all_three,
       (CASE WHEN md_click IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN md_view IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN md_error IS NOT NULL THEN 1 ELSE 0 END) >= 2 AS has_atleast_two
FROM mc
FULL JOIN mv ON mc.conv_id = mv.conv_id
FULL JOIN me ON COALESCE(mc.conv_id, mv.conv_id) = me.conv_id
"""


def q_melt_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 wide→long melt of the pivoted role counts (gather/pivot_longer,
    utils/helper_utils.R:36-38)."""
    wide = q_pivot_role_counts(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (role, n)".format(
        n=len(ROLES),
        args=", ".join(f"'{r}', n_{r}" for r in ROLES),
    )
    return wide.selectExpr("conv_id", stack_expr).filter(F.col("n") > 0)


SQL_MELT = f"""{_CTE},
wide AS (
    SELECT conv_id,
           {', '.join(f"count(CASE WHEN role = '{r}' THEN 1 END) AS n_{r}" for r in ROLES)}
    FROM transcripts GROUP BY conv_id
)
{' UNION ALL '.join(
    f"SELECT conv_id, '{r}' AS role, n_{r} AS n FROM wide WHERE n_{r} > 0"
    for r in ROLES)}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_last_wins": q_dedup_last_wins,
    "asof_state_label": q_asof_state_label,
    "forward_fill_tool": q_forward_fill_tool,
    "backward_fill_tool": q_backward_fill_tool,
    "turn_gaps": q_turn_gaps,
    "sessionize": q_sessionize,
    "rolling_gap_stats": q_rolling_gap_stats,
    "role_running_counts": q_role_running_counts,
    "user_aggregate": q_user_aggregate,
    "burst_membership": q_burst_membership,
    "topk_roles": q_topk_roles,
    "pivot_role_counts": q_pivot_role_counts,
    "zero_base_ts": q_zero_base_ts,
    "enrollment_window": q_enrollment_window,
    "customer_meta_agg": q_customer_meta_agg,
    "orders_last_status": q_orders_last_status,
    "lineitem_pricing": q_lineitem_pricing,
    "semi_anti_join": q_semi_anti_join,
    "full_outer_reduce": q_full_outer_reduce,
    "melt_role_counts": q_melt_role_counts,
}

ORACLES: dict[str, str] = {
    "dedup_last_wins": SQL_DEDUP,
    "asof_state_label": SQL_ASOF,
    "forward_fill_tool": SQL_FFILL,
    "backward_fill_tool": SQL_BFILL,
    "turn_gaps": SQL_GAPS,
    "sessionize": SQL_SESSIONS,
    "rolling_gap_stats": SQL_ROLLING,
    "role_running_counts": SQL_RUNNING,
    "user_aggregate": SQL_USER_AGG,
    "burst_membership": SQL_BURSTS,
    "topk_roles": SQL_TOPK,
    "pivot_role_counts": SQL_PIVOT,
    "zero_base_ts": SQL_ZERO_BASE,
    "enrollment_window": SQL_ENROLL,
    "customer_meta_agg": SQL_CUSTOMER_META,
    "orders_last_status": SQL_ORDERS_LAST,
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "semi_anti_join": SQL_SEMI_ANTI,
    "full_outer_reduce": SQL_FULL_OUTER,
    "melt_role_counts": SQL_MELT,
}
