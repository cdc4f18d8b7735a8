"""Custom join operators the reference (and stock Spark SQL) lack:
as-of join and interval/range join — implemented as compositions of
existing DataFrame ops (SURVEY.md §4: nothing here needs a Catalyst
rule).

The as-of join is the union-and-carry construction: instead of a
per-row lookup (O(n·m)) or a range self-join, both sides are unioned,
sorted within each key partition, and the most recent left-side value
is carried forward with ``last(ignorenulls)`` — one shuffle on the key,
linear work, no skew amplification. This is the standard distributed
as-of shape (it's what time-series stores do under the hood).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.util import epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    carry_cols: list[str],
    right_time_alias: str = "matched_ts",
    tiebreak_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each row of ``left``, attach the latest row of ``right`` with
    the same ``on`` key and ``right.time_col <= left.time_col``
    (``direction="backward"``, the default) — or the EARLIEST right row
    with ``right.time_col >= left.time_col`` (``direction="forward"``).
    The pandas ``merge_asof`` direction family; "nearest" composes the
    two (see ``join_asof_nearest_events``).

    Equal timestamps match in both directions (right sorts before left
    at ties). Columns in ``carry_cols`` are taken from the matched
    right row; unmatched left rows get NULLs (left-outer as-of
    semantics).

    The forward pass is the SAME union-and-carry plan traversed in
    descending time order: ``last(ignorenulls)`` then carries the
    smallest right time at-or-after each left row. One shuffle on the
    key either way, linear work, no skew amplification.

    ``tiebreak_cols`` (right-side columns, ideally a unique key) break
    ties between right rows sharing (key, time): the carried row is the
    one with the greatest tiebreak value. Without it the carry is
    whichever tied row the partitioning happened to order last —
    nondeterministic across runs (the repo's determinism rule: every
    window ORDER BY ends in a unique key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    tiebreak_cols = tiebreak_cols or []
    r = right.select(
        F.col(on),
        F.col(time_col),
        F.lit(0).alias("_side"),
        F.col(time_col).alias(right_time_alias),
        *[F.col(c) for c in carry_cols],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema[right_time_alias].dataType).alias(
            right_time_alias
        ),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in carry_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    t_ord = (
        F.col(time_col).asc()
        if direction == "backward"
        else F.col(time_col).desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(
            t_ord,
            F.col("_side").asc(),
            *[F.col(c).asc_nulls_first() for c in tiebreak_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in [right_time_alias, *carry_cols]
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side", right_time_alias, *carry_cols)
        .select(
            *[c for c in left.columns],
            *[
                F.col(f"_carried_{c}").alias(c)
                for c in [right_time_alias, *carry_cols]
            ],
        )
    )


@register(
    "join_asof_events",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
    purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.value,
           v.event_id AS view_event_id,
           EPOCH_US(p.ts) - EPOCH_US(v.ts) AS usecs_since_view
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    category="join",
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior 'view' event. DuckDB verifies with its native ASOF JOIN;
    Spark-side it is the union-and-carry composition above."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        views.withColumnRenamed("event_id", "view_event_id"),
        on="user_id",
        time_col="ts",
        carry_cols=["view_event_id"],
        right_time_alias="view_ts",
        tiebreak_cols=["view_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        "view_event_id",
        (epoch_micros("ts") - epoch_micros("view_ts")).alias(
            "usecs_since_view"
        ),
    )


def _purchase_view_asof(spark, sf_dir: str, direction: str) -> DataFrame:
    """Shared purchase↔view as-of pass for the direction variants."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases,
        views.withColumnRenamed("event_id", "view_event_id"),
        on="user_id",
        time_col="ts",
        carry_cols=["view_event_id"],
        right_time_alias="view_ts",
        tiebreak_cols=["view_event_id"],
        direction=direction,
    )


@register(
    "join_asof_forward_events",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
    purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.value,
           v.event_id AS view_event_id,
           EPOCH_US(v.ts) - EPOCH_US(p.ts) AS usecs_until_view
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    category="join",
)
def join_asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched to the user's NEXT 'view'
    at-or-after it (the did-they-come-back signal). Same union-and-
    carry plan as the backward pass, traversed in descending time;
    DuckDB verifies with its native forward ASOF (``p.ts <= v.ts``)."""
    joined = _purchase_view_asof(spark, sf_dir, "forward")
    return joined.select(
        "event_id",
        "user_id",
        "value",
        "view_event_id",
        (epoch_micros("view_ts") - epoch_micros("ts")).alias(
            "usecs_until_view"
        ),
    )


@register(
    "join_asof_nearest_events",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
    purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'),
    b AS (
      SELECT p.event_id, v.event_id AS bid, v.ts AS bts
      FROM purchases p
      ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts),
    f AS (
      SELECT p.event_id, v.event_id AS fid, v.ts AS fts
      FROM purchases p
      ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts <= v.ts)
    SELECT p.event_id, p.user_id,
           CASE WHEN b.bid IS NOT NULL AND (f.fid IS NULL
                  OR EPOCH_US(p.ts) - EPOCH_US(b.bts)
                     <= EPOCH_US(f.fts) - EPOCH_US(p.ts))
                THEN b.bid ELSE f.fid END AS view_event_id,
           CASE WHEN b.bid IS NOT NULL AND (f.fid IS NULL
                  OR EPOCH_US(p.ts) - EPOCH_US(b.bts)
                     <= EPOCH_US(f.fts) - EPOCH_US(p.ts))
                THEN EPOCH_US(p.ts) - EPOCH_US(b.bts)
                ELSE EPOCH_US(f.fts) - EPOCH_US(p.ts) END AS gap_us
    FROM purchases p
    LEFT JOIN b ON p.event_id = b.event_id
    LEFT JOIN f ON p.event_id = f.event_id
    """,
    category="join",
)
def join_asof_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (pandas ``direction='nearest'``): each purchase
    matched to the user's closest 'view' in absolute time, ties to the
    PRIOR view (deterministic — backward wins at equal gaps). Composed
    as backward ∘ forward + a per-purchase argmin: two linear carry
    passes and an equi-join on the purchase key, still no range
    explosion at any scale."""
    b = _purchase_view_asof(spark, sf_dir, "backward").select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_event_id").alias("bid"),
        F.col("view_ts").alias("bts"),
    )
    f = _purchase_view_asof(spark, sf_dir, "forward").select(
        "event_id",
        F.col("view_event_id").alias("fid"),
        F.col("view_ts").alias("fts"),
    )
    j = b.join(f, "event_id")
    gap_b = epoch_micros("ts") - epoch_micros("bts")
    gap_f = epoch_micros("fts") - epoch_micros("ts")
    back_wins = F.col("bid").isNotNull() & (
        F.col("fid").isNull() | (gap_b <= gap_f)
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(back_wins, F.col("bid")).otherwise(F.col("fid")).alias(
            "view_event_id"
        ),
        F.when(back_wins, gap_b).otherwise(gap_f).alias("gap_us"),
    )


@register(
    "join_range_shipwindow",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           COUNT(l.l_linenumber) AS lines_in_window,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty_in_window
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    category="join",
)
def join_range_shipwindow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: lines shipped within 30 days of their order date.
    The equi-key (orderkey) drives the shuffle; the range predicate is
    evaluated post-match, so this never degenerates into the O(n·m)
    pure-range cross product."""
    from iceberg_by_example_spark.functions.exact import dsum

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("l_linenumber").alias("lines_in_window"),
            dsum("l_quantity").alias("qty_in_window"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: the shuffle-elimination path for repeated joins
# ---------------------------------------------------------------------------

# Bucket count for the demo tables. At 100 TB this is sized so one
# bucket of the LARGER table fits an executor's memory (hundreds to
# thousands); the mechanism — identical bucketing on the join key on
# both sides makes every join on that key exchange-free — is what's
# being demonstrated, and is plan-asserted in pytest.
BUCKETED_JOIN_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders and customer as tables BUCKETED BY custkey (once
    per (session, sf_dir) — name-spaced database, reused if present)
    and return their qualified names.

    Bucketing is the pay-once-shuffle-never answer for a join run
    repeatedly at scale: the write clusters rows by
    hash(custkey) % buckets and records it in the table spec, so every
    later join/aggregation on custkey needs NO exchange and NO sort
    (sortBy pre-orders within buckets). The database LOCATION keeps the
    managed tables inside the scratch dir, not the global warehouse.

    The name tag is md5(sf_dir) + this process's pid. The pid suffix
    keeps concurrent sessions on the same sf_dir from sharing (and
    worse, reclaiming) each other's live table directories — a stable
    shared location would let a fresh session rmtree a directory that
    backs another running session's registered bucketed tables
    mid-query. The leak that per-process dirs would otherwise cause is
    bounded by the stale-sibling sweep below: any ``bucketdemo_<tag>_
    <pid>`` whose owning pid is no longer alive is removed before this
    process creates its own."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    # Reclaim scratch dirs left by DEAD processes only: a live pid
    # (signal-0 probe) may be mid-query on its tables, so its dir is
    # never touched. Dirs whose suffix isn't a pid (pre-round-7
    # layout) have no liveness signal and are also swept — no current
    # process can be using them, since every current process appends
    # its pid.
    prefix = f"bucketdemo_{tag}_"
    for entry in os.listdir(tmp):
        if not (entry.startswith(prefix) or entry == f"bucketdemo_{tag}"):
            continue
        owner = entry[len(prefix):] if entry.startswith(prefix) else ""
        try:
            alive = owner.isdigit() and (os.kill(int(owner), 0) is None)
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True  # exists but owned by another uid — leave it
        if not alive and int(owner or 0) != os.getpid():
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)

    db = f"bucketdemo_{tag}_{os.getpid()}"
    orders_t, cust_t = f"{db}.orders_b", f"{db}.customer_b"
    loc = os.path.join(tmp, db)
    if not spark.catalog.databaseExists(db):
        spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")

    def _write(table: str, source: str, key: str) -> None:
        if spark.catalog.tableExists(table):
            return  # reused within this session — the pay-once case
        # The location is pid-derived, so leftovers here can only be
        # this same process's (e.g. catalog dropped between Spark
        # sessions in one test run); reclaim before saveAsTable, which
        # refuses to create over an existing dir.
        leftover = os.path.join(loc, table.split(".", 1)[1])
        shutil.rmtree(leftover, ignore_errors=True)
        (
            load_table(spark, sf_dir, source)
            .write.bucketBy(BUCKETED_JOIN_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(table)
        )

    _write(orders_t, "orders", "o_custkey")
    _write(cust_t, "customer", "c_custkey")
    return orders_t, cust_t


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    category="join",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on custkey with BOTH sides bucketed on the
    key: the sort-merge join reads co-located buckets directly —
    zero Exchange, zero Sort in the plan (asserted in pytest). This is
    the standing answer to 'this join runs every night over 100 TB':
    pay the clustering once at write time, never shuffle again. The
    aggregate on top is the usual segment rollup; its exchange (4
    rows) is the only one in the whole query."""
    orders_t, cust_t = _bucketed_tables(spark, sf_dir)
    o, c = spark.table(orders_t), spark.table(cust_t)
    joined = o.join(c, o.o_custkey == c.c_custkey)
    from iceberg_by_example_spark.functions.exact import dsum

    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("total_price"),
    )
