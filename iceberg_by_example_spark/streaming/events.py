"""Event-time windowing over the ``events`` table (gap §2.13 — the
reference has no streaming constructs at all; "watermark" at LT:113 is
just a branch-label variable).

The window operators are defined once and run in BOTH modes:
- batch (registered here with DuckDB oracles — the correctness gate)
- Structured Streaming (tests/test_streaming.py drives the same
  transformations through readStream → memory sink with a watermark)

That duality is the point: ``F.window``/``F.session_window`` plans are
mode-agnostic, so the verified batch semantics carry to the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.exact import dsum
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


def tumbling_counts(events: DataFrame) -> DataFrame:
    """5-minute tumbling windows per event_type: count + exact sum.
    Used identically by the batch query below and the streaming test."""
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), dsum("value", scale=6).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS w_start,
           TIME_BUCKET(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS w_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    category="streaming",
    bench=True,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (epoch-aligned, same flooring as
    DuckDB's time_bucket)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS w_start, value FROM events
      UNION ALL
      SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
      FROM events)
    SELECT w_start, w_start + INTERVAL '10 minutes' AS w_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM starts GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 10-minute span / 5-minute slide: every event
    lands in exactly two windows (the oracle materializes the same two
    shifted bucket starts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value", scale=6).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "sum_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    category="streaming",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user.
    ``F.session_window`` merges adjacent events server-side; the oracle
    reconstructs the same islands with a lag/cumsum. Session end is
    last-event + gap in both."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_first_per_key(events: DataFrame) -> DataFrame:
    """Deterministic keep-first dedup on an idempotency key — at most
    one event per (user_id, event_type, minute): the batch twin of a
    streaming ``dropDuplicatesWithinWatermark``. The winner is the
    MIN-(ts, event_id) copy via a struct-MIN aggregate (map-side
    combinable — partial winners merge associatively, so the shuffle
    carries one candidate row per key per map task, never the full
    duplicate set; same shape as ``dedup_exact_keep_best``).

    Used identically by the registered batch query and the streaming
    test (which drives ``dropDuplicatesWithinWatermark`` over the same
    key and asserts the same survivor multiset size — the stream op
    keeps an ARBITRARY first-seen copy, so only the batch twin pins
    the winner deterministically enough to oracle-check values)."""
    key_bucket = F.date_trunc("minute", F.col("ts").cast("timestamp")).cast(
        events.schema["ts"].dataType
    )
    best = (
        events.groupBy(
            "user_id", "event_type", key_bucket.alias("minute_bucket")
        )
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("_w"),
            F.count(F.lit(1)).alias("n_duplicates"),
        )
        .select(
            "user_id",
            "event_type",
            "minute_bucket",
            F.col("_w.ts").alias("ts"),
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.value").alias("value"),
            "n_duplicates",
        )
    )
    return best


@register(
    "stream_dedup_events",
    bench=True,
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             DATE_TRUNC('minute', ts) AS minute_bucket,
             ts, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, DATE_TRUNC('minute', ts)
               ORDER BY ts, event_id) AS rk,
             COUNT(*) OVER (
               PARTITION BY user_id, event_type, DATE_TRUNC('minute', ts)
             ) AS n_duplicates
      FROM events)
    SELECT user_id, event_type, minute_bucket, ts, event_id, value,
           CAST(n_duplicates AS BIGINT) AS n_duplicates
    FROM ranked WHERE rk = 1
    """,
    category="streaming",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent event ingestion: collapse redeliveries to at most one
    event per (user, type, minute), keeping the earliest copy — the
    batch-verified semantics behind the streaming
    ``dropDuplicatesWithinWatermark`` test in
    ``tests/test_streaming.py``. The oracle reproduces the winner with
    a row_number window; the Spark plan uses the aggregate form
    because at 100 TB a struct-MIN combines map-side while a
    row_number window must materialize every duplicate in the sort."""
    return dedup_first_per_key(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Stream-stream interval join: view → purchase attribution
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_MIN = 30


def view_purchase_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Interval join: each purchase pairs with the SAME user's views in
    the preceding ATTRIB_WINDOW_MIN minutes — the canonical stream-
    stream join (ad impression → conversion attribution). Defined once
    for both modes: the batch query below grades it against DuckDB;
    tests/test_streaming.py drives the identical plan as a true
    stream-stream inner join (watermarks on both sides bound the join
    state; the two-sided event-time constraint is what lets Spark
    expire buffered rows instead of holding both streams forever)."""
    from iceberg_by_example_spark.util import epoch_micros

    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    pairs = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
    )
    return pairs.select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        (epoch_micros("p_ts") - epoch_micros("v_ts")).alias("gap_us"),
    )


@register(
    "stream_stream_join",
    oracle=f"""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id,
           p.user_id AS user_id,
           EPOCH_US(p.ts) - EPOCH_US(v.ts) AS gap_us
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL '{ATTRIB_WINDOW_MIN} minutes'
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
    category="streaming",
    bench=True,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch grading twin of the stream-stream interval join: purchase
    ↔ prior-views attribution pairs with the exact microsecond gap.

    Scale shape: an equi-join on user_id (the time bounds are a
    post-join filter for the optimizer, a state-expiry bound for the
    streaming engine) — shuffles partition by user, skew-safe for
    normal user distributions and salt-able (operators/skew.py) for
    hot keys. In streaming mode the watermark bounds per-side state
    to ~window+lateness of events per user, so the join runs forever
    in fixed memory."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    purchases = e.filter(F.col("event_type") == "purchase")
    return view_purchase_pairs(views, purchases)


UNMATCHED_SENTINEL = -1  # left-outer: "no view in the window" marker


def view_purchase_pairs_outer(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """LEFT OUTER interval join from the purchase side: every purchase
    emits its attribution pairs, OR one sentinel row (view_id = -1,
    gap_us = -1) when the user had NO view in the preceding
    ATTRIB_WINDOW_MIN minutes — the unattributed-conversion report.
    Sentinels instead of nulls because the grading hash goes through
    pandas, where a nullable int column degrades to float64.

    Mode duality: in batch this is a plain left join with the time
    bounds in the ON clause. As a stream-stream left outer join the
    same plan emits matched pairs eagerly and holds each buffered
    purchase until the VIEW-side watermark passes its event time (the
    join condition admits no view newer than the purchase, so that is
    the moment no future match can arrive) — then emits the unmatched
    row exactly once. State stays watermark-bounded on both sides,
    identical to the inner variant; the left-outer's only extra cost
    is the purchase rows living to their expiry instead of dying at
    first match-window close. Convergence is pytest-proven in
    tests/test_streaming.py for the expired prefix."""
    from iceberg_by_example_spark.util import epoch_micros

    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    pairs = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
        ),
        "left_outer",
    )
    return pairs.select(
        "purchase_id",
        F.coalesce("view_id", F.lit(UNMATCHED_SENTINEL)).alias("view_id"),
        F.col("p_user").alias("user_id"),
        F.coalesce(
            epoch_micros("p_ts") - epoch_micros("v_ts"),
            F.lit(UNMATCHED_SENTINEL).cast("long"),
        ).alias("gap_us"),
    )


@register(
    "stream_stream_join_outer",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           COALESCE(v.event_id, {UNMATCHED_SENTINEL}) AS view_id,
           p.user_id AS user_id,
           COALESCE(EPOCH_US(p.ts) - EPOCH_US(v.ts),
                    {UNMATCHED_SENTINEL}) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL '{ATTRIB_WINDOW_MIN} minutes'
    """,
    category="streaming",
)
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch grading twin of the stream-stream LEFT OUTER interval
    join: attribution pairs plus one sentinel row per unattributed
    purchase (see view_purchase_pairs_outer for the mode duality and
    state-expiry semantics).

    Scale shape: identical to the inner variant — an equi-join
    shuffle on user_id, time bounds as residual condition; the outer
    side adds zero exchanges (unmatched rows surface in the same join
    operator). Skew remedies (salting) apply unchanged."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    purchases = e.filter(F.col("event_type") == "purchase")
    return view_purchase_pairs_outer(views, purchases)


def window_user_spend(events: DataFrame) -> DataFrame:
    """Per 5-minute window per user: event count + exact spend. The
    mode-agnostic half of windowed top-k — ranking is not a streaming
    operator, so it applies DOWNSTREAM of this aggregation (per
    emitted window in a stream; one window function in batch)."""
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n"),
            dsum("value", scale=6).alias("spend"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "user_id",
            "n",
            "spend",
        )
    )


def topk_per_window(spend: DataFrame, k: int = 3) -> DataFrame:
    """Rank users within each window by (spend DESC, user_id ASC) and
    keep the top ``k`` — deterministic at ties by the unique key."""
    from pyspark.sql import Window

    w = Window.partitionBy("w_start").orderBy(
        F.desc("spend"), F.asc("user_id")
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("w_start", "rnk", "user_id", "n", "spend")
    )


@register(
    "stream_window_topk_users",
    oracle="""
    WITH wagg AS (
      SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS w_start, user_id,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS spend
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY w_start
               ORDER BY spend DESC, user_id) AS rnk
      FROM wagg)
    SELECT w_start, rnk, user_id, n, spend FROM r WHERE rnk <= 3
    """,
    category="streaming",
)
def stream_window_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k — the leaderboard shape (top spenders per
    5-minute window). The windowed per-user aggregation is
    mode-agnostic (``window_user_spend`` runs verbatim under
    readStream; tests/test_streaming.py proves the streaming run
    converges to this batch result); the rank-and-keep-k step applies
    to each FINALIZED window downstream — in a stream that is a
    per-microbatch window function over the updated windows
    (foreachBatch), never a global sort.

    Scale shape: one shuffle on (window, user) with map-side partial
    counts/sums, then a per-window row_number whose partitions are
    single windows — bounded by users-per-window, embarrassingly
    parallel across windows."""
    ev = load_table(spark, sf_dir, "events")
    return topk_per_window(window_user_spend(ev))
