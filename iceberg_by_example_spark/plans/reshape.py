"""Reshaping + advanced aggregates: pivot, unpivot, percentiles,
approximate distinct (gap §2.13 — none exist in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.exact import dsum
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


@register(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
    category="reshape",
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by priority x status. The pivot values are
    declared explicitly so the plan is a single pass (no value-discovery
    job) — the form that survives at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) FROM supplier
    """,
    category="reshape",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide supplier metrics to long form."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return s.unpivot(
        ids=["s_suppkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
           QUANTILE_CONT(l_quantity, 0.9) AS p90_qty,
           QUANTILE_CONT(l_extendedprice, 0.5) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles with linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the formula, and
    the interpolation arithmetic on identical sorted doubles is
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_extendedprice", 0.5).alias("median_price"),
    )


QSAMPLE_MOD = 10  # keep 1-in-10 rows: deterministic hash sample


@register(
    "agg_quantile_hash_sample",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, l_quantity, l_extendedprice,
             (('0x' || SUBSTR(MD5('qs:' || CAST(l_orderkey AS VARCHAR)
                || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT)
               % {QSAMPLE_MOD} = 0 AS samp
      FROM lineitem)
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN samp THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sample,
           QUANTILE_CONT(CASE WHEN samp THEN l_quantity END, 0.5)
             AS p50_qty_sample,
           QUANTILE_CONT(CASE WHEN samp THEN l_quantity END, 0.9)
             AS p90_qty_sample,
           QUANTILE_CONT(CASE WHEN samp THEN l_extendedprice END, 0.5)
             AS p50_price_sample
    FROM s GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_quantile_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles over a DETERMINISTIC hash sample — the
    mergeable quantile path for 100 TB: exact ``percentile`` holds
    every group value in aggregation state (O(rows) memory — fine at
    sf0.1, lethal at petabyte groups), while a 1-in-{QSAMPLE_MOD}
    hash-rank sample bounds state at rows/{QSAMPLE_MOD} with ~sqrt
    relative rank error, commutes with any partitioning (the filter is
    a pure map on the row key's md5 — no RNG, identical rows sampled
    on every engine, every run, every cluster size), and UNIONs
    across shards/days without re-sampling. Built-in
    ``approx_percentile`` solves the same problem with a
    non-portable sketch; this form trades a constant factor for
    cross-engine reproducibility (the same trade as the portable HLL).
    Emits sample size next to each estimate so consumers can see the
    error bar; pytest bounds the estimates against the exact
    percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("qs"),
                    F.col("l_orderkey"),
                    F.col("l_linenumber"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    samp = (h % QSAMPLE_MOD) == 0
    qty_s = F.when(samp, F.col("l_quantity"))
    price_s = F.when(samp, F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(samp.cast("long")).alias("n_sample"),
        F.percentile(qty_s, 0.5).alias("p50_qty_sample"),
        F.percentile(qty_s, 0.9).alias("p90_qty_sample"),
        F.percentile(price_s, 0.5).alias("p50_price_sample"),
    )


def approx_distinct_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct via the built-in
    ``approx_count_distinct`` — the native 100 TB cardinality
    estimator (constant-size per group, associative merge). Its
    sketch internals aren't cross-engine reproducible, so this demo
    stays UNREGISTERED; the registered ``agg_approx_distinct`` (below,
    after the portable-HLL machinery) computes the same shape from
    md5-derived registers DuckDB can recompute, and pytest bounds this
    built-in against the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed aggregate shapes in one pass (sum + extrema + distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "agg_variance_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS s2
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(s1 AS DOUBLE) / 100.0 / n AS mean_qty,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
             / 10000.0 / (n - 1) AS var_qty,
           SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
             / 10000.0 / (n - 1)) AS stddev_qty
    FROM m
    """,
    category="agg",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic variance/stddev from exact integer moments:
    quantize to cents, accumulate Σx and Σx² as int64 (associative,
    order-free), then one fixed-order double formula. Built-in
    var_samp over doubles is order-dependent across engines; this
    construction is reproducible anywhere — and it's the
    single-pass two-moment method a distributed engine wants."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100, 0).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    n = F.col("n")
    var = (s2d - s1d * s1d / n) / 10000.0 / (n - 1)
    return m.select(
        "l_returnflag",
        "n",
        (s1d / 100.0 / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


def agg_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(Unregistered since round 7.) DataSketches HLL sketch-union
    demo kept as an API helper: its serialized sketches are
    engine-specific, so the query could only ever be graded rows-only.
    The hash-green registered twin ``agg_sketch_union_portable``
    covers the same sketch-union rollup with a cross-engine register
    encoding; pytest ``test_sketch_union_datasketches`` still
    exercises this code path directly.

    Mergeable-sketch cardinality: build one DataSketches HLL per
    source (``hll_sketch_agg``), then UNION the serialized sketches
    (``hll_union_agg``) into the global estimate — the pattern that
    makes 100 TB distinct-counting incremental: per-partition/per-day
    sketches are small binary columns you can STORE, and any rollup
    (day→month, source→corpus) is a re-aggregation of sketches, never
    a rescan of raw keys. approx_count_distinct alone can't do this —
    it returns a number, not a mergeable state.

    Output: one row per source with its estimate, plus the unioned
    ALL row — computed from the per-source sketches, not the raw
    data (the union input is ~n_sources × 1 KB). Estimates are
    deterministic: HLL register maxima are order- and
    partitioning-insensitive."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.hll_sketch_agg(F.col("doc_id"), F.lit(12)).alias("sk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    by_source = per_source.select(
        "source",
        F.hll_sketch_estimate("sk").alias("approx_docs"),
        "n_docs",
    )
    total = per_source.agg(
        F.hll_union_agg(F.col("sk"), F.lit(False)).alias("sk"),
        F.sum("n_docs").alias("n_docs"),
    ).select(
        F.lit("ALL").alias("source"),
        F.hll_sketch_estimate("sk").alias("approx_docs"),
        "n_docs",
    )
    return by_source.unionByName(total)


# --- portable HLL: the same sketch-union rollup, oracle-checkable ----------
#
# DataSketches binaries aren't cross-engine, which leaves
# ``agg_sketch_union`` rows-only by design. This twin builds the HLL
# itself from first principles on the portable 60-bit md5 hash
# (``_md5_hash60``): bucket = h mod m, rho = leading zeros of the
# remaining 60-p bits + 1, register = MAX(rho) per (source, bucket) —
# and the ALL row is the max-merge of the per-source registers (the
# mergeability property, demonstrated rather than asserted). DuckDB
# recomputes identical registers, so the estimate hash-matches.
#
# Determinism notes: registers sum as EXACT integers (Σ 2^(rho0-r) via
# shiftleft, ≤ 2^61 — never a double sum, which is order-dependent);
# the one ln() in the linear-counting branch is the only libm call and
# the output is rounded to 4 decimals, far coarser than any cross-libm
# ulp. Estimates use the standard HLL alpha and the small-range
# linear-counting correction (Flajolet et al. 2007 thresholds).
HLL_P = 10  # 2^10 = 1024 buckets; ±3.2% rel. error (raise p at scale)
HLL_M = 1 << HLL_P
_HLL_W = 60 - HLL_P  # bits left for the rho run after the bucket index
_HLL_RHO0 = _HLL_W + 1  # register value when the remainder is all zeros
_HLL_SCALE = 1 << _HLL_RHO0  # exact-integer scale for the 2^-r sum
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(_HLL_SCALE)


def portable_hll_registers(df, group_cols: list[str], key) -> "DataFrame":
    """(group_cols..., bucket, r) — the portable HLL register relation
    for ``key`` (a column) per group. The shuffle is map-side
    combinable MAX over ≤ groups × m rows. Shared by
    ``agg_sketch_union_portable`` and ``agg_approx_distinct``."""
    from iceberg_by_example_spark.operators.dedup import _md5_hash60

    hd = df.select(*group_cols, _md5_hash60(key.cast("string")).alias("h"))
    w = F.expr(f"h div {HLL_M}")
    rho = F.when(w == 0, F.lit(_HLL_RHO0)).otherwise(
        F.lit(_HLL_RHO0) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        hd.select(*group_cols, (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def portable_hll_estimate(regs, group_cols: list[str]) -> "DataFrame":
    """(group_cols..., approx: double) from a register relation —
    exact-integer register sum, alpha estimator, linear-counting
    small-range branch, rounded to 4 decimals (see the block comment
    above for the determinism argument)."""
    est = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RHO0} - r AS INT))")
        ).alias("s_present"),
    )
    v = F.lit(HLL_M) - F.col("nz")
    raw = F.lit(_HLL_NUM) / (
        F.col("s_present") + v.cast("long") * F.lit(_HLL_SCALE)
    ).cast("double")
    approx = F.round(
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
            F.lit(HLL_M) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
        ).otherwise(raw),
        4,
    )
    return est.select(*group_cols, approx.alias("approx"))


@register(
    "agg_sketch_union_portable",
    oracle=f"""
    WITH h AS (
      SELECT source,
             ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM documents),
    rho AS (
      SELECT source, h % {HLL_M} AS bucket,
             CASE WHEN h // {HLL_M} = 0 THEN {_HLL_RHO0}
                  ELSE {_HLL_RHO0} - LENGTH(BIN(h // {HLL_M})) END AS rho
      FROM h),
    regs AS (
      SELECT source, bucket, MAX(rho) AS r
      FROM rho GROUP BY source, bucket),
    regs_u AS (
      SELECT * FROM regs
      UNION ALL
      SELECT 'ALL' AS source, bucket, MAX(r) AS r
      FROM regs GROUP BY bucket),
    est AS (
      SELECT source, COUNT(*) AS nz,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO0} - r)) AS BIGINT)
               AS s_present
      FROM regs_u GROUP BY source),
    e AS (
      SELECT source, {HLL_M} - nz AS v,
             {_HLL_NUM!r}
               / CAST(s_present
                      + CAST({HLL_M} - nz AS BIGINT) * {_HLL_SCALE} AS DOUBLE)
               AS raw
      FROM est),
    counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
      UNION ALL
      SELECT 'ALL', COUNT(*) FROM documents)
    SELECT e.source,
           ROUND(CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0
                      THEN {HLL_M} * LN({HLL_M}.0 / v)
                      ELSE raw END, 4) AS approx_docs,
           n_docs
    FROM e JOIN counts USING (source)
    """,
    category="agg",
)
def agg_sketch_union_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HLL sketch union (see the block comment above):
    per-source registers → per-source estimates AND a max-merged ALL
    row, all from column expressions over the portable md5 hash. The
    shuffle carries (source, bucket, partial-max) — map-side
    combinable, ≤ sources × m rows at any corpus size; the rollup
    reads registers, never raw keys. ``agg_sketch_union`` above is the
    DataSketches-native variant (smaller serialized state, faster
    update path) for deployments that don't need cross-engine
    verification."""
    d = load_table(spark, sf_dir, "documents")
    regs = portable_hll_registers(d, ["source"], F.col("doc_id"))
    regs_u = regs.unionByName(
        regs.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .select(F.lit("ALL").alias("source"), "bucket", "r")
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    counts_u = counts.unionByName(
        d.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit("ALL").alias("source"), "n_docs"
        )
    )
    return (
        portable_hll_estimate(regs_u, ["source"])
        .withColumnRenamed("approx", "approx_docs")
        .join(counts_u, "source")
        .select("source", "approx_docs", "n_docs")
    )


@register(
    "agg_approx_distinct",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             ('0x' || SUBSTR(MD5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM lineitem),
    rho AS (
      SELECT l_returnflag, h % {HLL_M} AS bucket,
             CASE WHEN h // {HLL_M} = 0 THEN {_HLL_RHO0}
                  ELSE {_HLL_RHO0} - LENGTH(BIN(h // {HLL_M})) END AS rho
      FROM h),
    regs AS (
      SELECT l_returnflag, bucket, MAX(rho) AS r
      FROM rho GROUP BY l_returnflag, bucket),
    est AS (
      SELECT l_returnflag, COUNT(*) AS nz,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO0} - r)) AS BIGINT)
               AS s_present
      FROM regs GROUP BY l_returnflag),
    e AS (
      SELECT l_returnflag, {HLL_M} - nz AS v,
             {_HLL_NUM!r}
               / CAST(s_present
                      + CAST({HLL_M} - nz AS BIGINT) * {_HLL_SCALE} AS DOUBLE)
               AS raw
      FROM est),
    ex AS (
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
      FROM lineitem GROUP BY l_returnflag)
    SELECT e.l_returnflag,
           ROUND(CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0
                      THEN {HLL_M} * LN({HLL_M}.0 / v)
                      ELSE raw END, 4) AS approx_parts,
           exact_parts
    FROM e JOIN ex USING (l_returnflag)
    """,
    category="agg",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct parts per return flag — the 100 TB
    cardinality-estimation shape (exact distinct shuffles every key;
    the sketch is ≤ m register rows per group, map-side-combinable
    MAX, merges associatively). Estimated via the portable md5 HLL
    (``portable_hll_registers``) so both engines compute identical
    registers and the row HASH-matches; ``approx_distinct_builtin``
    above is the native ``approx_count_distinct`` variant whose
    HLL++ sketch internals aren't cross-engine (pytest bounds it
    against the exact count instead). The exact count rides along for
    direct error inspection."""
    li = load_table(spark, sf_dir, "lineitem")
    regs = portable_hll_registers(li, ["l_returnflag"], F.col("l_partkey"))
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        portable_hll_estimate(regs, ["l_returnflag"])
        .withColumnRenamed("approx", "approx_parts")
        .join(exact, "l_returnflag")
        .select("l_returnflag", "approx_parts", "exact_parts")
    )


@register(
    "agg_linear_fit",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept
    FROM s
    """,
    category="agg",
)
def agg_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed least-squares fit (price ~ quantity per return
    flag) from EXACT moment sums: Σx, Σy, Σxy, Σx² accumulate in
    decimal (associative, partitioning-independent), convert to
    double ONCE, and the closed-form slope/intercept is a fixed IEEE
    expression of identical inputs — so the result is bit-identical
    in both engines and across reruns. The built-in ``regr_slope``
    streams floating-point moments instead, whose value depends on
    reduction order — exactly the nondeterminism this repo's
    determinism rules exclude from oracle-checked queries. Same
    single map-side-combinable aggregate shape as any other partial
    agg: one shuffle of 5 groups × 4 numbers at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(28,2)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
        .cast("double")
        .alias("sy"),
        F.sum(qty * price).cast("double").alias("sxy"),
        F.sum(qty * qty).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
        F.col("sxy"),
        F.col("sxx"),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@register(
    "agg_boolean_family",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_large,
           BOOL_AND(l_discount <= 0.1) AS all_discount_capped,
           BOOL_OR(l_tax > 0.07) AS any_high_tax,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_finished
    FROM lineitem GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates — count_if / bool_and (every) / bool_or
    (some): the data-quality assertion layer (all rows in contract?
    any violation at all? how many outliers?) expressed as ordinary
    map-side-combinable aggregates instead of count-then-compare
    subqueries. One partial-agg shuffle of 4 booleans/longs per
    group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_large"),
        F.bool_and(F.col("l_discount") <= 0.1).alias(
            "all_discount_capped"
        ),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.count_if(F.col("l_linestatus") == "F").alias("n_finished"),
    )


@register(
    "agg_string_concat_ordered",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    category="agg",
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG … WITHIN GROUP): collapse a
    group's members into one delimited, DETERMINISTICALLY ordered
    string — the report/export shape behind "list the nations per
    region" columns. Spark's listagg concatenates in arrival order
    (partitioning-dependent), so the deterministic form sorts an
    array first: collect_list → array_sort → array_join, which the
    optimizer still executes as one aggregate. Order BY a unique key
    or the value itself — an unordered listagg in an oracle-checked
    query would be flaky by construction."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("n_name")), ","
        ).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "agg_value_histogram",
    oracle="""
    SELECT LEAST(CAST(FLOOR(l_quantity / 5.0) AS BIGINT), 9) AS bin,
           LEAST(CAST(FLOOR(l_quantity / 5.0) AS BIGINT), 9) * 5.0
             AS bin_low,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1, 2
    """,
    category="agg",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (10 bins of width 5 over quantity,
    top bin open) — the dashboard distribution query, as a plain
    integer-arithmetic groupBy: bin assignment is a pure expression,
    so the histogram is one map-side-combinable aggregate over ≤10
    keys at any corpus size. Integer bin ids from FLOOR keep both
    engines exact; no approx sketch needed when bins are fixed."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_id = F.least(
        F.floor(F.col("l_quantity") / 5.0), F.lit(9).cast("long")
    )
    return li.groupBy(
        bin_id.alias("bin"), (bin_id * 5.0).alias("bin_low")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_bitwise_family",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(l_linenumber) AS and_linenumber,
           BIT_OR(l_linenumber) AS or_linenumber,
           BIT_XOR(l_suppkey) AS xor_suppkey,
           BIT_OR(l_partkey % 256) AS or_partbyte
    FROM lineitem GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates — bit_and / bit_or / bit_xor: flag-mask
    rollups and the constant-state parity/checksum idioms (xor of a
    key column is a cheap order-independent set fingerprint for
    partition-reconciliation checks). All three are commutative +
    associative → map-side combinable, O(1) state per group at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("and_linenumber"),
        F.bit_or("l_linenumber").alias("or_linenumber"),
        F.bit_xor("l_suppkey").alias("xor_suppkey"),
        F.bit_or(F.col("l_partkey") % 256).alias("or_partbyte"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linenumber AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT l_returnflag,
             MAX(struct_pack(cnt := cnt, v := v)) AS s
      FROM c GROUP BY 1)
    SELECT l_returnflag, s.cnt AS mode_count, s.v AS mode_value
    FROM m
    """,
    category="agg",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value) per group. The
    built-in ``mode()`` breaks frequency ties arbitrarily — which
    value you get depends on partitioning, violating the repo's
    reproducibility rule — so this is the argmax-by-struct form:
    count per (group, value), then MAX over struct(count, value)
    resolves ties to the GREATEST value, identically on every engine,
    partitioning, and run (the struct-min keep-first idiom, flipped).
    Two hash aggregations, both map-side combinable; state is
    O(distinct values per group), the same bound the built-in
    needs."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", F.col("l_linenumber").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    m = c.groupBy("l_returnflag").agg(
        F.max(F.struct("cnt", "v")).alias("s")
    )
    return m.select(
        "l_returnflag",
        F.col("s.cnt").alias("mode_count"),
        F.col("s.v").alias("mode_value"),
    )
