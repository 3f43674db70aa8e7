"""Analytics-breadth operators: percentiles, histograms, string functions,
null handling, and time-series gap filling.

These round out what a user of an OLAP engine reaches for weekly. Each is
a single declarative plan; the gap-fill operator is the one with a real
distributed design decision (spine generation via ``sequence``/``explode``
instead of a driver-side date loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numerics import davg, davg_sql, dround, dsum, dsum_scaled
from ..functions.timeparts import epoch_micros_from_ntz, month_start, year_of
from ..io import read_table


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per year — Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` (same linear interpolation
    over the sorted set, deterministic given identical inputs)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(year_of("o_orderdate").alias("year")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (``approx_percentile``) — the 100 TB path:
    bounded-memory KLL-style sketch, single pass, mergeable partials.
    Rows-only check (sketch error is engine-specific); the exact twin
    above is the anchor."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(year_of("o_orderdate").alias("year")).agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias(
            "median_approx"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


HIST_LO, HIST_STEP, HIST_BINS = 0.0, 50_000.0, 12


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via portable floor-binning (no engine-specific
    width_bucket): bin = clamp(floor((x - lo)/step), 0, bins-1)."""
    orders = read_table(spark, sf_dir, "orders")
    raw_bin = F.floor((F.col("o_totalprice") - HIST_LO) / HIST_STEP)
    bin_id = F.least(
        F.greatest(raw_bin, F.lit(0)), F.lit(HIST_BINS - 1)
    ).cast("int")
    return (
        orders.select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(HIST_LO) + F.col("bin") * HIST_STEP, 1).alias("bin_lo"),
            "n",
        )
    )


def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over customer names: case mapping, substring,
    concatenation, padding, reversal, regexp extraction, replacement —
    all codegen'd JVM expressions with DuckDB-identical semantics."""
    customer = read_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return customer.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.length(name).alias("name_len"),
        F.concat_ws("|", name, F.col("c_mktsegment")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse(name).alias("reversed"),
        F.regexp_extract(name, r"(\d+)", 1).alias("digits"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("replaced"),
    )


def null_handling_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: NULLIF to inject nulls, COALESCE / fill to
    repair them, null-aware counting. All per-row deterministic."""
    ev = read_table(spark, sf_dir, "events")
    v_null = F.nullif(F.col("event_type"), F.lit("error"))
    return (
        ev.select(
            "event_id",
            v_null.alias("type_or_null"),
            F.coalesce(v_null, F.lit("__repaired")).alias("type_repaired"),
            v_null.isNull().cast("int").alias("was_error"),
            F.nvl2(v_null, F.lit(0), F.lit(1)).alias("nvl2_flag"),
        )
    )


def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly series with forward fill: generate the complete
    month spine with ``sequence``/``explode`` (distributed, no driver date
    loop), left-join the observed series, carry the last observation
    forward with ``last_value(ignoreNulls)``.

    The fixture series has no gaps, so the interesting part is exercised
    by dropping February observations first — the operator must
    reconstruct them from January.
    """
    m = (
        read_table(spark, sf_dir, "orders")
        .groupBy(month_start("o_orderdate").alias("ms"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    # punch deterministic holes: drop all Februaries
    observed = m.filter(F.month("ms") != 2)
    bounds = m.agg(
        F.min("ms").alias("lo"), F.max("ms").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    )
    joined = spine.join(
        observed, spine.month_start == observed.ms, "left"
    ).select("month_start", "total")
    w = (
        Window.orderBy("month_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "month_start",
        "total",
        F.last("total", ignorenulls=True).over(w).alias("total_filled"),
        F.col("total").isNull().cast("int").alias("was_gap"),
    )


def timeseries_interpolate_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear interpolation across series gaps — the forward-fill twin's
    smarter sibling: each missing month gets
    ``prev + (next - prev) * k / n`` where ``k``/``n`` are month offsets
    to the neighboring observations (one pass, two complementary
    unbounded window frames carrying the last/next observed value AND its
    timestamp; no self-join, no driver loop). Gaps are punched
    deterministically (drop Februaries, as in ``timeseries_gap_fill``)
    so there is something to reconstruct.

    Rounding is ``dround`` (binary ties-away, DuckDB-identical) — an
    interpolated midpoint of two 4-dp values is EXACTLY the half-way tie
    ``F.round``'s decimal rendering would resolve differently."""
    m = (
        read_table(spark, sf_dir, "orders")
        .groupBy(month_start("o_orderdate").alias("ms"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    observed = m.filter(F.month("ms") != 2)
    bounds = m.agg(F.min("ms").alias("lo"), F.max("ms").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    )
    j = spine.join(
        observed, spine.month_start == observed.ms, "left"
    ).select("month_start", "total")
    wp = Window.orderBy("month_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.orderBy("month_start").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_ms = F.when(F.col("total").isNotNull(), F.col("month_start"))
    j2 = j.select(
        "month_start",
        "total",
        F.last("total", ignorenulls=True).over(wp).alias("pv"),
        F.first("total", ignorenulls=True).over(wn).alias("nv"),
        F.last(obs_ms, ignorenulls=True).over(wp).alias("pm"),
        F.first(obs_ms, ignorenulls=True).over(wn).alias("nm"),
    )
    k = F.months_between(F.col("month_start"), F.col("pm"))
    n = F.months_between(F.col("nm"), F.col("pm"))
    filled = (
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * k / n)
    )
    return j2.select(
        "month_start",
        F.col("total").alias("observed"),
        dround(filled, 4).alias("filled_total"),
        F.col("total").isNull().cast("int").alias("was_gap"),
    ).orderBy("month_start")


def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance of (quantity, discount) per return flag,
    computed from EXACT scaled-integer moment sums (Sx, Sy, Sxy, Sxx, Syy)
    so the result is order-independent — builtin ``corr``/``covar_pop``
    accumulate doubles and drift under parallel partial aggregation, which
    would break oracle hashing. Same single-pass moment-sketch shape every
    OLAP engine uses; the determinism comes from integer accumulation."""
    li = read_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_discount")

    def s(expr, scale):
        return F.sum(F.round(expr * scale).cast("long")) / float(scale)

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        s(x, 100).alias("sx"),
        s(y, 10_000).alias("sy"),
        s(x * y, 100_000).alias("sxy"),
        s(x * x, 100).alias("sxx"),
        s(y * y, 100_000_000).alias("syy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / n
    return m.select(
        "l_returnflag",
        "n",
        F.round(cov, 8).alias("covar_pop"),
        F.round(cov / F.sqrt(var_x * var_y), 6).alias("corr"),
    )


def window_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-frame window aggregates over the monthly series: trailing
    3-month moving average/min/max and first/last of the frame — the
    explicit ROWS-frame family (the reference only ever uses lag-1 and the
    running-peak frame). One sort, one WindowExec for all five functions."""
    m = (
        read_table(spark, sf_dir, "orders")
        .groupBy(month_start("o_orderdate").alias("ms"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    w3 = Window.orderBy("ms").rowsBetween(-2, 0)
    return m.select(
        F.col("ms").alias("month_start"),
        "total",
        F.round(
            F.sum(F.round(F.col("total") * 10_000).cast("long")).over(w3)
            / 10_000.0
            / F.count(F.lit(1)).over(w3),
            4,
        ).alias("ma3"),
        F.round(F.min("total").over(w3), 4).alias("min3"),
        F.round(F.max("total").over(w3), 4).alias("max3"),
        F.round(F.first("total").over(w3), 4).alias("frame_first"),
    )


def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: ``percent_rank`` and ``cume_dist``
    of each order's value within its year — the relative-standing
    primitives (tie-stable: both are rank-based, so tied prices get equal
    values in any engine). One shuffle on the year partition key."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy(F.year("o_orderdate")).orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year"),
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
        dround(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window family the pack lacked: ``first_value``,
    ``last_value`` and ``nth_value`` over the full partition frame — each
    month labeled with its year's opening, closing, and second-month
    totals. The window runs over the ~80-row monthly aggregate (per-year
    partitions), never the fact table; explicit unbounded ROWS frame so
    last/nth see the whole partition, not the default running frame."""
    m = (
        read_table(spark, sf_dir, "orders")
        .groupBy(month_start("o_orderdate").alias("ms"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    w = (
        Window.partitionBy(F.year("ms"))
        .orderBy("ms")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return m.select(
        F.col("ms").alias("month_start"),
        "total",
        F.round(F.first("total").over(w), 4).alias("year_open"),
        F.round(F.last("total").over(w), 4).alias("year_close"),
        F.round(F.nth_value("total", 2).over(w), 4).alias("year_second"),
    )


def window_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time — the frame family ROWS can't
    express: per day, the trailing-90-DAY order total (days with gaps
    contribute nothing; a ROWS frame would wrongly span a fixed row
    count). The range key is exact epoch days (integer), so frame
    membership is identical in both engines; the window runs over the
    ~2.4k-row DAILY aggregate, not the fact table."""
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    # F.floor (not a bare cast-to-long) so negative epochs floor like the
    # oracle's `epoch // 86400` — a cast truncates toward zero, shifting
    # frame membership by one day for pre-1970 timestamps.
    keyed = daily.withColumn(
        "day_num",
        F.floor(
            epoch_micros_from_ntz(F.col("day")) / 86_400_000_000
        ).cast("long"),
    )
    w = Window.orderBy("day_num").rangeBetween(-89, 0)
    return keyed.select(
        F.col("day").alias("day_start"),
        "total",
        F.round(
            F.sum(F.round(F.col("total") * 10_000).cast("long")).over(w)
            / 10_000.0,
            4,
        ).alias("trailing_90d_total"),
        F.count(F.lit(1)).over(w).alias("days_with_orders_90d"),
    )


def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year MODE of order priority — built as count + rank with a
    total tiebreak (most-frequent value, ties to the lexicographically
    smallest) instead of the engines' ``mode()`` aggregates, whose tie
    choice is implementation-defined and would flip between engines."""
    orders = read_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.year("o_orderdate").alias("year"), "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("year").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("year").cast("int").alias("year"),
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("year")
    )


def dq_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly months: |total - mean| > 2σ over the monthly
    series. Two tiny aggregates (mean via scaled-int davg; sample
    variance from scaled-int sums of squared deviations — deviations are
    ≤1e8 so the squares stay inside int64 at scale 1), the 1-row stats
    broadcast back via cross join, and a pure-projection z computed from
    bitwise-identical doubles in both engines."""
    m = (
        read_table(spark, sf_dir, "orders")
        .groupBy(month_start("o_orderdate").alias("ms"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("total"))
    )
    stats0 = m.agg(
        (F.sum(F.round(F.col("total") * 100).cast("long")) / 100.0 / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    with_mu = m.crossJoin(F.broadcast(stats0))
    dev2 = (F.col("total") - F.col("mu")) * (F.col("total") - F.col("mu"))
    stats = with_mu.groupBy("mu", "n").agg(
        (
            F.sum(F.when(dev2 >= 0, F.floor(dev2 + 0.5)).otherwise(F.lit(0).cast("long")))
            / (F.col("n") - 1)
        ).alias("var")
    )
    z = (F.col("total") - F.col("mu")) / F.sqrt(F.col("var"))
    return (
        m.crossJoin(F.broadcast(stats))
        .select(
            F.col("ms").alias("month_start"),
            "total",
            dround(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.0)
        .orderBy("month_start")
    )


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit — the DQ check every warehouse load gates
    on: count fact rows whose dimension key is missing. Violations are
    planted deterministically by trimming each dim side (drop every 7th
    customer / every 11th order) so the check has something to find.
    Each check is ONE left join + conditional count (never a per-row
    lookup); at 100 TB the missing-key probe rides the same broadcast /
    bitmap prefilter machinery as the semi-joins
    (joins.join_bitmap_prefiltered)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust_ok = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 != 0)
        .select("c_custkey")
    )
    orders_ok = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("ok_orderkey")
    )

    def check(fact, fk, dim, dk, name):
        j = fact.join(dim, F.col(fk) == F.col(dk), "left")
        viol = F.sum(F.col(dk).isNull().cast("long"))
        return j.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            viol.alias("n_violations"),
            F.round(
                viol.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("violation_rate"),
        )

    return (
        check(orders, "o_custkey", cust_ok, "c_custkey", "orders_customer_fk")
        .unionByName(
            check(li, "l_orderkey", orders_ok, "ok_orderkey", "lineitem_orders_fk")
        )
        .orderBy("check_name")
    )


def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median per year: smallest price whose cumulative
    weight reaches half the year's total — the weighted-quantile
    primitive built-in ``percentile`` lacks a portable weighted form of.
    Weights are a deterministic integer projection (``1 + key % 5``) so
    every comparison is integer-exact. One shuffle: both windows (running
    weight and per-year total) share the year partition key, so Catalyst
    plans a single exchange + sort; the threshold pick is then a plain
    filter + min — no second pass over the data."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.select(
        year_of("o_orderdate").alias("year"),
        F.col("o_totalprice").alias("price"),
        "o_orderkey",
        (F.lit(1) + F.col("o_orderkey") % 5).alias("wgt"),
    )
    wcum = (
        Window.partitionBy("year")
        .orderBy("price", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("year")
    c = d.select(
        "year",
        "price",
        F.sum("wgt").over(wcum).alias("cw"),
        F.sum("wgt").over(wtot).alias("tw"),
    )
    return (
        c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("year")
        .agg(
            F.max("tw").alias("total_weight"),
            F.round(F.min("price"), 4).alias("weighted_median"),
        )
        .orderBy("year")
    )


# dq_anomaly_zscore leads: registry merge order puts it at sample slot 50
# in the round-5 rotation (see registry._MODULES).
QUERIES = {
    "dq_anomaly_zscore": dq_anomaly_zscore,
    "window_distribution_ranks": window_distribution_ranks,
    "window_first_last_nth": window_first_last_nth,
    "window_trailing_range_frame": window_trailing_range_frame,
    "agg_mode_deterministic": agg_mode_deterministic,
    "agg_percentiles": agg_percentiles,
    "agg_corr_covar": agg_corr_covar,
    "window_moving_stats": window_moving_stats,
    "agg_approx_percentiles": agg_approx_percentiles,
    "agg_histogram": agg_histogram,
    "string_functions_showcase": string_functions_showcase,
    "null_handling_showcase": null_handling_showcase,
    "timeseries_gap_fill": timeseries_gap_fill,
    "timeseries_interpolate_linear": timeseries_interpolate_linear,
    "dq_referential_integrity": dq_referential_integrity,
    "agg_weighted_percentile": agg_weighted_percentile,
}

_MOMENTS = (
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
    "AS sx, "
    "CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 "
    "AS sy, "
    "CAST(SUM(CAST(ROUND(l_quantity * l_discount * 100000) AS BIGINT)) "
    "AS DOUBLE) / 100000.0 AS sxy, "
    "CAST(SUM(CAST(ROUND(l_quantity * l_quantity * 100) AS BIGINT)) "
    "AS DOUBLE) / 100.0 AS sxx, "
    "CAST(SUM(CAST(ROUND(l_discount * l_discount * 100000000) AS BIGINT)) "
    "AS DOUBLE) / 100000000.0 AS syy "
    "FROM lineitem GROUP BY 1"
)

_M3 = (
    "SELECT date_trunc('month', o_orderdate) AS ms, "
    "ROUND((CAST(SUM(CAST(ROUND((o_totalprice) * 10000) AS BIGINT)) "
    "AS DOUBLE) / 10000.0), 4) AS total FROM orders GROUP BY 1"
)

ORACLE = {
    "dq_anomaly_zscore": (
        f"WITH m AS ({_M3.replace(' AS ms', ' AS month_start')}), "
        "s0 AS (SELECT CAST(SUM(CAST(ROUND(total * 100) AS BIGINT)) "
        "AS DOUBLE) / 100.0 / COUNT(*) AS mu, COUNT(*) AS n FROM m), "
        "s AS (SELECT mu, n, "
        "CAST(SUM(CAST(FLOOR((total - mu) * (total - mu) + 0.5) "
        "AS BIGINT)) AS DOUBLE) / (n - 1) AS var "
        "FROM m, s0 GROUP BY mu, n) "
        "SELECT month_start, total, "
        "ROUND((total - mu) / sqrt(var), 6) AS zscore "
        "FROM m, s WHERE ABS(ROUND((total - mu) / sqrt(var), 6)) > 2.0 "
        "ORDER BY 1"
    ),
    "window_trailing_range_frame": (
        "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
        "ROUND((CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) "
        "AS DOUBLE) / 10000.0), 4) AS total FROM orders GROUP BY 1), "
        "k AS (SELECT day, total, "
        "CAST(epoch(CAST(day AS TIMESTAMP)) // 86400 AS BIGINT) AS day_num "
        "FROM d) "
        "SELECT day AS day_start, total, "
        "ROUND(CAST(SUM(CAST(ROUND(total * 10000) AS BIGINT)) OVER w "
        "AS DOUBLE) / 10000.0, 4) AS trailing_90d_total, "
        "COUNT(*) OVER w AS days_with_orders_90d "
        "FROM k WINDOW w AS (ORDER BY day_num "
        "RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)"
    ),
    "agg_mode_deterministic": (
        "WITH c AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1, 2), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY year "
        "ORDER BY n DESC, o_orderpriority) AS rn FROM c) "
        "SELECT year, o_orderpriority AS mode_priority, n AS mode_count "
        "FROM r WHERE rn = 1 ORDER BY year"
    ),
    "window_first_last_nth": (
        f"WITH m AS ({_M3}) "
        "SELECT ms AS month_start, total, "
        "ROUND(first_value(total) OVER w, 4) AS year_open, "
        "ROUND(last_value(total) OVER w, 4) AS year_close, "
        "ROUND(nth_value(total, 2) OVER w, 4) AS year_second "
        "FROM m WINDOW w AS (PARTITION BY year(ms) ORDER BY ms "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    "window_moving_stats": (
        f"WITH m AS ({_M3}) "
        "SELECT ms AS month_start, total, "
        "ROUND(CAST(SUM(CAST(ROUND(total * 10000) AS BIGINT)) OVER w "
        "AS DOUBLE) / 10000.0 / COUNT(*) OVER w, 4) AS ma3, "
        "ROUND(MIN(total) OVER w, 4) AS min3, "
        "ROUND(MAX(total) OVER w, 4) AS max3, "
        "ROUND(FIRST_VALUE(total) OVER w, 4) AS frame_first "
        "FROM m WINDOW w AS (ORDER BY ms "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
    ),
    "agg_corr_covar": (
        f"WITH m AS ({_MOMENTS}) "
        "SELECT l_returnflag, n, "
        "ROUND((sxy - sx * sy / n) / n, 8) AS covar_pop, "
        "ROUND(((sxy - sx * sy / n) / n) / "
        "sqrt(((sxx - sx * sx / n) / n) * ((syy - sy * sy / n) / n)), 6) "
        "AS corr FROM m"
    ),
    "agg_percentiles": (
        "SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price, "
        "ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price, "
        "COUNT(*) AS n_orders FROM orders GROUP BY 1"
    ),
    # agg_approx_percentiles: rows-only (sketch).
    "agg_histogram": (
        f"SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - {HIST_LO}) "
        f"/ {HIST_STEP}), 0), {HIST_BINS - 1}) AS INT) AS bin, "
        f"ROUND({HIST_LO} + CAST(LEAST(GREATEST(FLOOR((o_totalprice - {HIST_LO}) "
        f"/ {HIST_STEP}), 0), {HIST_BINS - 1}) AS INT) * {HIST_STEP}, 1) "
        "AS bin_lo, COUNT(*) AS n FROM orders GROUP BY 1, 2"
    ),
    "string_functions_showcase": (
        "SELECT c_custkey, upper(c_name) AS upper_name, "
        "lower(c_name) AS lower_name, substr(c_name, 1, 8) AS prefix8, "
        "CAST(length(c_name) AS INT) AS name_len, "
        "concat_ws('|', c_name, c_mktsegment) AS tagged, "
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key, "
        "reverse(c_name) AS reversed, "
        "regexp_extract(c_name, '(\\d+)', 1) AS digits, "
        "replace(c_name, 'Customer', 'Cust') AS replaced FROM customer"
    ),
    "null_handling_showcase": (
        "SELECT event_id, NULLIF(event_type, 'error') AS type_or_null, "
        "COALESCE(NULLIF(event_type, 'error'), '__repaired') AS type_repaired, "
        "CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 1 ELSE 0 END "
        "AS was_error, "
        "CASE WHEN NULLIF(event_type, 'error') IS NOT NULL THEN 0 ELSE 1 END "
        "AS nvl2_flag FROM events"
    ),
    "window_distribution_ranks": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year, "
        "ROUND(percent_rank() OVER (PARTITION BY year(o_orderdate) "
        "ORDER BY o_totalprice), 6) AS pct_rank, "
        "ROUND(cume_dist() OVER (PARTITION BY year(o_orderdate) "
        "ORDER BY o_totalprice), 6) AS cume_dist "
        "FROM orders"
    ),
    "timeseries_gap_fill": (
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS ms, "
        "ROUND((CAST(SUM(CAST(ROUND((o_totalprice) * 10000) AS BIGINT)) "
        "AS DOUBLE) / 10000.0), 4) AS total FROM orders GROUP BY 1), "
        "obs AS (SELECT * FROM m WHERE month(ms) != 2), "
        "b AS (SELECT MIN(ms) AS lo, MAX(ms) AS hi FROM m), "
        "spine AS (SELECT unnest(generate_series(lo, hi, "
        "INTERVAL 1 MONTH)) AS month_start FROM b) "
        "SELECT s.month_start, o.total, "
        "LAST_VALUE(o.total IGNORE NULLS) OVER (ORDER BY s.month_start "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_filled, "
        "CASE WHEN o.total IS NULL THEN 1 ELSE 0 END AS was_gap "
        "FROM spine s LEFT JOIN obs o ON s.month_start = o.ms"
    ),
    "timeseries_interpolate_linear": (
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS ms, "
        "ROUND((CAST(SUM(CAST(ROUND((o_totalprice) * 10000) AS BIGINT)) "
        "AS DOUBLE) / 10000.0), 4) AS total FROM orders GROUP BY 1), "
        "obs AS (SELECT * FROM m WHERE month(ms) != 2), "
        "b AS (SELECT MIN(ms) AS lo, MAX(ms) AS hi FROM m), "
        "spine AS (SELECT unnest(generate_series(lo, hi, "
        "INTERVAL 1 MONTH)) AS month_start FROM b), "
        "j AS (SELECT s.month_start, o.total "
        "FROM spine s LEFT JOIN obs o ON s.month_start = o.ms), "
        "w AS (SELECT month_start, total, "
        "LAST_VALUE(total IGNORE NULLS) OVER wp AS pv, "
        "FIRST_VALUE(total IGNORE NULLS) OVER wn AS nv, "
        "LAST_VALUE(CASE WHEN total IS NOT NULL THEN month_start END "
        "IGNORE NULLS) OVER wp AS pm, "
        "FIRST_VALUE(CASE WHEN total IS NOT NULL THEN month_start END "
        "IGNORE NULLS) OVER wn AS nm FROM j "
        "WINDOW wp AS (ORDER BY month_start ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW), "
        "wn AS (ORDER BY month_start ROWS BETWEEN CURRENT ROW AND "
        "UNBOUNDED FOLLOWING)) "
        "SELECT month_start, total AS observed, "
        "ROUND(CASE WHEN total IS NOT NULL THEN total "
        "WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv "
        "ELSE pv + (nv - pv) * "
        "CAST(date_diff('month', pm, month_start) AS DOUBLE) / "
        "CAST(date_diff('month', pm, nm) AS DOUBLE) END, 4) "
        "AS filled_total, "
        "CASE WHEN total IS NULL THEN 1 ELSE 0 END AS was_gap "
        "FROM w ORDER BY month_start"
    ),
    "dq_referential_integrity": (
        "SELECT 'orders_customer_fk' AS check_name, "
        "COUNT(*) AS n_checked, "
        "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_violations, "
        "ROUND(CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS violation_rate "
        "FROM orders o LEFT JOIN (SELECT c_custkey FROM customer "
        "WHERE c_custkey % 7 <> 0) c ON o.o_custkey = c.c_custkey "
        "UNION ALL "
        "SELECT 'lineitem_orders_fk', COUNT(*), "
        "CAST(SUM(CASE WHEN k.ok_orderkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT), "
        "ROUND(CAST(SUM(CASE WHEN k.ok_orderkey IS NULL THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) "
        "FROM lineitem l LEFT JOIN (SELECT o_orderkey AS ok_orderkey "
        "FROM orders WHERE o_orderkey % 11 <> 0) k "
        "ON l.l_orderkey = k.ok_orderkey "
        "ORDER BY check_name"
    ),
    "agg_weighted_percentile": (
        "WITH d AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "o_totalprice AS price, o_orderkey, "
        "1 + o_orderkey % 5 AS wgt FROM orders), "
        "c AS (SELECT year, price, "
        "SUM(wgt) OVER (PARTITION BY year ORDER BY price, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw, "
        "SUM(wgt) OVER (PARTITION BY year) AS tw FROM d) "
        "SELECT year, CAST(MAX(tw) AS BIGINT) AS total_weight, "
        "ROUND(MIN(price), 4) AS weighted_median "
        "FROM c WHERE 2 * cw >= tw GROUP BY 1 ORDER BY 1"
    ),
}


def norm_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) normalization per event type — the standard
    outlier-robust preprocessing before feeding a measure to a model:
    the bottom/top 5% of values are clamped to the 5th/95th order
    statistic and the clipped mean reported alongside the clip bounds
    and clip counts.

    Thresholds are ORDER STATISTICS (the value at integer rank
    ``k + 1`` / ``n - k`` with ``k = n*5 div 100``), not interpolated
    percentiles: rank arithmetic is integer-exact, so the clip bounds
    are actual data values and every downstream comparison is
    bitwise-portable across engines (an interpolated threshold's last
    ulp could flip a comparison for a value sitting exactly on the
    boundary). All three windows (rank, count, threshold-pick) share the
    ``event_type`` partition key → Catalyst plans ONE exchange + sort.
    At 100 TB the same clip semantics run off ``approx_percentile``
    sketch thresholds (see ``agg_approx_percentiles``) instead of the
    per-group sort; groups here are event types, so the sort
    parallelizes across groups."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(w.orderBy("value", "event_id"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).withColumn("k", F.expr("(n * 5) div 100"))
    # project rn/n/k BEFORE the threshold windows (analyzer trap: window
    # expressions over window outputs need an intermediate projection)
    thr = ranked.select(
        "event_type",
        "value",
        "rn",
        "n",
        "k",
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("value"))).over(w).alias("lo"),
        F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("value"))).over(w).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        thr.groupBy("event_type")
        .agg(
            F.max("n").alias("n_values"),
            F.max("k").alias("k_clip"),
            F.round(F.max("lo"), 4).alias("clip_lo"),
            F.round(F.max("hi"), 4).alias("clip_hi"),
            F.sum((F.col("rn") <= F.col("k")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col("rn") > F.col("n") - F.col("k")).cast("long")).alias(
                "n_clipped_high"
            ),
            F.round(davg(clipped), 4).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


QUERIES["norm_winsorize_clip"] = norm_winsorize_clip

ORACLE["norm_winsorize_clip"] = (
    "WITH r AS (SELECT event_type, value, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY event_type "
    "ORDER BY value, event_id) AS BIGINT) AS rn, "
    "COUNT(*) OVER (PARTITION BY event_type) AS n "
    "FROM events WHERE value IS NOT NULL), "
    "kk AS (SELECT *, (n * 5) // 100 AS k FROM r), "
    "t AS (SELECT *, "
    "MAX(CASE WHEN rn = k + 1 THEN value END) "
    "OVER (PARTITION BY event_type) AS lo, "
    "MAX(CASE WHEN rn = n - k THEN value END) "
    "OVER (PARTITION BY event_type) AS hi FROM kk) "
    "SELECT event_type, MAX(n) AS n_values, MAX(k) AS k_clip, "
    "ROUND(MAX(lo), 4) AS clip_lo, ROUND(MAX(hi), 4) AS clip_hi, "
    "CAST(SUM(CASE WHEN rn <= k THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_clipped_low, "
    "CAST(SUM(CASE WHEN rn > n - k THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_clipped_high, "
    f"ROUND({davg_sql('LEAST(GREATEST(value, lo), hi)')}, 4) "
    "AS winsorized_mean "
    "FROM t GROUP BY event_type ORDER BY event_type"
)


def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion (view → click → purchase, time-ordered per
    user): the product-analytics staple the aggregate family otherwise
    lacks. Stage timestamps are chained conditional window minimums —
    first view, first click AT OR AFTER that view, first purchase at or
    after that click — so a user converts only by traversing the stages
    in order. All three windows partition on ``user_id`` → ONE exchange
    (the per-user rollup reuses the same partitioning); comparisons are
    raw NTZ timestamps, no epoch arithmetic (CLAUDE.md 6a). Counts
    divide as conditional aggregates with zero-guards so the operator is
    total on an empty fixture."""
    ev = read_table(spark, sf_dir, "events")
    u = Window.partitionBy("user_id")
    a = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(u).alias("mv"),
    )
    b = a.select(
        "user_id",
        "event_type",
        "ts",
        "mv",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("mv")),
                F.col("ts"),
            )
        ).over(u).alias("mc"),
    )
    c = b.select(
        "user_id",
        "mv",
        "mc",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("mc")),
                F.col("ts"),
            )
        ).over(u).alias("mp"),
    )
    per_user = c.groupBy("user_id").agg(
        F.max("mv").alias("mv"), F.max("mc").alias("mc"), F.max("mp").alias("mp")
    )
    rate = lambda num, den: F.when(  # noqa: E731
        F.count(den) > 0, F.round(F.count(num) / F.count(den), 6)
    ).otherwise(F.lit(0.0))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("mv").alias("n_view"),
        F.count("mc").alias("n_click"),
        F.count("mp").alias("n_purchase"),
        rate("mc", "mv").alias("view_to_click"),
        rate("mp", "mc").alias("click_to_purchase"),
        rate("mp", "mv").alias("view_to_purchase"),
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity DAY,
    counted on each subsequent day they return (daily granularity —
    the events fixture spans ~30 days, so monthly cohorts would be
    degenerate; the shape is granularity-agnostic). Day math is calendar
    arithmetic on naive walls (``date_trunc``/``datediff``) — no
    epoch↔instant conversion, no timezone exposure (CLAUDE.md 6a).
    Shape: per-user first day via one user-partitioned window, distinct
    (user, day) pairs, then the (cohort, offset) count-distinct — the
    cohort matrix is O(days²) rows regardless of corpus size, and the
    heavy stages share the user shuffle key."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
    u = Window.partitionBy("user_id")
    k = d.select(
        "user_id", "day", F.min("day").over(u).alias("cohort_day")
    ).distinct()
    return (
        k.groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


QUERIES["agg_funnel_conversion"] = agg_funnel_conversion
QUERIES["retention_cohorts"] = retention_cohorts

ORACLE["agg_funnel_conversion"] = (
    "WITH a AS (SELECT user_id, event_type, ts, "
    "MIN(CASE WHEN event_type = 'view' THEN ts END) "
    "OVER (PARTITION BY user_id) AS mv FROM events), "
    "b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= mv "
    "THEN ts END) OVER (PARTITION BY user_id) AS mc FROM a), "
    "c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= mc "
    "THEN ts END) OVER (PARTITION BY user_id) AS mp FROM b), "
    "pu AS (SELECT user_id, MAX(mv) AS mv, MAX(mc) AS mc, MAX(mp) AS mp "
    "FROM c GROUP BY user_id) "
    "SELECT COUNT(*) AS n_users, COUNT(mv) AS n_view, "
    "COUNT(mc) AS n_click, COUNT(mp) AS n_purchase, "
    "CASE WHEN COUNT(mv) > 0 THEN ROUND(COUNT(mc) * 1.0 / COUNT(mv), 6) "
    "ELSE 0.0 END AS view_to_click, "
    "CASE WHEN COUNT(mc) > 0 THEN ROUND(COUNT(mp) * 1.0 / COUNT(mc), 6) "
    "ELSE 0.0 END AS click_to_purchase, "
    "CASE WHEN COUNT(mv) > 0 THEN ROUND(COUNT(mp) * 1.0 / COUNT(mv), 6) "
    "ELSE 0.0 END AS view_to_purchase FROM pu"
)

ORACLE["retention_cohorts"] = (
    "WITH d AS (SELECT user_id, date_trunc('day', ts) AS day FROM events), "
    "k AS (SELECT DISTINCT user_id, day, "
    "MIN(day) OVER (PARTITION BY user_id) AS cohort_day FROM d) "
    "SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, "
    "CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users "
    "FROM k GROUP BY cohort_day, date_diff('day', cohort_day, day) "
    "ORDER BY cohort_day, day_offset"
)


def agg_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS trend of monthly order totals — the reference
    dashboard's "is employment trending up?" question as a closed-form
    aggregate. x is the month INDEX (year*12+month, exact integers), y
    the monthly scaled-int total; all four OLS sums (Sx, Sy, Sxy, Sxx)
    stay INTEGER until the single final division, so the slope is
    bitwise-portable with no accumulation-order exposure (the naive
    double Σxy differs per partition schedule at scale). x is CENTERED
    on a fixed base month (Jan 1995) before any product — uncentered,
    ``n*Sxy`` overflows int64 already at sf0.01 (x ~ 24k multiplies
    every money term by 2e4 for nothing; centering is the standard OLS
    conditioning trick and here it is exactness, not just conditioning).
    The per-month money rollup is the scaled-int64 ``dsum_scaled``
    (bounded per month — ~5.6e14 at sf100, comfortably int64); the
    FOUR OLS SUMS run as DECIMAL(38,0) — still exact integers, matching
    DuckDB's HUGEINT sums, and immune to the int64 ceiling the cross
    products would hit around sf70 (Sy·Sx ~ 1e19). Decimal cost is nil:
    the outer aggregate sees only O(months x segments) rows. Two
    shuffles total: the month rollup, then that tiny per-segment
    aggregate. The intercept is reported AT THE BASE MONTH
    (x = 0 ⇔ Jan 1995)."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            "o_orderpriority",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
                - F.lit(1995 * 12)
            ).alias("x"),
        )
        .agg(dsum_scaled("o_totalprice").alias("y"))
    )
    dec = "decimal(38,0)"
    n = F.count(F.lit(1)).cast(dec)
    sx = F.sum(F.col("x").cast(dec))
    sy = F.sum(F.col("y").cast(dec))
    sxy = F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))
    sxx = F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
    # exact integer differences, ONE double division, then descale 1e4
    slope = (
        (n * sxy - sx * sy).cast("double")
        / (n * sxx - sx * sx).cast("double")
        / 10_000.0
    )
    intercept = (
        sy.cast("double") / 10_000.0 - slope * sx.cast("double")
    ) / n.cast("double")
    # a single-month segment has no slope (0/0 → NaN, and NaN compares
    # unequal to itself across engines) — guard to NULL; x is the group
    # key so n >= 2 implies distinct x and a nonzero denominator
    enough = F.count(F.lit(1)) >= 2
    return (
        monthly.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.when(enough, F.round(slope, 4)).alias("slope_per_month"),
            F.when(enough, F.round(intercept, 4)).alias("intercept_at_base"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["agg_linear_trend"] = agg_linear_trend

ORACLE["agg_linear_trend"] = (
    "WITH m AS (SELECT o_orderpriority, "
    "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 "
    f"- {1995 * 12} AS BIGINT) AS x, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) AS y "
    "FROM orders GROUP BY 1, 2) "
    "SELECT o_orderpriority, COUNT(*) AS n_months, "
    "CASE WHEN COUNT(*) >= 2 THEN "
    "ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE) "
    "/ CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE) "
    "/ 10000.0, 4) END AS slope_per_month, "
    "CASE WHEN COUNT(*) >= 2 THEN "
    "ROUND((CAST(SUM(y) AS DOUBLE) / 10000.0 "
    "- (CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE) "
    "/ CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE) / 10000.0) "
    "* CAST(SUM(x) AS DOUBLE)) / COUNT(*), 4) END AS intercept_at_base "
    "FROM m GROUP BY 1 ORDER BY 1"
)


def string_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 **string collations** (`collate(s, 'UTF8_LCASE')`):
    comparison/grouping semantics attached to the string TYPE rather
    than wrapped in `lower()` calls at every use site. The demo derives
    a mixed-case label from `c_mktsegment` (odd custkeys initcap'd),
    then counts distinct labels and equality matches under binary vs
    case-insensitive collation — semantics a `lower()`-twin oracle
    replays exactly, so the collation path is hash-checked.

    At scale collation-aware grouping hashes the collation KEY (one
    pass, same shuffle as any groupBy); the win is correctness-by-type:
    a case-insensitive join can't be forgotten at one of nine call
    sites. (ICU locale collations exist too; UTF8_LCASE is the
    deterministic engine-portable one, which is why it is the
    oracle-checkable choice.)"""
    customer = read_table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 1, F.initcap("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    lab = customer.select(F.col("c_custkey"), mixed.alias("label"))
    ci = F.collate(F.col("label"), "UTF8_LCASE")
    return lab.agg(
        F.countDistinct("label").alias("distinct_binary"),
        F.countDistinct(ci).alias("distinct_lcase"),
        F.sum((ci == F.lit("BUILDING")).cast("long")).alias("ci_eq_building"),
        F.sum((F.col("label") == F.lit("BUILDING")).cast("long")).alias(
            "bin_eq_building"
        ),
    )


QUERIES["string_collation_compare"] = string_collation_compare

ORACLE["string_collation_compare"] = (
    "WITH lab AS (SELECT c_custkey, CASE WHEN c_custkey % 2 = 1 "
    "THEN upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) "
    "ELSE c_mktsegment END AS label FROM customer) "
    "SELECT COUNT(DISTINCT label) AS distinct_binary, "
    "COUNT(DISTINCT lower(label)) AS distinct_lcase, "
    "CAST(SUM(CASE WHEN lower(label) = lower('BUILDING') THEN 1 ELSE 0 END) "
    "AS BIGINT) AS ci_eq_building, "
    "CAST(SUM(CASE WHEN label = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS bin_eq_building FROM lab"
)


def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **Benford's-law first-digit audit** (Benford 1938;
    the standard forensic-accounting screen, Nigrini 2012): the leading
    digit of naturally occurring amounts should follow
    ``P(d) = log10(1 + 1/d)``; a synthetic or truncated money column
    drifts from it. Emits the 9-row digit table — observed count, share,
    Benford share, absolute deviation — over ``o_totalprice``, with a
    1-9 spine LEFT JOIN so absent digits still audit (share 0, full
    deviation). One conditional aggregate over the scan; the 9-row spine
    and total are broadcast scalars.

    Determinism: digit extraction is integer/string (first char of the
    floored amount), shares are exact-int ratios rounded at 6 dp, and
    ``log10(1+1/d)`` evaluates on the same 9 doubles in both engines.
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = orders.agg(F.count(F.lit(1)).alias("tot"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    share = F.col("n") / F.col("tot")
    return (
        spine.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            dround(
                F.coalesce(share, F.lit(0.0)), 6
            ).alias("obs_share"),
            dround(benford, 6).alias("benford_share"),
            dround(
                F.abs(F.coalesce(share, F.lit(0.0)) - benford), 6
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


QUERIES["dq_benford_first_digit"] = dq_benford_first_digit

ORACLE["dq_benford_first_digit"] = (
    "WITH o AS (SELECT o_totalprice FROM orders WHERE o_totalprice > 0), "
    "obs AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) "
    "AS VARCHAR), 1, 1) AS INT) AS digit, COUNT(*) AS n "
    "FROM o GROUP BY 1), "
    "tot AS (SELECT COUNT(*) AS tot FROM o), "
    "spine AS (SELECT CAST(i AS INT) AS digit FROM range(1, 10) t(i)) "
    "SELECT spine.digit, CAST(COALESCE(obs.n, 0) AS BIGINT) AS n, "
    "ROUND(COALESCE(obs.n * 1.0 / tot, 0.0), 6) AS obs_share, "
    "ROUND(LOG10(1.0 + 1.0 / spine.digit), 6) AS benford_share, "
    "ROUND(ABS(COALESCE(obs.n * 1.0 / tot, 0.0) - "
    "LOG10(1.0 + 1.0 / spine.digit)), 6) AS abs_dev "
    "FROM spine LEFT JOIN obs ON obs.digit = spine.digit, tot "
    "ORDER BY 1"
)


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **RFM customer segmentation** (Hughes 1994, the
    classic BI scoring the reference's dashboard genre feeds): per
    customer, Recency (days since last order, against the corpus max
    date), Frequency (order count), Monetary (scaled-int revenue sum),
    each scored 1-5 against the corpus 20/40/60/80 quantiles, composed
    into the familiar ``rfm_code``.

    Scale shape — the `sample_quantile_threshold_cut` device, not a
    global ntile: quintile thresholds are ONE scalar aggregate over the
    per-customer rollup (exact interpolated ``percentile`` ≡
    ``quantile_cont``, rounded 6 dp), broadcast back as a 1-row join;
    scores are four strict-greater comparisons. No single-partition
    window anywhere; recency deltas are exact integer epoch-day
    arithmetic (timezone-free, rule 6a).
    """
    from ..functions.numerics import dsum
    from ..functions.timeparts import epoch_micros_from_ntz

    orders = read_table(spark, sf_dir, "orders")
    day = F.floor(
        epoch_micros_from_ntz(F.col("o_orderdate")) / 86_400_000_000
    ).cast("long")
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(dsum("o_totalprice"), 4).alias("monetary"),
    )
    maxd = orders.agg(F.max(day).alias("max_day"))
    rfm = per_cust.crossJoin(F.broadcast(maxd)).select(
        "custkey",
        (F.col("max_day") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    qs = rfm.agg(
        *[
            F.round(F.percentile(c, F.lit(p)), 6).alias(f"{c}_q{int(p*100)}")
            for c in ("recency_days", "frequency", "monetary")
            for p in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        s = F.lit(1)
        for p in (20, 40, 60, 80):
            s = s + (F.col(c) > F.col(f"{c}_q{p}")).cast("int")
        # recency: more days = worse -> invert to 5 = most recent
        return (F.lit(6) - s) if invert else s

    return (
        rfm.crossJoin(F.broadcast(qs))
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            score("recency_days", True).alias("r_score"),
            score("frequency", False).alias("f_score"),
            score("monetary", False).alias("m_score"),
        )
        .withColumn(
            "rfm_code",
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ),
        )
        .orderBy("custkey")
    )


QUERIES["rfm_segmentation"] = rfm_segmentation

ORACLE["rfm_segmentation"] = (
    "WITH o AS (SELECT o_custkey, "
    "CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day, "
    "o_totalprice FROM orders), "
    "pc AS (SELECT o_custkey AS custkey, MAX(day) AS last_day, "
    "COUNT(*) AS frequency, "
    "ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) "
    "AS DOUBLE) / 10000.0, 4) AS monetary FROM o GROUP BY 1), "
    "mx AS (SELECT MAX(day) AS max_day FROM o), "
    "rfm AS (SELECT custkey, max_day - last_day AS recency_days, "
    "frequency, monetary FROM pc, mx), "
    "qs AS (SELECT "
    + ", ".join(
        f"ROUND(quantile_cont({c}, {p}), 6) AS {c}_q{int(p * 100)}"
        for c in ("recency_days", "frequency", "monetary")
        for p in (0.2, 0.4, 0.6, 0.8)
    )
    + " FROM rfm), "
    "sc AS (SELECT custkey, recency_days, frequency, monetary, "
    "6 - (1 + CAST(recency_days > recency_days_q20 AS INT) + "
    "CAST(recency_days > recency_days_q40 AS INT) + "
    "CAST(recency_days > recency_days_q60 AS INT) + "
    "CAST(recency_days > recency_days_q80 AS INT)) AS r_score, "
    "1 + CAST(frequency > frequency_q20 AS INT) + "
    "CAST(frequency > frequency_q40 AS INT) + "
    "CAST(frequency > frequency_q60 AS INT) + "
    "CAST(frequency > frequency_q80 AS INT) AS f_score, "
    "1 + CAST(monetary > monetary_q20 AS INT) + "
    "CAST(monetary > monetary_q40 AS INT) + "
    "CAST(monetary > monetary_q60 AS INT) + "
    "CAST(monetary > monetary_q80 AS INT) AS m_score "
    "FROM rfm, qs) "
    "SELECT custkey, recency_days, frequency, monetary, "
    "r_score, f_score, m_score, "
    "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || "
    "CAST(m_score AS VARCHAR) AS rfm_code "
    "FROM sc ORDER BY custkey"
)


def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **ABC / Pareto classification** (the 80/20 inventory
    analysis; Pareto 1896 via Juran's quality canon): parts ranked by
    revenue, cumulative revenue share computed in descending order, and
    classed A (first 70 % of revenue), B (to 90 %), C (tail) — the
    classic OLAP drill the reference's dashboard genre ships beside
    top-N.

    Scale: revenue reduces on the FACT table with one keyed aggregate;
    the ordered cumulative window runs over the part-level rollup
    (|parts| ≪ |lineitem| — dim-sized, like every corpus-stats window
    here), never over facts. The cumulative sum accumulates the SCALED
    INT revenue (exact, order-stable under the (revenue desc, partkey)
    total order), so shares are identical bit-for-bit cross-engine.
    """
    from pyspark.sql.window import Window

    from ..functions.numerics import dsum_scaled

    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum_scaled(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("rev_s")
    )
    w = (
        Window.orderBy(F.col("rev_s").desc(), F.col("partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = rev.agg(F.sum("rev_s").alias("tot_s"))
    cum = (
        rev.withColumn("cum_s", F.sum("rev_s").over(w))
        .crossJoin(F.broadcast(tot))
    )
    share = F.col("cum_s").cast("double") / F.col("tot_s")
    return cum.select(
        "partkey",
        F.round(F.col("rev_s") / 10000.0, 4).alias("revenue"),
        dround(share, 6).alias("cum_share"),
        F.when(share <= 0.70, F.lit("A"))
        .when(share <= 0.90, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    ).orderBy(F.col("revenue").desc(), F.col("partkey"))


QUERIES["abc_pareto_parts"] = abc_pareto_parts

ORACLE["abc_pareto_parts"] = (
    "WITH rev AS (SELECT l_partkey AS partkey, "
    "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) "
    "AS BIGINT)) AS rev_s FROM lineitem GROUP BY 1), "
    "tot AS (SELECT SUM(rev_s) AS tot_s FROM rev), "
    "cum AS (SELECT partkey, rev_s, "
    "SUM(rev_s) OVER (ORDER BY rev_s DESC, partkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s "
    "FROM rev) "
    "SELECT partkey, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(cum_s AS DOUBLE) / tot_s, 6) AS cum_share, "
    "CASE WHEN CAST(cum_s AS DOUBLE) / tot_s <= 0.70 THEN 'A' "
    "WHEN CAST(cum_s AS DOUBLE) / tot_s <= 0.90 THEN 'B' "
    "ELSE 'C' END AS abc_class "
    "FROM cum, tot ORDER BY revenue DESC, partkey"
)


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **last-touch attribution** (the standard marketing-
    analytics credit model): each purchase credits 100 % of its value to
    the user's most recent PRIOR non-purchase event within a 7-day
    lookback, else to 'direct'. Emits the per-channel attribution
    rollup (purchase count + attributed revenue) — the campaign-ROI
    table every funnel dashboard pairs with `agg_funnel_conversion`.

    One exchange by user: the carry of (last non-purchase type, its ts)
    is a pair of ignore-nulls `last()` frames over the SAME user window
    the purchases then read; the lookback is an exact NTZ interval
    compare (CLAUDE.md 6a — no epoch decomposition, no FP seconds).
    (event_id tiebreak makes the frame order total under equal
    timestamps.)
    """
    from pyspark.sql.window import Window

    from ..functions.numerics import dsum

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    non_purchase_ts = F.when(
        F.col("event_type") != "purchase", F.col("ts")
    )
    carried = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(non_purchase, ignorenulls=True).over(w).alias("prior_type"),
        F.last(non_purchase_ts, ignorenulls=True).over(w).alias("prior_ts"),
    )
    purchases = carried.filter(F.col("event_type") == "purchase")
    within = F.col("prior_ts").isNotNull() & (
        (F.col("ts") - F.col("prior_ts")) <= F.expr("INTERVAL '7' DAY")
    )
    return (
        purchases.select(
            F.when(within, F.col("prior_type"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(dsum("value"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


QUERIES["events_attribution_last_touch"] = events_attribution_last_touch

ORACLE["events_attribution_last_touch"] = (
    "WITH c AS (SELECT user_id, ts, event_type, value, "
    "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END "
    "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_type, "
    "last_value(CASE WHEN event_type <> 'purchase' THEN ts END "
    "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_ts "
    "FROM events), "
    "p AS (SELECT CASE WHEN prior_ts IS NOT NULL "
    "AND ts - prior_ts <= INTERVAL 7 DAY THEN prior_type "
    "ELSE 'direct' END AS channel, value FROM c "
    "WHERE event_type = 'purchase') "
    "SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases, "
    "ROUND(CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE) "
    "/ 10000.0, 4) AS attributed_value "
    "FROM p GROUP BY 1 ORDER BY 1"
)


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **first-order Markov transition matrix** over the
    per-user event stream (the clickstream "what happens after X" model
    behind next-action prediction and anomaly scoring): for every
    ordered pair of consecutive events of one user, count the
    (prev_type → event_type) transition and row-normalize into
    ``P(next | prev)``.

    One exchange by user carries the lag (the ``sessionize_batch``
    shape); the transition table is at most |event_type|² rows, so the
    row-normalizing window runs over a k²-sized aggregate — at 100 TB
    the only corpus-sized cost is the per-user ordering shuffle, which
    AQE skew-splits on hot users. The probability is a per-row quotient
    emitted once per matrix CELL (small output), but rounds via
    ``dround`` anyway per the engine-wide 6-dp ratio rule.

    vs reference: no analogue — the reference's only sequence device is
    the lag-1 pct_change (`dashboard_nfp.py:152`); this is the same lag
    window applied to a categorical column and re-aggregated.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        dround(F.col("n") / F.sum("n").over(row_tot), 6).alias("prob"),
    ).orderBy("prev_type", "event_type")


QUERIES["events_markov_transitions"] = events_markov_transitions

ORACLE["events_markov_transitions"] = (
    "WITH p AS (SELECT LAG(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type, "
    "event_type FROM events), "
    "c AS (SELECT prev_type, event_type, COUNT(*) AS n FROM p "
    "WHERE prev_type IS NOT NULL GROUP BY 1, 2) "
    "SELECT prev_type, event_type, n, "
    "ROUND(CAST(n AS DOUBLE) / "
    "CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS prob "
    "FROM c ORDER BY 1, 2"
)


def timeseries_classical_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of Macaulay 1931, as in Hyndman & Athanasopoulos FPP §3.4)
    of the monthly per-priority revenue series — the reference's domain
    is exactly this kind of monthly macro series (`dashboard_nfp.py`
    computes MoM changes and yearly rollups; decomposition is the next
    question an analyst asks of it):

    - **trend** = centered 2x12-term moving average (index-based frames;
      the fixture series is gapless monthly, and the contract — mirrored
      in the oracle — is ROWS-based) computed EXACTLY in scaled-int64:
      ``t24 = 2*sum(rev_s)[-5..+5] + rev_s[-6] + rev_s[+6]`` (units =
      24 x 1e4-scaled dollars), defined only where the full 13-month
      window exists.
    - **seasonal** = per month-of-year mean of the exact detrended
      integers, rounded half-away in PURE INTEGER space
      (``(2|25*sum_d| + 6*cnt) DIV (12*cnt)`` micro-dollars — no FP in
      the mean), then centered so the 12 indices sum to ~0 with an
      exact-integer numerator ``n*s_micro - tot_micro``.
    - **residual** = detrended minus the (rounded) seasonal index —
      every emitted double is a single division off exact int64s, so
      the DuckDB twin hash-matches bit for bit.

    Scale: one shuffle for the monthly rollup (map-side partial over
    orders), one window exchange per series key, a ~60-row broadcast
    join for the seasonal indices. Series count scales out; series
    length stays bounded (monthly grain)."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))

    wo = Window.partitionBy("priority").orderBy("mon")
    w11 = wo.rowsBetween(-5, 5)
    w = m.select(
        "priority",
        "mon",
        "rev_s",
        F.count(F.lit(1)).over(w11).alias("cnt11"),
        F.sum("rev_s").over(w11).alias("sum11"),
        F.lag("rev_s", 6).over(wo).alias("lag6"),
        F.lead("rev_s", 6).over(wo).alias("lead6"),
    )
    t = (
        w.filter(
            (F.col("cnt11") == 11)
            & F.col("lag6").isNotNull()
            & F.col("lead6").isNotNull()
        )
        .select(
            "priority",
            "mon",
            "rev_s",
            F.month("mon").alias("moy"),
            (2 * F.col("sum11") + F.col("lag6") + F.col("lead6")).alias("t24"),
        )
        .withColumn("d24", 24 * F.col("rev_s") - F.col("t24"))
    )
    s = t.groupBy("priority", "moy").agg(
        F.sum("d24").alias("sum_d"), F.count(F.lit(1)).alias("cnt")
    )
    # integer round-half-away of (25*sum_d)/(6*cnt) micro-dollars: the
    # DIV operand is kept non-negative so Spark DIV (truncate-to-zero)
    # and DuckDB // agree by construction
    mag = F.expr("(2 * abs(25 * sum_d) + 6 * cnt) DIV (12 * cnt)")
    sm = s.select(
        "priority",
        "moy",
        F.when(F.col("sum_d") >= 0, mag).otherwise(-mag).alias("s_micro"),
    )
    wp = Window.partitionBy("priority")
    sc = sm.select(
        "priority",
        "moy",
        "s_micro",
        F.count(F.lit(1)).over(wp).alias("n_moy"),
        F.sum("s_micro").over(wp).alias("tot_micro"),
    )
    seasonal = (
        (F.col("n_moy") * F.col("s_micro") - F.col("tot_micro"))
        .cast("double")
        / (F.col("n_moy") * 1_000_000.0)
    )
    joined = t.join(F.broadcast(sc), ["priority", "moy"])
    return joined.select(
        "priority",
        "mon",
        F.round(F.col("rev_s").cast("double") / 10_000.0, 4).alias("revenue"),
        dround(F.col("t24").cast("double") / 240_000.0, 4).alias("trend"),
        dround(seasonal, 6).alias("seasonal"),
        dround(
            F.col("d24").cast("double") / 240_000.0 - dround(seasonal, 6), 6
        ).alias("residual"),
    ).orderBy("priority", "mon")


QUERIES["timeseries_classical_decompose"] = timeseries_classical_decompose

ORACLE["timeseries_classical_decompose"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "w AS (SELECT priority, mon, rev_s, "
    "COUNT(*) OVER win11 AS cnt11, "
    "CAST(SUM(rev_s) OVER win11 AS BIGINT) AS sum11, "
    "LAG(rev_s, 6) OVER wino AS lag6, "
    "LEAD(rev_s, 6) OVER wino AS lead6 "
    "FROM m WINDOW wino AS (PARTITION BY priority ORDER BY mon), "
    "win11 AS (PARTITION BY priority ORDER BY mon "
    "ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)), "
    "t AS (SELECT priority, mon, rev_s, MONTH(mon) AS moy, "
    "2 * sum11 + lag6 + lead6 AS t24, "
    "24 * rev_s - (2 * sum11 + lag6 + lead6) AS d24 "
    "FROM w WHERE cnt11 = 11 AND lag6 IS NOT NULL "
    "AND lead6 IS NOT NULL), "
    "s AS (SELECT priority, moy, CAST(SUM(d24) AS BIGINT) AS sum_d, "
    "COUNT(*) AS cnt FROM t GROUP BY 1, 2), "
    "sm AS (SELECT priority, moy, CASE WHEN sum_d >= 0 "
    "THEN (2 * abs(25 * sum_d) + 6 * cnt) // (12 * cnt) "
    "ELSE -((2 * abs(25 * sum_d) + 6 * cnt) // (12 * cnt)) END "
    "AS s_micro FROM s), "
    "sc AS (SELECT priority, moy, s_micro, "
    "COUNT(*) OVER (PARTITION BY priority) AS n_moy, "
    "CAST(SUM(s_micro) OVER (PARTITION BY priority) AS BIGINT) "
    "AS tot_micro FROM sm) "
    "SELECT t.priority, t.mon, "
    "ROUND(CAST(t.rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(t.t24 AS DOUBLE) / 240000.0, 4) AS trend, "
    "ROUND(CAST(sc.n_moy * sc.s_micro - sc.tot_micro AS DOUBLE) "
    "/ (sc.n_moy * 1000000.0), 6) AS seasonal, "
    "ROUND(CAST(t.d24 AS DOUBLE) / 240000.0 "
    "- ROUND(CAST(sc.n_moy * sc.s_micro - sc.tot_micro AS DOUBLE) "
    "/ (sc.n_moy * 1000000.0), 6), 6) AS residual "
    "FROM t JOIN sc ON t.priority = sc.priority AND t.moy = sc.moy "
    "ORDER BY 1, 2"
)


ACF_MAX_LAG = 12


def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **sample autocorrelation function** (Box & Jenkins
    1970, §2.1; the correlogram) of the monthly per-priority revenue
    series at lags 1..12, with the ±1.96/√n white-noise band — the
    diagnostic an analyst runs on exactly the reference's kind of
    monthly macro series before fitting anything (the reference's own
    `pct_change` in `dashboard_nfp.py:152` is the lag-1 special case
    of this machinery).

    Determinism: with y the scaled-int64 monthly revenue and
    z_t = n·y_t − Σy (the mean-centering cleared of its /n), the
    textbook r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)² equals
    Σ z_t·z_{t−k} / Σ z_t² — the n² cancels — so numerator and
    denominator are EXACT integer sums (z products as decimal in
    Spark ≡ HUGEINT in DuckDB; order-independent), and each emitted
    double is one division of two exact values, `dround`ed at 6 dp.

    Scale: the corpus-sized work is the monthly rollup (map-side
    partial over orders); everything after runs on the ~80-row-per-key
    monthly aggregate — the lag pairing is a per-key range self-join
    with fan-out ≤ 12 rows per month, the collapse-first discipline of
    CLAUDE.md rule 5. Series count scales out; series length stays
    bounded by the monthly grain.

    vs reference: extends `dashboard_nfp.py:152`'s lag-1 MoM change to
    the full correlogram; no other analogue.
    """
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wp = Window.partitionBy("priority")
    wo = Window.partitionBy("priority").orderBy("mon")
    # z = n*y - S is exact in int64 (|z| < 2n·max(rev_s)); the decimal
    # cast widens BEFORE the products, whose magnitudes (~1e31 at 100x)
    # need 128-bit — decimal(18,0)^2 -> decimal(37,0), sums at 38
    z = m.select(
        "priority",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wo).alias("rn"),
        (F.count(F.lit(1)).over(wp) * F.col("rev_s") - F.sum("rev_s").over(wp))
        .cast("decimal(18,0)")
        .alias("z"),
    )
    den = z.groupBy("priority", "n").agg(
        F.sum(F.col("z") * F.col("z")).alias("den")
    )
    a, b = z.alias("a"), z.alias("b")
    num = (
        a.join(
            b,
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.rn") - F.col("b.rn")).between(1, ACF_MAX_LAG),
        )
        .groupBy(
            F.col("a.priority").alias("priority"),
            (F.col("a.rn") - F.col("b.rn")).cast("int").alias("lag_k"),
        )
        .agg(F.sum(F.col("a.z") * F.col("b.z")).alias("num"))
    )
    return (
        num.join(den, "priority")
        .select(
            "priority",
            "lag_k",
            dround(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
            dround(F.lit(1.96) / F.sqrt(F.col("n").cast("double")), 6).alias(
                "ci95"
            ),
        )
        .orderBy("priority", "lag_k")
    )


QUERIES["timeseries_acf"] = timeseries_acf

ORACLE["timeseries_acf"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    # SUM(bigint) OVER is HUGEINT in DuckDB, so z is 128-bit exact here
    # just as the decimal(18,0) cast makes it in Spark
    "z AS (SELECT priority, "
    "COUNT(*) OVER (PARTITION BY priority) AS n, "
    "ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS rn, "
    "CAST(COUNT(*) OVER (PARTITION BY priority) AS HUGEINT) * rev_s "
    "- SUM(rev_s) OVER (PARTITION BY priority) AS z "
    "FROM m), "
    "den AS (SELECT priority, MAX(n) AS n, SUM(z * z) AS den "
    "FROM z GROUP BY 1), "
    "num AS (SELECT a.priority, CAST(a.rn - b.rn AS INT) AS lag_k, "
    "SUM(a.z * b.z) AS num FROM z a JOIN z b "
    f"ON a.priority = b.priority AND a.rn - b.rn BETWEEN 1 AND {ACF_MAX_LAG} "
    "GROUP BY 1, 2) "
    "SELECT num.priority, lag_k, "
    "ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf, "
    "ROUND(1.96 / sqrt(CAST(den.n AS DOUBLE)), 6) AS ci95 "
    "FROM num JOIN den ON num.priority = den.priority ORDER BY 1, 2"
)


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **sequence-pattern matching** over the per-user event
    stream: find every contiguous run matching ``view (click)* purchase``
    in the user's (ts, event_id)-ordered sequence — the
    MATCH_RECOGNIZE / CEP capability (SQL:2016 row-pattern recognition;
    Flink CEP's bread-and-butter) expressed as pure window functions.

    The device is the **last-non-matching-anchor**: for every event,
    carry (a) the sequence number and (b) the type/timestamp of the most
    recent NON-click event strictly before it — a conditional running
    ``max`` plus two ignore-nulls ``last`` frames. A ``purchase`` whose
    last non-click predecessor is a ``view`` closes exactly one maximal
    ``view click* purchase`` run, with ``n_clicks = seq gap - 1``; runs
    interrupted by any other event type never match, runs sharing the
    same view anchor cannot occur (the purchase itself is non-click and
    re-anchors). Each match is emitted once with its anchor timestamps —
    no regex over concatenated symbols, no self-join, no per-row UDF.

    Scale: ONE exchange by user (the ``sessionize_batch`` shape — the
    row_number and the three anchor frames share the same partition+sort,
    so Catalyst plans a single sort with stacked Window operators); the
    filter is post-window, everything stays in whole-stage codegen. At
    100 TB hot users AQE-skew-split exactly as sessionize does.

    vs reference: no analogue — the reference's only sequence device is
    lag-1 pct_change (`dashboard_nfp.py:152`); this is the general
    ordered-pattern extension of the same window machinery.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    return _pattern_match_events(ev)


def _pattern_match_events(ev: DataFrame) -> DataFrame:
    """The view-click*-purchase window stack over a 5-column events frame
    — shared verbatim by the flat-scan operator above and the
    user-bucketed `layout.events_pattern_match_clustered` (layout is
    physical, never semantic: byte-identical output, one oracle)."""
    # Encode event_type to a TINYINT before the exchange: the output
    # carries no strings (only "is click / is view / is purchase"
    # decisions survive), and the 10-100x profile shows the user_id
    # shuffle+sort IS the query (~2.4 of 3.4 s at 100x) — dropping the
    # variable-length string from every shuffled row narrows the
    # UnsafeRow payload ~25% for free. Catalyst keeps this projection
    # below the exchange (round-14, VERDICT r13 item 3).
    ev = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0))
        .when(F.col("event_type") == "view", F.lit(1))
        .when(F.col("event_type") == "purchase", F.lit(2))
        .otherwise(F.lit(3))
        .cast("tinyint")
        .alias("etype"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # project seq BEFORE the anchor frames reference it (rule 3)
    seqd = ev.select(
        "user_id",
        "ts",
        "event_id",
        "etype",
        "value",
        F.row_number().over(w).alias("seq"),
    )
    # the anchor frames order by (ts, event_id) — the SAME ordering seq
    # was numbered over — not by seq: ordering by the derived column
    # made Catalyst re-sort every partition between the two Window
    # operators (row 13: sort-count 3 → 2 in the flat plan, and off the
    # (user_id, ts, event_id)-sorted bucketed layout the whole pre-window
    # sort pipeline vanishes). ROWS BETWEEN frames care only about row
    # positions, which are identical under either key.
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # ONE ignore-nulls `last` over a struct replaces the former
    # max(seq) + last(type) + last(ts) trio: seq is monotone within the
    # frame, so the max non-click seq IS the last non-click row's seq —
    # one window-buffer function evaluation instead of three over the
    # same ROWS frame (round-14, VERDICT r13 item 3).
    nc_struct = F.last(
        F.when(
            F.col("etype") != 0,
            F.struct(
                F.col("seq").alias("seq"),
                F.col("etype").alias("etype"),
                F.col("ts").alias("ts"),
            ),
        ),
        ignorenulls=True,
    ).over(wf)
    # alias the struct ONCE and split fields in a FOLLOWING select:
    # three inline .getField calls each extract their own copy of the
    # window expression (last(_w0)/last(_w1)/last(_w2) — verified in the
    # optimized plan), while a single aliased column plans exactly one.
    anchored = seqd.select(
        "user_id",
        "ts",
        "event_id",
        "etype",
        "value",
        "seq",
        nc_struct.alias("nc"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        "etype",
        "value",
        "seq",
        F.col("nc.seq").alias("nc_seq"),
        F.col("nc.etype").alias("nc_type"),
        F.col("nc.ts").alias("nc_ts"),
    )
    return (
        anchored.filter((F.col("etype") == 2) & (F.col("nc_type") == 1))
        .select(
            "user_id",
            F.col("nc_ts").alias("view_ts"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            (F.col("seq") - F.col("nc_seq") - 1).cast("int").alias("n_clicks"),
            F.col("value").alias("purchase_value"),
        )
        .orderBy("user_id", "purchase_ts", "purchase_event_id")
    )


QUERIES["events_pattern_match"] = events_pattern_match

ORACLE["events_pattern_match"] = (
    "WITH s1 AS (SELECT user_id, ts, event_id, event_type, value, "
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq "
    "FROM events), "
    "s2 AS (SELECT user_id, ts, event_id, event_type, value, seq, "
    "MAX(CASE WHEN event_type <> 'click' THEN seq END) OVER wf AS nc_seq, "
    "LAST_VALUE(CASE WHEN event_type <> 'click' THEN event_type END "
    "IGNORE NULLS) OVER wf AS nc_type, "
    "LAST_VALUE(CASE WHEN event_type <> 'click' THEN ts END "
    "IGNORE NULLS) OVER wf AS nc_ts "
    "FROM s1 WINDOW wf AS (PARTITION BY user_id ORDER BY seq "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
    "SELECT user_id, nc_ts AS view_ts, ts AS purchase_ts, "
    "event_id AS purchase_event_id, "
    "CAST(seq - nc_seq - 1 AS INT) AS n_clicks, "
    "value AS purchase_value "
    "FROM s2 WHERE event_type = 'purchase' AND nc_type = 'view' "
    "ORDER BY user_id, purchase_ts, purchase_event_id"
)


def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **Theil-Sen robust trend** per priority (Theil 1950;
    Sen, JASA 1968): slope = MEDIAN of all pairwise slopes
    ``(y_j − y_i)/(x_j − x_i)``, intercept = median of per-point
    ``y_i − slope·x_i`` — the outlier-resistant companion of
    `agg_linear_trend`'s OLS (one wild month moves OLS arbitrarily;
    Theil-Sen has a 29.3% breakdown point).

    Same series conventions as the OLS twin: x = exact month index
    centered on Jan 1995, y = scaled-int64 monthly revenue. The
    pairwise self-join is per-series with MONTHLY grain, so fan-out is
    bounded (~84 months → ~3.5k pairs per key) no matter how many
    fact rows feed the rollup — pairwise generation happens strictly
    AFTER the aggregate, which is the only reason an O(n²) estimator
    is sane at 100 TB (n is series length, not row count). Each pair
    slope is one double division of exact integer differences —
    bit-identical across engines — and the median is the same linear
    interpolation `agg_percentiles` already proves equivalent
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            - F.lit(1995 * 12)
        ).alias("x"),
    ).agg(dsum_scaled("o_totalprice").alias("y"))
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.priority") == F.col("b.priority"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.priority").alias("priority"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("s"),
    )
    sl = slopes.groupBy("priority").agg(
        F.percentile("s", F.lit(0.5)).alias("slope_scaled"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    resid = monthly.join(F.broadcast(sl), "priority").select(
        "priority",
        "n_pairs",
        "slope_scaled",
        (
            (
                F.col("y").cast("double")
                - F.col("slope_scaled") * F.col("x").cast("double")
            )
            / 10_000.0
        ).alias("r"),
    )
    return (
        resid.groupBy("priority", "n_pairs", "slope_scaled")
        .agg(F.percentile("r", F.lit(0.5)).alias("icpt"))
        .select(
            "priority",
            F.round(F.col("slope_scaled") / 10_000.0, 6).alias("ts_slope"),
            F.round("icpt", 4).alias("ts_intercept"),
            "n_pairs",
        )
        .orderBy("priority")
    )


QUERIES["agg_theil_sen_trend"] = agg_theil_sen_trend

ORACLE["agg_theil_sen_trend"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "year(o_orderdate) * 12 + month(o_orderdate) - 1 - (1995 * 12) AS x, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) AS y "
    "FROM orders GROUP BY 1, 2), "
    "p AS (SELECT a.priority, "
    "CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s "
    "FROM m a JOIN m b ON a.priority = b.priority AND a.x < b.x), "
    "sl AS (SELECT priority, quantile_cont(s, 0.5) AS slope_scaled, "
    "CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1), "
    "r AS (SELECT m.priority, sl.n_pairs, sl.slope_scaled, "
    "(CAST(m.y AS DOUBLE) - sl.slope_scaled * CAST(m.x AS DOUBLE)) "
    "/ 10000.0 AS r FROM m JOIN sl ON sl.priority = m.priority) "
    "SELECT priority, ROUND(slope_scaled / 10000.0, 6) AS ts_slope, "
    "ROUND(quantile_cont(r, 0.5), 4) AS ts_intercept, n_pairs "
    "FROM r GROUP BY priority, n_pairs, slope_scaled ORDER BY priority"
)


def dq_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **robust outlier detection by Median Absolute
    Deviation** per event type (Hampel 1974; the 1.4826 consistency
    constant makes MAD a σ estimate under normality): flag values with
    ``|x − median| > 3 · 1.4826 · MAD`` — the robust companion of
    `dq_anomaly_zscore`, whose mean/stddev are themselves dragged by
    the outliers they're meant to find (masking); the median/MAD pair
    has a 50% breakdown point.

    Two grouped exact medians (value, then absolute deviation) with the
    per-type medians broadcast back between them — at 100 TB exact
    medians per group become `approx_percentile` sketches (the
    documented KLL path of `agg_approx_percentiles`); the flagging
    comparison is identical either way. Medians interpolate identically
    across engines (`agg_percentiles` precedent); the threshold compare
    runs on the same doubles both engines derive, so the counts are
    exact — no rounding anywhere until the emitted rate."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = ev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        "n",
        (
            F.abs(F.col("value") - F.col("med"))
            > F.lit(3.0) * (F.lit(1.4826) * F.col("mad"))
        ).cast("int").alias("is_out"),
    )
    return (
        flagged.groupBy("event_type", "med", "mad", "n")
        .agg(F.sum("is_out").alias("n_outliers"))
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
            "n",
            dround(F.col("n_outliers") / F.col("n"), 6).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


QUERIES["dq_anomaly_mad"] = dq_anomaly_mad

ORACLE["dq_anomaly_mad"] = (
    "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med "
    "FROM events GROUP BY 1), "
    "mad AS (SELECT e.event_type, med.med, "
    "quantile_cont(abs(e.value - med.med), 0.5) AS mad, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events e JOIN med ON med.event_type = e.event_type "
    "GROUP BY 1, 2), "
    "f AS (SELECT e.event_type, mad.med, mad.mad, mad.n, "
    "CASE WHEN abs(e.value - mad.med) > 3.0 * (1.4826 * mad.mad) "
    "THEN 1 ELSE 0 END AS is_out "
    "FROM events e JOIN mad ON mad.event_type = e.event_type) "
    "SELECT event_type, ROUND(med, 4) AS med, ROUND(mad, 4) AS mad, "
    "CAST(SUM(is_out) AS BIGINT) AS n_outliers, n, "
    "ROUND(CAST(SUM(is_out) AS DOUBLE) / CAST(n AS DOUBLE), 6) "
    "AS outlier_rate "
    "FROM f GROUP BY event_type, med, mad, n ORDER BY event_type"
)


MEDIAN_WIN = 2  # centered 5-month window: ROWS BETWEEN -2 AND +2


def timeseries_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **running-median smoothing** (Tukey, EDA 1977 §7:
    median smoothers resist the outliers a moving AVERAGE smears) of the
    monthly per-priority revenue series: the centered 5-month median,
    plus the residual against it — the robust companion of
    `window_moving_stats`' trailing mean and the smoothing primitive
    `dq_anomaly_mad`'s Hampel filter builds on.

    Determinism: the series values are scaled int64 (`dsum_scaled`), so
    the window median is either an exact integer (odd frame) or the
    midpoint of two integers (edge frames with even count) — Spark
    ``percentile(x, 0.5)`` ≡ DuckDB ``quantile_cont(x, 0.5)`` linear
    interpolation, the equivalence `agg_percentiles` already pins, with
    every interpolation here a /2 of exact ints (exact in binary FP).

    Scale: one shuffle for the monthly rollup, one window exchange per
    series key; frame length is constant so the median costs O(w log w)
    per row on a bounded w=5. Series count scales out."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w5 = (
        Window.partitionBy("priority")
        .orderBy("mon")
        .rowsBetween(-MEDIAN_WIN, MEDIAN_WIN)
    )
    med = F.expr("percentile(rev_s, 0.5)")
    smoothed = m.select(
        "priority",
        "mon",
        "rev_s",
        med.over(w5).alias("med_s"),
    )
    return smoothed.select(
        "priority",
        "mon",
        F.round(F.col("rev_s").cast("double") / 10_000.0, 4).alias(
            "revenue"
        ),
        dround(F.col("med_s") / 10_000.0, 4).alias("median5"),
        dround(
            (F.col("rev_s").cast("double") - F.col("med_s")) / 10_000.0, 4
        ).alias("residual"),
    ).orderBy("priority", "mon")


QUERIES["timeseries_moving_median"] = timeseries_moving_median

ORACLE["timeseries_moving_median"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "s AS (SELECT priority, mon, rev_s, "
    "quantile_cont(rev_s, 0.5) OVER (PARTITION BY priority ORDER BY mon "
    f"ROWS BETWEEN {MEDIAN_WIN} PRECEDING AND {MEDIAN_WIN} FOLLOWING) "
    "AS med_s FROM m) "
    "SELECT priority, mon, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(med_s / 10000.0, 4) AS median5, "
    "ROUND((CAST(rev_s AS DOUBLE) - med_s) / 10000.0, 4) AS residual "
    "FROM s ORDER BY 1, 2"
)


MASE_H = 12  # holdout length (months) and the seasonal period


def timeseries_seasonal_naive_mase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """North-star — **forecast backtest: seasonal-naive + MASE**
    (Hyndman & Koehler, IJF 2006 — the scale-free forecast-accuracy
    measure): hold out each priority's last 12 months, forecast every
    held-out month with the seasonal-naive rule ŷ_t = y_{t−12}, and
    score MASE = (test MAE) / (train MAE of the same seasonal-naive) —
    the standard "is the model better than the naive?" gate, and the
    natural next step after the reference's trend/MoM analytics
    (`dashboard_nfp.py` §trends) toward forecasting.

    Determinism: y is scaled int64 (`dsum_scaled`), so each absolute
    error is an exact integer and MASE = (Σ|e_test|·n_train) /
    (Σ|e_train|·n_test) is one double division of two exact int64
    products, `dround`ed at 6 dp; the test MAE is the exact integer sum
    divided by (n_test·1e4). Guard: priorities whose history is too
    short for a 12-lag train error drop out in BOTH engines (n_train
    errors counted AFTER the lag, identically).

    Scale: the corpus-sized work is the monthly rollup; the backtest is
    two window functions and one aggregate on the ~80-row-per-key
    series. Series count scales out (CLAUDE.md rule 5)."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wo = Window.partitionBy("priority").orderBy("mon")
    wd = Window.partitionBy("priority").orderBy(F.col("mon").desc())
    lagged = m.select(
        "priority",
        "rev_s",
        F.lag("rev_s", MASE_H).over(wo).alias("base"),
        F.row_number().over(wd).alias("rn_desc"),
    ).filter(F.col("base").isNotNull())
    err = lagged.select(
        "priority",
        (F.col("rn_desc") <= MASE_H).alias("is_test"),
        F.abs(F.col("rev_s") - F.col("base")).alias("ae"),
    )
    agg = err.groupBy("priority").agg(
        F.sum(F.when(F.col("is_test"), F.col("ae"))).alias("sum_test"),
        F.count(F.when(F.col("is_test"), F.lit(1))).alias("n_test"),
        F.sum(F.when(~F.col("is_test"), F.col("ae"))).alias("sum_train"),
        F.count(F.when(~F.col("is_test"), F.lit(1))).alias("n_train"),
    )
    return (
        agg.filter((F.col("n_train") > 0) & (F.col("n_test") > 0))
        .select(
            "priority",
            F.col("n_train").cast("int").alias("n_train"),
            F.col("n_test").cast("int").alias("n_test"),
            dround(
                F.col("sum_test").cast("double")
                / (F.col("n_test") * 10_000.0),
                4,
            ).alias("mae_test"),
            dround(
                (F.col("sum_test") * F.col("n_train")).cast("double")
                / (F.col("sum_train") * F.col("n_test")).cast("double"),
                6,
            ).alias("mase"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_seasonal_naive_mase"] = timeseries_seasonal_naive_mase

ORACLE["timeseries_seasonal_naive_mase"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "lagged AS (SELECT priority, rev_s, "
    f"LAG(rev_s, {MASE_H}) OVER (PARTITION BY priority ORDER BY mon) "
    "AS base, ROW_NUMBER() OVER (PARTITION BY priority "
    "ORDER BY mon DESC) AS rn_desc FROM m), "
    "err AS (SELECT priority, "
    f"rn_desc <= {MASE_H} AS is_test, abs(rev_s - base) AS ae "
    "FROM lagged WHERE base IS NOT NULL), "
    "agg AS (SELECT priority, "
    "CAST(SUM(CASE WHEN is_test THEN ae END) AS BIGINT) AS sum_test, "
    "CAST(COUNT(CASE WHEN is_test THEN 1 END) AS BIGINT) AS n_test, "
    "CAST(SUM(CASE WHEN NOT is_test THEN ae END) AS BIGINT) AS sum_train, "
    "CAST(COUNT(CASE WHEN NOT is_test THEN 1 END) AS BIGINT) AS n_train "
    "FROM err GROUP BY 1) "
    "SELECT priority, CAST(n_train AS INT) AS n_train, "
    "CAST(n_test AS INT) AS n_test, "
    "ROUND(CAST(sum_test AS DOUBLE) / (n_test * 10000.0), 4) AS mae_test, "
    "ROUND(CAST(sum_test * n_train AS DOUBLE) "
    "/ CAST(sum_train * n_test AS DOUBLE), 6) AS mase "
    "FROM agg WHERE n_train > 0 AND n_test > 0 ORDER BY 1"
)


# --- Gaps-and-islands: consecutive growth streaks ----------------------------

STREAK_MIN = 2  # report islands of >= 2 consecutive up-months


def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic **gaps-and-islands**: maximal runs of consecutive months
    with month-over-month revenue GROWTH per priority, via the canonical
    row_number-difference device (rn over all months minus rn over
    up-months is constant within an island). The OLAP twin of the
    reference's MoM growth question (`dashboard_nfp.py` "which months
    grew?") asked at streak granularity — "how LONG did growth runs
    last, and how much did each run add?".

    Determinism: the series is scaled int64 (`dsum_scaled`); the up flag
    compares exact integers; island keys are integer differences; gains
    are exact integer sums descaled once (`dround` 4 dp). First month of
    each series has no base month and is never an up-month in either
    engine (NULL base filtered identically). Island starts are unique
    per priority, so ORDER BY (priority, streak_start) is total.

    Scale: one corpus-sized shuffle for the monthly rollup, then two
    stacked windows over the SAME (priority, mon) sort — one exchange,
    one sort (CLAUDE.md rule 5: later frames order by the original key,
    never a derived alias)."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w = Window.partitionBy("priority").orderBy("mon")
    flagged = m.select(
        "priority",
        "mon",
        "rev_s",
        F.lag("rev_s").over(w).alias("base"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("base").isNotNull() & (F.col("rev_s") > F.col("base")))
    w_up = Window.partitionBy("priority").orderBy("mon")
    grouped = flagged.select(
        "priority",
        "mon",
        (F.col("rev_s") - F.col("base")).alias("gain_s"),
        (F.col("rn") - F.row_number().over(w_up)).alias("grp"),
    )
    return (
        grouped.groupBy("priority", "grp")
        .agg(
            F.min("mon").alias("streak_start"),
            F.max("mon").alias("streak_end"),
            F.count(F.lit(1)).alias("months_up"),
            F.sum("gain_s").alias("gain_sum"),
        )
        .filter(F.col("months_up") >= STREAK_MIN)
        .select(
            "priority",
            "streak_start",
            "streak_end",
            F.col("months_up").cast("int").alias("months_up"),
            F.round(F.col("gain_sum") / 10_000.0, 4).alias("total_gain"),
        )
        .orderBy("priority", "streak_start")
    )


QUERIES["window_gaps_islands"] = window_gaps_islands

ORACLE["window_gaps_islands"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "f AS (SELECT priority, mon, rev_s, "
    "LAG(rev_s) OVER (PARTITION BY priority ORDER BY mon) AS base, "
    "ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS rn "
    "FROM m), "
    "u AS (SELECT priority, mon, rev_s - base AS gain_s, "
    "rn - ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS grp "
    "FROM f WHERE base IS NOT NULL AND rev_s > base), "
    "g AS (SELECT priority, grp, MIN(mon) AS streak_start, "
    "MAX(mon) AS streak_end, CAST(COUNT(*) AS BIGINT) AS months_up, "
    "CAST(SUM(gain_s) AS BIGINT) AS gain_sum FROM u GROUP BY 1, 2) "
    "SELECT priority, streak_start, streak_end, "
    "CAST(months_up AS INT) AS months_up, "
    "ROUND(CAST(gain_sum AS DOUBLE) / 10000.0, 4) AS total_gain "
    f"FROM g WHERE months_up >= {STREAK_MIN} "
    "ORDER BY priority, streak_start"
)


# --- Periodogram: exact-integer DFT power at candidate seasonal periods ------

# cos/sin basis values at 2*pi*k/P, scaled by 1e6 and DEFINED as these
# integer literals in BOTH engines (the only irrational ones are
# +/-sqrt(3)/2 ~ +/-0.866025): the basis is part of the operator's
# contract, so no cross-engine trig ULP can enter.
PGRAM_BASIS = [
    (3, [1000000, -500000, -500000], [0, 866025, -866025]),
    (4, [1000000, 0, -1000000, 0], [0, 1000000, 0, -1000000]),
    (
        6,
        [1000000, 500000, -500000, -1000000, -500000, 500000],
        [0, 866025, 866025, 0, -866025, -866025],
    ),
    (
        12,
        [1000000, 866025, 500000, 0, -500000, -866025,
         -1000000, -866025, -500000, 0, 500000, 866025],
        [0, 500000, 866025, 1000000, 866025, 500000,
         0, -500000, -866025, -1000000, -866025, -500000],
    ),
]


def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Seasonality detection via a single-frequency DFT periodogram**
    (Schuster 1898; the harmonic-regression identity: the squared DFT
    coefficient at period P is the least-squares fit of a P-periodic
    sinusoid): project the de-meaned monthly revenue series onto the
    cos/sin pair at candidate periods {3, 4, 6, 12} months and report
    each period's fitted amplitude and share of variance explained —
    the quantitative answer to the reference's seasonality question
    (`dashboard_nfp.py` "is there a seasonal pattern?") that
    `timeseries_acf` answers in lag space.

    Determinism: y is scaled int64; de-meaning multiplies through by n
    (yc = n*y_t - S, exact); the basis is the PGRAM_BASIS integer table
    (see above); weighted sums run in DECIMAL(38,0) (Spark) == HUGEINT
    (DuckDB) — exact integers — and only the final amplitude/share
    arithmetic touches doubles: cast-from-exact-integer, two squares,
    one add, sqrt (IEEE correctly-rounded), fixed-shape quotients,
    `dround`. Identical expression shape in both engines.

    Scale: ONE corpus-sized shuffle (the monthly rollup); everything
    after runs on the ~n_months-row series (x4 periods after the basis
    explode). The scalar (S, n) rides a broadcast cross join."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w = Window.partitionBy().orderBy("mon")
    idx = m.select(F.row_number().over(w).alias("t"), "rev_s")
    tot = idx.agg(
        F.sum("rev_s").alias("s_tot"), F.count(F.lit(1)).alias("n")
    )
    centered = idx.crossJoin(F.broadcast(tot)).select(
        "t",
        "n",
        (
            F.col("rev_s").cast("decimal(38,0)") * F.col("n")
            - F.col("s_tot").cast("decimal(38,0)")
        ).alias("yc"),
    )
    basis = F.array(
        *[
            F.struct(
                F.lit(p).alias("period"),
                F.lit(cs).alias("cosv"),
                F.lit(ss).alias("sinv"),
            )
            for p, cs, ss in PGRAM_BASIS
        ]
    )
    pos = ((F.col("t") - 1) % F.col("period") + 1).cast("int")
    expanded = (
        centered.select("t", "n", "yc", F.explode(basis).alias("p"))
        .select(
            "t",
            "n",
            "yc",
            F.col("p.period").alias("period"),
            F.col("p.cosv").alias("cosv"),
            F.col("p.sinv").alias("sinv"),
        )
        .select(
            "n",
            "period",
            (F.col("yc") * F.element_at("cosv", pos)).alias("pc"),
            (F.col("yc") * F.element_at("sinv", pos)).alias("ps"),
            (F.col("yc") * F.col("yc")).alias("y2"),
        )
    )
    g = expanded.groupBy("period", "n").agg(
        F.sum("pc").alias("a_e"),
        F.sum("ps").alias("b_e"),
        F.sum("y2").alias("m2_e"),
    )
    a = F.col("a_e").cast("double")
    b = F.col("b_e").cast("double")
    m2 = F.col("m2_e").cast("double")
    n_d = F.col("n").cast("double")
    return g.select(
        "period",
        F.col("n").cast("int").alias("n_months"),
        dround(
            F.lit(2.0) * F.sqrt(a * a + b * b) / (n_d * n_d * F.lit(1e10)),
            4,
        ).alias("amp"),
        dround(
            F.lit(2.0) * (a * a + b * b) / (n_d * m2 * F.lit(1e12)), 6
        ).alias("var_share"),
    ).orderBy("period")


QUERIES["timeseries_periodogram"] = timeseries_periodogram


def _pgram_oracle_sql() -> str:
    values = ", ".join(
        f"({p}, {cs}, {ss})" for p, cs, ss in PGRAM_BASIS
    )
    return (
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
        "AS rev_s FROM orders GROUP BY 1), "
        "idx AS (SELECT ROW_NUMBER() OVER (ORDER BY mon) AS t, rev_s "
        "FROM m), "
        "tot AS (SELECT CAST(SUM(rev_s) AS HUGEINT) AS s_tot, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM idx), "
        "c AS (SELECT t, n, CAST(rev_s AS HUGEINT) * n - s_tot AS yc "
        "FROM idx, tot), "
        f"per(period, cosv, sinv) AS (VALUES {values}), "
        "e AS (SELECT n, period, "
        "yc * cosv[CAST((t - 1) % period + 1 AS INT)] AS pc, "
        "yc * sinv[CAST((t - 1) % period + 1 AS INT)] AS ps, "
        "yc * yc AS y2 FROM c, per), "
        "g AS (SELECT period, n, CAST(SUM(pc) AS DOUBLE) AS a, "
        "CAST(SUM(ps) AS DOUBLE) AS b, CAST(SUM(y2) AS DOUBLE) AS m2 "
        "FROM e GROUP BY 1, 2) "
        "SELECT period, CAST(n AS INT) AS n_months, "
        "ROUND(2.0 * sqrt(a * a + b * b) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e10), 4) AS amp, "
        "ROUND(2.0 * (a * a + b * b) "
        "/ (CAST(n AS DOUBLE) * m2 * 1e12), 6) AS var_share "
        "FROM g ORDER BY period"
    )


ORACLE["timeseries_periodogram"] = _pgram_oracle_sql()


# --- Ratio-to-report: share of total within a group ---------------------------


def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Ratio-to-report** (Oracle's RATIO_TO_REPORT, the classic BI
    "percent of total" column): each priority's share of its YEAR's
    revenue, plus its rank within the year — the one distribution
    window shape the rank family (`window_distribution_ranks`) didn't
    cover: a windowed SUM used as a denominator.

    Determinism: the numerator and the windowed denominator are the
    SAME exact scaled-int64 aggregate (`dsum_scaled`), so the share is
    one double division of exact integers per (year, priority) row,
    `dround`ed at 6 dp; rank breaks ties by priority (total order).

    Scale: one corpus-sized shuffle for the (year, priority) rollup;
    the share window runs over the ~35-row aggregate partitioned by
    year — the denominator never recomputes the fact scan."""
    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy(
        year_of("o_orderdate").alias("year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w_year = Window.partitionBy("year")
    w_rank = Window.partitionBy("year").orderBy(
        F.col("rev_s").desc(), "priority"
    )
    return per.select(
        "year",
        "priority",
        F.round(F.col("rev_s") / 10_000.0, 4).alias("revenue"),
        dround(
            F.col("rev_s").cast("double")
            / F.sum("rev_s").over(w_year).cast("double"),
            6,
        ).alias("share_of_year"),
        F.row_number().over(w_rank).cast("int").alias("rank_in_year"),
    ).orderBy("year", "priority")


QUERIES["window_share_of_total"] = window_share_of_total

ORACLE["window_share_of_total"] = (
    "WITH per AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
    "o_orderpriority AS priority, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2) "
    "SELECT year, priority, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(rev_s AS DOUBLE) / CAST(SUM(rev_s) "
    "OVER (PARTITION BY year) AS DOUBLE), 6) AS share_of_year, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY year "
    "ORDER BY rev_s DESC, priority) AS INT) AS rank_in_year "
    "FROM per ORDER BY year, priority"
)


# --- Wald–Wolfowitz runs test --------------------------------------------------


def timeseries_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Wald–Wolfowitz runs test** (Ann. Math. Stat. 1940) on the
    direction sequence of each priority's monthly revenue: are the
    up/down moves random, or do they cluster (trend/momentum) or
    alternate (mean-reversion)? The hypothesis-test companion of
    `timeseries_acf` (which measures the correlation; this tests the
    sign sequence) and the diagnostic a forecaster runs on
    `timeseries_seasonal_naive_mase`'s residual direction.

    R = observed runs, n1/n2 = up/down counts, and under H0:
    mu = 1 + 2*n1*n2/n, var = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n-1)),
    z = (R - mu)/sqrt(var). Zero-diff months are dropped (ties carry
    no direction) — identically in both engines.

    Determinism: signs compare exact scaled ints; R/n1/n2 are exact
    counts; mu/var are fixed-shape double expressions over small exact
    integers; one sqrt; `dround` 6. Groups without both signs or with
    var = 0 drop out on integer predicates in both engines.

    Scale: one corpus-sized rollup, then two stacked windows ordered by
    the original month key over ~80-row series, one aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w = Window.partitionBy("priority").orderBy("mon")
    signs = (
        m.select(
            "priority",
            "mon",
            (F.col("rev_s") - F.lag("rev_s").over(w)).alias("diff"),
        )
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select(
            "priority",
            "mon",
            F.when(F.col("diff") > 0, F.lit(1)).otherwise(F.lit(-1)).alias(
                "sign"
            ),
        )
    )
    w2 = Window.partitionBy("priority").orderBy("mon")
    runs = signs.select(
        "priority",
        "sign",
        F.when(F.lag("sign").over(w2).isNull(), F.lit(1))
        .when(F.lag("sign").over(w2) != F.col("sign"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = runs.groupBy("priority").agg(
        F.sum("new_run").alias("r_runs"),
        F.sum(F.when(F.col("sign") > 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_up"
        ),
        F.sum(F.when(F.col("sign") < 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_down"
        ),
    )
    n = F.col("n_up") + F.col("n_down")
    two_ab = F.lit(2) * F.col("n_up") * F.col("n_down")
    n_d = n.cast("double")
    mu = F.lit(1.0) + two_ab.cast("double") / n_d
    var = (two_ab * (two_ab - n)).cast("double") / (
        n_d * n_d * (n_d - F.lit(1.0))
    )
    return (
        agg.filter(
            (F.col("n_up") > 0)
            & (F.col("n_down") > 0)
            & (n > 2)
            & (two_ab * (two_ab - n) > 0)
        )
        .select(
            "priority",
            n.cast("int").alias("n_moves"),
            F.col("n_up").cast("int").alias("n_up"),
            F.col("n_down").cast("int").alias("n_down"),
            F.col("r_runs").cast("int").alias("runs"),
            dround(mu, 6).alias("expected_runs"),
            dround(
                (F.col("r_runs").cast("double") - mu) / F.sqrt(var), 6
            ).alias("z_score"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_runs_test"] = timeseries_runs_test

ORACLE["timeseries_runs_test"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "d AS (SELECT priority, mon, rev_s - LAG(rev_s) OVER ("
    "PARTITION BY priority ORDER BY mon) AS diff FROM m), "
    "sgn AS (SELECT priority, mon, "
    "CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sign "
    "FROM d WHERE diff IS NOT NULL AND diff <> 0), "
    "rn AS (SELECT priority, sign, "
    "CASE WHEN LAG(sign) OVER (PARTITION BY priority ORDER BY mon) "
    "IS NULL THEN 1 WHEN LAG(sign) OVER (PARTITION BY priority "
    "ORDER BY mon) <> sign THEN 1 ELSE 0 END AS new_run FROM sgn), "
    "a AS (SELECT priority, CAST(SUM(new_run) AS BIGINT) AS r_runs, "
    "CAST(SUM(CASE WHEN sign > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up, "
    "CAST(SUM(CASE WHEN sign < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down "
    "FROM rn GROUP BY 1) "
    "SELECT priority, "
    "CAST(n_up + n_down AS INT) AS n_moves, "
    "CAST(n_up AS INT) AS n_up, CAST(n_down AS INT) AS n_down, "
    "CAST(r_runs AS INT) AS runs, "
    "ROUND(1.0 + CAST(2 * n_up * n_down AS DOUBLE) "
    "/ CAST(n_up + n_down AS DOUBLE), 6) AS expected_runs, "
    "ROUND((CAST(r_runs AS DOUBLE) - (1.0 + "
    "CAST(2 * n_up * n_down AS DOUBLE) "
    "/ CAST(n_up + n_down AS DOUBLE))) "
    "/ sqrt(CAST((2 * n_up * n_down) * (2 * n_up * n_down "
    "- (n_up + n_down)) AS DOUBLE) / (CAST(n_up + n_down AS DOUBLE) "
    "* CAST(n_up + n_down AS DOUBLE) "
    "* (CAST(n_up + n_down AS DOUBLE) - 1.0))), 6) AS z_score "
    "FROM a WHERE n_up > 0 AND n_down > 0 AND n_up + n_down > 2 "
    "AND (2 * n_up * n_down) * (2 * n_up * n_down - (n_up + n_down)) > 0 "
    "ORDER BY priority"
)


# --- Ljung–Box portmanteau test ------------------------------------------------

LB_SCALE = 1_000_000_000_000  # 1e12: per-lag term quantization


def timeseries_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Ljung–Box portmanteau test** (Biometrika 1978): Q = n(n+2) ·
    Σ_{k=1..h} ρ_k²/(n−k) over the first h=12 autocorrelations of each
    priority's monthly revenue — the one-number "is there ANY serial
    correlation?" summary of `timeseries_acf`'s correlogram (compare Q
    to χ²(h); df is emitted, the critical value is the reader's table
    lookup).

    Determinism: ρ_k = num_k/den is a division of the ACF operator's
    exact 128-bit integer sums; the per-lag terms ρ_k²/(n−k) are each
    quantized to scaled int64 (×1e12, ties-away — `dsum_scaled`) so the
    cross-lag SUM is exact integer arithmetic, never an order-dependent
    float accumulation; Q is then one fixed-shape double expression.

    Scale: identical to `timeseries_acf` — corpus-sized work is the
    monthly rollup; the lag self-join fans out ≤ h rows per month."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wp = Window.partitionBy("priority")
    wo = Window.partitionBy("priority").orderBy("mon")
    z = m.select(
        "priority",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wo).alias("rn"),
        (
            F.count(F.lit(1)).over(wp) * F.col("rev_s")
            - F.sum("rev_s").over(wp)
        )
        .cast("decimal(18,0)")
        .alias("z"),
    )
    den = z.groupBy("priority", "n").agg(
        F.sum(F.col("z") * F.col("z")).alias("den")
    )
    a, b = z.alias("a"), z.alias("b")
    num = (
        a.join(
            b,
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.rn") - F.col("b.rn")).between(1, ACF_MAX_LAG),
        )
        .groupBy(
            F.col("a.priority").alias("priority"),
            (F.col("a.rn") - F.col("b.rn")).cast("int").alias("lag_k"),
        )
        .agg(F.sum(F.col("a.z") * F.col("b.z")).alias("num"))
    )
    rho = F.col("num").cast("double") / F.col("den").cast("double")
    term = rho * rho / (F.col("n") - F.col("lag_k")).cast("double")
    per = (
        num.join(den, "priority")
        .groupBy("priority", "n")
        .agg(
            dsum_scaled(term, LB_SCALE).alias("t_s"),
            F.count(F.lit(1)).alias("df"),
        )
    )
    return per.select(
        "priority",
        F.col("n").cast("int").alias("n_months"),
        F.col("df").cast("int").alias("df"),
        dround(
            (F.col("n") * (F.col("n") + F.lit(2))).cast("double")
            * F.col("t_s").cast("double")
            / F.lit(float(LB_SCALE)),
            6,
        ).alias("q_stat"),
    ).orderBy("priority")


QUERIES["timeseries_ljung_box"] = timeseries_ljung_box

ORACLE["timeseries_ljung_box"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "z AS (SELECT priority, "
    "COUNT(*) OVER (PARTITION BY priority) AS n, "
    "ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS rn, "
    "COUNT(*) OVER (PARTITION BY priority) * rev_s "
    "- SUM(rev_s) OVER (PARTITION BY priority) AS z FROM m), "
    "den AS (SELECT priority, n, SUM(z * z) AS den "
    "FROM z GROUP BY 1, 2), "
    "num AS (SELECT a.priority, CAST(a.rn - b.rn AS INT) AS lag_k, "
    "SUM(a.z * b.z) AS num FROM z a JOIN z b "
    f"ON a.priority = b.priority AND a.rn - b.rn BETWEEN 1 AND {ACF_MAX_LAG} "
    "GROUP BY 1, 2), "
    "per AS (SELECT num.priority, den.n, "
    "CAST(SUM(CAST(ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) "
    "* (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) "
    f"/ CAST(den.n - lag_k AS DOUBLE) * {LB_SCALE}) AS BIGINT)) "
    "AS BIGINT) AS t_s, "
    "CAST(COUNT(*) AS BIGINT) AS df "
    "FROM num JOIN den ON num.priority = den.priority GROUP BY 1, 2) "
    "SELECT priority, CAST(n AS INT) AS n_months, CAST(df AS INT) AS df, "
    "ROUND(CAST(n * (n + 2) AS DOUBLE) * CAST(t_s AS DOUBLE) "
    f"/ {float(LB_SCALE)}, 6) AS q_stat "
    "FROM per ORDER BY priority"
)


# --- Kaplan–Meier survival estimate --------------------------------------------

KM_LN_SCALE = 1_000_000_000_000  # 1e12: per-step ln(factor) quantization
KM_ZERO_SENTINEL = -(10**15)  # exp(cum/1e12) underflows to exactly 0.0
_US_PER_DAY = 86_400_000_000


def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Kaplan–Meier survival estimate** (JASA 1958) of time from a
    user's FIRST click to their FIRST subsequent purchase, with users
    who never purchase RIGHT-CENSORED at the fixture's horizon (the
    global max event time) — the correct treatment of the funnel
    question `agg_funnel_conversion` answers only for completed
    conversions (dropping non-converters biases time-to-convert low;
    censoring is the whole point of KM).

    Per distinct duration d (days): d_i = conversions at d, n_i = users
    still at risk (duration ≥ d, converted or censored), and
    S(d) = Π_{j ≤ d} (1 − d_j/n_j).

    Determinism: durations are exact int64 epoch-microsecond
    differences floor-divided to days (`epoch_micros_from_ntz`, rule
    6a — no tz-dependent casts); d_i/n_i/m_i are exact counts; the
    product runs as exp of a CUMULATIVE SUM of per-step ln factors
    each quantized to scaled int64 (×1e12 ties-away — the
    `corpus_entropy_by_source` convention: identical doubles into
    ln/exp on both engines, quantization absorbing any libm-vs-JVM
    ULP), so the running sum is exact integer arithmetic; a
    d_i = n_i step (everyone at risk converts) contributes the
    KM_ZERO_SENTINEL instead of ln(0), and exp then underflows to
    exactly 0.0 in both engines.

    Scale: two keyed aggregates over events (first click, first
    subsequent purchase — map-side combinable mins) + one LEFT join on
    user; the KM table itself is ~distinct-durations rows through two
    global windows (tiny by construction: durations are bounded by the
    fixture's day span)."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        epoch_micros_from_ntz(F.col("ts")).alias("us"),
    )
    t0 = (
        base.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    tmax = base.agg(F.max("us").alias("tmax"))
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("tp"))
    )
    cohort = (
        t0.join(p, "user_id", "left")
        .crossJoin(F.broadcast(tmax))
        .select(
            F.when(F.col("tp").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_event"),
            F.expr(
                f"(coalesce(tp, tmax) - t0) div {_US_PER_DAY}"
            ).alias("dur"),
        )
    )
    perd = cohort.groupBy("dur").agg(
        F.sum("is_event").alias("d_i"), F.count(F.lit(1)).alias("m_i")
    )
    w_risk = Window.partitionBy().orderBy(F.col("dur").desc())
    risk = perd.select(
        "dur", "d_i", "m_i", F.sum("m_i").over(w_risk).alias("n_i")
    )
    ln_f = F.log(
        (F.col("n_i") - F.col("d_i")).cast("double")
        / F.col("n_i").cast("double")
    )
    km = risk.filter(F.col("d_i") > 0).select(
        "dur",
        "d_i",
        "n_i",
        F.when(
            F.col("d_i") < F.col("n_i"),
            dround(ln_f * F.lit(float(KM_LN_SCALE)), 0).cast("long"),
        )
        .otherwise(F.lit(KM_ZERO_SENTINEL))
        .alias("ls"),
    )
    w_cum = Window.partitionBy().orderBy("dur")
    return (
        km.select(
            "dur",
            "d_i",
            "n_i",
            F.sum("ls").over(w_cum).alias("cum"),
        )
        .select(
            F.col("dur").alias("duration_days"),
            F.col("n_i").cast("long").alias("n_risk"),
            F.col("d_i").cast("long").alias("d_events"),
            dround(
                F.exp(
                    F.col("cum").cast("double")
                    / F.lit(float(KM_LN_SCALE))
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("duration_days")
    )


QUERIES["events_survival_km"] = events_survival_km

ORACLE["events_survival_km"] = (
    "WITH b AS (SELECT user_id, event_type, "
    "epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), "
    "t0 AS (SELECT user_id, MIN(us) AS t0 FROM b "
    "WHERE event_type = 'click' GROUP BY 1), "
    "tm AS (SELECT MAX(us) AS tmax FROM b), "
    "p AS (SELECT b.user_id, MIN(us) AS tp FROM b "
    "JOIN t0 ON t0.user_id = b.user_id "
    "WHERE event_type = 'purchase' AND us >= t0 GROUP BY 1), "
    "coh AS (SELECT CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END "
    "AS is_event, "
    f"CAST((COALESCE(tp, tmax) - t0) // {_US_PER_DAY} AS BIGINT) AS dur "
    "FROM t0 LEFT JOIN p ON p.user_id = t0.user_id, tm), "
    "perd AS (SELECT dur, CAST(SUM(is_event) AS BIGINT) AS d_i, "
    "CAST(COUNT(*) AS BIGINT) AS m_i FROM coh GROUP BY 1), "
    "r AS (SELECT dur, d_i, m_i, "
    "CAST(SUM(m_i) OVER (ORDER BY dur DESC) AS BIGINT) AS n_i "
    "FROM perd), "
    "km AS (SELECT dur, d_i, n_i, "
    "CASE WHEN d_i < n_i THEN "
    "CAST(ROUND(ln(CAST(n_i - d_i AS DOUBLE) / CAST(n_i AS DOUBLE)) "
    f"* {float(KM_LN_SCALE)}) AS BIGINT) "
    f"ELSE {KM_ZERO_SENTINEL} END AS ls "
    "FROM r WHERE d_i > 0), "
    "c AS (SELECT dur, d_i, n_i, "
    "CAST(SUM(ls) OVER (ORDER BY dur) AS BIGINT) AS cum FROM km) "
    "SELECT dur AS duration_days, n_i AS n_risk, d_i AS d_events, "
    f"ROUND(exp(CAST(cum AS DOUBLE) / {float(KM_LN_SCALE)}), 6) "
    "AS survival "
    "FROM c ORDER BY duration_days"
)


# --- Mann–Whitney U rank-sum test ----------------------------------------------

MW_GROUP_A = "1-URGENT"
MW_GROUP_B = "5-LOW"


def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Mann–Whitney U / Wilcoxon rank-sum test** (Ann. Math. Stat.
    1947): do URGENT and LOW orders draw from the same price
    distribution? The distribution-free two-sample test — the
    significance companion of `agg_percentiles`' descriptive contrast
    and the third member of the testing family (`timeseries_runs_test`,
    `timeseries_ljung_box`).

    Rank algebra kept EXACT by working in doubled units: with ties
    taking the average rank, 2·avgrank = 2·minrank + (t−1) is an exact
    integer (rank() gives minrank, a count window gives the tie size
    t), so the doubled rank sum R1d, U1d = R1d − n1(n1+1), and the tie
    correction T = Σ(t³−t) are all exact integers (DECIMAL(38,0) ≡
    HUGEINT for the cubes). The normal approximation
    z = (U1 − n1n2/2) / sqrt(n1n2/12 · ((n+1) − T/(n(n−1)))) is then
    one fixed-shape double expression; values are scaled-int prices so
    tie sets are identical across engines.

    Scale: one scan + one global rank window (the documented cost of
    exact global ranks; at 100 TB a range-partitioned sort — Spark's
    rank window already is one) + two exact aggregates."""
    orders = read_table(spark, sf_dir, "orders")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        dround(F.col("o_totalprice") * F.lit(10_000.0), 0)
        .cast("long")
        .alias("v"),
    )
    w_rank = Window.partitionBy().orderBy("v")
    w_tie = Window.partitionBy("v")
    ranked = both.select(
        "is_a",
        "v",
        F.rank().over(w_rank).alias("minrank"),
        F.count(F.lit(1)).over(w_tie).alias("t"),
    )
    agg = ranked.agg(
        F.sum(
            F.when(
                F.col("is_a"),
                F.lit(2) * F.col("minrank") + F.col("t") - F.lit(1),
            )
        ).alias("r1d"),
        F.sum(F.when(F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n1"
        ),
        F.sum(F.when(~F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n2"
        ),
    )
    # tie correction: one row per distinct value
    ties = (
        both.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t").cast("decimal(38,0)")
                * F.col("t")
                * F.col("t")
                - F.col("t")
            ).alias("t3t")
        )
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1d = F.col("r1d") - n1 * (n1 + F.lit(1))
    n_d = n.cast("double")
    var = (
        (n1 * n2).cast("double")
        / F.lit(12.0)
        * (
            (n + F.lit(1)).cast("double")
            - F.col("t3t").cast("double")
            / (n_d * (n_d - F.lit(1.0)))
        )
    )
    return (
        agg.crossJoin(F.broadcast(ties))
        .select(
            n1.cast("long").alias("n_urgent"),
            n2.cast("long").alias("n_low"),
            (u1d.cast("double") / F.lit(2.0)).alias("u_stat"),
            dround(
                (u1d - n1 * n2).cast("double")
                / (F.lit(2.0) * F.sqrt(var)),
                6,
            ).alias("z_score"),
        )
    )


QUERIES["agg_mann_whitney_u"] = agg_mann_whitney_u

ORACLE["agg_mann_whitney_u"] = (
    "WITH both_g AS (SELECT "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS v "
    f"FROM orders WHERE o_orderpriority IN ('{MW_GROUP_A}', "
    f"'{MW_GROUP_B}')), "
    "r AS (SELECT is_a, v, RANK() OVER (ORDER BY v) AS minrank, "
    "COUNT(*) OVER (PARTITION BY v) AS t FROM both_g), "
    "a AS (SELECT CAST(SUM(CASE WHEN is_a THEN 2 * minrank + t - 1 END) "
    "AS BIGINT) AS r1d, "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2 "
    "FROM r), "
    "ties AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) "
    "AS t3t FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t "
    "FROM both_g GROUP BY v)) "
    "SELECT n1 AS n_urgent, n2 AS n_low, "
    "CAST(r1d - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_stat, "
    "ROUND(CAST((r1d - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE) "
    "/ (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0 "
    "* (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(t3t AS DOUBLE) "
    "/ (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0))))), 6) "
    "AS z_score "
    "FROM a, ties"
)


# --- Chi-square test of independence --------------------------------------------

CHI2_SCALE = 1_000_000  # per-cell term quantization


def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Pearson χ² test of independence** (Pearson 1900) between order
    STATUS and PRIORITY — is the priority mix different across
    statuses? The categorical member of the testing family
    (`timeseries_runs_test`, `timeseries_ljung_box`,
    `agg_mann_whitney_u`) and the significance layer over
    `crosstab_status_priority`'s contingency table.

    Algebra kept exact: with O_ij the observed counts, r_i/c_j the
    margins and n the total, each cell's (O−E)²/E equals
    (n·O_ij − r_i·c_j)² / (n·r_i·c_j) — numerator and denominator are
    exact integers (DECIMAL(38,0) ≡ HUGEINT; the square reaches ~1e26
    at 100x); each cell's double quotient quantizes to scaled int64
    (×1e6 ties-away) so the cross-cell sum is exact integer arithmetic,
    and χ² is one descale. df = (R−1)(C−1) from exact distinct counts.

    Scale: one map-side-combinable count aggregate over orders; margins
    are two ~cardinality-row aggregates broadcast back; the cell
    algebra runs on the R×C frame."""
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_m = cells.groupBy("s").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("p").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("s").alias("nr"),
        F.countDistinct("p").alias("nc"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    joined = (
        cells.join(F.broadcast(rows_m), "s")
        .join(F.broadcast(cols_m), "p")
        .crossJoin(F.broadcast(tot))
    )
    dev = d(F.col("n")) * d(F.col("o")) - d(F.col("r")) * d(F.col("c"))
    term = (dev * dev).cast("double") / (
        d(F.col("n")) * d(F.col("r")) * d(F.col("c"))
    ).cast("double")
    return (
        joined.groupBy("n", "nr", "nc")
        .agg(dsum_scaled(term, CHI2_SCALE).alias("t_s"))
        .select(
            F.col("n").cast("long").alias("n_orders"),
            ((F.col("nr") - F.lit(1)) * (F.col("nc") - F.lit(1)))
            .cast("int")
            .alias("df"),
            dround(
                F.col("t_s").cast("double") / F.lit(float(CHI2_SCALE)), 6
            ).alias("chi2"),
        )
    )


QUERIES["agg_chi_square_independence"] = agg_chi_square_independence

ORACLE["agg_chi_square_independence"] = (
    "WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p, "
    "CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2), "
    "rm AS (SELECT s, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1), "
    "cm AS (SELECT p, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT s) AS BIGINT) AS nr, "
    "CAST(COUNT(DISTINCT p) AS BIGINT) AS nc FROM cells), "
    "t AS (SELECT n, nr, nc, "
    "CAST(SUM(CAST(ROUND((CAST((CAST(n AS HUGEINT) * o "
    "- CAST(r AS HUGEINT) * c) * (CAST(n AS HUGEINT) * o "
    "- CAST(r AS HUGEINT) * c) AS DOUBLE) "
    "/ CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE)) "
    f"* {CHI2_SCALE}) AS BIGINT)) AS BIGINT) AS t_s "
    "FROM cells JOIN rm USING (s) JOIN cm USING (p), tot "
    "GROUP BY 1, 2, 3) "
    "SELECT n AS n_orders, CAST((nr - 1) * (nc - 1) AS INT) AS df, "
    f"ROUND(CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}, 6) AS chi2 "
    "FROM t"
)


# --- Bollinger bands: rolling mean ± 2 rolling sd --------------------------------

BB_W = 6  # trailing window length (months)


def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Bollinger bands** (Bollinger 1992) over the monthly
    per-priority revenue: trailing 6-month mean ± 2 rolling standard
    deviations, plus an outside-the-bands flag — the volatility-
    normalized envelope `window_moving_stats`' plain min/max frame
    doesn't give (a breakout beyond 2σ is signal; beyond a fixed range
    is not), and the windowed sibling of `dq_anomaly_zscore`'s global
    z-score.

    Determinism: the series is scaled int64; the rolling second moment
    is exact per frame — M2 = w·Σv² − (Σv)² with Σv² in DECIMAL(38,0)
    ≡ HUGEINT (v² ~ 1e24 at sf0.1) and the frame width w a count
    window over the SAME frame — so sd = √M2/w is one IEEE sqrt of
    exact integers, and the band edges are fixed-shape arithmetic,
    `dround`ed at 4 dp. The outside flag compares exact ints to the
    rounded band (computed identically in both engines).

    Scale: one corpus-sized monthly rollup; one window exchange+sort
    per priority serves all five frame aggregates (same WindowSpec →
    single WindowExec)."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w6 = (
        Window.partitionBy("priority")
        .orderBy("mon")
        .rowsBetween(-(BB_W - 1), 0)
    )
    framed = m.select(
        "priority",
        "mon",
        "rev_s",
        F.count(F.lit(1)).over(w6).alias("w"),
        F.sum("rev_s").over(w6).alias("s1"),
        F.sum(F.col("rev_s").cast("decimal(38,0)") * F.col("rev_s"))
        .over(w6)
        .alias("s2"),
    )
    m2 = (
        F.col("w").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    w_d = F.col("w").cast("double")
    mid = F.col("s1").cast("double") / (w_d * F.lit(10_000.0))
    sd = F.sqrt(m2.cast("double")) / (w_d * F.lit(10_000.0))
    upper = mid + F.lit(2.0) * sd
    lower = mid - F.lit(2.0) * sd
    rev_d = F.col("rev_s").cast("double") / F.lit(10_000.0)
    return framed.select(
        "priority",
        "mon",
        F.round(F.col("rev_s") / 10_000.0, 4).alias("revenue"),
        dround(mid, 4).alias("mid"),
        dround(upper, 4).alias("upper_band"),
        dround(lower, 4).alias("lower_band"),
        F.when((rev_d > upper) | (rev_d < lower), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("outside"),
    ).orderBy("priority", "mon")


QUERIES["window_bollinger_bands"] = window_bollinger_bands

ORACLE["window_bollinger_bands"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "f AS (SELECT priority, mon, rev_s, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS w, "
    "CAST(SUM(rev_s) OVER w AS BIGINT) AS s1, "
    "CAST(SUM(CAST(rev_s AS HUGEINT) * rev_s) OVER w AS HUGEINT) AS s2 "
    "FROM m WINDOW w AS (PARTITION BY priority ORDER BY mon "
    f"ROWS BETWEEN {BB_W - 1} PRECEDING AND CURRENT ROW)) "
    "SELECT priority, mon, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(s1 AS DOUBLE) / (CAST(w AS DOUBLE) * 10000.0), 4) "
    "AS mid, "
    "ROUND(CAST(s1 AS DOUBLE) / (CAST(w AS DOUBLE) * 10000.0) "
    "+ 2.0 * (sqrt(CAST(CAST(w AS HUGEINT) * s2 "
    "- CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) "
    "/ (CAST(w AS DOUBLE) * 10000.0)), 4) AS upper_band, "
    "ROUND(CAST(s1 AS DOUBLE) / (CAST(w AS DOUBLE) * 10000.0) "
    "- 2.0 * (sqrt(CAST(CAST(w AS HUGEINT) * s2 "
    "- CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) "
    "/ (CAST(w AS DOUBLE) * 10000.0)), 4) AS lower_band, "
    "CAST(CASE WHEN CAST(rev_s AS DOUBLE) / 10000.0 "
    "> CAST(s1 AS DOUBLE) / (CAST(w AS DOUBLE) * 10000.0) "
    "+ 2.0 * (sqrt(CAST(CAST(w AS HUGEINT) * s2 "
    "- CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) "
    "/ (CAST(w AS DOUBLE) * 10000.0)) "
    "OR CAST(rev_s AS DOUBLE) / 10000.0 "
    "< CAST(s1 AS DOUBLE) / (CAST(w AS DOUBLE) * 10000.0) "
    "- 2.0 * (sqrt(CAST(CAST(w AS HUGEINT) * s2 "
    "- CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) "
    "/ (CAST(w AS DOUBLE) * 10000.0)) "
    "THEN 1 ELSE 0 END AS INT) AS outside "
    "FROM f ORDER BY priority, mon"
)


# --- Kruskal–Wallis H test ------------------------------------------------------

KW_SCALE = 10_000  # per-group term quantization (H error ~ 1e-8)


def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Kruskal–Wallis H test** (JASA 1952) across ALL five order
    priorities: the k-group generalization of `agg_mann_whitney_u` —
    one rank-based ANOVA answering "do any priorities price
    differently?" before pairwise tests.

    Same doubled-rank device as Mann–Whitney (2·avgrank = 2·minrank +
    t − 1, exact), then H = 12/(n(n+1)) · Σ R_i²/n_i − 3(n+1) with each
    group's R_i²/(4·n_i·n) quantized ×1e4 to int64 (the term divided by
    n BEFORE quantizing keeps it inside int64 at 100x; quantization
    error reaches H at ~12·5·0.5/(1e4·n·(n+1)) ≈ 1e-10 — identical in
    both engines regardless), the cross-group sum exact, and the tie
    correction 1 − Σ(t³−t)/(n³−n) in DECIMAL(38,0) ≡ HUGEINT.

    Scale: one scan + one global rank window + three exact aggregates
    (the `agg_mann_whitney_u` posture, k groups in one pass)."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        dround(F.col("o_totalprice") * F.lit(10_000.0), 0)
        .cast("long")
        .alias("v"),
    )
    w_rank = Window.partitionBy().orderBy("v")
    w_tie = Window.partitionBy("v")
    ranked = base.select(
        "grp",
        "v",
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).alias("dr"),
    )
    per_g = ranked.groupBy("grp").agg(
        F.sum("dr").alias("rd"), F.count(F.lit(1)).alias("ni")
    )
    tot = per_g.agg(
        F.sum("ni").alias("n"), F.count(F.lit(1)).alias("k")
    )
    term = (
        (F.col("rd").cast("decimal(38,0)") * F.col("rd")).cast("double")
        / (
            F.lit(4.0)
            * F.col("ni").cast("double")
            * F.col("n").cast("double")
        )
    )
    s = (
        per_g.crossJoin(F.broadcast(tot))
        .groupBy("n", "k")
        .agg(dsum_scaled(term, KW_SCALE).alias("s_q"))
    )
    ties = (
        base.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            ).alias("t3t")
        )
    )
    n_d = F.col("n").cast("double")
    h = (
        F.lit(12.0)
        * (F.col("s_q").cast("double") / F.lit(float(KW_SCALE)))
        / (n_d + F.lit(1.0))
        - F.lit(3.0) * (n_d + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("t3t").cast("double") / (
        n_d * n_d * n_d - n_d
    )
    return s.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("long").alias("n_orders"),
        (F.col("k") - F.lit(1)).cast("int").alias("df"),
        dround(h, 6).alias("h_stat"),
        dround(h / corr, 6).alias("h_corrected"),
    )


QUERIES["agg_kruskal_wallis"] = agg_kruskal_wallis

ORACLE["agg_kruskal_wallis"] = (
    "WITH base AS (SELECT o_orderpriority AS grp, "
    "CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS v FROM orders), "
    "r AS (SELECT grp, v, 2 * RANK() OVER (ORDER BY v) "
    "+ COUNT(*) OVER (PARTITION BY v) - 1 AS dr FROM base), "
    "pg AS (SELECT grp, CAST(SUM(dr) AS BIGINT) AS rd, "
    "CAST(COUNT(*) AS BIGINT) AS ni FROM r GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS n, "
    "CAST(COUNT(*) AS BIGINT) AS k FROM pg), "
    "s AS (SELECT n, k, CAST(SUM(CAST(ROUND("
    "CAST(CAST(rd AS HUGEINT) * rd AS DOUBLE) "
    "/ (4.0 * CAST(ni AS DOUBLE) * CAST(n AS DOUBLE)) "
    f"* {KW_SCALE}) AS BIGINT)) AS BIGINT) AS s_q "
    "FROM pg, tot GROUP BY 1, 2), "
    "ties AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * t * t - t) "
    "AS HUGEINT) AS t3t FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t "
    "FROM base GROUP BY v)) "
    "SELECT n AS n_orders, CAST(k - 1 AS INT) AS df, "
    f"ROUND(12.0 * (CAST(s_q AS DOUBLE) / {float(KW_SCALE)}) "
    "/ (CAST(n AS DOUBLE) + 1.0) "
    "- 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h_stat, "
    f"ROUND((12.0 * (CAST(s_q AS DOUBLE) / {float(KW_SCALE)}) "
    "/ (CAST(n AS DOUBLE) + 1.0) "
    "- 3.0 * (CAST(n AS DOUBLE) + 1.0)) "
    "/ (1.0 - CAST(t3t AS DOUBLE) / (CAST(n AS DOUBLE) "
    "* CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) "
    "AS h_corrected "
    "FROM s, ties"
)


# --- Kolmogorov–Smirnov two-sample test -----------------------------------------


def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Two-sample Kolmogorov–Smirnov statistic** (Smirnov 1939)
    between URGENT and LOW order prices: D = max_v |F1(v) − F2(v)| —
    the distribution-SHAPE companion of `agg_mann_whitney_u` (which
    only sees location): two samples can share a median and still
    differ in spread; KS sees it. Also emits the asymptotic scaling
    λ = D·√(n1·n2/(n1+n2)) (compare to the Kolmogorov distribution's
    1.358 at α=0.05).

    Exactness: the ECDF difference at value v clears denominators —
    |n2·C1(v) − n1·C2(v)| with C the cumulative group counts — so the
    argmax runs over exact int64 and D is ONE division, λ one
    fixed-shape expression (`dround` 6).

    Scale: one map-side-combinable per-value count aggregate, one
    global cumulative window over DISTINCT values (bounded by value
    cardinality, not rows), one max aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        dround(F.col("o_totalprice") * F.lit(10_000.0), 0)
        .cast("long")
        .alias("v"),
    )
    per_v = both.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "a"
        ),
        F.sum(F.when(~F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "b"
        ),
    )
    w = Window.partitionBy().orderBy("v")
    cum = per_v.select(
        F.sum("a").over(w).alias("c1"), F.sum("b").over(w).alias("c2")
    )
    tot = both.agg(
        F.sum(F.when(F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n1"
        ),
        F.sum(F.when(~F.col("is_a"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n2"
        ),
    )
    stat = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("n2") * F.col("c1") - F.col("n1") * F.col("c2")
                )
            ).alias("d_num")
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("d_num").cast("double") / (n1d * n2d)
    return stat.select(
        F.col("n1").cast("long").alias("n_urgent"),
        F.col("n2").cast("long").alias("n_low"),
        dround(d, 6).alias("d_stat"),
        dround(
            d * F.sqrt(n1d * n2d / (n1d + n2d)), 6
        ).alias("ks_lambda"),
    )


QUERIES["agg_ks_two_sample"] = agg_ks_two_sample

ORACLE["agg_ks_two_sample"] = (
    "WITH both_g AS (SELECT "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS v "
    f"FROM orders WHERE o_orderpriority IN ('{MW_GROUP_A}', "
    f"'{MW_GROUP_B}')), "
    "pv AS (SELECT v, "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS b "
    "FROM both_g GROUP BY 1), "
    "cum AS (SELECT CAST(SUM(a) OVER (ORDER BY v) AS BIGINT) AS c1, "
    "CAST(SUM(b) OVER (ORDER BY v) AS BIGINT) AS c2 FROM pv), "
    "tot AS (SELECT "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2 "
    "FROM both_g), "
    "st AS (SELECT n1, n2, "
    "CAST(MAX(abs(n2 * c1 - n1 * c2)) AS BIGINT) AS d_num "
    "FROM cum, tot GROUP BY 1, 2) "
    "SELECT n1 AS n_urgent, n2 AS n_low, "
    "ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) "
    "* CAST(n2 AS DOUBLE)), 6) AS d_stat, "
    "ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) "
    "* CAST(n2 AS DOUBLE)) * sqrt(CAST(n1 AS DOUBLE) "
    "* CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) "
    "+ CAST(n2 AS DOUBLE))), 6) AS ks_lambda "
    "FROM st"
)


# --- Spearman rank correlation ---------------------------------------------------


def agg_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Spearman rank correlation** (1904) between an order's total
    price and its line count — the monotonic-association companion of
    `agg_corr_covar`'s Pearson (which sees only LINEAR association and
    is leveraged by price outliers; rank correlation is robust to
    both).

    Exactness: both variables rank with the doubled-average-rank device
    (2·avgrank = 2·minrank + t − 1, exact ints); Pearson on the doubled
    ranks clears every /M — ρ = (M·Σxy − Σx·Σy) / √((M·Σx² − (Σx)²) ·
    (M·Σy² − (Σy)²)) — with all five sums exact DECIMAL(38,0) ≡
    HUGEINT; the two second-moment factors cast to double BEFORE their
    product (their exact product would overflow 128 bits at 100x), then
    one sqrt and one division, `dround` 6.

    Scale: one join (orders ⋈ per-order line counts — both keyed on
    the order key), two global rank windows, one moment aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    pairs = orders.select(
        "o_orderkey",
        dround(F.col("o_totalprice") * F.lit(10_000.0), 0)
        .cast("long")
        .alias("vx"),
    ).join(cnt, "o_orderkey")
    wx = Window.partitionBy().orderBy("vx")
    tx = Window.partitionBy("vx")
    wy = Window.partitionBy().orderBy("n_lines")
    ty = Window.partitionBy("n_lines")
    ranked = pairs.select(
        (
            F.lit(2) * F.rank().over(wx)
            + F.count(F.lit(1)).over(tx)
            - F.lit(1)
        ).alias("rx"),
        (
            F.lit(2) * F.rank().over(wy)
            + F.count(F.lit(1)).over(ty)
            - F.lit(1)
        ).alias("ry"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    mom = ranked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(d(F.col("rx")) * F.col("rx")).alias("sxx"),
        F.sum(d(F.col("ry")) * F.col("ry")).alias("syy"),
        F.sum(d(F.col("rx")) * F.col("ry")).alias("sxy"),
    )
    num = d(F.col("m")) * F.col("sxy") - d(F.col("sx")) * F.col("sy")
    m2x = d(F.col("m")) * F.col("sxx") - d(F.col("sx")) * F.col("sx")
    m2y = d(F.col("m")) * F.col("syy") - d(F.col("sy")) * F.col("sy")
    return (
        mom.filter((m2x > 0) & (m2y > 0))
        .select(
            F.col("m").cast("long").alias("n_orders"),
            dround(
                num.cast("double")
                / F.sqrt(m2x.cast("double") * m2y.cast("double")),
                6,
            ).alias("spearman_rho"),
        )
    )


QUERIES["agg_spearman_rank_corr"] = agg_spearman_rank_corr

ORACLE["agg_spearman_rank_corr"] = (
    "WITH cnt AS (SELECT l_orderkey AS o_orderkey, "
    "CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem GROUP BY 1), "
    "p AS (SELECT CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS vx, "
    "n_lines FROM orders JOIN cnt USING (o_orderkey)), "
    "r AS (SELECT "
    "2 * RANK() OVER (ORDER BY vx) "
    "+ COUNT(*) OVER (PARTITION BY vx) - 1 AS rx, "
    "2 * RANK() OVER (ORDER BY n_lines) "
    "+ COUNT(*) OVER (PARTITION BY n_lines) - 1 AS ry FROM p), "
    "mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
    "CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy, "
    "CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx, "
    "CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy, "
    "CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy FROM r) "
    "SELECT m AS n_orders, "
    "ROUND(CAST(CAST(m AS HUGEINT) * sxy "
    "- CAST(sx AS HUGEINT) * sy AS DOUBLE) "
    "/ sqrt(CAST(CAST(m AS HUGEINT) * sxx "
    "- CAST(sx AS HUGEINT) * sx AS DOUBLE) "
    "* CAST(CAST(m AS HUGEINT) * syy "
    "- CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6) AS spearman_rho "
    "FROM mom WHERE CAST(m AS HUGEINT) * sxx "
    "- CAST(sx AS HUGEINT) * sx > 0 "
    "AND CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0"
)


# --- Welch's unequal-variance t-test ---------------------------------------------


def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Welch's unequal-variance t-test** (Biometrika 1947) between
    URGENT and LOW order prices — the parametric companion of
    `agg_mann_whitney_u` on the same two groups (rank-free, so it sees
    the MEANS rather than the whole distributions), with the
    Welch–Satterthwaite effective degrees of freedom.

    Exactness: prices quantize to scaled int64 (×1e4); each group's
    count n, sum s and sum-of-squares q are exact integers (q in
    DECIMAL(38,0) ≡ HUGEINT — v² reaches ~2.5e19), so the sample
    variance numerator A = n·q − s² is exact. The exposed doubles are
    fixed-shape expressions off those integers: u_h = A_h/(n_h(n_h−1)n_h)
    (the squared standard error, scale cancelling between numerator and
    denominator of t), t = (m1−m2)/√(u1+u2), and
    df = (u1+u2)² / (u1²/(n1−1) + u2²/(n2−1)).

    Scale: ONE map-side-combinable conditional aggregate over orders —
    no rank window at all (contrast Mann–Whitney's global sort), so
    this is the cheapest member of the testing family at 100 TB."""
    orders = read_table(spark, sf_dir, "orders")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        dround(F.col("o_totalprice") * F.lit(10_000.0), 0)
        .cast("long")
        .alias("v"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    agg = both.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("is_a"), F.col("v"))).alias("s1"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).alias("s2"),
        F.sum(F.when(F.col("is_a"), d(F.col("v")) * F.col("v"))).alias("q1"),
        F.sum(F.when(~F.col("is_a"), d(F.col("v")) * F.col("v"))).alias(
            "q2"
        ),
    ).filter((F.col("n1") > 1) & (F.col("n2") > 1))
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2 = F.col("s1"), F.col("s2")
    a1 = d(n1) * F.col("q1") - d(s1) * s1
    a2 = d(n2) * F.col("q2") - d(s2) * s2
    n1d, n2d = n1.cast("double"), n2.cast("double")
    m1 = s1.cast("double") / n1d
    m2 = s2.cast("double") / n2d
    u1 = a1.cast("double") / (n1d * (n1d - F.lit(1.0)) * n1d)
    u2 = a2.cast("double") / (n2d * (n2d - F.lit(1.0)) * n2d)
    use = u1 + u2
    return agg.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        dround(m1 / F.lit(10_000.0), 4).alias("mean_urgent"),
        dround(m2 / F.lit(10_000.0), 4).alias("mean_low"),
        dround((m1 - m2) / F.lit(10_000.0), 4).alias("mean_diff"),
        dround((m1 - m2) / F.sqrt(use), 6).alias("t_stat"),
        dround(
            (use * use)
            / (
                u1 * u1 / (n1d - F.lit(1.0))
                + u2 * u2 / (n2d - F.lit(1.0))
            ),
            4,
        ).alias("df_welch"),
    )


QUERIES["agg_welch_ttest"] = agg_welch_ttest

ORACLE["agg_welch_ttest"] = (
    "WITH both_g AS (SELECT "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS v "
    f"FROM orders WHERE o_orderpriority IN ('{MW_GROUP_A}', "
    f"'{MW_GROUP_B}')), "
    "a AS (SELECT "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    "CAST(SUM(CASE WHEN is_a THEN v END) AS BIGINT) AS s1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN v END) AS BIGINT) AS s2, "
    "CAST(SUM(CASE WHEN is_a THEN CAST(v AS HUGEINT) * v END) "
    "AS HUGEINT) AS q1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN CAST(v AS HUGEINT) * v END) "
    "AS HUGEINT) AS q2 FROM both_g), "
    "u AS (SELECT n1, n2, "
    "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1, "
    "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2, "
    "CAST(CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) "
    "/ (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0) "
    "* CAST(n1 AS DOUBLE)) AS u1, "
    "CAST(CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) "
    "/ (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0) "
    "* CAST(n2 AS DOUBLE)) AS u2 "
    "FROM a WHERE n1 > 1 AND n2 > 1) "
    "SELECT n1 AS n_urgent, n2 AS n_low, "
    "ROUND(m1 / 10000.0, 4) AS mean_urgent, "
    "ROUND(m2 / 10000.0, 4) AS mean_low, "
    "ROUND((m1 - m2) / 10000.0, 4) AS mean_diff, "
    "ROUND((m1 - m2) / sqrt(u1 + u2), 6) AS t_stat, "
    "ROUND(((u1 + u2) * (u1 + u2)) "
    "/ (u1 * u1 / (CAST(n1 AS DOUBLE) - 1.0) "
    "+ u2 * u2 / (CAST(n2 AS DOUBLE) - 1.0)), 4) AS df_welch "
    "FROM u"
)


# --- One-way ANOVA F test ---------------------------------------------------------


def agg_oneway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**One-way analysis of variance** (Fisher 1925) of order price
    across ALL five priorities — the k-group parametric extension of
    `agg_welch_ttest`, exactly as `agg_kruskal_wallis` extends
    `agg_mann_whitney_u` on the rank side.

    Exactness (the Kruskal pre-divide device, CLAUDE.md rule 2): the
    per-group between term s_h²/(n_h·n) and the grand terms Q/n and
    S²/n² are each ONE fixed-shape double expression off exact
    integers, quantized at 0 dp in scaled² units (≈4.5e17 at 100x —
    inside int64 BECAUSE of the pre-divide by n; the un-divided
    s_h²/n_h would be ~1e23) so the cross-group sum B = Σ and the SS
    differences SSB/n = B − g, SSW/n = qn − B are exact integers.
    F = ((B−g)·(n−k)) / ((qn−B)·(k−1)) with the two products in
    DECIMAL(38,0) ≡ HUGEINT and ONE division; η² = (B−g)/(qn−g).

    Scale: one map-side-combinable aggregate over orders to the k-row
    group frame; everything after runs on k rows."""
    orders = read_table(spark, sf_dir, "orders")
    v = dround(F.col("o_totalprice") * F.lit(10_000.0), 0).cast("long")

    def d(c):
        return c.cast("decimal(38,0)")

    per = orders.groupBy(F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(v).alias("sh"),
        F.sum(d(v) * v).alias("qh"),
    )
    tot = per.agg(
        F.sum("nh").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sh").cast("long").alias("s"),
        F.sum("qh").alias("q"),
    )
    joined = per.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    bh = dround(
        F.col("sh").cast("double")
        * F.col("sh").cast("double")
        / (F.col("nh").cast("double") * nd),
        0,
    ).cast("long")
    sums = joined.groupBy("n", "k", "s", "q").agg(
        F.sum(bh).alias("b")
    )
    g = dround(
        F.col("s").cast("double") * F.col("s").cast("double") / (nd * nd),
        0,
    ).cast("long")
    qn = dround(F.col("q").cast("double") / nd, 0).cast("long")
    ssb_n = F.col("b") - g
    ssw_n = qn - F.col("b")
    return (
        sums.filter((qn - F.col("b")) > 0)
        .select(
            F.col("n").alias("n_orders"),
            F.col("k").alias("k_groups"),
            dround(
                (d(ssb_n) * (F.col("n") - F.col("k"))).cast("double")
                / (d(ssw_n) * (F.col("k") - F.lit(1))).cast("double"),
                6,
            ).alias("f_stat"),
            dround(
                ssb_n.cast("double") / (qn - g).cast("double"), 6
            ).alias("eta_squared"),
        )
    )


QUERIES["agg_oneway_anova"] = agg_oneway_anova

ORACLE["agg_oneway_anova"] = (
    "WITH per AS (SELECT o_orderpriority AS p, "
    "CAST(COUNT(*) AS BIGINT) AS nh, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT)) AS BIGINT) "
    "AS sh, "
    "CAST(SUM(CAST(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) "
    "AS HUGEINT) * CAST(ROUND(o_totalprice * 10000.0) AS BIGINT)) "
    "AS HUGEINT) AS qh FROM orders GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(nh) AS BIGINT) AS n, "
    "CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(sh) AS BIGINT) AS s, "
    "CAST(SUM(qh) AS HUGEINT) AS q FROM per), "
    "sums AS (SELECT n, k, s, q, "
    "CAST(SUM(CAST(ROUND(CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE) "
    "/ (CAST(nh AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)) AS BIGINT) "
    "AS b FROM per, tot GROUP BY n, k, s, q), "
    "f AS (SELECT n, k, b, "
    "CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS g, "
    "CAST(ROUND(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS qn "
    "FROM sums) "
    "SELECT n AS n_orders, k AS k_groups, "
    "ROUND(CAST(CAST(b - g AS HUGEINT) * (n - k) AS DOUBLE) "
    "/ CAST(CAST(qn - b AS HUGEINT) * (k - 1) AS DOUBLE), 6) AS f_stat, "
    "ROUND(CAST(b - g AS DOUBLE) / CAST(qn - g AS DOUBLE), 6) "
    "AS eta_squared "
    "FROM f WHERE qn - b > 0"
)


# --- Kendall's tau-b rank correlation ---------------------------------------------


def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Kendall's τ-b** (Biometrika 1938, tie correction Kendall 1945)
    between monthly revenue and monthly order count — the
    concordance-pair view of the same question `agg_spearman_rank_corr`
    answers with ranks (τ weights each discordant pair equally;
    Spearman squares rank gaps, so a single far-out month moves ρ more
    than τ).

    Pair generation strictly AFTER the monthly rollup (the
    `agg_theil_sen_trend` posture): the O(n²) is in SERIES LENGTH
    (~84 months → 3.5k pairs), never row count. Concordant /
    discordant / x-tied / y-tied pair counts are exact integers off
    the exact scaled-int revenue (ties identical across engines);
    τ_b = (C−D)/√((n0−n1)(n0−n2)) is one fixed-shape double off those
    integers — the (n0−n1)(n0−n2) product in DECIMAL(38,0) ≡ HUGEINT.

    Scale: one map-side-combinable month rollup, then a broadcast-able
    self-join of the ~84-row series."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        month_start("o_orderdate").alias("month")
    ).agg(
        dsum_scaled("o_totalprice").alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    a = monthly.select(
        F.col("month").alias("ma"),
        F.col("rev").alias("ra"),
        F.col("cnt").alias("ca"),
    )
    b = monthly.select(
        F.col("month").alias("mb"),
        F.col("rev").alias("rb"),
        F.col("cnt").alias("cb"),
    )
    pairs = a.join(F.broadcast(b), F.col("ma") < F.col("mb")).select(
        (F.col("ra") - F.col("rb")).alias("dx"),
        (F.col("ca") - F.col("cb")).alias("dy"),
    )
    sgn = F.signum(F.col("dx").cast("double")) * F.signum(
        F.col("dy").cast("double")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("dd"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    denom = d(F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n2"))
    return agg.filter(denom > 0).select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("dd").alias("discordant"),
        dround(
            (F.col("c") - F.col("dd")).cast("double")
            / F.sqrt(denom.cast("double")),
            6,
        ).alias("kendall_tau_b"),
    )


QUERIES["agg_kendall_tau"] = agg_kendall_tau

ORACLE["agg_kendall_tau"] = (
    "WITH monthly AS (SELECT date_trunc('month', o_orderdate) AS month, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT)) AS BIGINT) "
    "AS rev, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY 1), "
    "pairs AS (SELECT a.rev - b.rev AS dx, a.cnt - b.cnt AS dy "
    "FROM monthly a JOIN monthly b ON a.month < b.month), "
    "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0, "
    "CAST(SUM(CASE WHEN sign(CAST(dx AS DOUBLE)) "
    "* sign(CAST(dy AS DOUBLE)) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c, "
    "CAST(SUM(CASE WHEN sign(CAST(dx AS DOUBLE)) "
    "* sign(CAST(dy AS DOUBLE)) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd, "
    "CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2 "
    "FROM pairs) "
    "SELECT n0 AS n_pairs, c AS concordant, dd AS discordant, "
    "ROUND(CAST(c - dd AS DOUBLE) "
    "/ sqrt(CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n2) AS DOUBLE)), 6) "
    "AS kendall_tau_b "
    "FROM agg WHERE CAST(n0 - n1 AS HUGEINT) * (n0 - n2) > 0"
)


# --- Distribution-rank windows: cume_dist / percent_rank / ntile ------------------


def window_cume_dist_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Distribution-rank window trio** — ``ntile(10)`` decile buckets
    with ``cume_dist``/``percent_rank`` boundary values, per order
    priority: the window functions an analyst reaches for to bucket a
    population by rank (the windowed complement of `agg_percentiles`'
    value-space quantiles).

    Determinism: ``ntile`` assigns by ROW POSITION, so its ORDER BY
    carries the unique o_orderkey tiebreaker (a ties-only ordering
    would be engine-nondeterministic); ``cume_dist``/``percent_rank``
    are tie-safe BY DEFINITION (all peers share a value) and order by
    price alone — both facts the docstring of record for this engine.
    The decile summary emits each bucket's size, exact money bounds and
    the bucket-max of the two rank ratios (single divisions of exact
    rank integers, `dround` 6).

    Scale: one partition-local sort per priority (priority is the
    partition key — no global sort), then a 50-row rollup."""
    orders = read_table(spark, sf_dir, "orders")
    w_pos = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_val = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.ntile(10).over(w_pos).alias("decile"),
        F.cume_dist().over(w_val).alias("cd"),
        F.percent_rank().over(w_val).alias("pr"),
    )
    return (
        ranked.groupBy("priority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("price"), 4).alias("lo_price"),
            F.round(F.max("price"), 4).alias("hi_price"),
            dround(F.max("cd"), 6).alias("cume_dist_hi"),
            dround(F.max("pr"), 6).alias("pct_rank_hi"),
        )
        .orderBy("priority", "decile")
    )


QUERIES["window_cume_dist_deciles"] = window_cume_dist_deciles

ORACLE["window_cume_dist_deciles"] = (
    "WITH r AS (SELECT o_orderpriority AS priority, "
    "o_totalprice AS price, "
    "NTILE(10) OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice, o_orderkey) AS decile, "
    "CUME_DIST() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice) AS cd, "
    "PERCENT_RANK() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice) AS pr FROM orders) "
    "SELECT priority, CAST(decile AS INT) AS decile, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "ROUND(MIN(price), 4) AS lo_price, ROUND(MAX(price), 4) AS hi_price, "
    "ROUND(MAX(cd), 6) AS cume_dist_hi, "
    "ROUND(MAX(pr), 6) AS pct_rank_hi "
    "FROM r GROUP BY 1, 2 ORDER BY 1, 2"
)


# --- Cross-correlation function between two monthly series ------------------------

CCF_MAX_LAG = 6
CCF_X = "1-URGENT"
CCF_Y = "5-LOW"


def timeseries_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Sample cross-correlation function** (Box & Jenkins 1970 §11.1)
    between the URGENT and LOW monthly revenue series at lags −6..+6 —
    does one priority's revenue LEAD the other? Positive lag k means
    x (URGENT) at month t pairs with y (LOW) at month t−k, so a peak
    at k>0 reads "LOW leads URGENT by k months". The two-series
    companion of `timeseries_acf`, sharing its exactness device.

    Determinism: on the COMMON month spine (inner join), with
    zx_t = n·x_t − Σx and zy_t = n·y_t − Σy exact int64, the textbook
    r_k = Σ(x_{t}−x̄)(y_{t−k}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²) equals
    Σ zx_t·zy_{t−k} / √(Σzx²·Σzy²) — every n² cancels — so the
    numerator is an exact integer sum (DECIMAL ≡ HUGEINT) and the two
    denominator moments cast to double BEFORE their product (the
    Spearman posture; the exact product would overflow 128 bits at
    100x). One division + one sqrt per lag, `dround` 6.

    Scale: corpus-sized work is the monthly rollup; the lag pairing is
    a ≤13-fanout range self-join on the ~80-row spine."""
    orders = read_table(spark, sf_dir, "orders")
    m = (
        orders.filter(F.col("o_orderpriority").isin(CCF_X, CCF_Y))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(dsum_scaled("o_totalprice").alias("rev_s"))
    )
    xs = m.filter(F.col("priority") == CCF_X).select(
        "mon", F.col("rev_s").alias("x")
    )
    ys = m.filter(F.col("priority") == CCF_Y).select(
        "mon", F.col("rev_s").alias("y")
    )
    spine = xs.join(ys, "mon")
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("mon")
    z = spine.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.row_number().over(w_ord).alias("rn"),
        (F.count(F.lit(1)).over(w_all) * F.col("x") - F.sum("x").over(w_all))
        .cast("decimal(18,0)")
        .alias("zx"),
        (F.count(F.lit(1)).over(w_all) * F.col("y") - F.sum("y").over(w_all))
        .cast("decimal(18,0)")
        .alias("zy"),
    )
    den = z.groupBy("n").agg(
        F.sum(F.col("zx") * F.col("zx")).alias("dx"),
        F.sum(F.col("zy") * F.col("zy")).alias("dy"),
    )
    a, b = z.alias("a"), z.alias("b")
    num = (
        a.join(
            b,
            (F.col("a.rn") - F.col("b.rn")).between(
                -CCF_MAX_LAG, CCF_MAX_LAG
            ),
        )
        .groupBy(
            (F.col("a.rn") - F.col("b.rn")).cast("int").alias("lag_k")
        )
        .agg(
            F.sum(F.col("a.zx") * F.col("b.zy")).alias("num"),
            F.count(F.lit(1)).alias("n_overlap"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag_k",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            dround(
                F.col("num").cast("double")
                / F.sqrt(
                    F.col("dx").cast("double") * F.col("dy").cast("double")
                ),
                6,
            ).alias("ccf"),
            dround(
                F.lit(1.96) / F.sqrt(F.col("n").cast("double")), 6
            ).alias("ci95"),
        )
        .orderBy("lag_k")
    )


QUERIES["timeseries_ccf"] = timeseries_ccf

ORACLE["timeseries_ccf"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders "
    f"WHERE o_orderpriority IN ('{CCF_X}', '{CCF_Y}') GROUP BY 1, 2), "
    f"xs AS (SELECT mon, rev_s AS x FROM m WHERE priority = '{CCF_X}'), "
    f"ys AS (SELECT mon, rev_s AS y FROM m WHERE priority = '{CCF_Y}'), "
    "spine AS (SELECT xs.mon, x, y FROM xs JOIN ys ON xs.mon = ys.mon), "
    "z AS (SELECT CAST(COUNT(*) OVER () AS BIGINT) AS n, "
    "ROW_NUMBER() OVER (ORDER BY mon) AS rn, "
    "CAST(COUNT(*) OVER () * x - SUM(x) OVER () AS HUGEINT) AS zx, "
    "CAST(COUNT(*) OVER () * y - SUM(y) OVER () AS HUGEINT) AS zy "
    "FROM spine), "
    "den AS (SELECT n, CAST(SUM(zx * zx) AS HUGEINT) AS dx, "
    "CAST(SUM(zy * zy) AS HUGEINT) AS dy FROM z GROUP BY n), "
    "num AS (SELECT CAST(a.rn - b.rn AS INT) AS lag_k, "
    "CAST(SUM(a.zx * b.zy) AS HUGEINT) AS num, "
    "CAST(COUNT(*) AS BIGINT) AS n_overlap "
    "FROM z a JOIN z b ON a.rn - b.rn "
    f"BETWEEN -{CCF_MAX_LAG} AND {CCF_MAX_LAG} GROUP BY 1) "
    "SELECT lag_k, n_overlap, "
    "ROUND(CAST(num AS DOUBLE) "
    "/ sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6) AS ccf, "
    "ROUND(1.96 / sqrt(CAST(n AS DOUBLE)), 6) AS ci95 "
    "FROM num, den ORDER BY lag_k"
)


# --- AR(2) Yule-Walker fit off the exact correlogram -------------------------------


def timeseries_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Yule–Walker AR(2) fit** (Yule 1927; Walker 1931) of each
    priority's monthly revenue series — the first MODEL on top of
    `timeseries_acf`'s diagnostics, in the closed 2×2 form:
    φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²), with the innovation
    variance share σ²/c₀ = 1 − φ₁r₁ − φ₂r₂.

    Determinism: r₁/r₂ ride the ACF's cleared-mean device — numerators
    Σz_t·z_{t−k} and denominator Σz² are exact integers — and are
    QUANTIZED at 12 dp (scaled-int longs) before the φ algebra, so the
    rational functions run on identical inputs in both engines;
    φ/σ² are fixed-shape double expressions of those two quantized
    values, `dround` 6. Series with a degenerate lag structure
    (|1−r₁²| quantized to 0) are filtered on the exact long in both
    engines.

    Scale: identical to the ACF — the corpus-sized work is the monthly
    rollup; the fit runs on one row per priority."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wp = Window.partitionBy("priority")
    wo = Window.partitionBy("priority").orderBy("mon")
    z = m.select(
        "priority",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wo).alias("rn"),
        (F.count(F.lit(1)).over(wp) * F.col("rev_s") - F.sum("rev_s").over(wp))
        .cast("decimal(18,0)")
        .alias("z"),
    )
    den = z.groupBy("priority", "n").agg(
        F.sum(F.col("z") * F.col("z")).alias("den")
    )
    a, b = z.alias("a"), z.alias("b")
    num = (
        a.join(
            b,
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.rn") - F.col("b.rn")).between(1, 2),
        )
        .groupBy(
            F.col("a.priority").alias("priority"),
            (F.col("a.rn") - F.col("b.rn")).cast("int").alias("lag_k"),
        )
        .agg(F.sum(F.col("a.z") * F.col("b.z")).alias("num"))
    )
    rq = (
        num.join(den, "priority")
        .select(
            "priority",
            "n",
            "lag_k",
            dround(
                F.lit(1e12)
                * F.col("num").cast("double")
                / F.col("den").cast("double"),
                0,
            )
            .cast("long")
            .alias("rq"),
        )
    )
    wide = rq.groupBy("priority", "n").agg(
        F.sum(F.when(F.col("lag_k") == 1, F.col("rq"))).alias("r1q"),
        F.sum(F.when(F.col("lag_k") == 2, F.col("rq"))).alias("r2q"),
    )
    r1 = F.col("r1q").cast("double") / F.lit(1e12)
    r2 = F.col("r2q").cast("double") / F.lit(1e12)
    # exact degeneracy filter: 1 - r1^2 == 0 at 12-dp quantization
    # (1e24 and r1q^2 exceed int64 — the comparison runs in decimal ≡
    # HUGEINT)
    def _d38(c):
        return c.cast("decimal(38,0)")

    den_q = _d38(F.lit(10**12)) * F.lit(10**12) - _d38(
        F.col("r1q")
    ) * F.col("r1q")
    phi1 = r1 * (F.lit(1.0) - r2) / (F.lit(1.0) - r1 * r1)
    phi2 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    return (
        wide.filter(den_q != 0)
        .select(
            "priority",
            F.col("n").cast("long").alias("n_months"),
            dround(r1, 6).alias("r1"),
            dround(r2, 6).alias("r2"),
            dround(phi1, 6).alias("phi1"),
            dround(phi2, 6).alias("phi2"),
            dround(
                F.lit(1.0) - phi1 * r1 - phi2 * r2, 6
            ).alias("innovation_var_share"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_ar2_yule_walker"] = timeseries_ar2_yule_walker

ORACLE["timeseries_ar2_yule_walker"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "z AS (SELECT priority, "
    "CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n, "
    "ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS rn, "
    "CAST(COUNT(*) OVER (PARTITION BY priority) * rev_s "
    "- SUM(rev_s) OVER (PARTITION BY priority) AS HUGEINT) AS z "
    "FROM m), "
    "den AS (SELECT priority, n, CAST(SUM(z * z) AS HUGEINT) AS den "
    "FROM z GROUP BY 1, 2), "
    "num AS (SELECT a.priority, CAST(a.rn - b.rn AS INT) AS lag_k, "
    "CAST(SUM(a.z * b.z) AS HUGEINT) AS num "
    "FROM z a JOIN z b ON a.priority = b.priority "
    "AND a.rn - b.rn BETWEEN 1 AND 2 GROUP BY 1, 2), "
    "rq AS (SELECT num.priority, den.n, lag_k, "
    "CAST(ROUND(1e12 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) "
    "AS BIGINT) AS rq FROM num JOIN den ON num.priority = den.priority), "
    "wide AS (SELECT priority, n, "
    "CAST(SUM(CASE WHEN lag_k = 1 THEN rq END) AS BIGINT) AS r1q, "
    "CAST(SUM(CASE WHEN lag_k = 2 THEN rq END) AS BIGINT) AS r2q "
    "FROM rq GROUP BY 1, 2), "
    "f AS (SELECT priority, n, "
    "CAST(r1q AS DOUBLE) / 1e12 AS r1, CAST(r2q AS DOUBLE) / 1e12 AS r2 "
    "FROM wide WHERE CAST(1000000000000 AS HUGEINT) * 1000000000000 "
    "- CAST(r1q AS HUGEINT) * r1q <> 0) "
    "SELECT priority, n AS n_months, "
    "ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2, "
    "ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1, "
    "ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2, "
    "ROUND(1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r1 "
    "- ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2, 6) "
    "AS innovation_var_share "
    "FROM f ORDER BY priority"
)


# --- Top user path trigrams (sequential pattern counts) ----------------------------

PATH_TOP_K = 20


def events_user_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **top event-type trigram paths** across the per-user
    event streams (the k=3 special case of sequential pattern mining,
    Agrawal & Srikant ICDE'95; the order-3 extension of
    `events_markov_transitions`' first-order matrix): which 3-step
    behaviors are most common?

    One exchange by user carries BOTH leads (same WindowSpec → one sort,
    the `sessionize_batch` shape); the trigram table is ≤|types|³ rows.
    Counts exact; total order (n DESC, path ASC) with LIMIT — a
    TakeOrdered, no global sort.

    vs reference: no analogue (the reference has no sequence surface
    beyond lag-1 pct_change, `dashboard_nfp.py:152`)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
        .limit(PATH_TOP_K)
    )


QUERIES["events_user_path_trigrams"] = events_user_path_trigrams

ORACLE["events_user_path_trigrams"] = (
    "WITH t AS (SELECT event_type AS e1, "
    "LEAD(event_type, 1) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS e2, "
    "LEAD(event_type, 2) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS e3 FROM events) "
    "SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths "
    "FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL "
    "GROUP BY 1, 2, 3 "
    f"ORDER BY n_paths DESC, e1, e2, e3 LIMIT {PATH_TOP_K}"
)


# --- Inter-arrival time statistics per event type ----------------------------------


def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **inter-arrival time statistics** per event type:
    the gap distribution between consecutive events of each type (the
    arrival-process view of the stream — what a capacity planner or
    anomaly detector reads; the global-per-type complement of
    `events_sessionish`'s per-user gaps).

    Timestamp discipline per CLAUDE.md rule 6/6a: epoch micros via
    `epoch_micros_from_ntz` (pure wall arithmetic, session-timezone
    proof); gaps are exact int64 micro differences ordered by the
    total (ts, event_id) key; mean is one division of exact ints;
    median/p90 are Spark ``percentile`` ≡ DuckDB ``quantile_cont`` on
    the integer gaps (the `agg_percentiles` device). All exposed
    seconds values descale by 1e6 inside a single `dround` 6.

    Scale: one exchange by event type (k partitions — coarse, but the
    per-type sort is exactly the arrival-order question; a 100 TB
    deployment would pre-bucket by type) + one rollup."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    us = epoch_micros_from_ntz(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (
        ev.select("event_type", us.alias("us"), "event_id")
        .select(
            "event_type",
            (F.col("us") - F.lag("us").over(w)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").alias("sum_gap"),
            F.percentile("gap", F.lit(0.5)).alias("med"),
            F.percentile("gap", F.lit(0.9)).alias("p90"),
            F.max("gap").alias("mx"),
        )
        .select(
            "event_type",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            dround(
                F.col("sum_gap").cast("double")
                / F.col("n_gaps").cast("double")
                / F.lit(1e6),
                6,
            ).alias("mean_gap_s"),
            dround(F.col("med") / F.lit(1e6), 6).alias("median_gap_s"),
            dround(F.col("p90") / F.lit(1e6), 6).alias("p90_gap_s"),
            dround(F.col("mx").cast("double") / F.lit(1e6), 6).alias(
                "max_gap_s"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["events_inter_arrival_stats"] = events_inter_arrival_stats

ORACLE["events_inter_arrival_stats"] = (
    "WITH b AS (SELECT event_type, "
    "epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id FROM events), "
    "g AS (SELECT event_type, "
    "us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id) "
    "AS gap FROM b), "
    "a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
    "CAST(SUM(gap) AS BIGINT) AS sum_gap, "
    "quantile_cont(gap, 0.5) AS med, quantile_cont(gap, 0.9) AS p90, "
    "CAST(MAX(gap) AS BIGINT) AS mx "
    "FROM g WHERE gap IS NOT NULL GROUP BY 1) "
    "SELECT event_type, n_gaps, "
    "ROUND(CAST(sum_gap AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1e6, 6) "
    "AS mean_gap_s, "
    "ROUND(med / 1e6, 6) AS median_gap_s, "
    "ROUND(p90 / 1e6, 6) AS p90_gap_s, "
    "ROUND(CAST(mx AS DOUBLE) / 1e6, 6) AS max_gap_s "
    "FROM a ORDER BY event_type"
)


# --- Contingency-table effect sizes off the chi-square device ----------------------


def agg_contingency_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Categorical effect sizes** for the status × priority
    contingency table — Cramér's V (1946), Pearson's contingency
    coefficient C, and Tschuprow's T (1925): the MAGNITUDE layer over
    `agg_chi_square_independence`'s significance (χ² grows with n even
    for a trivial association; V/C/T are the n-free strengths a user
    reports).

    χ² rides the chi-square operator's exact device verbatim (per-cell
    (n·O − r·c)²/(n·r·c) quantized ×1e6, exact cross-cell sum), so the
    two operators can never disagree on χ²; each effect size is then
    ONE fixed-shape double expression off the exact t_s/n/nr/nc —
    V = √(χ²/(n·min(nr−1,nc−1))), C = √(χ²/(χ²+n)),
    T = √(χ²/(n·√((nr−1)(nc−1)))) — `dround` 6.

    Scale: identical to the χ² operator (one count aggregate; k²-row
    algebra)."""
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_m = cells.groupBy("s").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("p").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("s").alias("nr"),
        F.countDistinct("p").alias("nc"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    joined = (
        cells.join(rows_m, "s")
        .join(cols_m, "p")
        .crossJoin(F.broadcast(tot))
    )
    dev = d(F.col("n")) * d(F.col("o")) - d(F.col("r")) * d(F.col("c"))
    term = (dev * dev).cast("double") / (
        d(F.col("n")) * d(F.col("r")) * d(F.col("c"))
    ).cast("double")
    agg = joined.groupBy("n", "nr", "nc").agg(
        dsum_scaled(term, CHI2_SCALE).alias("t_s")
    )
    chi2 = F.col("t_s").cast("double") / F.lit(float(CHI2_SCALE))
    n_d = F.col("n").cast("double")
    m = F.least(F.col("nr"), F.col("nc")) - F.lit(1)
    return agg.select(
        F.col("n").cast("long").alias("n_orders"),
        ((F.col("nr") - F.lit(1)) * (F.col("nc") - F.lit(1)))
        .cast("int")
        .alias("df"),
        dround(chi2, 6).alias("chi2"),
        dround(F.sqrt(chi2 / (n_d * m.cast("double"))), 6).alias(
            "cramers_v"
        ),
        dround(F.sqrt(chi2 / (chi2 + n_d)), 6).alias("contingency_c"),
        dround(
            F.sqrt(
                chi2
                / (
                    n_d
                    * F.sqrt(
                        ((F.col("nr") - F.lit(1)) * (F.col("nc") - F.lit(1)))
                        .cast("double")
                    )
                )
            ),
            6,
        ).alias("tschuprow_t"),
    )


QUERIES["agg_contingency_effect_sizes"] = agg_contingency_effect_sizes

ORACLE["agg_contingency_effect_sizes"] = (
    "WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p, "
    "CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2), "
    "rm AS (SELECT s, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1), "
    "cm AS (SELECT p, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT s) AS BIGINT) AS nr, "
    "CAST(COUNT(DISTINCT p) AS BIGINT) AS nc FROM cells), "
    "t AS (SELECT n, nr, nc, "
    "CAST(SUM(CAST(ROUND((CAST((CAST(n AS HUGEINT) * o "
    "- CAST(r AS HUGEINT) * c) * (CAST(n AS HUGEINT) * o "
    "- CAST(r AS HUGEINT) * c) AS DOUBLE) "
    "/ CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE)) "
    f"* {CHI2_SCALE}) AS BIGINT)) AS BIGINT) AS t_s "
    "FROM cells JOIN rm USING (s) JOIN cm USING (p), tot "
    "GROUP BY 1, 2, 3) "
    "SELECT n AS n_orders, CAST((nr - 1) * (nc - 1) AS INT) AS df, "
    f"ROUND(CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}, 6) AS chi2, "
    f"ROUND(sqrt((CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}) "
    "/ (CAST(n AS DOUBLE) * CAST(least(nr, nc) - 1 AS DOUBLE))), 6) "
    "AS cramers_v, "
    f"ROUND(sqrt((CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}) "
    f"/ ((CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}) "
    "+ CAST(n AS DOUBLE))), 6) AS contingency_c, "
    f"ROUND(sqrt((CAST(t_s AS DOUBLE) / {float(CHI2_SCALE)}) "
    "/ (CAST(n AS DOUBLE) "
    "* sqrt(CAST((nr - 1) * (nc - 1) AS DOUBLE)))), 6) AS tschuprow_t "
    "FROM t"
)


# --- Customer revenue concentration: Gini + top-decile share ------------------------


def agg_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Customer revenue concentration** — Gini coefficient (1912) and
    top-decile share of lifetime revenue per customer: the business-side
    inequality twin of `corpus_gini_by_source` (token inequality) and
    the concentration layer over `rfm_segmentation`.

    Exactness (the corpus-gini device): per-customer revenue is an
    exact scaled-int64 sum; with x_(i) the revenues sorted ASC under
    the total (revenue, custkey) order, G = (2·Σi·x_i − (n+1)·Σx) /
    (n·Σx) — ties in the sorted index commute inside Σi·x_i, so the
    unique tiebreaker cannot flip the value — and the top-decile share
    counts the n DIV 10 highest ranks. Every term is an exact integer
    (Σi·x_i in DECIMAL(38,0) ≡ HUGEINT); each exposed ratio is one
    division, `dround` 6.

    Scale: one map-side-combinable rollup to customer grain, one global
    rank (range-partitioned sort — the documented cost of exact ranks),
    one moment aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        dsum_scaled("o_totalprice").alias("x")
    )
    w = Window.partitionBy().orderBy("x", "o_custkey")
    ranked = per.select(
        "x", F.row_number().over(w).alias("i")
    )

    def d(c):
        return c.cast("decimal(38,0)")

    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(d(F.col("i")) * F.col("x")).alias("six"),
    )
    # top-decile revenue needs the rank cutoff; compute in a second pass
    tot = ranked.agg(F.count(F.lit(1)).alias("n2"))
    topd = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            F.col("i")
            > F.col("n2") - F.floor(F.col("n2") / F.lit(10)).cast("long")
        )
        .agg(F.sum("x").alias("top_x"))
    )
    g_num = F.lit(2) * d(F.col("six")) - d(F.col("n") + 1) * F.col("sx")
    g_den = d(F.col("n")) * F.col("sx")
    return (
        agg.crossJoin(F.broadcast(topd))
        .filter(F.col("sx") > 0)
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.round(
                F.col("sx").cast("double") / F.lit(10_000.0), 4
            ).alias("total_revenue"),
            dround(
                g_num.cast("double") / g_den.cast("double"), 6
            ).alias("gini"),
            dround(
                F.col("top_x").cast("double")
                / F.col("sx").cast("double"),
                6,
            ).alias("top_decile_share"),
        )
    )


QUERIES["agg_gini_customer_revenue"] = agg_gini_customer_revenue

ORACLE["agg_gini_customer_revenue"] = (
    "WITH per AS (SELECT o_custkey, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS x FROM orders GROUP BY 1), "
    "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i "
    "FROM per), "
    "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(x) AS BIGINT) AS sx, "
    "CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six FROM r), "
    "t AS (SELECT CAST(SUM(x) AS BIGINT) AS top_x FROM r, a "
    "WHERE i > n - n // 10) "
    "SELECT n AS n_customers, "
    "ROUND(CAST(sx AS DOUBLE) / 10000.0, 4) AS total_revenue, "
    "ROUND(CAST(2 * six - CAST(n + 1 AS HUGEINT) * sx AS DOUBLE) "
    "/ CAST(CAST(n AS HUGEINT) * sx AS DOUBLE), 6) AS gini, "
    "ROUND(CAST(top_x AS DOUBLE) / CAST(sx AS DOUBLE), 6) "
    "AS top_decile_share "
    "FROM a, t WHERE sx > 0"
)


# --- Column completeness / distinctness profile -------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def dq_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Column profiling** — per-column null counts, distinct
    cardinality and completeness ratio for the orders table: the
    first-contact data-quality report (the profile half of `dq_checks`'
    assertion half).

    One pass computes every column's null count and exact distinct
    count in a single aggregate (Spark plans multi-distinct via expand;
    the 100 TB variant swaps `countDistinct` for HLL sketches —
    `agg_hll_sketch_merge` is that path); the per-column rows are then
    an inline unpivot of that 1-row frame. Completeness is one division
    of exact ints, `dround` 6.

    vs reference: `etl.py:44-50` drops NA rows blindly; this measures
    what WOULD be dropped, per column, before anyone mutates data."""
    orders = read_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select("n_rows", F.explode(rows).alias("p"))
        .select(
            F.col("p.column_name").alias("column_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("p.n_nulls").alias("n_nulls"),
            F.col("p.n_distinct").alias("n_distinct"),
            dround(
                (F.col("n_rows") - F.col("p.n_nulls")).cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("completeness"),
        )
        .orderBy("column_name")
    )


QUERIES["dq_completeness_profile"] = dq_completeness_profile

ORACLE["dq_completeness_profile"] = (
    "WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS nn_{c}, CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}"
        for c in _PROFILE_COLS
    )
    + " FROM orders) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nulls, "
        f"nd_{c} AS n_distinct, "
        f"ROUND(CAST(n_rows - nn_{c} AS DOUBLE) "
        f"/ CAST(n_rows AS DOUBLE), 6) AS completeness FROM a"
        for c in _PROFILE_COLS
    )
    + " ORDER BY column_name"
)


# --- DAU/MAU stickiness per month ---------------------------------------------------


def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **DAU/MAU stickiness** per month: average daily
    active users over monthly active users (the classic product
    engagement ratio), plus the raw actives. The calendar-grain
    engagement view beside `retention_cohorts` (cohort survival) and
    `events_sessionish` (session grain).

    Two exact distinct-count aggregates (daily and monthly actives —
    the 100 TB path swaps in HLL sketch partials, `agg_hll_sketch_merge`);
    stickiness = Σdau / (n_days·mau) is ONE division of exact integers
    (`dround` 6). Month emitted as the NTZ wall timestamp (CLAUDE.md
    rule 6a; the oracle CASTs DuckDB's date_trunc DATE back to
    TIMESTAMP, rule 4)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    daily = ev.groupBy(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    monthly = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    per = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("sum_dau"),
    )
    return (
        per.join(monthly, "month")
        .select(
            "month",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("mau").cast("long").alias("mau"),
            dround(
                F.col("sum_dau").cast("double")
                / F.col("n_days").cast("double"),
                6,
            ).alias("avg_dau"),
            dround(
                F.col("sum_dau").cast("double")
                / (F.col("n_days") * F.col("mau")).cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


QUERIES["events_dau_mau_stickiness"] = events_dau_mau_stickiness

ORACLE["events_dau_mau_stickiness"] = (
    "WITH daily AS (SELECT date_trunc('month', ts) AS month, "
    "date_trunc('day', ts) AS day, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau "
    "FROM events GROUP BY 1, 2), "
    "monthly AS (SELECT date_trunc('month', ts) AS month, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau "
    "FROM events GROUP BY 1), "
    "per AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days, "
    "CAST(SUM(dau) AS BIGINT) AS sum_dau FROM daily GROUP BY 1) "
    "SELECT CAST(per.month AS TIMESTAMP) AS month, n_days, mau, "
    "ROUND(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE), 6) "
    "AS avg_dau, "
    "ROUND(CAST(sum_dau AS DOUBLE) / CAST(n_days * mau AS DOUBLE), 6) "
    "AS stickiness "
    "FROM per JOIN monthly ON per.month = monthly.month "
    "ORDER BY month"
)


# --- Maximum drawdown of the monthly revenue series ---------------------------------


def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Maximum drawdown** per priority of the monthly revenue series —
    the worst peak-to-trough decline relative to the running peak (the
    risk metric quants read off any level series; Magdon-Ismail & Atiya
    2004 formalize it): dd_t = (peak_t − y_t)/peak_t with
    peak_t = running max. The summary layer over
    `window_running_max`'s per-row prior-peak frame.

    Exactness: revenue and running peak are exact scaled ints; each
    month's dd is one division of exact ints, computed identically in
    both engines, so the MAX over months picks the same month and the
    single exposed ratio `dround`s at 6 dp. n_underwater counts months
    strictly below peak — an exact-integer comparison.

    Scale: one monthly rollup + one per-priority ordered window + one
    rollup to 5 rows."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev"))
    w = (
        Window.partitionBy("priority")
        .orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = m.select(
        "priority",
        "rev",
        F.max("rev").over(w).alias("peak"),
    ).select(
        "priority",
        (F.col("peak") - F.col("rev")).cast("double")
        / F.col("peak").cast("double"),
        (F.col("rev") < F.col("peak")).alias("under"),
    )
    ddc = dd.toDF("priority", "dd", "under")
    return (
        ddc.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.max("dd").alias("mx"),
            F.sum(F.when(F.col("under"), 1).otherwise(0))
            .cast("long")
            .alias("n_underwater"),
        )
        .select(
            "priority",
            F.col("n_months").cast("long").alias("n_months"),
            dround(F.col("mx"), 6).alias("max_drawdown"),
            "n_underwater",
        )
        .orderBy("priority")
    )


QUERIES["window_drawdown"] = window_drawdown

ORACLE["window_drawdown"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev FROM orders GROUP BY 1, 2), "
    "d AS (SELECT priority, rev, "
    "MAX(rev) OVER (PARTITION BY priority ORDER BY mon "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM m) "
    "SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months, "
    "ROUND(MAX(CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE)), 6) "
    "AS max_drawdown, "
    "CAST(SUM(CASE WHEN rev < peak THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_underwater "
    "FROM d GROUP BY 1 ORDER BY 1"
)


# --- Hour-of-day activity profile per event type -------------------------------------


def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **hour-of-day activity profile** per event type:
    event counts and within-type share by wall-clock hour (the
    diurnal-pattern view behind load planning and bot detection; the
    calendar companion of `events_inter_arrival_stats`' gap view).

    Hours come off the NTZ wall timestamp (`F.hour` on TIMESTAMP_NTZ ≡
    DuckDB `hour()` on the naive fixture walls — no session-timezone
    dependence, CLAUDE.md rule 6a). Counts exact; share is one division
    per (type, hour) cell of a ≤|types|·24 frame, `dround` 6.

    Scale: ONE map-side-combinable count aggregate; the share window
    runs on the tiny profile frame."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    return (
        cells.select(
            "event_type",
            "hour_of_day",
            F.col("n_events").cast("long").alias("n_events"),
            dround(
                F.col("n_events").cast("double")
                / F.sum("n_events").over(w).cast("double"),
                6,
            ).alias("share_of_type"),
        )
        .orderBy("event_type", "hour_of_day")
    )


QUERIES["events_hourly_profile"] = events_hourly_profile

ORACLE["events_hourly_profile"] = (
    "WITH c AS (SELECT event_type, "
    "CAST(hour(ts) AS INT) AS hour_of_day, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2) "
    "SELECT event_type, hour_of_day, n_events, "
    "ROUND(CAST(n_events AS DOUBLE) / CAST(SUM(n_events) "
    "OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share_of_type "
    "FROM c ORDER BY event_type, hour_of_day"
)


# --- Partial autocorrelation (lags 1-3) via Cramer determinants ---------------------

PACF_SCALE = 1_000_000  # 6-dp quantization of the ACF inputs


def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Partial autocorrelation function** at lags 1–3 of each
    priority's monthly revenue (Box & Jenkins 1970 §3.2 — the AR-order
    identification plot read beside `timeseries_acf`): φ_kk is the
    last Yule–Walker coefficient of the order-k fit, here in CLOSED
    Cramer form so the whole computation is exact-integer polynomial
    algebra rather than a sequential Durbin–Levinson recursion:

        φ11 = a/S,  φ22 = (bS − a²)/(S² − a²),
        φ33 = (S²c − 2Sab + ab² + a³ − a²c) /
              (S³ − 2a²S + 2a²b − Sb²)

    with (a,b,c) the lag-1..3 autocorrelations QUANTIZED at S = 1e6
    (the `timeseries_ar2_yule_walker` device; the ACF numerators and
    denominator are themselves exact integers). Every polynomial term
    stays ≤ ~1e18·k (DECIMAL(38,0) ≡ HUGEINT); each φ is ONE double
    division, `dround` 6. Degenerate denominators filter on the exact
    integer in both engines.

    Scale: the ACF shape — monthly rollup, ≤3-fanout lag self-join,
    k-row algebra."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wp = Window.partitionBy("priority")
    wo = Window.partitionBy("priority").orderBy("mon")
    z = m.select(
        "priority",
        F.row_number().over(wo).alias("rn"),
        (F.count(F.lit(1)).over(wp) * F.col("rev_s") - F.sum("rev_s").over(wp))
        .cast("decimal(18,0)")
        .alias("z"),
    )
    den = z.groupBy("priority").agg(
        F.sum(F.col("z") * F.col("z")).alias("den")
    )
    a_, b_ = z.alias("a"), z.alias("b")
    num = (
        a_.join(
            b_,
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.rn") - F.col("b.rn")).between(1, 3),
        )
        .groupBy(
            F.col("a.priority").alias("priority"),
            (F.col("a.rn") - F.col("b.rn")).cast("int").alias("lag_k"),
        )
        .agg(F.sum(F.col("a.z") * F.col("b.z")).alias("num"))
    )
    rq = num.join(den, "priority").select(
        "priority",
        "lag_k",
        dround(
            F.lit(float(PACF_SCALE))
            * F.col("num").cast("double")
            / F.col("den").cast("double"),
            0,
        )
        .cast("long")
        .alias("rq"),
    )
    wide = rq.groupBy("priority").agg(
        F.sum(F.when(F.col("lag_k") == 1, F.col("rq"))).alias("a"),
        F.sum(F.when(F.col("lag_k") == 2, F.col("rq"))).alias("b"),
        F.sum(F.when(F.col("lag_k") == 3, F.col("rq"))).alias("c"),
    )

    def d(c):
        return c.cast("decimal(38,0)")

    s = F.lit(PACF_SCALE)
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    den2 = d(s) * s - d(a) * a
    num2 = d(b) * s - d(a) * a
    den3 = (
        d(s) * s * s
        - F.lit(2) * d(a) * a * s
        + F.lit(2) * d(a) * a * b
        - d(s) * b * b
    )
    num3 = (
        d(s) * s * c
        - F.lit(2) * d(s) * a * b
        + d(a) * b * b
        + d(a) * a * a
        - d(a) * a * c
    )
    lags = F.array(
        F.struct(
            F.lit(1).alias("lag_k"),
            dround(a.cast("double") / s.cast("double"), 6).alias("pacf"),
        ),
        F.struct(
            F.lit(2).alias("lag_k"),
            dround(
                num2.cast("double") / den2.cast("double"), 6
            ).alias("pacf"),
        ),
        F.struct(
            F.lit(3).alias("lag_k"),
            dround(
                num3.cast("double") / den3.cast("double"), 6
            ).alias("pacf"),
        ),
    )
    return (
        wide.filter((den2 != 0) & (den3 != 0))
        .select("priority", F.explode(lags).alias("l"))
        .select("priority", F.col("l.lag_k").alias("lag_k"), F.col("l.pacf").alias("pacf"))
        .orderBy("priority", "lag_k")
    )


QUERIES["timeseries_pacf"] = timeseries_pacf

_PACF_BASE = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "z AS (SELECT priority, "
    "ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) AS rn, "
    "CAST(COUNT(*) OVER (PARTITION BY priority) * rev_s "
    "- SUM(rev_s) OVER (PARTITION BY priority) AS HUGEINT) AS z "
    "FROM m), "
    "den AS (SELECT priority, CAST(SUM(z * z) AS HUGEINT) AS den "
    "FROM z GROUP BY 1), "
    "num AS (SELECT a.priority, CAST(a.rn - b.rn AS INT) AS lag_k, "
    "CAST(SUM(a.z * b.z) AS HUGEINT) AS num "
    "FROM z a JOIN z b ON a.priority = b.priority "
    "AND a.rn - b.rn BETWEEN 1 AND 3 GROUP BY 1, 2), "
    "rq AS (SELECT num.priority, lag_k, "
    f"CAST(ROUND({PACF_SCALE}.0 * CAST(num AS DOUBLE) "
    "/ CAST(den AS DOUBLE)) AS BIGINT) AS rq "
    "FROM num JOIN den ON num.priority = den.priority), "
    "wide AS (SELECT priority, "
    "CAST(SUM(CASE WHEN lag_k = 1 THEN rq END) AS HUGEINT) AS a, "
    "CAST(SUM(CASE WHEN lag_k = 2 THEN rq END) AS HUGEINT) AS b, "
    "CAST(SUM(CASE WHEN lag_k = 3 THEN rq END) AS HUGEINT) AS c "
    "FROM rq GROUP BY 1), "
    f"f AS (SELECT priority, a, b, c, CAST({PACF_SCALE} AS HUGEINT) AS s "
    "FROM wide) "
)

ORACLE["timeseries_pacf"] = (
    _PACF_BASE
    + "SELECT priority, lag_k, pacf FROM ("
    "SELECT priority, 1 AS lag_k, "
    "ROUND(CAST(a AS DOUBLE) / CAST(s AS DOUBLE), 6) AS pacf FROM f "
    "WHERE s * s - a * a <> 0 "
    "AND s * s * s - 2 * a * a * s + 2 * a * a * b - s * b * b <> 0 "
    "UNION ALL "
    "SELECT priority, 2, "
    "ROUND(CAST(b * s - a * a AS DOUBLE) "
    "/ CAST(s * s - a * a AS DOUBLE), 6) FROM f "
    "WHERE s * s - a * a <> 0 "
    "AND s * s * s - 2 * a * a * s + 2 * a * a * b - s * b * b <> 0 "
    "UNION ALL "
    "SELECT priority, 3, "
    "ROUND(CAST(s * s * c - 2 * s * a * b + a * b * b + a * a * a "
    "- a * a * c AS DOUBLE) "
    "/ CAST(s * s * s - 2 * a * a * s + 2 * a * a * b - s * b * b "
    "AS DOUBLE), 6) FROM f "
    "WHERE s * s - a * a <> 0 "
    "AND s * s * s - 2 * a * a * s + 2 * a * a * b - s * b * b <> 0) "
    "ORDER BY priority, lag_k"
)


# --- Two-proportion z-test ----------------------------------------------------------


def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Two-proportion z-test** (the pooled-variance normal
    approximation; Fleiss, *Statistical Methods for Rates and
    Proportions*): do URGENT and LOW orders FINISH (status 'F') at the
    same rate? The binomial member of the testing family — Welch
    compares means, Mann-Whitney distributions, this compares rates.

    Counts are exact integers from one conditional aggregate; the two
    rates, the pooled rate and z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)) are
    fixed-shape double expressions off those integers (`dround` 6).
    Degenerate pools (p̂ ∈ {0,1}) filter on exact integers: 0 < x1+x2
    < n1+n2 in both engines.

    Scale: ONE map-side-combinable aggregate over orders."""
    orders = read_table(spark, sf_dir, "orders")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        (F.col("o_orderstatus") == "F").alias("done"),
    )
    agg = both.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("is_a") & F.col("done"), 1).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(~F.col("is_a") & F.col("done"), 1).otherwise(0))
        .cast("long")
        .alias("x2"),
    )
    n1, n2, x1, x2 = (F.col(c) for c in ("n1", "n2", "x1", "x2"))
    n1d, n2d = n1.cast("double"), n2.cast("double")
    p1 = x1.cast("double") / n1d
    p2 = x2.cast("double") / n2d
    pp = (x1 + x2).cast("double") / (n1 + n2).cast("double")
    z = (p1 - p2) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1d + F.lit(1.0) / n2d)
    )
    return agg.filter(
        ((x1 + x2) > 0) & ((x1 + x2) < (n1 + n2)) & (n1 > 0) & (n2 > 0)
    ).select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        x1.alias("x_urgent"),
        x2.alias("x_low"),
        dround(p1, 6).alias("rate_urgent"),
        dround(p2, 6).alias("rate_low"),
        dround(z, 6).alias("z_score"),
    )


QUERIES["agg_two_proportion_ztest"] = agg_two_proportion_ztest

ORACLE["agg_two_proportion_ztest"] = (
    "WITH b AS (SELECT "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "o_orderstatus = 'F' AS done FROM orders "
    f"WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')), "
    "a AS (SELECT "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    "CAST(SUM(CASE WHEN is_a AND done THEN 1 ELSE 0 END) AS BIGINT) AS x1, "
    "CAST(SUM(CASE WHEN NOT is_a AND done THEN 1 ELSE 0 END) AS BIGINT) "
    "AS x2 FROM b) "
    "SELECT n1 AS n_urgent, n2 AS n_low, x1 AS x_urgent, x2 AS x_low, "
    "ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate_urgent, "
    "ROUND(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_low, "
    "ROUND((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
    "- CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) "
    "/ sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) "
    "* (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) "
    "* (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6) "
    "AS z_score "
    "FROM a WHERE x1 + x2 > 0 AND x1 + x2 < n1 + n2 "
    "AND n1 > 0 AND n2 > 0"
)


# --- Pareto 80/20 concentration of event volume -------------------------------------


def events_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — **Pareto 80/20 concentration** of event volume over
    users: the smallest user set covering ≥80% of all events (the
    "how concentrated is engagement" question;
    `agg_gini_customer_revenue` gives the index-number view, this the
    actionable cutoff). k is found by an exact INTEGER comparison
    (5·cum ≥ 4·total — no FP threshold), counting ranks strictly below
    the cutoff; event counts and cumulative sums are exact.

    Scale: one count rollup to user grain, one global rank window (the
    documented exact-rank cost), two tiny aggregates."""
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy().orderBy(F.col("c").desc(), "user_id")
    wc = (
        Window.partitionBy()
        .orderBy(F.col("c").desc(), "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per.select(
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(wc).alias("cum"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("cum").alias("total"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    k_agg = j.agg(
        (
            F.sum(
                F.when(
                    F.lit(5) * F.col("cum") < F.lit(4) * F.col("total"),
                    1,
                ).otherwise(0)
            )
            + F.lit(1)
        )
        .cast("long")
        .alias("k")
    )
    at_k = (
        j.crossJoin(F.broadcast(k_agg))
        .filter(F.col("rn") == F.col("k"))
        .select(
            F.col("k"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("total").cast("long").alias("total_events"),
            F.col("cum").alias("cum_k"),
        )
    )
    return at_k.select(
        F.col("n_users"),
        F.col("total_events"),
        F.col("k").alias("k_users_80"),
        dround(
            F.col("k").cast("double") / F.col("n_users").cast("double"),
            6,
        ).alias("user_share"),
        dround(
            F.col("cum_k").cast("double")
            / F.col("total_events").cast("double"),
            6,
        ).alias("event_share"),
    )


QUERIES["events_pareto_8020"] = events_pareto_8020

ORACLE["events_pareto_8020"] = (
    "WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM events GROUP BY 1), "
    "r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rn, "
    "CAST(SUM(c) OVER (ORDER BY c DESC, user_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    "FROM per), "
    "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
    "CAST(MAX(cum) AS BIGINT) AS total FROM r), "
    "ka AS (SELECT CAST(SUM(CASE WHEN 5 * cum < 4 * total "
    "THEN 1 ELSE 0 END) + 1 AS BIGINT) AS k FROM r, t) "
    "SELECT n_users, total AS total_events, k AS k_users_80, "
    "ROUND(CAST(k AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS user_share, "
    "ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS event_share "
    "FROM r, t, ka WHERE rn = k"
)


# --- Customer-cohort LTV triangle ----------------------------------------------------


def rollup_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Cohort LTV triangle** — the revenue companion to
    `retention_cohorts` (which counts come-backs; this accumulates what
    they SPEND): customers are cohorted by their first order month, and
    each (cohort, month-offset) cell reports active customers, the
    cell's revenue, the cohort's cumulative revenue, and cumulative
    LTV per cohort member — the curve growth/finance teams read to
    decide payback windows (Fader & Hardie's CLV primitives, computed
    the warehouse way).

    Determinism: money via `dsum_scaled` (exact int64 cells), the
    cumulative sum runs over the SCALED integers and descales once at
    the end; per-cell money/LTV quotients round via `dround` 4 (rule
    2 — the triangle is row-per-cell). Cohort size is read off the
    offset-0 cell with a window MAX(CASE) — every member's first
    month IS offset 0, so no second scan of orders.

    Scale: one window-min over the customer partition (shuffle by
    custkey), one cell aggregate, then windows over the ~cohorts ×
    offsets triangle (tiny). No self-joins, no re-scan.

    vs reference: extends `dashboard_nfp.py`'s single-series rollups
    to the cohort triangle; no direct analogue."""
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("mon"),
        "o_totalprice",
    )
    w_cust = Window.partitionBy("o_custkey")
    base = o.select(
        "o_custkey",
        "mon",
        "o_totalprice",
        F.min("mon").over(w_cust).alias("cohort_month"),
    )
    cells = base.groupBy(
        "cohort_month",
        F.months_between(F.col("mon"), F.col("cohort_month"))
        .cast("int")
        .alias("offset_months"),
    ).agg(
        dsum_scaled("o_totalprice").alias("rev_s"),
        F.countDistinct("o_custkey").alias("active_customers"),
    )
    w_cum = (
        Window.partitionBy("cohort_month")
        .orderBy("offset_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_coh = Window.partitionBy("cohort_month")
    staged = cells.select(
        "cohort_month",
        "offset_months",
        "active_customers",
        "rev_s",
        F.sum("rev_s").over(w_cum).alias("cum_s"),
        F.max(
            F.when(F.col("offset_months") == 0, F.col("active_customers"))
        )
        .over(w_coh)
        .alias("cohort_customers"),
    )
    return staged.select(
        "cohort_month",
        "offset_months",
        "active_customers",
        F.col("cohort_customers").cast("long").alias("cohort_customers"),
        dround(F.col("rev_s").cast("double") / 10000.0, 4).alias(
            "month_revenue"
        ),
        dround(F.col("cum_s").cast("double") / 10000.0, 4).alias(
            "cum_revenue"
        ),
        dround(
            F.col("cum_s").cast("double")
            / 10000.0
            / F.col("cohort_customers").cast("double"),
            4,
        ).alias("cum_ltv_per_customer"),
    ).orderBy("cohort_month", "offset_months")


QUERIES["rollup_cohort_ltv"] = rollup_cohort_ltv

ORACLE["rollup_cohort_ltv"] = (
    "WITH o AS (SELECT o_custkey, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "o_totalprice FROM orders), "
    "b AS (SELECT o_custkey, mon, o_totalprice, "
    "MIN(mon) OVER (PARTITION BY o_custkey) AS cohort_month FROM o), "
    "cell AS (SELECT cohort_month, "
    "CAST(date_diff('month', cohort_month, mon) AS INT) AS offset_months, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s, "
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers "
    "FROM b GROUP BY 1, 2), "
    "w AS (SELECT cohort_month, offset_months, active_customers, rev_s, "
    "CAST(SUM(rev_s) OVER (PARTITION BY cohort_month ORDER BY "
    "offset_months ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS BIGINT) AS cum_s, "
    "CAST(MAX(CASE WHEN offset_months = 0 THEN active_customers END) "
    "OVER (PARTITION BY cohort_month) AS BIGINT) AS cohort_customers "
    "FROM cell) "
    "SELECT cohort_month, offset_months, active_customers, "
    "cohort_customers, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS month_revenue, "
    "ROUND(CAST(cum_s AS DOUBLE) / 10000.0, 4) AS cum_revenue, "
    "ROUND(CAST(cum_s AS DOUBLE) / 10000.0 "
    "/ CAST(cohort_customers AS DOUBLE), 4) AS cum_ltv_per_customer "
    "FROM w ORDER BY cohort_month, offset_months"
)


# --- Mutual information of the status x priority contingency table -------------------

# per-term c*ln(c) scale for the three exact entropy sums (the
# corpus_entropy_by_source device); envelope: term*scale must fit int64
_MI_SCALE = 100_000_000


def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Mutual information + normalized MI** of order status x priority
    (Cover & Thomas ch. 2) — the information-theoretic member of the
    association family: `agg_chi_square_independence` tests the null,
    `agg_contingency_effect_sizes` sizes it in chi-square units, this
    measures it in nats as MI = H(row) + H(col) - H(joint), with
    NMI = MI / sqrt(H(row)*H(col)) (Strehl & Ghosh 2002).

    Determinism: every entropy uses the factored exact form
    H = ln N - (SUM c*ln c)/N where the per-TYPE `c*ln c` terms sum as
    scaled int64 (`dsum_scaled`, associativity-proof). The row/column
    marginal sums are deduplicated with a per-cell ROW_NUMBER == 1
    guard so the whole statistic comes from ONE aggregate over the
    windowed 9-cell frame — one scan of orders, no re-executed
    subtrees (CLAUDE.md rule 5).

    Scale: one map-side-combinable cell count over orders; everything
    downstream runs on the #statuses x #priorities frame."""
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy()
    w_r = Window.partitionBy("o_orderstatus")
    w_c = Window.partitionBy("o_orderpriority")
    w_rn_r = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    w_rn_c = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    x = cells.select(
        F.col("c"),
        F.sum("c").over(w_r).alias("r"),
        F.sum("c").over(w_c).alias("s"),
        F.sum("c").over(w_all).alias("n"),
        (F.row_number().over(w_rn_r) == 1).alias("first_of_row"),
        (F.row_number().over(w_rn_c) == 1).alias("first_of_col"),
    )
    ln = F.log
    agg = x.agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("first_of_row"), 1).otherwise(0))
        .cast("long")
        .alias("n_status"),
        F.sum(F.when(F.col("first_of_col"), 1).otherwise(0))
        .cast("long")
        .alias("n_priority"),
        dsum_scaled(
            F.col("c").cast("double") * ln(F.col("c").cast("double")),
            _MI_SCALE,
        ).alias("sj"),
        dsum_scaled(
            F.when(
                F.col("first_of_row"),
                F.col("r").cast("double") * ln(F.col("r").cast("double")),
            ).otherwise(F.lit(0.0)),
            _MI_SCALE,
        ).alias("sr"),
        dsum_scaled(
            F.when(
                F.col("first_of_col"),
                F.col("s").cast("double") * ln(F.col("s").cast("double")),
            ).otherwise(F.lit(0.0)),
            _MI_SCALE,
        ).alias("sc"),
    )
    nd = F.col("n").cast("double")
    h_joint = ln(nd) - F.col("sj").cast("double") / _MI_SCALE / nd
    h_row = ln(nd) - F.col("sr").cast("double") / _MI_SCALE / nd
    h_col = ln(nd) - F.col("sc").cast("double") / _MI_SCALE / nd
    mi = h_row + h_col - h_joint
    return agg.filter(F.col("n") > 0).select(
        F.col("n").cast("long").alias("n_orders"),
        "n_status",
        "n_priority",
        dround(h_row, 6).alias("h_status"),
        dround(h_col, 6).alias("h_priority"),
        dround(h_joint, 6).alias("h_joint"),
        dround(mi, 6).alias("mi_nats"),
        dround(F.try_divide(mi, F.sqrt(h_row * h_col)), 6).alias("nmi"),
    )


QUERIES["agg_mutual_information"] = agg_mutual_information

ORACLE["agg_mutual_information"] = (
    "WITH cells AS (SELECT o_orderstatus, o_orderpriority, "
    "CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY 1, 2), "
    "x AS (SELECT c, "
    "SUM(c) OVER (PARTITION BY o_orderstatus) AS r, "
    "SUM(c) OVER (PARTITION BY o_orderpriority) AS s, "
    "SUM(c) OVER () AS n, "
    "ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_orderpriority) = 1 AS first_of_row, "
    "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_orderstatus) = 1 AS first_of_col FROM cells), "
    "a AS (SELECT CAST(MAX(n) AS BIGINT) AS n, "
    "CAST(SUM(CASE WHEN first_of_row THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_status, "
    "CAST(SUM(CASE WHEN first_of_col THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_priority, "
    "CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) "
    f"* {_MI_SCALE}) AS BIGINT)) AS BIGINT) AS sj, "
    "CAST(SUM(CAST(ROUND(CASE WHEN first_of_row THEN "
    "CAST(r AS DOUBLE) * ln(CAST(r AS DOUBLE)) ELSE 0.0 END "
    f"* {_MI_SCALE}) AS BIGINT)) AS BIGINT) AS sr, "
    "CAST(SUM(CAST(ROUND(CASE WHEN first_of_col THEN "
    "CAST(s AS DOUBLE) * ln(CAST(s AS DOUBLE)) ELSE 0.0 END "
    f"* {_MI_SCALE}) AS BIGINT)) AS BIGINT) AS sc FROM x) "
    "SELECT n AS n_orders, n_status, n_priority, "
    f"ROUND(ln(CAST(n AS DOUBLE)) - CAST(sr AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE), 6) AS h_status, "
    f"ROUND(ln(CAST(n AS DOUBLE)) - CAST(sc AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE), 6) AS h_priority, "
    f"ROUND(ln(CAST(n AS DOUBLE)) - CAST(sj AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE), 6) AS h_joint, "
    f"ROUND((ln(CAST(n AS DOUBLE)) - CAST(sr AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)) "
    f"+ (ln(CAST(n AS DOUBLE)) - CAST(sc AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)) "
    f"- (ln(CAST(n AS DOUBLE)) - CAST(sj AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)), 6) AS mi_nats, "
    f"ROUND(((ln(CAST(n AS DOUBLE)) - CAST(sr AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)) "
    f"+ (ln(CAST(n AS DOUBLE)) - CAST(sc AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)) "
    f"- (ln(CAST(n AS DOUBLE)) - CAST(sj AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE))) "
    f"/ sqrt((ln(CAST(n AS DOUBLE)) - CAST(sr AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE)) "
    f"* (ln(CAST(n AS DOUBLE)) - CAST(sc AS DOUBLE) / {_MI_SCALE} "
    "/ CAST(n AS DOUBLE))), 6) AS nmi "
    "FROM a WHERE n > 0"
)


# --- AR(1) mean-reversion fit + half-life off the monthly revenue series --------------


def timeseries_ar1_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**AR(1) fit + mean-reversion half-life** of the monthly total
    revenue series: regress y_t on y_{t-1} by OLS, report phi (the
    lag-1 persistence), the implied intercept, and the Ornstein-
    Uhlenbeck-style half-life ln(1/2)/ln(phi) — "how many months for a
    shock to decay halfway back" (Hamilton, *Time Series Analysis*
    §4; the mean-reversion diagnostic quants run right after the ACF,
    whose lag-1 bar this turns into months).

    Determinism: with z_x = n*x - SUM(x) (the mean-centering cleared of
    /n, the `timeseries_acf` device), phi = SUM(z_x*z_y)/SUM(z_x^2) —
    the n^2 cancels — so numerator and denominator are EXACT integer
    sums (decimal(18,0) products -> decimal(38) in Spark == HUGEINT in
    DuckDB). The stationarity gate 0 < phi < 1 filters on the exact
    integers (0 < num < den), never on a rounded double; each emitted
    double is one fixed-shape expression off the exact sums (`dround`).

    Scale: corpus-sized work is the monthly rollup (map-side partial
    over orders); the lag pairing and the five sums run on the
    ~80-row monthly frame. Same int64 envelope as `timeseries_acf`."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(dsum_scaled("o_totalprice").alias("y_s"))
    w_lag = Window.orderBy("mon")
    pairs = m.select(
        F.col("y_s").alias("y"), F.lag("y_s").over(w_lag).alias("x")
    ).filter(F.col("x").isNotNull())
    w_all = Window.partitionBy()
    z = pairs.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        (F.count(F.lit(1)).over(w_all) * F.col("x") - F.sum("x").over(w_all))
        .cast("decimal(18,0)")
        .alias("zx"),
        (F.count(F.lit(1)).over(w_all) * F.col("y") - F.sum("y").over(w_all))
        .cast("decimal(18,0)")
        .alias("zy"),
        F.col("x"),
        F.col("y"),
    )
    s = z.groupBy("n").agg(
        F.sum(F.col("zx") * F.col("zy")).alias("num"),
        F.sum(F.col("zx") * F.col("zx")).alias("den"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    nd = F.col("n").cast("double")
    phi = F.col("num").cast("double") / F.col("den").cast("double")
    intercept = (
        (F.col("sy").cast("double") - phi * F.col("sx").cast("double"))
        / nd
        / 10000.0
    )
    # phi/intercept always emitted; the half-life only exists on a
    # stationary positive-persistence fit, gated in EXACT integer space
    # (0 < num < den). Spark ln(x<=0) is NULL (never aborts); DuckDB
    # ln(x<=0) ERRORS, so the oracle gates with a lazy CASE (rule 4).
    return s.filter(F.col("den") > 0).select(
        F.col("n").cast("long").alias("n_pairs"),
        dround(phi, 6).alias("phi"),
        dround(intercept, 4).alias("intercept_monthly"),
        dround(
            F.when(
                (F.col("num") > 0) & (F.col("num") < F.col("den")),
                F.log(F.lit(0.5)) / F.log(phi),
            ),
            6,
        ).alias("halflife_months"),
    )


QUERIES["timeseries_ar1_halflife"] = timeseries_ar1_halflife

ORACLE["timeseries_ar1_halflife"] = (
    "WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y_s FROM orders GROUP BY 1), "
    "p AS (SELECT y_s AS y, LAG(y_s) OVER (ORDER BY mon) AS x FROM m), "
    "q AS (SELECT x, y FROM p WHERE x IS NOT NULL), "
    "z AS (SELECT COUNT(*) OVER () AS n, "
    "CAST(COUNT(*) OVER () * x - SUM(x) OVER () AS HUGEINT) AS zx, "
    "CAST(COUNT(*) OVER () * y - SUM(y) OVER () AS HUGEINT) AS zy, "
    "x, y FROM q), "
    "s AS (SELECT n, SUM(zx * zy) AS num, SUM(zx * zx) AS den, "
    "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy "
    "FROM z GROUP BY n) "
    "SELECT CAST(n AS BIGINT) AS n_pairs, "
    "ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS phi, "
    "ROUND((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) "
    "/ CAST(den AS DOUBLE) * CAST(sx AS DOUBLE)) "
    "/ CAST(n AS DOUBLE) / 10000.0, 4) AS intercept_monthly, "
    "ROUND(CASE WHEN num > 0 AND num < den THEN "
    "ln(0.5) / ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) END, 6) "
    "AS halflife_months "
    "FROM s WHERE den > 0"
)


# --- Candidate-key uniqueness profile (one GROUPING SETS pass) ------------------------


def dq_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Candidate-key uniqueness profile** — the data-contract check
    run before declaring a primary key or a merge key: for each
    candidate (the declared PK `o_orderkey`, and the business key
    `(o_custkey, o_orderdate)` an upsert pipeline might be tempted to
    merge on), report group counts, duplicate groups/rows and max
    multiplicity. Completes the dq pack: `dq_completeness_profile`
    profiles NULLs per column, this profiles uniqueness per KEY.

    Both candidates are counted in ONE scan via GROUPING SETS
    (Spark 4's `DataFrame.groupingSets` == DuckDB `GROUP BY GROUPING
    SETS`) — the one-groupby-per-candidate alternative re-reads the
    fact table once per key (CLAUDE.md rule 5). All outputs exact
    integers; `is_unique` compares them in integer space.

    Scale: one expanded aggregate (map-side combinable per set);
    the per-candidate rollup runs on group-count rows."""
    orders = read_table(spark, sf_dir, "orders")
    g = orders.groupingSets(
        [[F.col("o_orderkey")], [F.col("o_custkey"), F.col("o_orderdate")]],
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderdate"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.grouping("o_orderkey").alias("g_ok"),
    )
    prof = g.groupBy(
        F.when(F.col("g_ok") == 0, F.lit("o_orderkey"))
        .otherwise(F.lit("o_custkey,o_orderdate"))
        .alias("candidate_key")
    ).agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        .cast("long")
        .alias("dup_groups"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        .cast("long")
        .alias("dup_rows"),
        F.max("c").alias("max_multiplicity"),
    )
    return prof.select(
        "candidate_key",
        "n_rows",
        "n_groups",
        "dup_groups",
        "dup_rows",
        "max_multiplicity",
        F.when(F.col("n_groups") == F.col("n_rows"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_unique"),
    ).orderBy("candidate_key")


QUERIES["dq_key_uniqueness"] = dq_key_uniqueness

ORACLE["dq_key_uniqueness"] = (
    "WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) AS c, "
    "GROUPING(o_orderkey) AS g_ok FROM orders "
    "GROUP BY GROUPING SETS ((o_orderkey), (o_custkey, o_orderdate))), "
    "p AS (SELECT CASE WHEN g_ok = 0 THEN 'o_orderkey' "
    "ELSE 'o_custkey,o_orderdate' END AS candidate_key, "
    "CAST(SUM(c) AS BIGINT) AS n_rows, "
    "CAST(COUNT(*) AS BIGINT) AS n_groups, "
    "CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS dup_groups, "
    "CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) "
    "AS dup_rows, "
    "CAST(MAX(c) AS BIGINT) AS max_multiplicity FROM g GROUP BY 1) "
    "SELECT candidate_key, n_rows, n_groups, dup_groups, dup_rows, "
    "max_multiplicity, "
    "CASE WHEN n_groups = n_rows THEN 1 ELSE 0 END AS is_unique "
    "FROM p ORDER BY candidate_key"
)


# --- Rolling 6-month OLS trend slope per priority -------------------------------------


def window_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Rolling OLS trend slope** — the windowed member of the trend
    family (`agg_linear_trend` fits one global line; this fits a
    6-month line ENDING AT EVERY MONTH, per priority): the local
    trend/momentum signal (slope in $/month) analysts overlay on the
    monthly series, with the window mean as its level companion.

    Determinism: x is the month ordinal (ROW_NUMBER over the monthly
    frame), y the scaled-int64 monthly revenue, so the five trailing
    sums (n, Σx, Σy, Σxy, Σx²) are EXACT integers; the slope
    (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) is one division of exact values per row
    (`dround` 4 after descaling). Only full windows emit (n = 6,
    integer compare), so the denominator is the fixed positive
    constant of six distinct x's — no zero-division branch at all.

    The trailing-sum windows order by `mon` — the ORIGINAL key the
    row-number was numbered over — never by the derived `x`
    (CLAUDE.md rule 5: Catalyst cannot prove the aliases equivalent
    and would re-sort between the stacked windows).

    Scale: one monthly rollup (map-side partial over orders), then
    two stacked windows sharing ONE sort per priority partition."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("y_s"))
    w_rn = Window.partitionBy("priority").orderBy("mon")
    t = m.select(
        "priority",
        "mon",
        "y_s",
        F.row_number().over(w_rn).cast("long").alias("x"),
    )
    w6 = (
        Window.partitionBy("priority")
        .orderBy("mon")
        .rowsBetween(-5, Window.currentRow)
    )
    s = t.select(
        "priority",
        "mon",
        F.count(F.lit(1)).over(w6).alias("n"),
        F.sum("x").over(w6).alias("sx"),
        F.sum("y_s").over(w6).alias("sy"),
        F.sum(F.col("x") * F.col("y_s")).over(w6).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w6).alias("sx2"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return s.filter(F.col("n") == 6).select(
        "priority",
        F.col("mon").alias("month"),
        dround(
            num.cast("double") / den.cast("double") / 10000.0, 4
        ).alias("slope_monthly"),
        dround(
            F.col("sy").cast("double") / F.col("n").cast("double") / 10000.0,
            4,
        ).alias("mean_monthly"),
    ).orderBy("priority", "month")


QUERIES["window_rolling_ols_slope"] = window_rolling_ols_slope

ORACLE["window_rolling_ols_slope"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y_s FROM orders GROUP BY 1, 2), "
    "t AS (SELECT priority, mon, y_s, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) "
    "AS BIGINT) AS x FROM m), "
    "s AS (SELECT priority, mon, "
    "CAST(COUNT(*) OVER w6 AS BIGINT) AS n, "
    "CAST(SUM(x) OVER w6 AS BIGINT) AS sx, "
    "CAST(SUM(y_s) OVER w6 AS BIGINT) AS sy, "
    "CAST(SUM(x * y_s) OVER w6 AS BIGINT) AS sxy, "
    "CAST(SUM(x * x) OVER w6 AS BIGINT) AS sx2 FROM t "
    "WINDOW w6 AS (PARTITION BY priority ORDER BY mon "
    "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)) "
    "SELECT priority, mon AS month, "
    "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
    "/ CAST(n * sx2 - sx * sx AS DOUBLE) / 10000.0, 4) AS slope_monthly, "
    "ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 4) "
    "AS mean_monthly "
    "FROM s WHERE n = 6 ORDER BY priority, month"
)


# --- Log-log price elasticity of demand per brand --------------------------------------

_ELAST_SCALE = 1_000_000_000  # per-row ln() values scaled to int64 (9 dp)


def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Price elasticity of demand** per part brand — the log-log OLS
    slope d ln(quantity)/d ln(unit price) over lineitems (the
    econometrics-101 estimate; elasticity < -1 = elastic demand), with
    r² as the fit diagnostic — the pricing-analytics question an OLAP
    engine over a sales fact table exists to answer.

    Determinism: per-row ln(unit price) and ln(quantity) scale to
    int64 at 9 dp (`_nearest_long_away`, bitwise == DuckDB
    ROUND(x*1e9)); per-brand Σx, Σy, Σxy, Σx², Σy² are then EXACT
    (products as decimal(18,0)² -> decimal(38) ≡ HUGEINT — a single
    product already exceeds int64). Slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    — the per-row scale cancels — is one division of exact values;
    r² = num²/(den_x·den_y) evaluates in fixed-shape doubles (num² at
    ~1e60 exceeds every exact type). `dround` 6 on both.

    Scale: broadcast the part dim (25 brands), one map-side-combinable
    aggregate over the fact scan — no windows, no self-joins; the
    sargable positivity filters reach the parquet scan."""
    from ..functions.numerics import _nearest_long_away

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    xs = _nearest_long_away(
        F.log(F.col("l_extendedprice") / F.col("l_quantity"))
        * _ELAST_SCALE
    ).cast("decimal(18,0)")
    ys = _nearest_long_away(
        F.log(F.col("l_quantity")) * _ELAST_SCALE
    ).cast("decimal(18,0)")
    s = j.select(F.col("p_brand").alias("brand"), xs.alias("x"), ys.alias("y")).groupBy(
        "brand"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n_dec = F.col("n").cast("decimal(12,0)")
    num = n_dec * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = n_dec * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n_dec * F.col("syy") - F.col("sy") * F.col("sy")
    num_d, denx_d, deny_d = (
        num.cast("double"),
        den_x.cast("double"),
        den_y.cast("double"),
    )
    return s.filter((den_x > 0) & (den_y > 0)).select(
        "brand",
        F.col("n").cast("long").alias("n_items"),
        dround(num_d / denx_d, 6).alias("elasticity"),
        dround(num_d * num_d / (denx_d * deny_d), 6).alias("r2"),
    ).orderBy("brand")


QUERIES["agg_price_elasticity"] = agg_price_elasticity

ORACLE["agg_price_elasticity"] = (
    "WITH j AS (SELECT p.p_brand AS brand, "
    f"CAST(ROUND(ln(l_extendedprice / l_quantity) * {_ELAST_SCALE}) "
    "AS HUGEINT) AS x, "
    f"CAST(ROUND(ln(l_quantity) * {_ELAST_SCALE}) AS HUGEINT) AS y "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE l_quantity > 0 AND l_extendedprice > 0), "
    "s AS (SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n, "
    "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, "
    "SUM(x * x) AS sxx, SUM(y * y) AS syy FROM j GROUP BY 1), "
    "d AS (SELECT brand, n, n * sxy - sx * sy AS num, "
    "n * sxx - sx * sx AS den_x, n * syy - sy * sy AS den_y FROM s) "
    "SELECT brand, CAST(n AS BIGINT) AS n_items, "
    "ROUND(CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE), 6) AS elasticity, "
    "ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) "
    "/ (CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)), 6) AS r2 "
    "FROM d WHERE den_x > 0 AND den_y > 0 ORDER BY brand"
)


# --- Benjamini-Hochberg FDR over the per-year rate-difference tests -------------------

_BH_Q = 0.10  # target false-discovery rate
# Abramowitz & Stegun 26.2.17 Phi(z) polynomial (|error| < 7.5e-8)
_AS_T = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Benjamini-Hochberg FDR control** (Benjamini & Hochberg 1995)
    over a FAMILY of hypotheses — the multiple-testing discipline the
    per-test operators (`agg_two_proportion_ztest` et al.) need the
    moment they run per-group: here, one URGENT-vs-LOW finish-rate
    z-test PER SHIP YEAR, p-values via the Abramowitz-Stegun 26.2.17
    normal-CDF polynomial (|err| < 7.5e-8; closed-form, so BOTH engines
    evaluate the identical double expression — no stats library), then
    the BH step-up: sort p ascending, reject all ranks <= the largest i
    with p_(i) <= (i/m)q.

    Determinism: counts are exact integers per year; z, p and the BH
    threshold are fixed-shape double expressions off those integers —
    the step-up comparison runs on the UNROUNDED doubles identically in
    both engines; displayed values `dround` 6. Degenerate years filter
    in integer space first, so m is the tested-family size.

    Scale: one conditional aggregate over orders; the BH machinery
    runs on the ~7-row family."""
    orders = read_table(spark, sf_dir, "orders")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        F.year("o_orderdate").cast("int").alias("ship_year"),
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        (F.col("o_orderstatus") == "F").alias("done"),
    )
    agg = both.groupBy("ship_year").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("is_a") & F.col("done"), 1).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(~F.col("is_a") & F.col("done"), 1).otherwise(0))
        .cast("long")
        .alias("x2"),
    )
    n1, n2, x1, x2 = (F.col(c) for c in ("n1", "n2", "x1", "x2"))
    tested = agg.filter(
        ((x1 + x2) > 0) & ((x1 + x2) < (n1 + n2)) & (n1 > 0) & (n2 > 0)
    )
    n1d, n2d = n1.cast("double"), n2.cast("double")
    p1 = x1.cast("double") / n1d
    p2 = x2.cast("double") / n2d
    pp = (x1 + x2).cast("double") / (n1 + n2).cast("double")
    z = (p1 - p2) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1d + F.lit(1.0) / n2d)
    )
    za = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_T) * za)
    poly = (
        F.lit(_AS_B[0]) * t
        + F.lit(_AS_B[1]) * t * t
        + F.lit(_AS_B[2]) * t * t * t
        + F.lit(_AS_B[3]) * t * t * t * t
        + F.lit(_AS_B[4]) * t * t * t * t * t
    )
    pdf = F.lit(_INV_SQRT_2PI) * F.exp(F.lit(-0.5) * za * za)
    pval = F.lit(2.0) * pdf * poly
    scored = tested.select(
        "ship_year", "n1", "n2", "x1", "x2",
        z.alias("z"), pval.alias("p"),
    )
    w_rank = Window.orderBy(F.col("p").asc(), "ship_year")
    w_all = Window.partitionBy()
    ranked = scored.select(
        "*",
        F.row_number().over(w_rank).alias("p_rank"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    crit = (
        F.col("p_rank").cast("double")
        / F.col("m").cast("double")
        * F.lit(_BH_Q)
    )
    flagged = ranked.select(
        "*",
        crit.alias("crit"),
        F.max(F.when(F.col("p") <= crit, F.col("p_rank"))).over(w_all).alias(
            "k_max"
        ),
    )
    return flagged.select(
        "ship_year",
        "n1",
        "n2",
        "x1",
        "x2",
        dround(F.col("z"), 6).alias("z_score"),
        dround(F.col("p"), 6).alias("p_value"),
        F.col("p_rank").cast("int").alias("p_rank"),
        F.col("m").cast("long").alias("m_tests"),
        dround(F.col("crit"), 6).alias("bh_crit"),
        F.when(F.col("p_rank") <= F.col("k_max"), 1)
        .otherwise(0)
        .cast("int")
        .alias("rejected"),
    ).orderBy("ship_year")


QUERIES["agg_benjamini_hochberg"] = agg_benjamini_hochberg

_BH_Z = (
    "(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
    "- CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) "
    "/ sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) "
    "* (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) "
    "* (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))"
)

ORACLE["agg_benjamini_hochberg"] = (
    "WITH b AS (SELECT CAST(year(o_orderdate) AS INT) AS ship_year, "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "o_orderstatus = 'F' AS done FROM orders "
    f"WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')), "
    "a AS (SELECT ship_year, "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    "CAST(SUM(CASE WHEN is_a AND done THEN 1 ELSE 0 END) AS BIGINT) "
    "AS x1, "
    "CAST(SUM(CASE WHEN NOT is_a AND done THEN 1 ELSE 0 END) AS BIGINT) "
    "AS x2 FROM b GROUP BY 1), "
    "tested AS (SELECT * FROM a WHERE x1 + x2 > 0 "
    "AND x1 + x2 < n1 + n2 AND n1 > 0 AND n2 > 0), "
    f"sc AS (SELECT ship_year, n1, n2, x1, x2, {_BH_Z} AS z FROM tested), "
    f"pv AS (SELECT *, 2.0 * ({_INV_SQRT_2PI} "
    "* exp(-0.5 * abs(z) * abs(z))) * ("
    f"{_AS_B[0]} * (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"+ {_AS_B[1]} * (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"+ {_AS_B[2]} * (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"+ {_AS_B[3]} * (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"+ {_AS_B[4]} * (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z))) "
    f"* (1.0 / (1.0 + {_AS_T} * abs(z)))) AS p FROM sc), "
    "rk AS (SELECT *, "
    "ROW_NUMBER() OVER (ORDER BY p ASC, ship_year) AS p_rank, "
    "COUNT(*) OVER () AS m FROM pv), "
    "fl AS (SELECT *, "
    f"CAST(p_rank AS DOUBLE) / CAST(m AS DOUBLE) * {_BH_Q} AS crit, "
    "MAX(CASE WHEN p <= CAST(p_rank AS DOUBLE) / CAST(m AS DOUBLE) "
    f"* {_BH_Q} THEN p_rank END) OVER () AS k_max FROM rk) "
    "SELECT ship_year, n1, n2, x1, x2, "
    "ROUND(z, 6) AS z_score, ROUND(p, 6) AS p_value, "
    "CAST(p_rank AS INT) AS p_rank, CAST(m AS BIGINT) AS m_tests, "
    "ROUND(crit, 6) AS bh_crit, "
    "CAST(CASE WHEN p_rank <= k_max THEN 1 ELSE 0 END AS INT) "
    "AS rejected "
    "FROM fl ORDER BY ship_year"
)


# --- Exact 10%-trimmed mean per year ---------------------------------------------------


def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Exact trimmed mean** (10% per tail) of order value per year —
    the robust-location companion to `agg_percentiles` (median) and
    `norm_winsorize_clip` (which CLAMPS the tails; trimming DROPS
    them): rank each year's orders, discard exactly k = floor(n/10)
    rows from each tail, average the middle — the robust KPI that
    survives the mega-order outliers `dq_anomaly_mad` flags.

    Determinism: the trim boundary is pure integer logic on a
    ROW_NUMBER that tiebreaks on the unique order key (k from n by
    integer division — no interpolation, no percentile edge cases);
    the surviving rows sum via `dsum` (exact scaled int64). The plain
    mean is emitted alongside so the outlier pull (mean − trimmed) is
    visible per year.

    Scale: one exchange per year partition (rank window + conditional
    aggregate share it)."""
    orders = read_table(spark, sf_dir, "orders")
    w_rank = Window.partitionBy(F.year("o_orderdate")).orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_n = Window.partitionBy(F.year("o_orderdate"))
    r = orders.select(
        F.year("o_orderdate").cast("int").alias("year"),
        "o_totalprice",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    k = F.floor(F.col("n") / 10)
    kept = F.col("o_totalprice").isNotNull() & (F.col("rn") > k) & (
        F.col("rn") <= F.col("n") - k
    )
    agg = r.groupBy("year").agg(
        F.max("n").alias("n_orders"),
        F.max(k).alias("k_trim"),
        dsum_scaled(F.when(kept, F.col("o_totalprice")).otherwise(F.lit(0.0)))
        .alias("kept_s"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        dsum_scaled("o_totalprice").alias("all_s"),
    )
    return agg.select(
        "year",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("k_trim").cast("long").alias("k_trim"),
        dround(
            F.col("all_s").cast("double")
            / 10000.0
            / F.col("n_orders").cast("double"),
            4,
        ).alias("mean_price"),
        dround(
            F.col("kept_s").cast("double")
            / 10000.0
            / F.col("n_kept").cast("double"),
            4,
        ).alias("trimmed_mean_price"),
    ).orderBy("year")


QUERIES["agg_trimmed_mean"] = agg_trimmed_mean

ORACLE["agg_trimmed_mean"] = (
    "WITH r AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
    "o_totalprice, "
    "ROW_NUMBER() OVER (PARTITION BY year(o_orderdate) "
    "ORDER BY o_totalprice, o_orderkey) AS rn, "
    "COUNT(*) OVER (PARTITION BY year(o_orderdate)) AS n FROM orders), "
    "a AS (SELECT year, CAST(MAX(n) AS BIGINT) AS n_orders, "
    "CAST(MAX(n // 10) AS BIGINT) AS k_trim, "
    "CAST(SUM(CAST(ROUND(CASE WHEN o_totalprice IS NOT NULL "
    "AND rn > n // 10 AND rn <= n - n // 10 THEN o_totalprice "
    "ELSE 0.0 END * 10000) AS BIGINT)) AS BIGINT) AS kept_s, "
    "CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND rn > n // 10 "
    "AND rn <= n - n // 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS all_s FROM r GROUP BY 1) "
    "SELECT year, n_orders, k_trim, "
    "ROUND(CAST(all_s AS DOUBLE) / 10000.0 "
    "/ CAST(n_orders AS DOUBLE), 4) AS mean_price, "
    "ROUND(CAST(kept_s AS DOUBLE) / 10000.0 "
    "/ CAST(n_kept AS DOUBLE), 4) AS trimmed_mean_price "
    "FROM a ORDER BY year"
)


# --- FPP seasonal/trend strength off the classical decomposition ----------------------


def timeseries_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Trend and seasonal strength** (Hyndman & Athanasopoulos FPP
    §4.3; the STL-features pair every forecasting triage starts with):
    F_trend = max(0, 1 − Var(R)/Var(T+R)) and F_seasonal = max(0,
    1 − Var(R)/Var(S+R)) per priority, computed off the SAME exact
    integer components as `timeseries_classical_decompose` (T+R = the
    deseasonalized series, S+R = the detrended series — both already
    exact by that operator's construction).

    Determinism: all three series re-express in ONE common integer
    unit (1/(6e6·n_moy) dollars — the lcm of the trend's 24·1e4 and
    the centered seasonal's n_moy·1e6 scales), so each variance
    numerator n·Σv²−(Σv)² is EXACT (decimal(18,0)² -> decimal(38) ≡
    HUGEINT; the common n cancels in the ratio); each strength is one
    division + `greatest(0, 1−·)` of fixed-shape doubles, `dround` 6.
    Degenerate variances filter on the exact integers.

    Scale: identical physical shape to the decompose (one monthly
    rollup, one window exchange per series, a broadcast seasonal
    join); the variance rollup adds one map-side-combinable
    aggregate over the ~80-row overlap frame."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    wo = Window.partitionBy("priority").orderBy("mon")
    w11 = wo.rowsBetween(-5, 5)
    w = m.select(
        "priority",
        "mon",
        "rev_s",
        F.count(F.lit(1)).over(w11).alias("cnt11"),
        F.sum("rev_s").over(w11).alias("sum11"),
        F.lag("rev_s", 6).over(wo).alias("lag6"),
        F.lead("rev_s", 6).over(wo).alias("lead6"),
    )
    t = (
        w.filter(
            (F.col("cnt11") == 11)
            & F.col("lag6").isNotNull()
            & F.col("lead6").isNotNull()
        )
        .select(
            "priority",
            "mon",
            "rev_s",
            F.month("mon").alias("moy"),
            (2 * F.col("sum11") + F.col("lag6") + F.col("lead6")).alias("t24"),
        )
        .withColumn("d24", 24 * F.col("rev_s") - F.col("t24"))
    )
    s = t.groupBy("priority", "moy").agg(
        F.sum("d24").alias("sum_d"), F.count(F.lit(1)).alias("cnt")
    )
    mag = F.expr("(2 * abs(25 * sum_d) + 6 * cnt) DIV (12 * cnt)")
    sm = s.select(
        "priority",
        "moy",
        F.when(F.col("sum_d") >= 0, mag).otherwise(-mag).alias("s_micro"),
    )
    wp = Window.partitionBy("priority")
    sc = sm.select(
        "priority",
        "moy",
        "s_micro",
        F.count(F.lit(1)).over(wp).alias("n_moy"),
        F.sum("s_micro").over(wp).alias("tot_micro"),
    )
    joined = t.join(F.broadcast(sc), ["priority", "moy"])
    s_cent = F.col("n_moy") * F.col("s_micro") - F.col("tot_micro")
    u = joined.select(
        "priority",
        (25 * F.col("n_moy") * F.col("d24") - 6 * s_cent)
        .cast("decimal(18,0)")
        .alias("r_u"),
        (25 * F.col("n_moy") * F.col("d24")).cast("decimal(18,0)").alias("d_u"),
        (600 * F.col("n_moy") * F.col("rev_s") - 6 * s_cent)
        .cast("decimal(18,0)")
        .alias("ys_u"),
    )
    a = u.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_u").alias("sr"),
        F.sum(F.col("r_u") * F.col("r_u")).alias("srr"),
        F.sum("d_u").alias("sd"),
        F.sum(F.col("d_u") * F.col("d_u")).alias("sdd"),
        F.sum("ys_u").alias("sy"),
        F.sum(F.col("ys_u") * F.col("ys_u")).alias("syy"),
    )
    n_dec = F.col("n").cast("decimal(12,0)")
    var_r = n_dec * F.col("srr") - F.col("sr") * F.col("sr")
    var_d = n_dec * F.col("sdd") - F.col("sd") * F.col("sd")
    var_ys = n_dec * F.col("syy") - F.col("sy") * F.col("sy")
    return a.filter((var_d > 0) & (var_ys > 0)).select(
        "priority",
        F.col("n").cast("long").alias("n_months"),
        dround(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - var_r.cast("double") / var_ys.cast("double"),
            ),
            6,
        ).alias("f_trend"),
        dround(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - var_r.cast("double") / var_d.cast("double"),
            ),
            6,
        ).alias("f_seasonal"),
    ).orderBy("priority")


QUERIES["timeseries_seasonal_strength"] = timeseries_seasonal_strength

ORACLE["timeseries_seasonal_strength"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "w AS (SELECT priority, mon, rev_s, "
    "COUNT(*) OVER win11 AS cnt11, "
    "CAST(SUM(rev_s) OVER win11 AS BIGINT) AS sum11, "
    "LAG(rev_s, 6) OVER wino AS lag6, "
    "LEAD(rev_s, 6) OVER wino AS lead6 "
    "FROM m WINDOW wino AS (PARTITION BY priority ORDER BY mon), "
    "win11 AS (PARTITION BY priority ORDER BY mon "
    "ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)), "
    "t AS (SELECT priority, mon, rev_s, MONTH(mon) AS moy, "
    "24 * rev_s - (2 * sum11 + lag6 + lead6) AS d24 "
    "FROM w WHERE cnt11 = 11 AND lag6 IS NOT NULL "
    "AND lead6 IS NOT NULL), "
    "s AS (SELECT priority, moy, CAST(SUM(d24) AS BIGINT) AS sum_d, "
    "COUNT(*) AS cnt FROM t GROUP BY 1, 2), "
    "sm AS (SELECT priority, moy, CASE WHEN sum_d >= 0 "
    "THEN (2 * abs(25 * sum_d) + 6 * cnt) // (12 * cnt) "
    "ELSE -((2 * abs(25 * sum_d) + 6 * cnt) // (12 * cnt)) END "
    "AS s_micro FROM s), "
    "sc AS (SELECT priority, moy, s_micro, "
    "COUNT(*) OVER (PARTITION BY priority) AS n_moy, "
    "CAST(SUM(s_micro) OVER (PARTITION BY priority) AS BIGINT) "
    "AS tot_micro FROM sm), "
    "u AS (SELECT t.priority, "
    "CAST(25 * sc.n_moy * t.d24 "
    "- 6 * (sc.n_moy * sc.s_micro - sc.tot_micro) AS HUGEINT) AS r_u, "
    "CAST(25 * sc.n_moy * t.d24 AS HUGEINT) AS d_u, "
    "CAST(600 * sc.n_moy * t.rev_s "
    "- 6 * (sc.n_moy * sc.s_micro - sc.tot_micro) AS HUGEINT) AS ys_u "
    "FROM t JOIN sc ON t.priority = sc.priority AND t.moy = sc.moy), "
    "a AS (SELECT priority, CAST(COUNT(*) AS HUGEINT) AS n, "
    "SUM(r_u) AS sr, SUM(r_u * r_u) AS srr, "
    "SUM(d_u) AS sd, SUM(d_u * d_u) AS sdd, "
    "SUM(ys_u) AS sy, SUM(ys_u * ys_u) AS syy FROM u GROUP BY 1), "
    "v AS (SELECT priority, n, "
    "n * srr - sr * sr AS var_r, "
    "n * sdd - sd * sd AS var_d, "
    "n * syy - sy * sy AS var_ys FROM a) "
    "SELECT priority, CAST(n AS BIGINT) AS n_months, "
    "ROUND(GREATEST(0.0, 1.0 - CAST(var_r AS DOUBLE) "
    "/ CAST(var_ys AS DOUBLE)), 6) AS f_trend, "
    "ROUND(GREATEST(0.0, 1.0 - CAST(var_r AS DOUBLE) "
    "/ CAST(var_d AS DOUBLE)), 6) AS f_seasonal "
    "FROM v WHERE var_d > 0 AND var_ys > 0 ORDER BY priority"
)


# --- Rescaled-range (R/S) Hurst exponent of the monthly revenue series -----------------

_HURST_SIZES = (8, 16, 32)  # block sizes; H = slope of ln(R/S) on ln(b)
_HURST_SCALE = 1_000_000_000  # per-block R/S doubles sum as scaled int64


def agg_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Hurst exponent by rescaled-range (R/S) analysis** (Hurst 1951;
    Mandelbrot & Wallis 1969) of the monthly total-revenue series — the
    long-range-dependence diagnostic (H > 0.5 persistent, < 0.5
    mean-reverting) that complements the short-memory family
    (`timeseries_acf`, `timeseries_ar1_halflife`): for each block size
    b ∈ {8,16,32} months, split the series into ⌊T/b⌋ full blocks,
    compute each block's rescaled range R/S (range of mean-adjusted
    cumulative deviations over the population std), average per size,
    and read H off the log-log line — which for the dyadic size grid
    collapses to the closed form H = ln(avg₃₂/avg₈)/(2·ln 2).

    Determinism: within a block, z_t = b·cumsum(y) − t·Σy is EXACT
    int64 (the mean cleared of /b), so R = max z − min z is exact and
    R/S = R/√(b·Σy²−(Σy)²) — the scale AND the /b cancel — is one
    fixed-shape double off exact integers (y² products as decimal ≡
    HUGEINT); per-size averages sum those doubles as scaled int64
    (associativity-proof); degenerate blocks (constant series) filter
    on the exact denominator. The three-size explode happens AFTER the
    corpus-sized monthly rollup — one scan, no re-executed subtrees
    (CLAUDE.md rule 5).

    Scale: corpus work is the monthly rollup; the R/S machinery runs
    on sizes × months ≈ 240 rows."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(dsum_scaled("o_totalprice").alias("y"))
    w_rn = Window.orderBy("mon")
    w_all = Window.partitionBy()
    t = m.select(
        "y",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("t_months"),
    )
    e = t.select(
        "*",
        F.explode(
            F.array(*[F.lit(b) for b in _HURST_SIZES])
        ).alias("b"),
    ).filter(F.col("rn") <= (F.col("t_months").cast("long") / F.col("b")).cast("long") * F.col("b"))
    blk = e.select(
        "y",
        "b",
        "t_months",
        ((F.col("rn") - 1) / F.col("b")).cast("long").alias("blk"),
        (F.col("rn") - ((F.col("rn") - 1) / F.col("b")).cast("long") * F.col("b")).alias("pos"),
        "rn",
    )
    w_blk = Window.partitionBy("b", "blk")
    w_cum = (
        Window.partitionBy("b", "blk")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z = blk.select(
        "b",
        "blk",
        "t_months",
        "y",
        (
            F.col("b") * F.sum("y").over(w_cum)
            - F.col("pos") * F.sum("y").over(w_blk)
        ).alias("z"),
    )
    per_block = z.groupBy("b", "blk").agg(
        F.max("t_months").alias("t_months"),
        F.count(F.lit(1)).alias("nb"),
        (F.max("z") - F.min("z")).alias("r_int"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)")).alias("syy"),
    )
    den = (
        F.col("b").cast("decimal(12,0)") * F.col("syy")
        - F.col("sy").cast("decimal(18,0)") * F.col("sy").cast("decimal(18,0)")
    )
    rs = F.col("r_int").cast("double") / F.sqrt(den.cast("double"))
    scored = per_block.filter(
        (F.col("nb") == F.col("b")) & (den > 0)
    ).select("b", "t_months", rs.alias("rs"))
    per_size = scored.groupBy("b").agg(
        F.max("t_months").alias("t_months"),
        F.count(F.lit(1)).alias("n_blocks"),
        dsum_scaled("rs", _HURST_SCALE).alias("rs_s"),
    )
    avg = (
        F.col("rs_s").cast("double")
        / _HURST_SCALE
        / F.col("n_blocks").cast("double")
    )
    one = per_size.select("b", "t_months", "n_blocks", avg.alias("avg_rs")).agg(
        F.max("t_months").cast("long").alias("n_months"),
        F.max(F.when(F.col("b") == 8, F.col("n_blocks"))).cast("long").alias("n_blocks_8"),
        F.max(F.when(F.col("b") == 16, F.col("n_blocks"))).cast("long").alias("n_blocks_16"),
        F.max(F.when(F.col("b") == 32, F.col("n_blocks"))).cast("long").alias("n_blocks_32"),
        F.max(F.when(F.col("b") == 8, F.col("avg_rs"))).alias("a8"),
        F.max(F.when(F.col("b") == 16, F.col("avg_rs"))).alias("a16"),
        F.max(F.when(F.col("b") == 32, F.col("avg_rs"))).alias("a32"),
    )
    return one.select(
        "n_months",
        "n_blocks_8",
        "n_blocks_16",
        "n_blocks_32",
        dround(F.col("a8"), 6).alias("avg_rs_8"),
        dround(F.col("a16"), 6).alias("avg_rs_16"),
        dround(F.col("a32"), 6).alias("avg_rs_32"),
        dround(
            F.log(F.col("a32") / F.col("a8"))
            / (F.lit(2.0) * F.log(F.lit(2.0))),
            6,
        ).alias("hurst"),
    )


QUERIES["agg_hurst_rs"] = agg_hurst_rs

ORACLE["agg_hurst_rs"] = (
    "WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y FROM orders GROUP BY 1), "
    "t AS (SELECT y, ROW_NUMBER() OVER (ORDER BY mon) AS rn, "
    "COUNT(*) OVER () AS t_months FROM m), "
    "e AS (SELECT t.y, t.rn, t.t_months, u.b FROM t, "
    "UNNEST([8, 16, 32]) AS u(b) "
    "WHERE t.rn <= (t.t_months // u.b) * u.b), "
    "blk AS (SELECT y, b, t_months, (rn - 1) // b AS blk, "
    "rn - ((rn - 1) // b) * b AS pos, rn FROM e), "
    "z AS (SELECT b, blk, t_months, y, "
    "b * SUM(y) OVER (PARTITION BY b, blk ORDER BY rn "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "- pos * SUM(y) OVER (PARTITION BY b, blk) AS z FROM blk), "
    "pb AS (SELECT b, blk, MAX(t_months) AS t_months, "
    "COUNT(*) AS nb, CAST(MAX(z) - MIN(z) AS BIGINT) AS r_int, "
    "CAST(SUM(y) AS BIGINT) AS sy, "
    "SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy "
    "FROM z GROUP BY 1, 2), "
    "sc AS (SELECT b, t_months, "
    "CAST(r_int AS DOUBLE) / sqrt(CAST(CAST(b AS HUGEINT) * syy "
    "- CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)) AS rs "
    "FROM pb WHERE nb = b AND CAST(b AS HUGEINT) * syy "
    "- CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) > 0), "
    "ps AS (SELECT b, MAX(t_months) AS t_months, "
    "CAST(COUNT(*) AS BIGINT) AS n_blocks, "
    f"CAST(SUM(CAST(ROUND(rs * {_HURST_SCALE}) AS BIGINT)) AS BIGINT) "
    "AS rs_s FROM sc GROUP BY 1), "
    "av AS (SELECT b, t_months, n_blocks, "
    f"CAST(rs_s AS DOUBLE) / {_HURST_SCALE} "
    "/ CAST(n_blocks AS DOUBLE) AS avg_rs FROM ps), "
    "one AS (SELECT CAST(MAX(t_months) AS BIGINT) AS n_months, "
    "CAST(MAX(CASE WHEN b = 8 THEN n_blocks END) AS BIGINT) "
    "AS n_blocks_8, "
    "CAST(MAX(CASE WHEN b = 16 THEN n_blocks END) AS BIGINT) "
    "AS n_blocks_16, "
    "CAST(MAX(CASE WHEN b = 32 THEN n_blocks END) AS BIGINT) "
    "AS n_blocks_32, "
    "MAX(CASE WHEN b = 8 THEN avg_rs END) AS a8, "
    "MAX(CASE WHEN b = 16 THEN avg_rs END) AS a16, "
    "MAX(CASE WHEN b = 32 THEN avg_rs END) AS a32 FROM av) "
    "SELECT n_months, n_blocks_8, n_blocks_16, n_blocks_32, "
    "ROUND(a8, 6) AS avg_rs_8, ROUND(a16, 6) AS avg_rs_16, "
    "ROUND(a32, 6) AS avg_rs_32, "
    "ROUND(ln(a32 / a8) / (2.0 * ln(2.0)), 6) AS hurst FROM one"
)


# --- Tukey IQR outlier fences per year -------------------------------------------------


def dq_outlier_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Tukey boxplot fences** per year (Tukey, *EDA* 1977): q1/q3 by
    exact interpolated quantiles, the 1.5·IQR inner fences, and the
    count/share of orders outside them — the third member of the
    outlier-screen family (`dq_anomaly_zscore` assumes normality,
    `dq_anomaly_mad` robust location; the IQR fence is the
    distribution-free boxplot rule every data-profiling report leads
    with).

    Determinism: Spark `percentile` ≡ DuckDB `quantile_cont` (same
    linear interpolation over the identical sorted multiset), both
    computed as WINDOW aggregates so every row compares against its
    year's fence IN THE SAME ENGINE-IDENTICAL double — outlier counts
    are then exact integers, ratios single divisions (`dround` 6;
    fence values display at 4 dp money).

    Scale: one exchange per year partition (the quantile window and
    the flag rollup share it)."""
    orders = read_table(spark, sf_dir, "orders")
    w_y = Window.partitionBy(F.year("o_orderdate"))
    flagged = orders.select(
        F.year("o_orderdate").cast("int").alias("year"),
        "o_totalprice",
        F.percentile("o_totalprice", F.lit(0.25)).over(w_y).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).over(w_y).alias("q3"),
    ).select(
        "year",
        "o_totalprice",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    agg = flagged.groupBy("year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("q1").alias("q1"),
        F.max("q3").alias("q3"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
        F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_above"),
    )
    return agg.select(
        "year",
        F.col("n_orders").cast("long").alias("n_orders"),
        dround(F.col("q1"), 4).alias("q1"),
        dround(F.col("q3"), 4).alias("q3"),
        dround(F.col("lo"), 4).alias("fence_lo"),
        dround(F.col("hi"), 4).alias("fence_hi"),
        "n_below",
        "n_above",
        dround(
            (F.col("n_below") + F.col("n_above")).cast("double")
            / F.col("n_orders").cast("double"),
            6,
        ).alias("outlier_share"),
    ).orderBy("year")


QUERIES["dq_outlier_iqr_fences"] = dq_outlier_iqr_fences

ORACLE["dq_outlier_iqr_fences"] = (
    "WITH f AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
    "o_totalprice, "
    "quantile_cont(o_totalprice, 0.25) OVER wy AS q1, "
    "quantile_cont(o_totalprice, 0.75) OVER wy AS q3 "
    "FROM orders WINDOW wy AS (PARTITION BY year(o_orderdate))), "
    "g AS (SELECT year, o_totalprice, q1, q3, "
    "q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM f), "
    "a AS (SELECT year, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "MAX(q1) AS q1, MAX(q3) AS q3, MAX(lo) AS lo, MAX(hi) AS hi, "
    "CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_below, "
    "CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_above FROM g GROUP BY 1) "
    "SELECT year, n_orders, ROUND(q1, 4) AS q1, ROUND(q3, 4) AS q3, "
    "ROUND(lo, 4) AS fence_lo, ROUND(hi, 4) AS fence_hi, "
    "n_below, n_above, "
    "ROUND(CAST(n_below + n_above AS DOUBLE) "
    "/ CAST(n_orders AS DOUBLE), 6) AS outlier_share "
    "FROM a ORDER BY year"
)


# --- Entropy rate of the event-stream Markov chain -------------------------------------

_ENTR_SCALE = 100_000_000


def events_entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Entropy rate of the first-order event Markov chain** (Cover &
    Thomas §4.2, with the empirical transition counts as the chain):
    H = −Σ_ij (n_ij/N)·ln(n_ij/n_i) — how many nats of surprise the
    NEXT event carries given the current one. The sequence-level
    summary of `events_markov_transitions` (which emits the matrix;
    this scores its predictability), read against ln(k) (i.i.d.
    ceiling): efficiency near 1 means the stream is memoryless, near 0
    means paths are deterministic — the signal that decides whether
    sequence features are worth mining.

    Determinism: H factors as (Σ_i n_i·ln n_i − Σ_ij n_ij·ln n_ij)/N
    where both sums quantize per TERM to scaled int64 (the entropy-
    family device; row marginals deduplicate with a ROW_NUMBER == 1
    guard inside the ONE aggregate over the k²-cell frame). Exposed
    doubles are fixed-shape expressions off the exact sums, `dround` 6.

    Scale: one per-user ordering exchange (the `sessionize_batch`
    shape) carries the lag; everything after runs on the k²-cell
    transition frame."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).filter(F.col("prev_type").isNotNull())
    cells = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_row = Window.partitionBy("prev_type")
    w_all = Window.partitionBy()
    w_rn = Window.partitionBy("prev_type").orderBy("event_type")
    x = cells.select(
        "c",
        F.sum("c").over(w_row).alias("r"),
        F.sum("c").over(w_all).alias("n"),
        (F.row_number().over(w_rn) == 1).alias("first_of_row"),
    )
    ln = F.log
    agg = x.agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("first_of_row"), 1).otherwise(0))
        .cast("long")
        .alias("n_states"),
        F.count(F.lit(1)).alias("n_cells"),
        dsum_scaled(
            F.col("c").cast("double") * ln(F.col("c").cast("double")),
            _ENTR_SCALE,
        ).alias("sc"),
        dsum_scaled(
            F.when(
                F.col("first_of_row"),
                F.col("r").cast("double") * ln(F.col("r").cast("double")),
            ).otherwise(F.lit(0.0)),
            _ENTR_SCALE,
        ).alias("sr"),
    )
    nd = F.col("n").cast("double")
    h = (
        F.col("sr").cast("double") - F.col("sc").cast("double")
    ) / _ENTR_SCALE / nd
    hmax = ln(F.col("n_states").cast("double"))
    return agg.filter(F.col("n") > 0).select(
        F.col("n").cast("long").alias("n_transitions"),
        "n_states",
        F.col("n_cells").cast("long").alias("n_cells"),
        dround(h, 6).alias("entropy_rate_nats"),
        dround(hmax, 6).alias("max_entropy_nats"),
        dround(F.try_divide(h, hmax), 6).alias("efficiency"),
    )


QUERIES["events_entropy_rate_markov"] = events_entropy_rate_markov

ORACLE["events_entropy_rate_markov"] = (
    "WITH p AS (SELECT LAG(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type, "
    "event_type FROM events), "
    "cells AS (SELECT prev_type, event_type, "
    "CAST(COUNT(*) AS BIGINT) AS c FROM p "
    "WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
    "x AS (SELECT c, "
    "SUM(c) OVER (PARTITION BY prev_type) AS r, "
    "SUM(c) OVER () AS n, "
    "ROW_NUMBER() OVER (PARTITION BY prev_type ORDER BY event_type) = 1 "
    "AS first_of_row FROM cells), "
    "a AS (SELECT CAST(MAX(n) AS BIGINT) AS n, "
    "CAST(SUM(CASE WHEN first_of_row THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_states, "
    "CAST(COUNT(*) AS BIGINT) AS n_cells, "
    "CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) "
    f"* {_ENTR_SCALE}) AS BIGINT)) AS BIGINT) AS sc, "
    "CAST(SUM(CAST(ROUND(CASE WHEN first_of_row THEN "
    "CAST(r AS DOUBLE) * ln(CAST(r AS DOUBLE)) ELSE 0.0 END "
    f"* {_ENTR_SCALE}) AS BIGINT)) AS BIGINT) AS sr FROM x) "
    "SELECT n AS n_transitions, n_states, n_cells, "
    f"ROUND((CAST(sr AS DOUBLE) - CAST(sc AS DOUBLE)) / {_ENTR_SCALE} "
    "/ CAST(n AS DOUBLE), 6) AS entropy_rate_nats, "
    "ROUND(ln(CAST(n_states AS DOUBLE)), 6) AS max_entropy_nats, "
    f"ROUND(((CAST(sr AS DOUBLE) - CAST(sc AS DOUBLE)) / {_ENTR_SCALE} "
    "/ CAST(n AS DOUBLE)) / ln(CAST(n_states AS DOUBLE)), 6) "
    "AS efficiency "
    "FROM a WHERE n > 0"
)


# --- Cohen's d / Hedges' g effect size (URGENT vs LOW order value) ---------------------


def agg_cohens_d_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Cohen's d and Hedges' g** for the URGENT-vs-LOW order-value
    contrast (Cohen 1988; Hedges 1981) — the EFFECT-SIZE companion to
    `agg_welch_ttest` (significance says the difference is real;
    d says whether it is big enough to matter — the value a dashboard
    should surface next to any p-value): d = (m1−m2)/s_pooled with the
    (n−1)-weighted pooled SD, g = d·(1 − 3/(4(n1+n2)−9)).

    Determinism: per-group Σv and Σv² accumulate over the 1e4-scaled
    integer prices (exact, decimal ≡ HUGEINT squares); every exposed
    double is a fixed-shape expression off those exact sums, `dround`.
    Degenerate pools (pooled variance 0) filter on the exact integers.

    Scale: ONE conditional map-side-combinable aggregate over orders."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    v = F.col("v").cast("decimal(18,0)")
    both = orders.filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        (F.col("o_orderpriority") == MW_GROUP_A).alias("is_a"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    )
    agg = both.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("is_a"), F.col("v")).otherwise(F.lit(0)))
        .cast("decimal(18,0)")
        .alias("s1"),
        F.sum(F.when(~F.col("is_a"), F.col("v")).otherwise(F.lit(0)))
        .cast("decimal(18,0)")
        .alias("s2"),
        F.sum(F.when(F.col("is_a"), v * v).otherwise(F.lit(0).cast("decimal(37,0)")))
        .alias("q1"),
        F.sum(F.when(~F.col("is_a"), v * v).otherwise(F.lit(0).cast("decimal(37,0)")))
        .alias("q2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2").cast("double") / n2d
    ss1 = F.col("q1").cast("double") - m1 * F.col("s1").cast("double")
    ss2 = F.col("q2").cast("double") - m2 * F.col("s2").cast("double")
    sp = F.sqrt((ss1 + ss2) / (n1d + n2d - F.lit(2.0)))
    d = (m1 - m2) / sp
    g = d * (
        F.lit(1.0)
        - F.lit(3.0) / (F.lit(4.0) * (n1d + n2d) - F.lit(9.0))
    )
    return agg.filter((F.col("n1") > 1) & (F.col("n2") > 1)).select(
        "n1",
        "n2",
        dround(m1 / 10000.0, 4).alias("mean_urgent"),
        dround(m2 / 10000.0, 4).alias("mean_low"),
        dround(sp / 10000.0, 4).alias("pooled_sd"),
        dround(d, 6).alias("cohens_d"),
        dround(g, 6).alias("hedges_g"),
    )


QUERIES["agg_cohens_d_effect_size"] = agg_cohens_d_effect_size

ORACLE["agg_cohens_d_effect_size"] = (
    "WITH b AS (SELECT "
    f"o_orderpriority = '{MW_GROUP_A}' AS is_a, "
    "CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS v FROM orders "
    f"WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')), "
    "a AS (SELECT "
    "CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    "CAST(SUM(CASE WHEN is_a THEN v ELSE 0 END) AS HUGEINT) AS s1, "
    "CAST(SUM(CASE WHEN NOT is_a THEN v ELSE 0 END) AS HUGEINT) AS s2, "
    "SUM(CASE WHEN is_a THEN CAST(v AS HUGEINT) * CAST(v AS HUGEINT) "
    "ELSE CAST(0 AS HUGEINT) END) AS q1, "
    "SUM(CASE WHEN NOT is_a THEN CAST(v AS HUGEINT) * CAST(v AS HUGEINT) "
    "ELSE CAST(0 AS HUGEINT) END) AS q2 FROM b) "
    "SELECT n1, n2, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0, 4) "
    "AS mean_urgent, "
    "ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0, 4) "
    "AS mean_low, "
    "ROUND(sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) "
    "/ CAST(n1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "+ (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) "
    "* CAST(s2 AS DOUBLE))) "
    "/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) / 10000.0, 4) "
    "AS pooled_sd, "
    "ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
    "- CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) "
    "/ sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) "
    "/ CAST(n1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "+ (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) "
    "* CAST(s2 AS DOUBLE))) "
    "/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6) "
    "AS cohens_d, "
    "ROUND(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
    "- CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) "
    "/ sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) "
    "/ CAST(n1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "+ (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) "
    "* CAST(s2 AS DOUBLE))) "
    "/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))) "
    "* (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) "
    "- 9.0)), 6) AS hedges_g "
    "FROM a WHERE n1 > 1 AND n2 > 1"
)


# --- Brown-Forsythe robust equality-of-variances test ----------------------------------

BF_DESCALE = 20_000.0  # |2v - 2*median| is in DOUBLED 1e4-scaled price units
BF_SSB_SCALE = 10_000  # per-group between-SS term quantization
BF_SSW_SCALE = 1.0  # per-group within-SS terms are ~1e13+; unit quantization


def agg_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Brown-Forsythe test** (Brown & Forsythe 1974 — Levene's test
    with the group MEDIAN center, the robust recommendation) for
    equality of order-value spread across the five priorities: a
    one-way ANOVA on z = |x − median_g|. The DISPERSION member of the
    testing family — `agg_oneway_anova` asks whether the priority
    MEANS differ; this asks whether their VARIABILITY does (the
    homoscedasticity check that decides whether the pooled-variance
    tests upstream are even applicable).

    Determinism: v is the 1e4-scaled integer price; 2·median_g is an
    exact integer for any group size (the interpolated median of
    integers is k or k+0.5, and Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — identical linear interpolation, exact in IEEE
    below 2^53), so z = |2v − 2med| is an exact int64 and the
    per-group Σz / Σz² accumulate in DECIMAL(38,0) ≡ HUGEINT. The
    between/within sum-of-squares terms are fixed-shape doubles off
    those exact sums, quantized PER GROUP to scaled int64 before the
    exact cross-group sum (the `agg_kruskal_wallis` device), so no
    float accumulation is order-dependent. W is one division off the
    exact quantized sums.

    Scale: one broadcast of the 5-row median table back onto orders,
    one map-side-combinable conditional aggregate, then all algebra on
    the 5-row group frame (two tiny windows)."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    s = orders.select(
        F.col("o_orderpriority").alias("g"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    )
    med = s.groupBy("g").agg(
        (F.lit(2.0) * F.percentile("v", F.lit(0.5)))
        .cast("long")
        .alias("m2")
    )
    z = s.join(F.broadcast(med), "g").select(
        "g", F.abs(F.lit(2) * F.col("v") - F.col("m2")).alias("z")
    )
    zd = F.col("z").cast("decimal(18,0)")
    pg = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(zd).cast("decimal(38,0)").alias("sz"),
        F.sum(zd * zd).cast("decimal(38,0)").alias("qz"),
    )
    w_all = Window.partitionBy()
    t = pg.select(
        "n_g",
        "sz",
        "qz",
        F.sum("n_g").over(w_all).alias("nn"),
        F.sum("sz").over(w_all).alias("szz"),
    )
    n_g_d = F.col("n_g").cast("double")
    sz_d = F.col("sz").cast("double")
    qz_d = F.col("qz").cast("double")
    nn_d = F.col("nn").cast("double")
    szz_d = F.col("szz").cast("double")
    diff = sz_d / n_g_d / F.lit(BF_DESCALE) - szz_d / nn_d / F.lit(
        BF_DESCALE
    )
    ssb_term = n_g_d * diff * diff
    ssw_term = (qz_d - sz_d / n_g_d * sz_d) / F.lit(
        BF_DESCALE * BF_DESCALE
    )
    q = t.agg(
        F.max("nn").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(_nearest_long_away(ssb_term * F.lit(float(BF_SSB_SCALE))))
        .cast("long")
        .alias("ssb_s"),
        F.sum(_nearest_long_away(ssw_term * F.lit(BF_SSW_SCALE)))
        .cast("long")
        .alias("ssw_s"),
    )
    ssb = F.col("ssb_s").cast("double") / F.lit(float(BF_SSB_SCALE))
    ssw = F.col("ssw_s").cast("double") / F.lit(BF_SSW_SCALE)
    n_d = F.col("n").cast("double")
    k_d = F.col("k").cast("double")
    w_stat = (ssb / (k_d - F.lit(1.0))) / (ssw / (n_d - k_d))
    return q.filter((F.col("ssw_s") > 0) & (F.col("n") > F.col("k"))).select(
        F.col("n").alias("n_orders"),
        F.col("k").cast("int").alias("k_groups"),
        dround(ssb, 4).alias("ss_between"),
        dround(ssw, 4).alias("ss_within"),
        dround(w_stat, 6).alias("bf_w"),
    )


QUERIES["agg_levene_brown_forsythe"] = agg_levene_brown_forsythe

ORACLE["agg_levene_brown_forsythe"] = (
    "WITH s AS (SELECT o_orderpriority AS g, "
    "CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS v FROM orders), "
    "med AS (SELECT g, CAST(2.0 * quantile_cont(v, 0.5) AS BIGINT) AS m2 "
    "FROM s GROUP BY 1), "
    "z AS (SELECT s.g, ABS(2 * s.v - med.m2) AS z "
    "FROM s JOIN med USING (g)), "
    "pg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g, "
    "CAST(SUM(CAST(z AS HUGEINT)) AS HUGEINT) AS sz, "
    "SUM(CAST(z AS HUGEINT) * z) AS qz FROM z GROUP BY 1), "
    "t AS (SELECT n_g, sz, qz, SUM(n_g) OVER () AS nn, "
    "SUM(sz) OVER () AS szz FROM pg), "
    "q AS (SELECT CAST(MAX(nn) AS BIGINT) AS n, "
    "CAST(COUNT(*) AS BIGINT) AS k, "
    "CAST(SUM(CAST(ROUND(CAST(n_g AS DOUBLE) "
    "* (CAST(sz AS DOUBLE) / CAST(n_g AS DOUBLE) / 20000.0 "
    "- CAST(szz AS DOUBLE) / CAST(nn AS DOUBLE) / 20000.0) "
    "* (CAST(sz AS DOUBLE) / CAST(n_g AS DOUBLE) / 20000.0 "
    "- CAST(szz AS DOUBLE) / CAST(nn AS DOUBLE) / 20000.0) "
    f"* {float(BF_SSB_SCALE)}) AS BIGINT)) AS BIGINT) AS ssb_s, "
    "CAST(SUM(CAST(ROUND((CAST(qz AS DOUBLE) "
    "- CAST(sz AS DOUBLE) / CAST(n_g AS DOUBLE) * CAST(sz AS DOUBLE)) "
    f"/ 400000000.0 * {BF_SSW_SCALE}) AS BIGINT)) AS BIGINT) AS ssw_s "
    "FROM t) "
    "SELECT n AS n_orders, CAST(k AS INT) AS k_groups, "
    f"ROUND(CAST(ssb_s AS DOUBLE) / {float(BF_SSB_SCALE)}, 4) "
    "AS ss_between, "
    f"ROUND(CAST(ssw_s AS DOUBLE) / {BF_SSW_SCALE}, 4) AS ss_within, "
    f"ROUND((CAST(ssb_s AS DOUBLE) / {float(BF_SSB_SCALE)} "
    "/ (CAST(k AS DOUBLE) - 1.0)) "
    f"/ (CAST(ssw_s AS DOUBLE) / {BF_SSW_SCALE} "
    "/ (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS bf_w "
    "FROM q WHERE ssw_s > 0 AND n > k"
)


# --- Mood's median test ----------------------------------------------------------------

MOOD_SCALE = 1_000_000  # per-cell chi-square term quantization


def agg_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Mood's median test** (Mood 1950) across the five priorities:
    dichotomize every order at the GRAND median price and chi-square
    the resulting 2×k table — the nonparametric location test that
    survives arbitrary outliers (50% breakdown), the blunter, more
    robust sibling of `agg_kruskal_wallis` (which uses full ranks).

    Determinism: the grand median doubles to an exact integer (the
    `agg_levene_brown_forsythe` device), so every above/below count is
    an exact integer classification; the 2×k chi-square runs in the
    `agg_chi_square_independence` exact form — each cell's (O−E)²/E as
    (n·O − r·c)²/(n·r·c) off exact integers, quantized per cell to
    scaled int64 before the exact cross-cell sum. Both margins are
    strictly positive by construction (the median is interior), so the
    divisions are total.

    Scale: one global exact-percentile aggregate broadcast onto orders,
    one map-side-combinable count aggregate, then all algebra on the
    k-row frame."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    s = orders.select(
        F.col("o_orderpriority").alias("g"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    )
    gm = s.agg(
        (F.lit(2.0) * F.percentile("v", F.lit(0.5)))
        .cast("long")
        .alias("m2")
    )
    cells = (
        s.crossJoin(F.broadcast(gm))
        .select(
            "g",
            F.when(F.lit(2) * F.col("v") > F.col("m2"), 1)
            .otherwise(0)
            .alias("above"),
        )
        .groupBy("g")
        .agg(
            F.sum("above").cast("long").alias("n_above"),
            F.sum(F.lit(1) - F.col("above")).cast("long").alias("n_le"),
        )
    )
    w_all = Window.partitionBy()
    t = cells.select(
        "g",
        "n_above",
        "n_le",
        (F.col("n_above") + F.col("n_le")).alias("r"),
        F.sum("n_above").over(w_all).alias("c_ab"),
        F.sum("n_le").over(w_all).alias("c_le"),
        F.sum(F.col("n_above") + F.col("n_le")).over(w_all).alias("n"),
    )

    def dd(c):
        return c.cast("decimal(38,0)")

    def cell_term(o, c):
        dev = dd(F.col("n")) * dd(o) - dd(F.col("r")) * dd(c)
        return (dev * dev).cast("double") / (
            dd(F.col("n")) * dd(F.col("r")) * dd(c)
        ).cast("double")

    from ..functions.numerics import _nearest_long_away as _nla

    stat = t.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            _nla(
                (
                    cell_term(F.col("n_above"), F.col("c_ab"))
                    + cell_term(F.col("n_le"), F.col("c_le"))
                )
                * F.lit(float(MOOD_SCALE))
            )
        )
        .cast("long")
        .alias("t_s"),
    )
    out = cells.crossJoin(F.broadcast(stat))
    return out.select(
        F.col("g").alias("priority"),
        "n_above",
        F.col("n_le").alias("n_below_eq"),
        dround(
            F.col("n_above").cast("double")
            / (F.col("n_above") + F.col("n_le")).cast("double"),
            6,
        ).alias("share_above"),
        dround(
            F.col("t_s").cast("double") / F.lit(float(MOOD_SCALE)), 6
        ).alias("chi2"),
        (F.col("k") - F.lit(1)).cast("int").alias("df"),
    ).orderBy("priority")


QUERIES["agg_mood_median_test"] = agg_mood_median_test

ORACLE["agg_mood_median_test"] = (
    "WITH s AS (SELECT o_orderpriority AS g, "
    "CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS v FROM orders), "
    "gm AS (SELECT CAST(2.0 * quantile_cont(v, 0.5) AS BIGINT) AS m2 "
    "FROM s), "
    "cells AS (SELECT g, "
    "CAST(SUM(CASE WHEN 2 * v > m2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_above, "
    "CAST(SUM(CASE WHEN 2 * v > m2 THEN 0 ELSE 1 END) AS BIGINT) "
    "AS n_le FROM s, gm GROUP BY 1), "
    "t AS (SELECT g, n_above, n_le, n_above + n_le AS r, "
    "SUM(n_above) OVER () AS c_ab, SUM(n_le) OVER () AS c_le, "
    "SUM(n_above + n_le) OVER () AS n FROM cells), "
    "stat AS (SELECT CAST(MAX(n) AS BIGINT) AS n, "
    "CAST(COUNT(*) AS BIGINT) AS k, "
    "CAST(SUM(CAST(ROUND(("
    "CAST((CAST(n AS HUGEINT) * n_above - CAST(r AS HUGEINT) * c_ab) "
    "* (CAST(n AS HUGEINT) * n_above - CAST(r AS HUGEINT) * c_ab) "
    "AS DOUBLE) / CAST(CAST(n AS HUGEINT) * r * c_ab AS DOUBLE) "
    "+ CAST((CAST(n AS HUGEINT) * n_le - CAST(r AS HUGEINT) * c_le) "
    "* (CAST(n AS HUGEINT) * n_le - CAST(r AS HUGEINT) * c_le) "
    "AS DOUBLE) / CAST(CAST(n AS HUGEINT) * r * c_le AS DOUBLE)) "
    f"* {float(MOOD_SCALE)}) AS BIGINT)) AS BIGINT) AS t_s FROM t) "
    "SELECT g AS priority, n_above, n_le AS n_below_eq, "
    "ROUND(CAST(n_above AS DOUBLE) / CAST(n_above + n_le AS DOUBLE), 6) "
    "AS share_above, "
    f"ROUND(CAST(t_s AS DOUBLE) / {float(MOOD_SCALE)}, 6) AS chi2, "
    "CAST(k - 1 AS INT) AS df "
    "FROM cells, stat ORDER BY priority"
)


# --- Grubbs maximum-studentized-deviate outlier test -----------------------------------


def agg_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Grubbs' test statistic** (Grubbs 1950) on the monthly total-
    revenue series: G = max|x − x̄| / s — which single month is the
    most anomalous, and how many sample standard deviations out it
    sits. The SERIES-level outlier test beside `dq_anomaly_zscore`'s
    per-row flags and `dq_anomaly_mad`'s robust companion (Grubbs is
    the classical normal-theory statistic dashboards quote).

    Determinism: monthly revenue is an exact 1e4-scaled int64 sum; the
    deviation ARGMAX runs over exact integers — |n·x − S| in
    DECIMAL(38,0) ≡ HUGEINT, so the suspect month is found without a
    single float compare (ties break on the month key); mean, sample
    sd (via n·Q − S² exact) and G are fixed-shape doubles off the
    exact integers, `dround`ed.

    Scale: one corpus-sized monthly rollup (map-side combinable);
    everything after runs on the ~month-count frame (two tiny
    windows)."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w_all = Window.partitionBy()
    vd = F.col("rev_s").cast("decimal(38,0)")
    t = m.select(
        "mon",
        "rev_s",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(vd).over(w_all).alias("s1"),
        F.sum(vd * F.col("rev_s")).over(w_all).alias("q2"),
    )
    dev = F.abs(
        F.col("n").cast("decimal(38,0)") * vd - F.col("s1")
    ).alias("dev")
    t2 = t.select("mon", "rev_s", "n", "s1", "q2", dev)
    w_rank = Window.partitionBy().orderBy(
        F.col("dev").desc(), F.col("mon").asc()
    )
    top = t2.select(
        "*", F.row_number().over(w_rank).alias("rn")
    ).filter(F.col("rn") == 1)
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d / F.lit(10_000.0)
    m2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q2")
        - F.col("s1") * F.col("s1")
    )
    sd = F.sqrt(
        m2.cast("double") / (n_d * (n_d - F.lit(1.0)))
    ) / F.lit(10_000.0)
    g = (
        F.col("dev").cast("double") / n_d / F.lit(10_000.0)
    ) / sd
    return top.filter(F.col("n") > 2).select(
        F.col("n").cast("long").alias("n_months"),
        dround(mean, 4).alias("mean_revenue"),
        dround(sd, 4).alias("sd_revenue"),
        F.col("mon").alias("suspect_month"),
        F.round(F.col("rev_s") / 10_000.0, 4).alias("suspect_revenue"),
        dround(g, 6).alias("g_stat"),
    )


QUERIES["agg_grubbs_outlier"] = agg_grubbs_outlier

ORACLE["agg_grubbs_outlier"] = (
    "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) "
    "AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1), "
    "t AS (SELECT mon, rev_s, "
    "CAST(COUNT(*) OVER () AS BIGINT) AS n, "
    "SUM(CAST(rev_s AS HUGEINT)) OVER () AS s1, "
    "SUM(CAST(rev_s AS HUGEINT) * rev_s) OVER () AS q2 FROM m), "
    "t2 AS (SELECT mon, rev_s, n, s1, q2, "
    "ABS(CAST(n AS HUGEINT) * rev_s - s1) AS dev FROM t), "
    "top AS (SELECT *, ROW_NUMBER() OVER (ORDER BY dev DESC, mon ASC) "
    "AS rn FROM t2) "
    "SELECT n AS n_months, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 4) "
    "AS mean_revenue, "
    "ROUND(sqrt(CAST(CAST(n AS HUGEINT) * q2 - s1 * s1 AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) "
    "* (CAST(n AS DOUBLE) - 1.0))) / 10000.0, 4) AS sd_revenue, "
    "mon AS suspect_month, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS suspect_revenue, "
    "ROUND((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) "
    "/ (sqrt(CAST(CAST(n AS HUGEINT) * q2 - s1 * s1 AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) "
    "* (CAST(n AS DOUBLE) - 1.0))) / 10000.0), 6) AS g_stat "
    "FROM top WHERE rn = 1 AND n > 2"
)


# --- Delta-method CI for a ratio metric (revenue per line, order-randomized) -----------


def agg_delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Delta-method standard error for a ratio metric** (Deng, Knoblich
    & Lu KDD'18; Fieller 1954 lineage): revenue-per-LINE with the ORDER
    as the randomization unit — the A/B-testing estimator experiment
    platforms need whenever the analysis unit (line) is finer than the
    assignment unit (order), where the naive per-line variance is badly
    anti-conservative because lines within an order correlate:
    R = Σy_i/Σx_i over orders i, Var(R) ≈ (s_y² − 2R·s_xy + R²·s_x²)
    / (n·x̄²), CI = R ± 1.96·SE.

    Determinism: per-order y (1e4-scaled line revenue) and x (line
    count) are exact int64; all five moment sums accumulate in
    DECIMAL(38,0) ≡ HUGEINT (y² ~ 1e19 exceeds int64); every exposed
    double is a fixed-shape expression off those exact sums, `dround`ed
    (4 dp money, 6 dp SE). The z literal 1.96 is shared text.

    Scale: one lineitem-sized keyed aggregate (map-side combinable),
    one orderkey equi-join (co-partitioned fact-fact), one 5-row
    priority rollup."""
    from ..functions.numerics import dsum_scaled

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        dsum_scaled("l_extendedprice").alias("y"),
    )
    j = orders.select("o_orderkey", "o_orderpriority").join(
        per_order, "o_orderkey"
    )

    def dd(c):
        return c.cast("decimal(38,0)")

    per_g = j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dd(F.col("x"))).alias("sx"),
        F.sum(dd(F.col("y"))).alias("sy"),
        F.sum(dd(F.col("x")) * F.col("x")).alias("qx"),
        F.sum(dd(F.col("y")) * F.col("y")).alias("qy"),
        F.sum(dd(F.col("x")) * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    r_s = sy_d / sx_d
    xbar = sx_d / n_d
    sy2 = (F.col("qy").cast("double") - sy_d / n_d * sy_d) / (
        n_d - F.lit(1.0)
    )
    sx2 = (F.col("qx").cast("double") - sx_d / n_d * sx_d) / (
        n_d - F.lit(1.0)
    )
    sxy = (F.col("sxy").cast("double") - sx_d / n_d * sy_d) / (
        n_d - F.lit(1.0)
    )
    var_r = (
        sy2 - F.lit(2.0) * r_s * sxy + r_s * r_s * sx2
    ) / (n_d * xbar * xbar)
    se_s = F.sqrt(var_r)
    return (
        per_g.filter((F.col("n") > 1) & (F.col("sx") > 0))
        .select(
            "priority",
            F.col("n").alias("n_orders"),
            F.col("sx").cast("long").alias("n_lines"),
            dround(r_s / F.lit(10_000.0), 4).alias("revenue_per_line"),
            dround(se_s / F.lit(10_000.0), 6).alias("se"),
            dround(
                (r_s - F.lit(1.96) * se_s) / F.lit(10_000.0), 4
            ).alias("ci_lo"),
            dround(
                (r_s + F.lit(1.96) * se_s) / F.lit(10_000.0), 4
            ).alias("ci_hi"),
        )
        .orderBy("priority")
    )


QUERIES["agg_delta_method_ratio_ci"] = agg_delta_method_ratio_ci

ORACLE["agg_delta_method_ratio_ci"] = (
    "WITH po AS (SELECT l_orderkey AS o_orderkey, "
    "CAST(COUNT(*) AS BIGINT) AS x, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y FROM lineitem GROUP BY 1), "
    "j AS (SELECT o.o_orderpriority AS priority, po.x, po.y "
    "FROM orders o JOIN po USING (o_orderkey)), "
    "g AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n, "
    "SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy, "
    "SUM(CAST(x AS HUGEINT) * x) AS qx, "
    "SUM(CAST(y AS HUGEINT) * y) AS qy, "
    "SUM(CAST(x AS HUGEINT) * y) AS sxy FROM j GROUP BY 1) "
    "SELECT priority, n AS n_orders, CAST(sx AS BIGINT) AS n_lines, "
    "ROUND(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) / 10000.0, 4) "
    "AS revenue_per_line, "
    "ROUND(sqrt(((CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0) - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) "
    "* ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) "
    "* CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) "
    "+ (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * (CAST(sy AS DOUBLE) "
    "/ CAST(sx AS DOUBLE)) * ((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0))) / (CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) "
    "/ 10000.0, 6) AS se, "
    "ROUND((CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) "
    "- 1.96 * sqrt(((CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0) - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) "
    "* ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) "
    "* CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) "
    "+ (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * (CAST(sy AS DOUBLE) "
    "/ CAST(sx AS DOUBLE)) * ((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0))) / (CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))) "
    "/ 10000.0, 4) AS ci_lo, "
    "ROUND((CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) "
    "+ 1.96 * sqrt(((CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0) - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) "
    "* ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) "
    "* CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) "
    "+ (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * (CAST(sy AS DOUBLE) "
    "/ CAST(sx AS DOUBLE)) * ((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) "
    "- 1.0))) / (CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) "
    "/ CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))) "
    "/ 10000.0, 4) AS ci_hi "
    "FROM g WHERE n > 1 AND sx > 0 ORDER BY priority"
)


# --- Cochran-Armitage trend test across ordered priorities -----------------------------


def agg_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Cochran-Armitage trend test** (Cochran 1954; Armitage 1955)
    for a monotone trend in the order FINISH rate across the ORDERED
    priority scale (scores s = 1..5 parsed from the priority prefix) —
    the ordered-alternative upgrade of `agg_chi_square_independence`
    (which ignores the ordering and spends df on every deviation; CA
    spends one df on the linear trend, the question "does urgency
    actually predict completion?" a dashboard wants answered).

    Determinism: the core statistic clears denominators to three exact
    integers — a = N·Σs·r − R·Σs·n (the numerator N·T), b = R(N−R),
    c = N·Σn·s² − (Σn·s)² — accumulated in DECIMAL(38,0) ≡ HUGEINT;
    z = a/√(b·c/N) is one fixed-shape double expression off exact
    ints, `dround` 6. Both margins are interior on any mixed-status
    fixture (b > 0 filtered on the exact integer).

    Scale: one map-side-combinable conditional count aggregate over
    orders; all algebra on the 5-row group frame."""
    orders = read_table(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("r_g"),
    )
    g = g.select(
        "priority",
        F.substring("priority", 1, 1).cast("int").alias("s"),
        "n_g",
        "r_g",
    )
    w_all = Window.partitionBy()

    def dd(c):
        return c.cast("decimal(38,0)")

    t = g.select(
        "priority",
        "s",
        "n_g",
        "r_g",
        F.sum("n_g").over(w_all).alias("nn"),
        F.sum("r_g").over(w_all).alias("rr"),
        F.sum(F.col("s").cast("long") * F.col("r_g")).over(w_all).alias("ssr"),
        F.sum(F.col("s").cast("long") * F.col("n_g")).over(w_all).alias("ssn"),
        F.sum(
            F.col("s").cast("long") * F.col("s") * F.col("n_g")
        )
        .over(w_all)
        .alias("sns2"),
    )
    a = dd(F.col("nn")) * dd(F.col("ssr")) - dd(F.col("rr")) * dd(
        F.col("ssn")
    )
    b = dd(F.col("rr")) * (dd(F.col("nn")) - dd(F.col("rr")))
    c = dd(F.col("nn")) * dd(F.col("sns2")) - dd(F.col("ssn")) * dd(
        F.col("ssn")
    )
    z = a.cast("double") / F.sqrt(
        b.cast("double") * c.cast("double") / F.col("nn").cast("double")
    )
    return (
        t.filter((b > 0) & (c > 0))
        .select(
            "priority",
            "s",
            F.col("n_g").alias("n_orders"),
            F.col("r_g").alias("n_finished"),
            dround(
                F.col("r_g").cast("double") / F.col("n_g").cast("double"),
                6,
            ).alias("finish_rate"),
            dround(z, 6).alias("ca_z"),
            dround(z * z, 6).alias("ca_chi2"),
        )
        .orderBy("priority")
    )


QUERIES["agg_cochran_armitage_trend"] = agg_cochran_armitage_trend

ORACLE["agg_cochran_armitage_trend"] = (
    "WITH g AS (SELECT o_orderpriority AS priority, "
    "CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS s, "
    "CAST(COUNT(*) AS BIGINT) AS n_g, "
    "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) "
    "AS BIGINT) AS r_g FROM orders GROUP BY 1, 2), "
    "t AS (SELECT priority, s, n_g, r_g, "
    "SUM(n_g) OVER () AS nn, SUM(r_g) OVER () AS rr, "
    "SUM(CAST(s AS BIGINT) * r_g) OVER () AS ssr, "
    "SUM(CAST(s AS BIGINT) * n_g) OVER () AS ssn, "
    "SUM(CAST(s AS BIGINT) * s * n_g) OVER () AS sns2 FROM g) "
    "SELECT priority, s, n_g AS n_orders, r_g AS n_finished, "
    "ROUND(CAST(r_g AS DOUBLE) / CAST(n_g AS DOUBLE), 6) "
    "AS finish_rate, "
    "ROUND(CAST(CAST(nn AS HUGEINT) * ssr "
    "- CAST(rr AS HUGEINT) * ssn AS DOUBLE) "
    "/ sqrt(CAST(CAST(rr AS HUGEINT) * (CAST(nn AS HUGEINT) - rr) "
    "AS DOUBLE) * CAST(CAST(nn AS HUGEINT) * sns2 "
    "- CAST(ssn AS HUGEINT) * ssn AS DOUBLE) "
    "/ CAST(nn AS DOUBLE)), 6) AS ca_z, "
    "ROUND((CAST(CAST(nn AS HUGEINT) * ssr "
    "- CAST(rr AS HUGEINT) * ssn AS DOUBLE) "
    "/ sqrt(CAST(CAST(rr AS HUGEINT) * (CAST(nn AS HUGEINT) - rr) "
    "AS DOUBLE) * CAST(CAST(nn AS HUGEINT) * sns2 "
    "- CAST(ssn AS HUGEINT) * ssn AS DOUBLE) "
    "/ CAST(nn AS DOUBLE))) * (CAST(CAST(nn AS HUGEINT) * ssr "
    "- CAST(rr AS HUGEINT) * ssn AS DOUBLE) "
    "/ sqrt(CAST(CAST(rr AS HUGEINT) * (CAST(nn AS HUGEINT) - rr) "
    "AS DOUBLE) * CAST(CAST(nn AS HUGEINT) * sns2 "
    "- CAST(ssn AS HUGEINT) * ssn AS DOUBLE) "
    "/ CAST(nn AS DOUBLE))), 6) AS ca_chi2 "
    "FROM t WHERE CAST(rr AS HUGEINT) * (CAST(nn AS HUGEINT) - rr) > 0 "
    "AND CAST(nn AS HUGEINT) * sns2 - CAST(ssn AS HUGEINT) * ssn > 0 "
    "ORDER BY priority"
)


# --- KPSS level-stationarity statistic per priority ------------------------------------


def timeseries_kpss_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**KPSS level-stationarity statistic** (Kwiatkowski, Phillips,
    Schmidt & Shin 1992) per monthly revenue series: η = Σ S_t² /
    (n²·σ̂²) with S_t the partial sums of demeaned revenue — the
    stationarity-null counterpart of the unit-root view
    (`timeseries_ar1_halflife` fits mean reversion; KPSS asks whether
    the level is stable at all — the triage that decides differencing
    before any ARIMA-family fit). Lag-0 (i.i.d.) long-run variance by
    CONTRACT — deterministic, no HAC bandwidth choice; the classical
    5% critical value 0.463 is emitted with a reject flag.

    Determinism: denominators clear by n — n·e_t = n·y_t − Σy and its
    partial sums are exact integers (DECIMAL(38,0) ≡ HUGEINT), and
    η = Σ(n·S_t)² / (n · Σ(n·e_t)²) algebraically, so the statistic
    is ONE division of exact integers, `dround` 6; the reject flag
    compares the identical unrounded double in both engines.

    Scale: one corpus-sized monthly rollup; one window
    exchange+sort per priority serves both the totals and the running
    partial sum."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w_n = Window.partitionBy("priority")
    t = m.select(
        "priority",
        "mon",
        "rev_s",
        F.count(F.lit(1)).over(w_n).alias("n"),
        F.sum(F.col("rev_s").cast("decimal(38,0)")).over(w_n).alias("sy"),
    )
    ne = (
        F.col("n").cast("decimal(38,0)") * F.col("rev_s") - F.col("sy")
    ).alias("ne")
    t2 = t.select("priority", "mon", "n", ne)
    w_cum = Window.partitionBy("priority").orderBy("mon")
    t3 = t2.select(
        "priority",
        "n",
        "ne",
        F.sum("ne").over(w_cum).alias("ns"),
    )
    agg = t3.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_months"),
        F.sum(F.col("ns") * F.col("ns")).alias("q_ns"),
        F.sum(F.col("ne") * F.col("ne")).alias("q_ne"),
    )
    eta = F.col("q_ns").cast("double") / (
        F.col("n_months").cast("double") * F.col("q_ne").cast("double")
    )
    return (
        agg.filter(F.col("q_ne") > 0)
        .select(
            "priority",
            "n_months",
            dround(eta, 6).alias("kpss_eta"),
            F.lit(0.463).alias("crit_5pct"),
            (eta > F.lit(0.463)).cast("int").alias("reject_level_stat"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_kpss_stat"] = timeseries_kpss_stat

ORACLE["timeseries_kpss_stat"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "t AS (SELECT priority, mon, rev_s, "
    "CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n, "
    "SUM(CAST(rev_s AS HUGEINT)) OVER (PARTITION BY priority) AS sy "
    "FROM m), "
    "t2 AS (SELECT priority, mon, n, "
    "CAST(n AS HUGEINT) * rev_s - sy AS ne FROM t), "
    "t3 AS (SELECT priority, n, ne, "
    "SUM(ne) OVER (PARTITION BY priority ORDER BY mon) AS ns FROM t2), "
    "a AS (SELECT priority, CAST(MAX(n) AS BIGINT) AS n_months, "
    "SUM(ns * ns) AS q_ns, SUM(ne * ne) AS q_ne FROM t3 GROUP BY 1) "
    "SELECT priority, n_months, "
    "ROUND(CAST(q_ns AS DOUBLE) / (CAST(n_months AS DOUBLE) "
    "* CAST(q_ne AS DOUBLE)), 6) AS kpss_eta, "
    "0.463 AS crit_5pct, "
    "CAST(CAST(q_ns AS DOUBLE) / (CAST(n_months AS DOUBLE) "
    "* CAST(q_ne AS DOUBLE)) > 0.463 AS INT) AS reject_level_stat "
    "FROM a WHERE q_ne > 0 ORDER BY priority"
)


# --- G-test (likelihood-ratio) independence --------------------------------------------

GTEST_SCALE = 1_000_000  # per-cell term quantization


def agg_gtest_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**G-test of independence** (Sokal & Rohlf; Woolf 1957) between
    order STATUS and PRIORITY: G = 2·Σ O·ln(N·O/(r·c)) — the
    likelihood-ratio twin of `agg_chi_square_independence` (additively
    decomposable across table partitions, which Pearson χ² is not;
    the version information-theoretic pipelines prefer since G =
    2N·MI in nats — the bridge to `agg_mutual_information`).

    Determinism: the margins/total join is the chi-square device; each
    cell's O·ln(N·O/(r·c)) double (one ln of a ratio of exact sub-2^53
    integers) quantizes to scaled int64 per CELL before the exact
    cross-cell sum, and G is one descale+double, `dround` 6.

    Scale: one map-side-combinable count aggregate over orders;
    margins broadcast back; cell algebra on the R×C frame."""
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_m = cells.groupBy("s").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("p").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("s").alias("nr"),
        F.countDistinct("p").alias("nc"),
    )
    joined = (
        cells.join(F.broadcast(rows_m), "s")
        .join(F.broadcast(cols_m), "p")
        .crossJoin(F.broadcast(tot))
    )
    o_d = F.col("o").cast("double")
    term = o_d * F.log(
        F.col("n").cast("double")
        * o_d
        / (F.col("r").cast("double") * F.col("c").cast("double"))
    )
    return (
        joined.groupBy("n", "nr", "nc")
        .agg(dsum_scaled(term, GTEST_SCALE).alias("t_s"))
        .select(
            F.col("n").cast("long").alias("n_orders"),
            ((F.col("nr") - F.lit(1)) * (F.col("nc") - F.lit(1)))
            .cast("int")
            .alias("df"),
            dround(
                F.lit(2.0)
                * F.col("t_s").cast("double")
                / F.lit(float(GTEST_SCALE)),
                6,
            ).alias("g_stat"),
        )
    )


QUERIES["agg_gtest_independence"] = agg_gtest_independence

ORACLE["agg_gtest_independence"] = (
    "WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p, "
    "CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2), "
    "rm AS (SELECT s, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1), "
    "cm AS (SELECT p, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT s) AS BIGINT) AS nr, "
    "CAST(COUNT(DISTINCT p) AS BIGINT) AS nc FROM cells), "
    "t AS (SELECT n, nr, nc, "
    "CAST(SUM(CAST(ROUND(CAST(o AS DOUBLE) "
    "* ln(CAST(n AS DOUBLE) * CAST(o AS DOUBLE) "
    "/ (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) "
    f"* {GTEST_SCALE}) AS BIGINT)) AS BIGINT) AS t_s "
    "FROM cells JOIN rm USING (s) JOIN cm USING (p), tot "
    "GROUP BY 1, 2, 3) "
    "SELECT n AS n_orders, CAST((nr - 1) * (nc - 1) AS INT) AS df, "
    f"ROUND(2.0 * CAST(t_s AS DOUBLE) / {float(GTEST_SCALE)}, 6) "
    "AS g_stat FROM t"
)


# --- Winsorized mean (10% per tail clamped, not dropped) -------------------------------


def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Exact winsorized mean** (10% per tail — Winsor via Tukey 1962)
    of order value per year: rank each year's orders, CLAMP the k =
    floor(n/10) most extreme values at each tail to the boundary order
    statistics v₍k+1₎ / v₍n−k₎, average all n — the robust-location
    estimator that (unlike `agg_trimmed_mean`, which drops the tails)
    keeps n constant and so composes with downstream per-year counts;
    the rank-based batch form of `norm_winsorize_clip`'s fixed-quantile
    clamp.

    Determinism: pure integer logic — the clamp boundary is a
    ROW_NUMBER with the unique order-key tiebreak, boundary values are
    exact scaled int64 picked by rank equality, and the winsorized sum
    k·v₍k+1₎ + Σ_middle + k·v₍n−k₎ is exact integer arithmetic end to
    end; means are single divisions, 4-dp.

    Scale: one exchange per year partition (rank window + conditional
    aggregate share it) — the `agg_trimmed_mean` posture."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    w_rank = Window.partitionBy(F.year("o_orderdate")).orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_n = Window.partitionBy(F.year("o_orderdate"))
    r = orders.select(
        F.year("o_orderdate").cast("int").alias("year"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    k = F.floor(F.col("n") / 10)
    mid = (F.col("rn") > k) & (F.col("rn") <= F.col("n") - k)
    agg = r.groupBy("year").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.max(k).cast("long").alias("k_wins"),
        F.max(F.when(F.col("rn") == k + 1, F.col("v"))).alias("lo_s"),
        F.max(F.when(F.col("rn") == F.col("n") - k, F.col("v"))).alias(
            "hi_s"
        ),
        F.sum(F.when(mid, F.col("v")).otherwise(F.lit(0)))
        .cast("long")
        .alias("mid_s"),
        F.sum("v").cast("long").alias("all_s"),
    )
    win_s = (
        F.col("k_wins") * F.col("lo_s")
        + F.col("mid_s")
        + F.col("k_wins") * F.col("hi_s")
    )
    return agg.select(
        "year",
        "n_orders",
        "k_wins",
        F.round(F.col("lo_s") / 10_000.0, 4).alias("lo_clamp"),
        F.round(F.col("hi_s") / 10_000.0, 4).alias("hi_clamp"),
        dround(
            F.col("all_s").cast("double")
            / 10_000.0
            / F.col("n_orders").cast("double"),
            4,
        ).alias("mean_price"),
        dround(
            win_s.cast("double")
            / 10_000.0
            / F.col("n_orders").cast("double"),
            4,
        ).alias("winsorized_mean_price"),
    ).orderBy("year")


QUERIES["agg_winsorized_mean"] = agg_winsorized_mean

ORACLE["agg_winsorized_mean"] = (
    "WITH r AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
    "CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS v, "
    "ROW_NUMBER() OVER (PARTITION BY year(o_orderdate) "
    "ORDER BY o_totalprice, o_orderkey) AS rn, "
    "COUNT(*) OVER (PARTITION BY year(o_orderdate)) AS n FROM orders), "
    "a AS (SELECT year, CAST(MAX(n) AS BIGINT) AS n_orders, "
    "CAST(MAX(n // 10) AS BIGINT) AS k_wins, "
    "CAST(MAX(CASE WHEN rn = n // 10 + 1 THEN v END) AS BIGINT) "
    "AS lo_s, "
    "CAST(MAX(CASE WHEN rn = n - n // 10 THEN v END) AS BIGINT) "
    "AS hi_s, "
    "CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10 "
    "THEN v ELSE 0 END) AS BIGINT) AS mid_s, "
    "CAST(SUM(v) AS BIGINT) AS all_s FROM r GROUP BY 1) "
    "SELECT year, n_orders, k_wins, "
    "ROUND(CAST(lo_s AS DOUBLE) / 10000.0, 4) AS lo_clamp, "
    "ROUND(CAST(hi_s AS DOUBLE) / 10000.0, 4) AS hi_clamp, "
    "ROUND(CAST(all_s AS DOUBLE) / 10000.0 "
    "/ CAST(n_orders AS DOUBLE), 4) AS mean_price, "
    "ROUND(CAST(k_wins * lo_s + mid_s + k_wins * hi_s AS DOUBLE) "
    "/ 10000.0 / CAST(n_orders AS DOUBLE), 4) "
    "AS winsorized_mean_price "
    "FROM a ORDER BY year"
)


# --- YTD running revenue vs prior-year YTD ---------------------------------------------


def window_ytd_vs_prior_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**YTD vs prior-year YTD** per priority — the fiscal-calendar
    running comparison every finance dashboard leads with (Kimball's
    "year-to-date vs same period last year"): cumulative revenue
    within the year at each month, joined against the SAME month
    offset of the previous year, with the YoY-YTD growth rate. The
    calendar-anchored member of the window family — `window_drawdown`
    compares against the running peak, `window_share_of_total` against
    the year total; this compares against LAST YEAR's partial total
    (which no single window frame expresses — it is a cumsum + a
    calendar self-join).

    Determinism: YTD is an exact int64 cumulative sum of the 1e4-scaled
    monthly revenue; the prior-year lookup is an integer equi-join on
    (priority, month-of-year, year−1) — no frame arithmetic, so missing
    months can never silently shift the comparison; growth is one
    division of exact ints, `dround` 6 (prior YTD > 0 always on this
    fixture; the join is INNER so year 1 rows without a comparator
    drop, keeping the output NULL-free).

    Scale: one corpus-sized monthly rollup, ONE window exchange per
    priority for the cumsum, then a dim-sized self-join (month-count
    rows) — broadcast-able."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w_cum = (
        Window.partitionBy("priority", F.year("mon"))
        .orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = m.select(
        "priority",
        "mon",
        F.year("mon").cast("int").alias("yr"),
        F.month("mon").cast("int").alias("monum"),
        "rev_s",
        F.sum("rev_s").over(w_cum).alias("ytd_s"),
    )
    # prior-year lookup as a SECOND WINDOW over the month-count frame
    # (partition by calendar month, lag one year) instead of a self-join
    # of two copies of the corpus-sized rollup subtree — Spark shares no
    # subtrees, so the join form would scan orders twice (rule 5)
    w_moy = Window.partitionBy("priority", "monum").orderBy("yr")
    j = t.select(
        "priority",
        "mon",
        "yr",
        "rev_s",
        "ytd_s",
        F.lag("yr").over(w_moy).alias("p_yr"),
        F.lag("ytd_s").over(w_moy).alias("p_ytd_s"),
    )
    return (
        j.filter(
            (F.col("p_yr") == F.col("yr") - F.lit(1))
            & (F.col("p_ytd_s") > 0)
        )
        .select(
            "priority",
            "mon",
            F.round(F.col("rev_s") / 10_000.0, 4).alias("revenue"),
            F.round(F.col("ytd_s") / 10_000.0, 4).alias("ytd_revenue"),
            F.round(F.col("p_ytd_s") / 10_000.0, 4).alias(
                "prior_ytd_revenue"
            ),
            dround(
                (
                    F.col("ytd_s").cast("double")
                    - F.col("p_ytd_s").cast("double")
                )
                / F.col("p_ytd_s").cast("double"),
                6,
            ).alias("yoy_ytd_growth"),
        )
        .orderBy("priority", "mon")
    )


QUERIES["window_ytd_vs_prior_year"] = window_ytd_vs_prior_year

ORACLE["window_ytd_vs_prior_year"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "t AS (SELECT priority, mon, "
    "CAST(year(mon) AS INT) AS yr, CAST(month(mon) AS INT) AS monum, "
    "rev_s, CAST(SUM(rev_s) OVER (PARTITION BY priority, year(mon) "
    "ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS BIGINT) AS ytd_s FROM m), "
    "j AS (SELECT priority, mon, yr, rev_s, ytd_s, "
    "LAG(yr) OVER w AS p_yr, LAG(ytd_s) OVER w AS p_ytd_s FROM t "
    "WINDOW w AS (PARTITION BY priority, monum ORDER BY yr)) "
    "SELECT priority, mon, "
    "ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(ytd_s AS DOUBLE) / 10000.0, 4) AS ytd_revenue, "
    "ROUND(CAST(p_ytd_s AS DOUBLE) / 10000.0, 4) AS prior_ytd_revenue, "
    "ROUND((CAST(ytd_s AS DOUBLE) - CAST(p_ytd_s AS DOUBLE)) "
    "/ CAST(p_ytd_s AS DOUBLE), 6) AS yoy_ytd_growth "
    "FROM j WHERE p_yr = yr - 1 AND p_ytd_s > 0 "
    "ORDER BY priority, mon"
)


# --- Deterministic A/B assignment + sample-ratio-mismatch check ------------------------


def agg_srm_assignment_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Hash-bucketed A/B assignment with a sample-ratio-mismatch
    (SRM) guardrail** (Fabijan et al. KDD'19 — the first diagnostic
    every experimentation platform runs): assign each order to
    control/treatment by a PORTABLE salted-md5 parity (the
    `agg_halfsample_ci` device — no RNG state, reproducible on any
    cluster layout), then chi-square the realized split against the
    designed 50/50. For two cells the statistic collapses to
    (n₀−n₁)²/n — ONE division of exact integers (and it is symmetric
    in the arms, so both rows carry the same value). The per-arm mean
    of the metric is emitted beside it — the table a reviewer reads
    before trusting any downstream test (`agg_delta_method_ratio_ci`,
    `agg_welch_ttest`).

    Determinism: assignment is a pure function of the order key; every
    count is exact; means divide exact scaled-int sums; the flag
    compares the identical unrounded double to the 1-df 5% critical
    value 3.841 in both engines.

    Scale: one map-side-combinable conditional aggregate over orders;
    all algebra on the 2-row arm frame."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ab:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    g = orders.select(
        F.when(arm == 0, "control").otherwise("treatment").alias("arm"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    ).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").cast("long").alias("s_g"),
    )
    w_all = Window.partitionBy()
    t = g.select(
        "arm",
        "n_g",
        "s_g",
        F.sum("n_g").over(w_all).alias("n"),
    )
    diff = F.lit(2) * F.col("n_g") - F.col("n")
    chi2 = (diff * diff).cast("double") / F.col("n").cast("double")
    return t.select(
        "arm",
        F.col("n_g").alias("n_assigned"),
        dround(
            F.col("n_g").cast("double") / F.col("n").cast("double"), 6
        ).alias("share"),
        dround(
            F.col("s_g").cast("double")
            / 10_000.0
            / F.col("n_g").cast("double"),
            4,
        ).alias("mean_price"),
        dround(chi2, 6).alias("srm_chi2"),
        (chi2 > F.lit(3.841)).cast("int").alias("srm_flag"),
    ).orderBy("arm")


QUERIES["agg_srm_assignment_check"] = agg_srm_assignment_check

ORACLE["agg_srm_assignment_check"] = (
    "WITH g AS (SELECT CASE WHEN "
    "CAST(('0x' || substr(md5('ab:' || CAST(o_orderkey AS VARCHAR)), "
    "1, 8)) AS BIGINT) % 2 = 0 THEN 'control' ELSE 'treatment' END "
    "AS arm, "
    "CAST(COUNT(*) AS BIGINT) AS n_g, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS s_g FROM orders GROUP BY 1), "
    "t AS (SELECT arm, n_g, s_g, SUM(n_g) OVER () AS n FROM g) "
    "SELECT arm, n_g AS n_assigned, "
    "ROUND(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share, "
    "ROUND(CAST(s_g AS DOUBLE) / 10000.0 / CAST(n_g AS DOUBLE), 4) "
    "AS mean_price, "
    "ROUND(CAST((2 * n_g - n) * (2 * n_g - n) AS DOUBLE) "
    "/ CAST(n AS DOUBLE), 6) AS srm_chi2, "
    "CAST(CAST((2 * n_g - n) * (2 * n_g - n) AS DOUBLE) "
    "/ CAST(n AS DOUBLE) > 3.841 AS INT) AS srm_flag "
    "FROM t ORDER BY arm"
)


# --- Gumbel extreme-value fit of monthly block maxima ----------------------------------

GUMBEL_GAMMA = 0.5772156649015329  # Euler-Mascheroni, shared literal
GUMBEL_PI = 3.141592653589793


def agg_extreme_value_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Gumbel extreme-value fit** (Gumbel 1958; the method-of-moments
    fit of Coles §3) of MONTHLY BLOCK MAXIMA of daily revenue: β =
    s·√6/π, μ = m − γ·β, and the T=12-block return level x_T = μ −
    β·ln(−ln(1−1/T)) — "the daily revenue spike you should expect
    about once a year". The tail-risk member of the profile family:
    `agg_percentiles` describes the bulk, `dq_outlier_iqr_fences`
    flags today's outliers, the Gumbel fit EXTRAPOLATES the maxima
    process (capacity planning reads x_T, not p99).

    Determinism: block maxima are exact int64 (max of 1e4-scaled daily
    sums); the moment sums n/Σ/Σ² accumulate in DECIMAL(38,0) ≡
    HUGEINT; β/μ/x_T are fixed-shape doubles off the exact integers
    with γ and π as shared literals (√6 and the double-ln are single
    correctly-rounded IEEE ops), `dround`ed.

    Scale: one corpus-sized daily rollup (map-side combinable), one
    tiny monthly max, one 1-row moment aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(dsum_scaled("o_totalprice").alias("d_s"))
    bm = daily.groupBy(
        F.date_trunc("month", "day").alias("mon")
    ).agg(F.max("d_s").alias("mx"))
    mxd = F.col("mx").cast("decimal(38,0)")
    stats = bm.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(mxd).alias("s1"),
        F.sum(mxd * F.col("mx")).alias("q2"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d / F.lit(10_000.0)
    m2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q2")
        - F.col("s1") * F.col("s1")
    )
    sd = F.sqrt(
        m2.cast("double") / (n_d * (n_d - F.lit(1.0)))
    ) / F.lit(10_000.0)
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(GUMBEL_PI)
    mu = mean - F.lit(GUMBEL_GAMMA) * beta
    rl12 = mu - beta * F.log(-F.log(F.lit(11.0) / F.lit(12.0)))
    return stats.filter(F.col("n") > 2).select(
        F.col("n").alias("n_blocks"),
        dround(mean, 4).alias("mean_block_max"),
        dround(sd, 4).alias("sd_block_max"),
        dround(mu, 4).alias("gumbel_mu"),
        dround(beta, 4).alias("gumbel_beta"),
        dround(rl12, 4).alias("return_level_12"),
    )


QUERIES["agg_extreme_value_gumbel"] = agg_extreme_value_gumbel

ORACLE["agg_extreme_value_gumbel"] = (
    "WITH d AS (SELECT CAST(date_trunc('day', o_orderdate) "
    "AS TIMESTAMP) AS day, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS d_s FROM orders GROUP BY 1), "
    "bm AS (SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS mon, "
    "CAST(MAX(d_s) AS BIGINT) AS mx FROM d GROUP BY 1), "
    "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "SUM(CAST(mx AS HUGEINT)) AS s1, "
    "SUM(CAST(mx AS HUGEINT) * mx) AS q2 FROM bm) "
    "SELECT n AS n_blocks, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 4) "
    "AS mean_block_max, "
    "ROUND(sqrt(CAST(CAST(n AS HUGEINT) * q2 - s1 * s1 AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0, 4) "
    "AS sd_block_max, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 "
    f"- {GUMBEL_GAMMA!r} * (sqrt(CAST(CAST(n AS HUGEINT) * q2 "
    "- s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) "
    "* (CAST(n AS DOUBLE) - 1.0))) / 10000.0 * sqrt(6.0) "
    f"/ {GUMBEL_PI!r}), 4) AS gumbel_mu, "
    "ROUND(sqrt(CAST(CAST(n AS HUGEINT) * q2 - s1 * s1 AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0 "
    f"* sqrt(6.0) / {GUMBEL_PI!r}, 4) AS gumbel_beta, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 "
    f"- {GUMBEL_GAMMA!r} * (sqrt(CAST(CAST(n AS HUGEINT) * q2 "
    "- s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) "
    "* (CAST(n AS DOUBLE) - 1.0))) / 10000.0 * sqrt(6.0) "
    f"/ {GUMBEL_PI!r}) "
    "- (sqrt(CAST(CAST(n AS HUGEINT) * q2 - s1 * s1 AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0 "
    f"* sqrt(6.0) / {GUMBEL_PI!r}) * ln(-ln(11.0 / 12.0)), 4) "
    "AS return_level_12 "
    "FROM st WHERE n > 2"
)


# --- McNemar test of year-over-year customer activity ----------------------------------


def agg_mcnemar_yearly_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**McNemar's test** (McNemar 1947) on PAIRED year-over-year
    customer activity: for each consecutive year pair, every customer
    is a matched pair (active-in-y, active-in-y+1), and the test asks
    whether churn (active→inactive) and acquisition (inactive→active)
    are balanced — marginal homogeneity, χ² = (b−c)²/(b+c) on the
    discordant counts only. The PAIRED member of the testing family
    (`agg_two_proportion_ztest` compares independent groups; customer
    activity across adjacent years is anything but independent), and
    the significance layer over `retention_cohorts`' descriptive
    rates. The continuity-corrected form (max(|b−c|−1,0))²/(b+c) is
    emitted beside the raw statistic.

    Determinism: activity is a distinct (customer, year) projection;
    all four pair-cell counts are exact integers off ONE full outer
    join of the activity set with itself shifted by a year; both
    statistics are single divisions of exact ints, `dround` 6.

    Scale: one distinct aggregate, one (customer, year) equi-join
    (co-partitioned), one year-count rollup."""
    orders = read_table(spark, sf_dir, "orders")
    act = (
        orders.select(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .distinct()
        # consumed three times (cur, shifted, bounds) — materialize once
        # instead of re-running the corpus distinct per consumer (rule 5)
        .localCheckpoint(eager=True)
    )
    nxt = act.select(
        "cust", (F.col("yr") - F.lit(1)).alias("yr"), F.lit(1).alias("b")
    )
    cur = act.select("cust", "yr", F.lit(1).alias("a"))
    j = cur.join(nxt, ["cust", "yr"], "full").select(
        "yr",
        F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("b"),
    )
    bounds = act.agg(
        F.min("yr").alias("y_min"), F.max("yr").alias("y_max")
    )
    g = (
        j.groupBy("yr")
        .agg(
            F.sum(F.col("a") * F.col("b")).cast("long").alias("n_both"),
            F.sum(F.col("a") * (F.lit(1) - F.col("b")))
            .cast("long")
            .alias("n_churned"),
            F.sum((F.lit(1) - F.col("a")) * F.col("b"))
            .cast("long")
            .alias("n_acquired"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("yr") >= F.col("y_min")) & (F.col("yr") < F.col("y_max"))
        )
    )
    b = F.col("n_churned")
    c = F.col("n_acquired")
    disc = (b + c).cast("double")
    chi2 = ((b - c) * (b - c)).cast("double") / disc
    cc_num = F.greatest(F.abs(b - c) - F.lit(1), F.lit(0)).cast("long")
    cc = (cc_num * cc_num).cast("double") / disc
    return (
        g.filter((b + c) > 0)
        .select(
            F.col("yr").alias("year_from"),
            (F.col("yr") + F.lit(1)).cast("int").alias("year_to"),
            "n_both",
            "n_churned",
            "n_acquired",
            dround(chi2, 6).alias("mcnemar_chi2"),
            dround(cc, 6).alias("mcnemar_cc_chi2"),
        )
        .orderBy("year_from")
    )


QUERIES["agg_mcnemar_yearly_activity"] = agg_mcnemar_yearly_activity

ORACLE["agg_mcnemar_yearly_activity"] = (
    "WITH act AS (SELECT DISTINCT o_custkey AS cust, "
    "CAST(year(o_orderdate) AS INT) AS yr FROM orders), "
    "cur AS (SELECT cust, yr, 1 AS a FROM act), "
    "nxt AS (SELECT cust, yr - 1 AS yr, 1 AS b FROM act), "
    "j AS (SELECT COALESCE(cur.yr, nxt.yr) AS yr, "
    "COALESCE(a, 0) AS a, COALESCE(b, 0) AS b "
    "FROM cur FULL OUTER JOIN nxt "
    "ON cur.cust = nxt.cust AND cur.yr = nxt.yr), "
    "bounds AS (SELECT MIN(yr) AS y_min, MAX(yr) AS y_max FROM act), "
    "g AS (SELECT yr, CAST(SUM(a * b) AS BIGINT) AS n_both, "
    "CAST(SUM(a * (1 - b)) AS BIGINT) AS n_churned, "
    "CAST(SUM((1 - a) * b) AS BIGINT) AS n_acquired "
    "FROM j GROUP BY 1) "
    "SELECT yr AS year_from, CAST(yr + 1 AS INT) AS year_to, "
    "n_both, n_churned, n_acquired, "
    "ROUND(CAST((n_churned - n_acquired) * (n_churned - n_acquired) "
    "AS DOUBLE) / CAST(n_churned + n_acquired AS DOUBLE), 6) "
    "AS mcnemar_chi2, "
    "ROUND(CAST(GREATEST(ABS(n_churned - n_acquired) - 1, 0) "
    "* GREATEST(ABS(n_churned - n_acquired) - 1, 0) AS DOUBLE) "
    "/ CAST(n_churned + n_acquired AS DOUBLE), 6) AS mcnemar_cc_chi2 "
    "FROM g, bounds WHERE yr >= y_min AND yr < y_max "
    "AND n_churned + n_acquired > 0 ORDER BY year_from"
)


# --- Daily bounce rate off the 30-minute sessionization --------------------------------


def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Daily bounce rate** off the shared 30-minute gap
    sessionization: share of sessions with exactly one event, per
    session-start day, beside the mean session depth — THE standard
    engagement KPI pair a web-analytics dashboard leads with, and the
    daily-grain consumer of `sessionize_batch`'s session frame
    (`events_dau_mau_stickiness` counts users; this scores their
    visits).

    Determinism: sessions come from the exact NTZ-interval gap logic
    (shared `_sessionize_events` — identical boundaries in both
    engines); counts are exact integers; the two exposed ratios are
    single divisions, `dround` 6.

    Scale: one window exchange by user (the sessionize shape), then
    one day-keyed map-side-combinable rollup."""
    from .custom_udf import _sessionize_events

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    s = _sessionize_events(ev)
    g = s.groupBy(
        F.date_trunc("day", "session_start").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.sum("n_events").cast("long").alias("n_events_total"),
    )
    return g.select(
        "day",
        "n_sessions",
        "n_bounces",
        dround(
            F.col("n_bounces").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("bounce_rate"),
        dround(
            F.col("n_events_total").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("avg_session_depth"),
    ).orderBy("day")


QUERIES["events_bounce_rate_daily"] = events_bounce_rate_daily

ORACLE["events_bounce_rate_daily"] = (
    "WITH e AS (SELECT user_id, ts, "
    "CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    ">= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), "
    "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e), "
    "sess AS (SELECT user_id, sid, MIN(ts) AS session_start, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM s GROUP BY 1, 2), "
    "g AS (SELECT CAST(date_trunc('day', session_start) AS TIMESTAMP) "
    "AS day, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
    "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_bounces, "
    "CAST(SUM(n_events) AS BIGINT) AS n_events_total FROM sess "
    "GROUP BY 1) "
    "SELECT day, n_sessions, n_bounces, "
    "ROUND(CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6) "
    "AS bounce_rate, "
    "ROUND(CAST(n_events_total AS DOUBLE) "
    "/ CAST(n_sessions AS DOUBLE), 6) AS avg_session_depth "
    "FROM g ORDER BY day"
)


# --- Lincoln-Petersen / Chapman capture-recapture coverage estimate --------------------


def agg_capture_recapture_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Capture-recapture population estimation** (Lincoln 1930;
    Petersen 1896; the bias-corrected Chapman 1951 form): treat each
    consecutive year's active-customer set as a capture occasion and
    estimate the reachable customer population from the overlap —
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — then compare against the CATALOG
    truth (the customer dimension's row count, which a marketplace
    normally cannot observe; here the fixture makes the estimator's
    error measurable). The estimation-theory member of the customer
    family: `retention_cohorts` describes the observed overlap, this
    extrapolates to the unobserved.

    Determinism: all capture counts are exact integers off distinct
    projections and one (customer, year) equi-join; the Chapman
    estimate and coverage ratio are fixed-shape doubles off exact
    ints, `dround`ed (4 dp estimate, 6 dp ratio).

    Scale: one distinct aggregate, one co-partitioned self-join, one
    year-count rollup, a broadcast 1-row catalog count."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    act = (
        orders.select(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .distinct()
        # three consumers (year counts, both self-join sides) — rule 5
        .localCheckpoint(eager=True)
    )
    n1f = act.groupBy("yr").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2f = n1f.select(
        (F.col("yr") - F.lit(1)).alias("yr"), F.col("n1").alias("n2")
    )
    pairs = act.join(
        act.select("cust", (F.col("yr") - F.lit(1)).alias("yr")),
        ["cust", "yr"],
    )
    mf = pairs.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    total = cust.agg(F.count(F.lit(1)).cast("long").alias("n_catalog"))
    j = (
        n1f.join(n2f, "yr")
        .join(mf, "yr", "left")
        .select(
            "yr",
            "n1",
            "n2",
            F.coalesce(F.col("m"), F.lit(0).cast("long")).alias("m"),
        )
        .crossJoin(F.broadcast(total))
    )
    chapman = (
        (F.col("n1") + F.lit(1)).cast("double")
        * (F.col("n2") + F.lit(1)).cast("double")
        / (F.col("m") + F.lit(1)).cast("double")
        - F.lit(1.0)
    )
    return j.select(
        F.col("yr").alias("year_from"),
        (F.col("yr") + F.lit(1)).cast("int").alias("year_to"),
        F.col("n1").alias("n_active_from"),
        F.col("n2").alias("n_active_to"),
        F.col("m").alias("n_overlap"),
        (F.col("n1") + F.col("n2") - F.col("m")).alias("n_union_observed"),
        dround(chapman, 4).alias("chapman_est"),
        F.col("n_catalog"),
        dround(
            chapman / F.col("n_catalog").cast("double"), 6
        ).alias("est_coverage"),
    ).orderBy("year_from")


QUERIES["agg_capture_recapture_customers"] = agg_capture_recapture_customers

ORACLE["agg_capture_recapture_customers"] = (
    "WITH act AS (SELECT DISTINCT o_custkey AS cust, "
    "CAST(year(o_orderdate) AS INT) AS yr FROM orders), "
    "n1f AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n1 FROM act "
    "GROUP BY 1), "
    "n2f AS (SELECT yr - 1 AS yr, n1 AS n2 FROM n1f), "
    "mf AS (SELECT a.yr, CAST(COUNT(*) AS BIGINT) AS m FROM act a "
    "JOIN act b ON b.cust = a.cust AND b.yr = a.yr + 1 GROUP BY 1), "
    "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_catalog "
    "FROM customer), "
    "j AS (SELECT n1f.yr, n1, n2, COALESCE(m, 0) AS m, n_catalog "
    "FROM n1f JOIN n2f ON n2f.yr = n1f.yr "
    "LEFT JOIN mf ON mf.yr = n1f.yr, tot) "
    "SELECT yr AS year_from, CAST(yr + 1 AS INT) AS year_to, "
    "n1 AS n_active_from, n2 AS n_active_to, m AS n_overlap, "
    "n1 + n2 - m AS n_union_observed, "
    "ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) "
    "/ CAST(m + 1 AS DOUBLE) - 1.0, 4) AS chapman_est, "
    "n_catalog, "
    "ROUND((CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) "
    "/ CAST(m + 1 AS DOUBLE) - 1.0) / CAST(n_catalog AS DOUBLE), 6) "
    "AS est_coverage "
    "FROM j ORDER BY year_from"
)


# --- Stationary distribution of the event Markov chain ---------------------------------

MKV_ITERS = 6
MKV_SCALE = 1_000_000_000_000.0  # probabilities as pico-units


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Stationary distribution of the event Markov chain** — π with
    π = πP, found by ``MKV_ITERS`` unrolled power iterations from the
    uniform start (the long-run occupancy the chain converges to): the
    EQUILIBRIUM view completing the sequence-model family —
    `events_markov_transitions` emits the one-step dynamics,
    `events_entropy_rate_markov` their predictability, this their
    long-run destination — read against the EMPIRICAL state shares (a
    large stationary-vs-empirical delta is the non-ergodicity /
    drifting-usage signal).

    Contract: the state space is the types appearing as transition
    SOURCES (every type on this fixture); transitions into
    out-of-space states are dropped before row-normalization.

    Determinism: the transition matrix quantizes row-stochastically to
    scaled int64 cells; each π update is an exact DECIMAL(38,0) ≡
    HUGEINT dot product of quantized vectors followed by one
    normalize-and-quantize (both engines round the identical double),
    so every iteration is bit-stable at any partition count.

    Scale: ONE corpus exchange (the per-user lag); every iteration
    runs on the k-row / k²-cell frames."""
    from ..functions.numerics import _nearest_long_away

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).filter(F.col("prev_type").isNotNull())
    cells = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    states = cells.select(
        F.col("prev_type").alias("state")
    ).distinct().localCheckpoint(eager=True)
    cells_in = cells.join(
        F.broadcast(states.select(F.col("state").alias("event_type"))),
        "event_type",
    ).localCheckpoint(eager=True)
    w_row = Window.partitionBy("prev_type")
    p = cells_in.select(
        "prev_type",
        "event_type",
        "n",
        _nearest_long_away(
            F.col("n").cast("double")
            / F.sum("n").over(w_row).cast("double")
            * F.lit(MKV_SCALE)
        ).alias("pq"),
    ).localCheckpoint(eager=True)
    kc = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(kc)).select(
        "state",
        _nearest_long_away(
            F.lit(MKV_SCALE) / F.col("k").cast("double")
        ).alias("piq"),
    )
    for _i in range(MKV_ITERS):
        raw = (
            p.join(pi, p["prev_type"] == pi["state"])
            .groupBy(F.col("event_type").alias("state"))
            .agg(
                F.sum(
                    F.col("piq").cast("decimal(38,0)") * F.col("pq")
                ).alias("raw")
            )
        )
        tot = raw.agg(F.sum("raw").alias("t"))
        pi = raw.crossJoin(F.broadcast(tot)).select(
            "state",
            _nearest_long_away(
                F.col("raw").cast("double")
                / F.col("t").cast("double")
                * F.lit(MKV_SCALE)
            ).alias("piq"),
        )
    emp = cells_in.groupBy(F.col("event_type").alias("state")).agg(
        F.sum("n").cast("long").alias("n_in")
    )
    w_all = Window.partitionBy()
    emp2 = emp.select(
        "state", "n_in", F.sum("n_in").over(w_all).alias("n_tot")
    )
    j = pi.join(emp2, "state")
    stat = F.col("piq").cast("double") / F.lit(MKV_SCALE)
    empd = F.col("n_in").cast("double") / F.col("n_tot").cast("double")
    return j.select(
        F.col("state").alias("event_type"),
        "n_in",
        dround(stat, 6).alias("stationary_prob"),
        dround(empd, 6).alias("empirical_share"),
        dround(stat - empd, 6).alias("delta"),
    ).orderBy("event_type")


QUERIES["events_markov_stationary"] = events_markov_stationary


def _markov_stationary_oracle_sql() -> str:
    s = f"{MKV_SCALE:.1f}"
    sql = (
        "WITH pr AS (SELECT LAG(event_type) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type, "
        "event_type FROM events), "
        "cells AS (SELECT prev_type, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM pr "
        "WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
        "states AS (SELECT DISTINCT prev_type AS state FROM cells), "
        "ci AS MATERIALIZED (SELECT c.* FROM cells c "
        "JOIN states s ON s.state = c.event_type), "
        "p AS MATERIALIZED (SELECT prev_type, event_type, n, "
        "CAST(ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER ("
        f"PARTITION BY prev_type) AS DOUBLE) * {s}) AS BIGINT) AS pq "
        "FROM ci), "
        "kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states), "
        "pi0 AS (SELECT state, "
        f"CAST(ROUND({s} / CAST(k AS DOUBLE)) AS BIGINT) AS piq "
        "FROM states, kc)"
    )
    prev = "pi0"
    for i in range(1, MKV_ITERS + 1):
        sql += (
            f", r{i} AS MATERIALIZED (SELECT p.event_type AS state, "
            "SUM(CAST(piq AS HUGEINT) * pq) AS raw "
            f"FROM p JOIN {prev} ON {prev}.state = p.prev_type "
            "GROUP BY 1), "
            f"t{i} AS (SELECT SUM(raw) AS t FROM r{i}), "
            f"pi{i} AS (SELECT state, "
            "CAST(ROUND(CAST(raw AS DOUBLE) / CAST(t AS DOUBLE) "
            f"* {s}) AS BIGINT) AS piq FROM r{i}, t{i})"
        )
        prev = f"pi{i}"
    sql += (
        ", emp AS (SELECT event_type AS state, "
        "CAST(SUM(n) AS BIGINT) AS n_in FROM ci GROUP BY 1), "
        "emp2 AS (SELECT state, n_in, SUM(n_in) OVER () AS n_tot "
        "FROM emp) "
        "SELECT state AS event_type, n_in, "
        f"ROUND(CAST(piq AS DOUBLE) / {s}, 6) AS stationary_prob, "
        "ROUND(CAST(n_in AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) "
        "AS empirical_share, "
        f"ROUND(CAST(piq AS DOUBLE) / {s} "
        "- CAST(n_in AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS delta "
        f"FROM {prev} JOIN emp2 USING (state) ORDER BY event_type"
    )
    return sql


ORACLE["events_markov_stationary"] = _markov_stationary_oracle_sql()


# --- Lorenz curve deciles of customer revenue ------------------------------------------


def agg_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Lorenz curve, tabulated at customer deciles** (Lorenz 1905):
    rank customers by lifetime revenue ascending, cut into 10 integer-
    rank deciles, and emit each decile's revenue and the CUMULATIVE
    population/revenue shares — the plottable curve behind
    `agg_gini_customer_revenue`'s scalar (the Gini is twice the area
    between this curve and the diagonal; dashboards show the curve).

    Determinism: deciles are pure integer logic — d = ceil(10·rn/n)
    off a ROW_NUMBER with the unique customer-key tiebreak (no ntile
    edge semantics); per-decile sums and the running totals are exact
    int64; shares are single divisions, `dround` 6.

    Scale: one customer rollup (map-side combinable), one rank
    window over the customer dimension, one 10-row cumulative
    window."""
    orders = read_table(spark, sf_dir, "orders")
    per_c = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        dsum_scaled("o_totalprice").alias("rev_s")
    )
    w_rank = Window.partitionBy().orderBy("rev_s", "cust")
    w_n = Window.partitionBy()
    r = per_c.select(
        "rev_s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    dec = F.ceil(F.lit(10) * F.col("rn") / F.col("n")).cast("int")
    g = r.groupBy(dec.alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_s").cast("long").alias("d_rev_s"),
        F.max("n").cast("long").alias("n"),
    )
    w_cum = Window.partitionBy().orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy()
    t = g.select(
        "decile",
        "n_customers",
        "d_rev_s",
        "n",
        F.sum("n_customers").over(w_cum).alias("cum_n"),
        F.sum("d_rev_s").over(w_cum).alias("cum_rev"),
        F.sum("d_rev_s").over(w_tot).alias("tot_rev"),
    )
    return t.select(
        "decile",
        "n_customers",
        F.round(F.col("d_rev_s") / 10_000.0, 4).alias("decile_revenue"),
        dround(
            F.col("cum_n").cast("double") / F.col("n").cast("double"), 6
        ).alias("cum_pop_share"),
        dround(
            F.col("cum_rev").cast("double")
            / F.col("tot_rev").cast("double"),
            6,
        ).alias("cum_revenue_share"),
    ).orderBy("decile")


QUERIES["agg_lorenz_curve_deciles"] = agg_lorenz_curve_deciles

ORACLE["agg_lorenz_curve_deciles"] = (
    "WITH pc AS (SELECT o_custkey AS cust, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1), "
    "r AS (SELECT rev_s, "
    "ROW_NUMBER() OVER (ORDER BY rev_s, cust) AS rn, "
    "COUNT(*) OVER () AS n FROM pc), "
    "g AS (SELECT CAST(CEIL(10 * rn / CAST(n AS DOUBLE)) AS INT) "
    "AS decile, CAST(COUNT(*) AS BIGINT) AS n_customers, "
    "CAST(SUM(rev_s) AS BIGINT) AS d_rev_s, "
    "CAST(MAX(n) AS BIGINT) AS n FROM r GROUP BY 1), "
    "t AS (SELECT decile, n_customers, d_rev_s, n, "
    "CAST(SUM(n_customers) OVER (ORDER BY decile "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS cum_n, "
    "CAST(SUM(d_rev_s) OVER (ORDER BY decile "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS cum_rev, "
    "CAST(SUM(d_rev_s) OVER () AS BIGINT) AS tot_rev FROM g) "
    "SELECT decile, n_customers, "
    "ROUND(CAST(d_rev_s AS DOUBLE) / 10000.0, 4) AS decile_revenue, "
    "ROUND(CAST(cum_n AS DOUBLE) / CAST(n AS DOUBLE), 6) "
    "AS cum_pop_share, "
    "ROUND(CAST(cum_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE), 6) "
    "AS cum_revenue_share "
    "FROM t ORDER BY decile"
)


# --- Durbin-Watson autocorrelation-of-residuals diagnostic -----------------------------


def timeseries_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Durbin-Watson statistic** (Durbin & Watson 1950) on the
    residuals of the per-priority monthly OLS trend: DW =
    Σ(e_t−e_{t−1})²/Σe_t² — the standard "did the linear fit leave
    serial correlation behind" diagnostic that decides whether
    `window_rolling_ols_slope`'s trend lines can be trusted or an
    AR term (`timeseries_ar1_halflife`) is needed. DW ≈ 2(1−ρ̂₁); the
    implied ρ̂ is emitted beside it.

    Determinism: the OLS coefficients come from exact integer normal-
    equation sums (the `timeseries_theta_forecast` device); each
    residual y_t − a − b·t is the identical double in both engines and
    quantizes to int64 (sub-unit absolute error on a 1e12-scale
    series), so both quadratic forms are exact DECIMAL(38,0) ≡ HUGEINT
    sums and DW is ONE division, `dround` 6.

    Scale: one corpus-sized monthly rollup; one window exchange per
    priority serves the index, the moment sums, the residual, and the
    lag."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("y"))
    w_ord = Window.partitionBy("priority").orderBy("mon")
    w_p = Window.partitionBy("priority")
    t1 = m.select(
        "priority",
        "mon",
        "y",
        F.row_number().over(w_ord).cast("long").alias("t"),
    )

    def dd(c):
        return c.cast("decimal(38,0)")

    t2 = t1.select(
        "priority",
        "mon",
        "y",
        "t",
        F.count(F.lit(1)).over(w_p).alias("n"),
        F.sum("t").over(w_p).alias("st"),
        F.sum(F.col("t") * F.col("t")).over(w_p).alias("st2"),
        F.sum(dd(F.col("y"))).over(w_p).alias("sy"),
        F.sum(dd(F.col("t")) * F.col("y")).over(w_p).alias("sty"),
    )
    num = dd(F.col("n")) * F.col("sty") - dd(F.col("st")) * F.col("sy")
    den = dd(F.col("n")) * F.col("st2") - dd(F.col("st")) * F.col("st")
    b_s = num.cast("double") / den.cast("double")
    a_s = (
        F.col("sy").cast("double") - b_s * F.col("st").cast("double")
    ) / F.col("n").cast("double")
    e_q = _nearest_long_away(
        F.col("y").cast("double") - (a_s + b_s * F.col("t").cast("double"))
    )
    t3 = t2.select("priority", "mon", "n", e_q.alias("e"))
    t4 = t3.select(
        "priority",
        "n",
        "e",
        F.lag("e").over(w_ord).alias("e_prev"),
    )
    d = F.col("e") - F.col("e_prev")
    agg = t4.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_months"),
        F.sum(dd(F.col("e")) * F.col("e")).alias("q_e"),
        F.sum(
            F.when(F.col("e_prev").isNotNull(), dd(d) * d).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("q_d"),
    )
    dw = F.col("q_d").cast("double") / F.col("q_e").cast("double")
    return (
        agg.filter(F.col("q_e") > 0)
        .select(
            "priority",
            "n_months",
            dround(dw, 6).alias("durbin_watson"),
            dround(F.lit(1.0) - dw / F.lit(2.0), 6).alias("rho_implied"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_durbin_watson"] = timeseries_durbin_watson

ORACLE["timeseries_durbin_watson"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y FROM orders GROUP BY 1, 2), "
    "t1 AS (SELECT priority, mon, y, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY mon) "
    "AS BIGINT) AS t FROM m), "
    "t2 AS (SELECT priority, mon, y, t, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS n, "
    "CAST(SUM(t) OVER w AS BIGINT) AS st, "
    "CAST(SUM(t * t) OVER w AS BIGINT) AS st2, "
    "SUM(CAST(y AS HUGEINT)) OVER w AS sy, "
    "SUM(CAST(t AS HUGEINT) * y) OVER w AS sty "
    "FROM t1 WINDOW w AS (PARTITION BY priority)), "
    "t3 AS (SELECT priority, mon, n, "
    "CAST(ROUND(CAST(y AS DOUBLE) - ("
    "(CAST(sy AS DOUBLE) - CAST(CAST(n AS HUGEINT) * sty "
    "- CAST(st AS HUGEINT) * sy AS DOUBLE) "
    "/ CAST(CAST(n AS HUGEINT) * st2 - CAST(st AS HUGEINT) * st "
    "AS DOUBLE) * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) "
    "+ CAST(CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy "
    "AS DOUBLE) / CAST(CAST(n AS HUGEINT) * st2 "
    "- CAST(st AS HUGEINT) * st AS DOUBLE) * CAST(t AS DOUBLE))) "
    "AS BIGINT) AS e FROM t2), "
    "t4 AS (SELECT priority, n, e, "
    "LAG(e) OVER (PARTITION BY priority ORDER BY mon) AS e_prev "
    "FROM t3), "
    "a AS (SELECT priority, CAST(MAX(n) AS BIGINT) AS n_months, "
    "SUM(CAST(e AS HUGEINT) * e) AS q_e, "
    "SUM(CASE WHEN e_prev IS NOT NULL THEN "
    "CAST(e - e_prev AS HUGEINT) * (e - e_prev) "
    "ELSE CAST(0 AS HUGEINT) END) AS q_d FROM t4 GROUP BY 1) "
    "SELECT priority, n_months, "
    "ROUND(CAST(q_d AS DOUBLE) / CAST(q_e AS DOUBLE), 6) "
    "AS durbin_watson, "
    "ROUND(1.0 - CAST(q_d AS DOUBLE) / CAST(q_e AS DOUBLE) / 2.0, 6) "
    "AS rho_implied "
    "FROM a WHERE q_e > 0 ORDER BY priority"
)


# --- Herfindahl-Hirschman brand concentration ------------------------------------------


def agg_herfindahl_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Herfindahl-Hirschman index** of brand revenue concentration
    per ship year — HHI = Σ share_b² (the antitrust-standard
    concentration scalar; DOJ thresholds 0.15/0.25) with the effective
    brand count 1/HHI (the Hill number the Simpson family uses) and
    the top brand's share — the MARKET-structure view beside
    `agg_gini_customer_revenue`'s customer-inequality view and
    `abc_pareto_parts`' part classes.

    Determinism: HHI clears to Σ rev_b² / (Σ rev_b)² — per-brand
    squares exact in DECIMAL(38,0) ≡ HUGEINT, the denominator square
    formed as a double PRODUCT of the same exact total (the
    `agg_spearman_rank_corr` 128-bit posture); every exposed double is
    one fixed-shape expression, `dround` 6.

    Scale: one broadcast dim join (part), one map-side-combinable
    (year, brand) rollup, then all algebra on the brand-count frame."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    cells = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy(
            F.year("l_shipdate").cast("int").alias("year"),
            F.col("p_brand").alias("brand"),
        )
        .agg(dsum_scaled("l_extendedprice").alias("rev_s"))
    )
    w_y = Window.partitionBy("year")

    def dd(c):
        return c.cast("decimal(38,0)")

    t = cells.select(
        "year",
        "rev_s",
        F.sum(dd(F.col("rev_s"))).over(w_y).alias("s_tot"),
    )
    agg = t.groupBy("year").agg(
        F.count(F.lit(1)).cast("int").alias("n_brands"),
        F.sum(dd(F.col("rev_s")) * F.col("rev_s")).alias("q"),
        F.max("s_tot").alias("s_tot"),
        F.max("rev_s").cast("long").alias("max_rev"),
    )
    s_d = F.col("s_tot").cast("double")
    hhi = F.col("q").cast("double") / (s_d * s_d)
    return (
        agg.filter(F.col("s_tot") > 0)
        .select(
            "year",
            "n_brands",
            dround(hhi, 6).alias("hhi"),
            dround(F.lit(1.0) / hhi, 4).alias("effective_brands"),
            dround(F.col("max_rev").cast("double") / s_d, 6).alias(
                "top_brand_share"
            ),
        )
        .orderBy("year")
    )


QUERIES["agg_herfindahl_brand_hhi"] = agg_herfindahl_brand_hhi

ORACLE["agg_herfindahl_brand_hhi"] = (
    "WITH cells AS (SELECT CAST(year(l_shipdate) AS INT) AS year, "
    "p_brand AS brand, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) "
    "AS BIGINT) AS rev_s "
    "FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1, 2), "
    "t AS (SELECT year, rev_s, "
    "SUM(CAST(rev_s AS HUGEINT)) OVER (PARTITION BY year) AS s_tot "
    "FROM cells), "
    "a AS (SELECT year, CAST(COUNT(*) AS INT) AS n_brands, "
    "SUM(CAST(rev_s AS HUGEINT) * rev_s) AS q, "
    "MAX(s_tot) AS s_tot, CAST(MAX(rev_s) AS BIGINT) AS max_rev "
    "FROM t GROUP BY 1) "
    "SELECT year, n_brands, "
    "ROUND(CAST(q AS DOUBLE) / (CAST(s_tot AS DOUBLE) "
    "* CAST(s_tot AS DOUBLE)), 6) AS hhi, "
    "ROUND(1.0 / (CAST(q AS DOUBLE) / (CAST(s_tot AS DOUBLE) "
    "* CAST(s_tot AS DOUBLE))), 4) AS effective_brands, "
    "ROUND(CAST(max_rev AS DOUBLE) / CAST(s_tot AS DOUBLE), 6) "
    "AS top_brand_share "
    "FROM a WHERE s_tot > 0 ORDER BY year"
)


# --- Mann-Kendall nonparametric trend test ----------------------------------------------


def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Mann-Kendall trend test** (Mann 1945; Kendall 1975 — the
    hydrology-standard nonparametric monotone-trend test) per monthly
    revenue series: S = Σ_{i<j} sgn(y_j − y_i), tie-corrected variance
    Var = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18, and the
    continuity-corrected z — the distribution-free companion of
    `agg_linear_trend`'s OLS slope (MK sees any monotone trend, not
    just linear, and ignores outlier magnitude entirely); Kendall's
    τ-a = 2S/(n(n−1)) is emitted beside it (the same concordance
    algebra as `agg_kendall_tau`, here against TIME).

    Determinism: pair generation strictly AFTER the monthly rollup
    (the `agg_theil_sen_trend` posture — O(n²) in series length, not
    row count; the tiny rollup is localCheckpoint-ed so the corpus
    aggregate runs once, not once per join side); S, the tie sum and
    18·Var are exact integers; z and τ are fixed-shape doubles off
    exact ints, `dround` 6.

    Scale: one corpus-sized monthly rollup, then all pair work on the
    ~month-count frame."""
    orders = read_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(dsum_scaled("o_totalprice").alias("y"))
        .localCheckpoint(eager=True)
    )
    a = m.select(
        "priority", F.col("mon").alias("mi"), F.col("y").alias("yi")
    )
    b = m.select(
        "priority", F.col("mon").alias("mj"), F.col("y").alias("yj")
    )
    pairs = a.join(b, "priority").filter(F.col("mi") < F.col("mj"))
    sgn = F.when(F.col("yj") > F.col("yi"), 1).otherwise(
        F.when(F.col("yj") < F.col("yi"), -1).otherwise(0)
    )
    s_f = pairs.groupBy("priority").agg(
        F.sum(sgn).cast("long").alias("s")
    )
    nf = m.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        m.groupBy("priority", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("priority")
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - F.lit(1))
                * (F.lit(2) * F.col("t") + F.lit(5))
            )
            .cast("long")
            .alias("tie_sum")
        )
    )
    j = s_f.join(nf, "priority").join(ties, "priority")
    n = F.col("n")
    var18 = (
        n * (n - F.lit(1)) * (F.lit(2) * n + F.lit(5)) - F.col("tie_sum")
    )
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    s_d = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (s_d - F.lit(1.0)) / sd).otherwise(
        F.when(F.col("s") < 0, (s_d + F.lit(1.0)) / sd).otherwise(
            F.lit(0.0)
        )
    )
    tau = F.lit(2.0) * s_d / (
        n.cast("double") * (n.cast("double") - F.lit(1.0))
    )
    return (
        j.filter(var18 > 0)
        .select(
            "priority",
            F.col("n").alias("n_months"),
            F.col("s").alias("s_stat"),
            var18.cast("long").alias("var18"),
            dround(tau, 6).alias("kendall_tau_a"),
            dround(z, 6).alias("mk_z"),
        )
        .orderBy("priority")
    )


QUERIES["timeseries_mann_kendall"] = timeseries_mann_kendall

ORACLE["timeseries_mann_kendall"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS y FROM orders GROUP BY 1, 2), "
    "p AS (SELECT a.priority, "
    "CAST(SUM(CASE WHEN b.y > a.y THEN 1 "
    "WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s "
    "FROM m a JOIN m b ON b.priority = a.priority AND a.mon < b.mon "
    "GROUP BY 1), "
    "nf AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n FROM m "
    "GROUP BY 1), "
    "ties AS (SELECT priority, "
    "CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum FROM "
    "(SELECT priority, y, CAST(COUNT(*) AS BIGINT) AS t FROM m "
    "GROUP BY 1, 2) GROUP BY 1), "
    "j AS (SELECT p.priority, s, n, "
    "n * (n - 1) * (2 * n + 5) - tie_sum AS var18 "
    "FROM p JOIN nf USING (priority) JOIN ties USING (priority)) "
    "SELECT priority, n AS n_months, s AS s_stat, "
    "CAST(var18 AS BIGINT) AS var18, "
    "ROUND(2.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) "
    "* (CAST(n AS DOUBLE) - 1.0)), 6) AS kendall_tau_a, "
    "ROUND(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) "
    "/ sqrt(CAST(var18 AS DOUBLE) / 18.0) "
    "WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) "
    "/ sqrt(CAST(var18 AS DOUBLE) / 18.0) ELSE 0.0 END, 6) AS mk_z "
    "FROM j WHERE var18 > 0 ORDER BY priority"
)


# --- Decision-stump split evaluation by Gini impurity -----------------------------------

STUMP_SCALE = 1_000_000_000_000.0  # impurity-decrease rank quantization


def agg_decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Decision-stump split search by Gini impurity** (CART —
    Breiman et al. 1984, ch. 2): for every candidate one-vs-rest split
    on priority, the weighted Gini impurity of the two children over
    the order-status distribution and its decrease vs the parent — the
    ML-primitive counterpart of `agg_chi_square_independence` (the
    chi-square says the table is dependent; the stump says which
    single split buys the most purity — feature-importance triage
    implemented as three aggregates).

    Determinism: the dense status×priority contingency builds from one
    count aggregate + a cross join of the two tiny key sets (missing
    cells must be EXPLICIT zeros — the right child's (tot−o)² term is
    nonzero precisely where the left count is absent); every impurity
    clears to exact-integer forms (n_ch² − Σc²)/n_ch; the best-split
    rank orders by the decrease quantized to int64 with the split
    value as tiebreak.

    Scale: one map-side-combinable count over orders; everything after
    is on the R×C frame."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("o")).localCheckpoint(eager=True)
    statuses = cells.select("s").distinct()
    prios = cells.select("p").distinct()
    dense = (
        statuses.crossJoin(prios)
        .join(cells, ["s", "p"], "left")
        .select(
            "s", "p", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    w_s = Window.partitionBy("s")
    t = dense.select(
        "s",
        "p",
        "o",
        F.sum("o").over(w_s).alias("tot_s"),
    )

    def dd(c):
        return c.cast("decimal(38,0)")

    per_p = t.groupBy("p").agg(
        F.sum("o").cast("long").alias("l"),
        F.sum(dd(F.col("o")) * F.col("o")).alias("ql"),
        F.sum(F.col("tot_s")).cast("long").alias("nn"),
        F.sum(
            dd(F.col("tot_s") - F.col("o"))
            * (F.col("tot_s") - F.col("o"))
        ).alias("qr"),
        F.sum(dd(F.col("tot_s")) * F.col("tot_s")).alias("qn"),
    )
    l_d = F.col("l").cast("double")
    n_d = F.col("nn").cast("double")
    r_d = n_d - l_d
    gini_parent = (
        n_d * n_d - F.col("qn").cast("double")
    ) / (n_d * n_d)
    child = (
        (l_d * l_d - F.col("ql").cast("double")) / l_d
        + (r_d * r_d - F.col("qr").cast("double")) / r_d
    ) / n_d
    dec = gini_parent - child
    ranked = per_p.filter((F.col("l") > 0) & (F.col("l") < F.col("nn"))).select(
        F.col("p").alias("split_priority"),
        F.col("l").alias("n_left"),
        (F.col("nn") - F.col("l")).alias("n_right"),
        dround(gini_parent, 6).alias("gini_parent"),
        dround(child, 6).alias("gini_weighted_children"),
        dround(dec, 6).alias("gini_decrease"),
        _nearest_long_away(dec * F.lit(STUMP_SCALE)).alias("dq"),
    )
    w_rank = Window.orderBy(F.col("dq").desc(), "split_priority")
    return (
        ranked.select(
            "split_priority",
            "n_left",
            "n_right",
            "gini_parent",
            "gini_weighted_children",
            "gini_decrease",
            F.row_number().over(w_rank).cast("int").alias("rank"),
        )
        .orderBy("rank")
    )


QUERIES["agg_decision_stump_gini"] = agg_decision_stump_gini

ORACLE["agg_decision_stump_gini"] = (
    "WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p, "
    "CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2), "
    "dense AS (SELECT ss.s, pp.p, COALESCE(c.o, 0) AS o "
    "FROM (SELECT DISTINCT s FROM cells) ss "
    "CROSS JOIN (SELECT DISTINCT p FROM cells) pp "
    "LEFT JOIN cells c ON c.s = ss.s AND c.p = pp.p), "
    "t AS (SELECT s, p, o, "
    "SUM(o) OVER (PARTITION BY s) AS tot_s FROM dense), "
    "pp2 AS (SELECT p, CAST(SUM(o) AS BIGINT) AS l, "
    "SUM(CAST(o AS HUGEINT) * o) AS ql, "
    "CAST(SUM(tot_s) AS BIGINT) AS nn, "
    "SUM(CAST(tot_s - o AS HUGEINT) * (tot_s - o)) AS qr, "
    "SUM(CAST(tot_s AS HUGEINT) * tot_s) AS qn FROM t GROUP BY 1), "
    "r AS (SELECT p AS split_priority, l AS n_left, "
    "nn - l AS n_right, "
    "ROUND((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) "
    "- CAST(qn AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "* CAST(nn AS DOUBLE)), 6) AS gini_parent, "
    "ROUND(((CAST(l AS DOUBLE) * CAST(l AS DOUBLE) "
    "- CAST(ql AS DOUBLE)) / CAST(l AS DOUBLE) "
    "+ ((CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "* (CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "- CAST(qr AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "- CAST(l AS DOUBLE))) / CAST(nn AS DOUBLE), 6) "
    "AS gini_weighted_children, "
    "ROUND((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) "
    "- CAST(qn AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "* CAST(nn AS DOUBLE)) "
    "- ((CAST(l AS DOUBLE) * CAST(l AS DOUBLE) "
    "- CAST(ql AS DOUBLE)) / CAST(l AS DOUBLE) "
    "+ ((CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "* (CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "- CAST(qr AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "- CAST(l AS DOUBLE))) / CAST(nn AS DOUBLE), 6) AS gini_decrease, "
    "CAST(ROUND(((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) "
    "- CAST(qn AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "* CAST(nn AS DOUBLE)) "
    "- ((CAST(l AS DOUBLE) * CAST(l AS DOUBLE) "
    "- CAST(ql AS DOUBLE)) / CAST(l AS DOUBLE) "
    "+ ((CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "* (CAST(nn AS DOUBLE) - CAST(l AS DOUBLE)) "
    "- CAST(qr AS DOUBLE)) / (CAST(nn AS DOUBLE) "
    "- CAST(l AS DOUBLE))) / CAST(nn AS DOUBLE)) "
    f"* {STUMP_SCALE:.1f}) AS BIGINT) AS dq "
    "FROM pp2 WHERE l > 0 AND l < nn) "
    "SELECT split_priority, n_left, n_right, gini_parent, "
    "gini_weighted_children, gini_decrease, "
    "CAST(ROW_NUMBER() OVER (ORDER BY dq DESC, split_priority) AS INT) "
    "AS rank FROM r ORDER BY rank"
)


# --- Conversion-latency quantiles (view -> purchase) ------------------------------------


def events_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**View→purchase conversion latency, quantile profile per
    month**: for every purchase, the gap to the SAME user's most
    recent prior view (the CEP anchor device carried by one
    ignore-nulls window), summarized as p50/p90/mean hours per
    purchase month — the latency DISTRIBUTION view that
    `events_survival_km` (which censors) and `events_pattern_match`
    (which lists matches) both imply but don't tabulate; it is the
    marketing dashboard's "time-to-convert" panel.

    Determinism: gaps are exact epoch-microsecond int64 differences
    (pure interval arithmetic — rule 6a); the quantiles are Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` on those exact ints (the
    `agg_percentiles` equivalence); mean divides exact sums. All
    exposed hour values are fixed-shape doubles, `dround` 6.

    Scale: ONE exchange by user carries the anchor window; the
    month rollup is map-side combinable."""
    from ..functions.timeparts import epoch_micros_from_ntz

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = epoch_micros_from_ntz(F.col("ts"))
    anchored = ev.select(
        "ts",
        "event_type",
        us.alias("ts_us"),
        F.last(
            F.when(F.col("event_type") == "view", us), ignorenulls=True
        )
        .over(w)
        .alias("view_us"),
    )
    gaps = anchored.filter(
        (F.col("event_type") == "purchase") & F.col("view_us").isNotNull()
    ).select(
        F.date_trunc("month", "ts").alias("mon"),
        (F.col("ts_us") - F.col("view_us")).alias("gap_us"),
    )
    h = F.lit(3_600_000_000.0)
    g = gaps.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.percentile("gap_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("gap_us", F.lit(0.9)).alias("p90_us"),
        F.sum("gap_us").cast("long").alias("s_us"),
    )
    return g.select(
        "mon",
        "n_conversions",
        dround(F.col("p50_us") / h, 6).alias("p50_hours"),
        dround(F.col("p90_us") / h, 6).alias("p90_hours"),
        dround(
            F.col("s_us").cast("double")
            / F.col("n_conversions").cast("double")
            / h,
            6,
        ).alias("mean_hours"),
    ).orderBy("mon")


QUERIES["events_conversion_latency_quantiles"] = (
    events_conversion_latency_quantiles
)

ORACLE["events_conversion_latency_quantiles"] = (
    "WITH a AS (SELECT ts, event_type, epoch_us(ts) AS ts_us, "
    "LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END "
    "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_us "
    "FROM events), "
    "g AS (SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS mon, "
    "CAST(ts_us - view_us AS BIGINT) AS gap_us FROM a "
    "WHERE event_type = 'purchase' AND view_us IS NOT NULL), "
    "q AS (SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_conversions, "
    "quantile_cont(gap_us, 0.5) AS p50_us, "
    "quantile_cont(gap_us, 0.9) AS p90_us, "
    "CAST(SUM(gap_us) AS BIGINT) AS s_us FROM g GROUP BY 1) "
    "SELECT mon, n_conversions, "
    "ROUND(p50_us / 3600000000.0, 6) AS p50_hours, "
    "ROUND(p90_us / 3600000000.0, 6) AS p90_hours, "
    "ROUND(CAST(s_us AS DOUBLE) / CAST(n_conversions AS DOUBLE) "
    "/ 3600000000.0, 6) AS mean_hours "
    "FROM q ORDER BY mon"
)


# --- Laspeyres / Paasche / Fisher price indices ------------------------------------------


def agg_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Laspeyres, Paasche and Fisher price indices** per ship year
    against the first year as base (ILO CPI manual ch. 15): L_t =
    Σp_t·q₀/Σp₀·q₀ (base-period basket at current prices), P_t =
    Σp_t·q_t/Σp₀·q_t (current basket at base prices), Fisher = √(L·P)
    — the macro-index family the reference's NFP domain sits beside
    (a payroll dashboard quotes exactly this construction), computed
    over parts present in both periods. Unit prices are per-part
    revenue/quantity.

    Determinism: per-(part, year) revenue (1e4-scaled) and quantity
    are exact int64; each basket term E_t·Q₀/Q_t is one double off
    three exact ints, quantized to scaled int64 per PART before the
    exact per-year sum (the entropy-family device); the three indices
    are fixed-shape expressions off the exact sums, `dround` 6.

    Scale: one lineitem-sized (part, year) aggregate (map-side
    combinable), a part-keyed co-partitioned join against the base
    year, one per-year rollup."""
    from ..functions.numerics import _nearest_long_away

    li = read_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").cast("int").alias("yr"),
    ).agg(
        dsum_scaled("l_extendedprice").alias("e_s"),
        F.sum("l_quantity").cast("long").alias("q"),
    )
    # base-period lookup as a per-part WINDOW over the single (part,
    # year) aggregate — a base-subset self-join would re-execute the
    # lineitem rollup per side (rule 5)
    w_all = Window.partitionBy()
    w_part = Window.partitionBy("part")
    t = py.select(
        "part",
        "yr",
        "e_s",
        "q",
        F.min("yr").over(w_all).alias("b"),
    )
    t2 = t.select(
        "part",
        "yr",
        "e_s",
        "q",
        "b",
        F.max(F.when(F.col("yr") == F.col("b"), F.col("e_s")))
        .over(w_part)
        .alias("e0"),
        F.max(F.when(F.col("yr") == F.col("b"), F.col("q")))
        .over(w_part)
        .alias("q0"),
    )
    j = t2.filter(
        (F.col("yr") > F.col("b"))
        & F.col("q0").isNotNull()
        & (F.col("q") > 0)
        & (F.col("q0") > 0)
    )
    et = F.col("e_s").cast("double")
    e0 = F.col("e0").cast("double")
    qt = F.col("q").cast("double")
    q0 = F.col("q0").cast("double")
    lt = _nearest_long_away(et * q0 / qt)  # p_t * q0, scaled
    pt = _nearest_long_away(e0 * qt / q0)  # p_0 * q_t, scaled
    g = j.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(lt).cast("long").alias("num_l"),
        F.sum("e0").cast("long").alias("den_l"),
        F.sum("e_s").cast("long").alias("num_p"),
        F.sum(pt).cast("long").alias("den_p"),
    )
    l_idx = F.col("num_l").cast("double") / F.col("den_l").cast("double")
    p_idx = F.col("num_p").cast("double") / F.col("den_p").cast("double")
    return (
        g.filter((F.col("den_l") > 0) & (F.col("den_p") > 0))
        .select(
            F.col("yr").alias("year"),
            F.col("n_parts").alias("n_parts_matched"),
            dround(l_idx, 6).alias("laspeyres"),
            dround(p_idx, 6).alias("paasche"),
            dround(F.sqrt(l_idx * p_idx), 6).alias("fisher"),
        )
        .orderBy("year")
    )


QUERIES["agg_price_index_laspeyres"] = agg_price_index_laspeyres

ORACLE["agg_price_index_laspeyres"] = (
    "WITH py AS (SELECT l_partkey AS part, "
    "CAST(year(l_shipdate) AS INT) AS yr, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) "
    "AS BIGINT) AS e_s, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q "
    "FROM lineitem GROUP BY 1, 2), "
    "t AS (SELECT part, yr, e_s, q, MIN(yr) OVER () AS b FROM py), "
    "t2 AS (SELECT part, yr, e_s, q, b, "
    "MAX(CASE WHEN yr = b THEN e_s END) OVER (PARTITION BY part) "
    "AS e0, "
    "MAX(CASE WHEN yr = b THEN q END) OVER (PARTITION BY part) "
    "AS q0 FROM t), "
    "j AS (SELECT yr, e_s, q, e0, q0 FROM t2 "
    "WHERE yr > b AND q0 IS NOT NULL AND q > 0 AND q0 > 0), "
    "g AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_parts, "
    "CAST(SUM(CAST(ROUND(CAST(e_s AS DOUBLE) * CAST(q0 AS DOUBLE) "
    "/ CAST(q AS DOUBLE)) AS BIGINT)) AS BIGINT) AS num_l, "
    "CAST(SUM(e0) AS BIGINT) AS den_l, "
    "CAST(SUM(e_s) AS BIGINT) AS num_p, "
    "CAST(SUM(CAST(ROUND(CAST(e0 AS DOUBLE) * CAST(q AS DOUBLE) "
    "/ CAST(q0 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS den_p "
    "FROM j GROUP BY 1) "
    "SELECT yr AS year, n_parts AS n_parts_matched, "
    "ROUND(CAST(num_l AS DOUBLE) / CAST(den_l AS DOUBLE), 6) "
    "AS laspeyres, "
    "ROUND(CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE), 6) "
    "AS paasche, "
    "ROUND(sqrt(CAST(num_l AS DOUBLE) / CAST(den_l AS DOUBLE) "
    "* (CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE))), 6) AS fisher "
    "FROM g WHERE den_l > 0 AND den_p > 0 ORDER BY year"
)


# --- Odds ratio / relative risk with Woolf logit CI --------------------------------------


def agg_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Odds ratio and relative risk of the 2×2 design** (Woolf 1955
    logit CI; Katz et al. 1978 for the RR interval): exposure =
    URGENT priority, outcome = order finished — OR = ad/bc with
    CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)), RR = [a/(a+b)] /
    [c/(c+d)] with its Katz interval. The EFFECT-DIRECTION view of the
    association the chi-square/G-test only score for existence — the
    epidemiology-standard table every incident review quotes.

    Determinism: the four cells are exact integers from one
    conditional aggregate; OR/RR and both intervals are fixed-shape
    doubles off the exact cells (one ln, one √, one exp each side —
    correctly-rounded IEEE singletons), `dround` 6. Zero cells filter
    (Woolf is undefined there; the fixture has none).

    Scale: one map-side-combinable aggregate over orders; scalar
    algebra after."""
    orders = read_table(spark, sf_dir, "orders")
    exp_ = F.col("o_orderpriority") == "1-URGENT"
    out = F.col("o_orderstatus") == "F"
    cells = orders.agg(
        F.sum(F.when(exp_ & out, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(exp_ & ~out, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~exp_ & out, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~exp_ & ~out, 1).otherwise(0)).cast("long").alias("d"),
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    or_ = a * d / (b * c)
    se_or = F.sqrt(
        F.lit(1.0) / a + F.lit(1.0) / b + F.lit(1.0) / c + F.lit(1.0) / d
    )
    rr = (a / (a + b)) / (c / (c + d))
    se_rr = F.sqrt(
        F.lit(1.0) / a
        - F.lit(1.0) / (a + b)
        + F.lit(1.0) / c
        - F.lit(1.0) / (c + d)
    )
    return cells.filter(
        (F.col("a") > 0)
        & (F.col("b") > 0)
        & (F.col("c") > 0)
        & (F.col("d") > 0)
    ).select(
        "a",
        "b",
        "c",
        "d",
        dround(or_, 6).alias("odds_ratio"),
        dround(F.exp(F.log(or_) - F.lit(1.96) * se_or), 6).alias(
            "or_ci_lo"
        ),
        dround(F.exp(F.log(or_) + F.lit(1.96) * se_or), 6).alias(
            "or_ci_hi"
        ),
        dround(rr, 6).alias("relative_risk"),
        dround(F.exp(F.log(rr) - F.lit(1.96) * se_rr), 6).alias(
            "rr_ci_lo"
        ),
        dround(F.exp(F.log(rr) + F.lit(1.96) * se_rr), 6).alias(
            "rr_ci_hi"
        ),
    )


QUERIES["agg_odds_ratio_woolf"] = agg_odds_ratio_woolf

ORACLE["agg_odds_ratio_woolf"] = (
    "WITH cells AS (SELECT "
    "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' "
    "AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a, "
    "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' "
    "AND NOT o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b, "
    "CAST(SUM(CASE WHEN NOT o_orderpriority = '1-URGENT' "
    "AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c, "
    "CAST(SUM(CASE WHEN NOT o_orderpriority = '1-URGENT' "
    "AND NOT o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS d "
    "FROM orders) "
    "SELECT a, b, c, d, "
    "ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
    "/ (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) AS odds_ratio, "
    "ROUND(exp(ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
    "/ (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) "
    "- 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE) "
    "+ 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))), 6) "
    "AS or_ci_lo, "
    "ROUND(exp(ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
    "/ (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) "
    "+ 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE) "
    "+ 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))), 6) "
    "AS or_ci_hi, "
    "ROUND((CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))) "
    "/ (CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))), 6) "
    "AS relative_risk, "
    "ROUND(exp(ln((CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) "
    "+ CAST(b AS DOUBLE))) / (CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) "
    "+ CAST(d AS DOUBLE)))) - 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) "
    "- 1.0 / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) "
    "+ 1.0 / CAST(c AS DOUBLE) "
    "- 1.0 / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)))), 6) AS rr_ci_lo, "
    "ROUND(exp(ln((CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) "
    "+ CAST(b AS DOUBLE))) / (CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) "
    "+ CAST(d AS DOUBLE)))) + 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) "
    "- 1.0 / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) "
    "+ 1.0 / CAST(c AS DOUBLE) "
    "- 1.0 / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)))), 6) AS rr_ci_hi "
    "FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0"
)


# --- Inverse-propensity-weighted treatment effect ----------------------------------------

# exact integer IPW weights: p(treat | priority digit s) = s/10 via
# md5 % 10 < s, so 1/p = 10/s scales by 6 to ints and 1/(1-p) =
# 10/(10-s) scales by 252 — the constant factors cancel in the Hajek
# ratios, leaving EXACT integer weighted sums in both engines
_IPW_W_T = {s: 60 // s for s in (1, 2, 3, 4, 5)}  # 6 * 10/s
_IPW_W_C = {s: 2520 // (10 - s) for s in (1, 2, 3, 4, 5)}  # 252 * 10/(10-s)


def agg_ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Inverse-propensity-weighted treatment effect** (Horvitz &
    Thompson 1952; the Hájek-normalized form; Rosenbaum & Rubin 1983
    for the propensity frame): a synthetic experiment whose assignment
    probability DEPENDS on priority (p = s/10 for priority digit s,
    assigned by portable md5 % 10 — deterministic, no RNG), so the
    naive treated-vs-control mean difference is confounded by
    priority; IPW reweights each (priority, arm) cell by 1/p or
    1/(1−p) and recovers an unconfounded estimate. The
    observational-causal member of the A/B family
    (`agg_srm_assignment_check` validates a real experiment's
    assignment; IPW is what you run when assignment wasn't uniform).

    Determinism: assignment is a pure hash function; per-cell Σy and n
    are exact 1e4-scaled int64 sums; the IPW weights clear to exact
    integers (60/s and 2520/(10−s)) whose constant factors cancel in
    the Hájek ratio, so BOTH weighted numerators/denominators are
    exact integer sums and every estimate is a fixed-shape double off
    exact ints, `dround` 4.

    Scale: one map-side-combinable (priority, arm) aggregate; all
    weighting on the 10-row cell frame."""
    orders = read_table(spark, sf_dir, "orders")
    s_dig = F.substring("o_orderpriority", 1, 1).cast("int")
    hmod = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ipw:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    from ..functions.numerics import _nearest_long_away

    cells = orders.select(
        s_dig.alias("s"),
        (hmod < s_dig).alias("treated"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    ).groupBy("s", "treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
    )
    wt = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _IPW_W_T.items() for x in kv]
        ),
        F.col("s"),
    )
    wc = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _IPW_W_C.items() for x in kv]
        ),
        F.col("s"),
    )
    weighted = cells.select(
        "treated",
        "n",
        "sv",
        F.when(F.col("treated"), wt).otherwise(wc).alias("w"),
    )

    def dd(col):
        return col.cast("decimal(38,0)")

    agg = weighted.groupBy("treated").agg(
        F.sum("n").cast("long").alias("n_arm"),
        F.sum("sv").cast("long").alias("sv_arm"),
        F.sum(dd(F.col("w")) * F.col("sv")).alias("wy"),
        F.sum(dd(F.col("w")) * F.col("n")).alias("wn"),
    )
    w_all = Window.partitionBy()
    naive = F.col("sv_arm").cast("double") / (
        F.col("n_arm").cast("double") * F.lit(10_000.0)
    )
    hajek = F.col("wy").cast("double") / (
        F.col("wn").cast("double") * F.lit(10_000.0)
    )
    t = agg.select(
        "treated",
        "n_arm",
        dround(naive, 4).alias("naive_mean"),
        dround(hajek, 4).alias("ipw_mean"),
        F.sum(F.when(F.col("treated"), hajek).otherwise(-hajek))
        .over(w_all)
        .alias("ate_raw"),
        F.sum(F.when(F.col("treated"), naive).otherwise(-naive))
        .over(w_all)
        .alias("naive_diff_raw"),
    )
    return t.select(
        "treated",
        "n_arm",
        "naive_mean",
        "ipw_mean",
        dround(F.col("naive_diff_raw"), 4).alias("naive_diff"),
        dround(F.col("ate_raw"), 4).alias("ipw_ate"),
    ).orderBy("treated")


QUERIES["agg_ipw_treatment_effect"] = agg_ipw_treatment_effect


def _ipw_oracle_sql() -> str:
    wt_case = " ".join(
        f"WHEN s = {s} THEN {w}" for s, w in _IPW_W_T.items()
    )
    wc_case = " ".join(
        f"WHEN s = {s} THEN {w}" for s, w in _IPW_W_C.items()
    )
    return (
        "WITH b AS (SELECT "
        "CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS s, "
        "CAST(('0x' || substr(md5('ipw:' "
        "|| CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10 "
        "< CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS treated, "
        "CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS v FROM orders), "
        "cells AS (SELECT s, treated, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(v) AS BIGINT) AS sv FROM b GROUP BY 1, 2), "
        "wgt AS (SELECT treated, n, sv, "
        f"CASE WHEN treated THEN (CASE {wt_case} END) "
        f"ELSE (CASE {wc_case} END) END AS w FROM cells), "
        "a AS (SELECT treated, CAST(SUM(n) AS BIGINT) AS n_arm, "
        "CAST(SUM(sv) AS BIGINT) AS sv_arm, "
        "SUM(CAST(w AS HUGEINT) * sv) AS wy, "
        "SUM(CAST(w AS HUGEINT) * n) AS wn FROM wgt GROUP BY 1), "
        "t AS (SELECT treated, n_arm, "
        "CAST(sv_arm AS DOUBLE) / (CAST(n_arm AS DOUBLE) * 10000.0) "
        "AS naive_raw, "
        "CAST(wy AS DOUBLE) / (CAST(wn AS DOUBLE) * 10000.0) "
        "AS hajek_raw FROM a), "
        "t2 AS (SELECT treated, n_arm, naive_raw, hajek_raw, "
        "SUM(CASE WHEN treated THEN hajek_raw ELSE -hajek_raw END) "
        "OVER () AS ate_raw, "
        "SUM(CASE WHEN treated THEN naive_raw ELSE -naive_raw END) "
        "OVER () AS naive_diff_raw FROM t) "
        "SELECT treated, n_arm, "
        "ROUND(naive_raw, 4) AS naive_mean, "
        "ROUND(hajek_raw, 4) AS ipw_mean, "
        "ROUND(naive_diff_raw, 4) AS naive_diff, "
        "ROUND(ate_raw, 4) AS ipw_ate "
        "FROM t2 ORDER BY treated"
    )


ORACLE["agg_ipw_treatment_effect"] = _ipw_oracle_sql()


# --- Wilson score interval for per-priority finish rates ----------------------------------


def agg_wilson_score_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Wilson score interval** (Wilson 1927) for each priority's
    finish rate — center (p̂ + z²/2n)/(1 + z²/n), half-width
    z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n) — the binomial interval that
    stays inside [0,1] and behaves at extreme rates, which the Wald
    interval `agg_two_proportion_ztest` implies does not (Brown, Cai
    & DasGupta 2001 is the standard indictment). The per-group CI
    table a dashboard should print under any rate.

    Determinism: n and successes are exact integers from one
    conditional aggregate; the interval is one fixed-shape double
    expression per group off the exact ints (z = 1.96 shared
    literal), `dround` 6.

    Scale: one map-side-combinable aggregate; 5-row algebra."""
    orders = read_table(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    n = F.col("n").cast("double")
    p = F.col("s").cast("double") / n
    # the same DECIMAL literal as the oracle text — IEEE(1.96)² rounds
    # to a (possibly) different last bit than parse("3.8416")
    z2 = F.lit(3.8416)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(1.96)
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return (
        g.filter(F.col("n") > 0)
        .select(
            "priority",
            F.col("n").alias("n_orders"),
            F.col("s").alias("n_finished"),
            dround(p, 6).alias("rate"),
            dround(center - half, 6).alias("wilson_lo"),
            dround(center + half, 6).alias("wilson_hi"),
        )
        .orderBy("priority")
    )


QUERIES["agg_wilson_score_ci"] = agg_wilson_score_ci

_WILSON_P = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
_WILSON_DEN = "(1.0 + 3.8416 / CAST(n AS DOUBLE))"
_WILSON_CTR = (
    f"(({_WILSON_P} + 3.8416 / (2.0 * CAST(n AS DOUBLE))) / {_WILSON_DEN})"
)
_WILSON_HALF = (
    f"(1.96 * sqrt({_WILSON_P} * (1.0 - {_WILSON_P}) / CAST(n AS DOUBLE) "
    "+ 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) "
    f"/ {_WILSON_DEN})"
)

ORACLE["agg_wilson_score_ci"] = (
    "WITH g AS (SELECT o_orderpriority AS priority, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) "
    "AS BIGINT) AS s FROM orders GROUP BY 1) "
    "SELECT priority, n AS n_orders, s AS n_finished, "
    f"ROUND({_WILSON_P}, 6) AS rate, "
    f"ROUND({_WILSON_CTR} - {_WILSON_HALF}, 6) AS wilson_lo, "
    f"ROUND({_WILSON_CTR} + {_WILSON_HALF}, 6) AS wilson_hi "
    "FROM g WHERE n > 0 ORDER BY priority"
)


# --- Declarative data-quality constraint violations --------------------------------------


def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Declarative cross-field constraint checking** (the
    Deequ/Great-Expectations shape: a RULE TABLE of named invariants,
    each scored in one pass): five business rules over the
    orders⋈lineitem join — ship-before-order, non-positive price,
    discount out of [0, 0.1], quantity out of [1, 50], tax out of
    [0, 0.08] — each emitting (checked, violations, rate). The
    CROSS-FIELD member of the DQ family: `dq_checks` profiles single
    columns, `dq_referential_integrity` keys, `dq_key_uniqueness`
    candidate keys; real pipelines gate loads on exactly this rule
    table.

    Determinism: every rule is an exact integer conditional count off
    ONE conditional aggregate (no per-rule scans); the unpivot is a
    literal ``stack``; rates are single divisions, `dround` 6.

    Scale: one co-partitioned fact-fact equi-join (orderkey), one
    map-side-combinable aggregate, a 5-row unpivot."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
        "l_quantity",
        "l_tax",
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(orders, "o_orderkey")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
        )
        .cast("long")
        .alias("v_ship"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("v_price"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_disc"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1.0) | (F.col("l_quantity") > 50.0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_qty"),
        F.sum(
            F.when((F.col("l_tax") < 0.0) | (F.col("l_tax") > 0.08), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("v_tax"),
    )
    un = agg.select(
        "n",
        F.expr(
            "stack(5, "
            "'ship_before_order', v_ship, "
            "'non_positive_price', v_price, "
            "'discount_out_of_range', v_disc, "
            "'quantity_out_of_range', v_qty, "
            "'tax_out_of_range', v_tax) AS (rule, n_violations)"
        ),
    )
    return un.select(
        "rule",
        F.col("n").alias("n_checked"),
        "n_violations",
        dround(
            F.col("n_violations").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("violation_rate"),
    ).orderBy("rule")


QUERIES["dq_constraint_violations"] = dq_constraint_violations

ORACLE["dq_constraint_violations"] = (
    "WITH j AS (SELECT l.*, o.o_orderdate FROM lineitem l "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey), "
    "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) "
    "AS BIGINT) AS v_ship, "
    "CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS v_price, "
    "CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS v_disc, "
    "CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS v_qty, "
    "CAST(SUM(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS v_tax FROM j), "
    "u AS (SELECT 'ship_before_order' AS rule, n, v_ship "
    "AS n_violations FROM a "
    "UNION ALL SELECT 'non_positive_price', n, v_price FROM a "
    "UNION ALL SELECT 'discount_out_of_range', n, v_disc FROM a "
    "UNION ALL SELECT 'quantity_out_of_range', n, v_qty FROM a "
    "UNION ALL SELECT 'tax_out_of_range', n, v_tax FROM a) "
    "SELECT rule, n AS n_checked, n_violations, "
    "ROUND(CAST(n_violations AS DOUBLE) / CAST(n AS DOUBLE), 6) "
    "AS violation_rate "
    "FROM u ORDER BY rule"
)


# --- Daily new vs returning active users --------------------------------------------------


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Daily new-vs-returning active users** — each day's DAU split
    by whether the user's FIRST-ever event falls on that day: the
    growth-accounting table every consumer dashboard opens with
    (acquisition vs retention composition), the daily-grain sibling of
    `events_dau_mau_stickiness` and the descriptive layer under
    `agg_mcnemar_yearly_activity`'s churn test.

    Determinism: the first-seen day is a per-user window MIN over the
    distinct (user, day) frame (no join back to the corpus — rule 5);
    all counts are exact integers; the share is one division,
    `dround` 6.

    Scale: one distinct aggregate, one user-keyed window over the
    user×day frame, one day rollup."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    ud = ev.distinct()
    w_u = Window.partitionBy("user_id")
    t = ud.select(
        "day",
        (F.col("day") == F.min("day").over(w_u)).alias("is_new"),
    )
    g = t.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
    )
    return g.select(
        "day",
        "dau",
        "new_users",
        (F.col("dau") - F.col("new_users")).alias("returning_users"),
        dround(
            F.col("new_users").cast("double") / F.col("dau").cast("double"),
            6,
        ).alias("pct_new"),
    ).orderBy("day")


QUERIES["events_new_vs_returning"] = events_new_vs_returning

ORACLE["events_new_vs_returning"] = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events), "
    "t AS (SELECT day, "
    "day = MIN(day) OVER (PARTITION BY user_id) AS is_new FROM ud), "
    "g AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau, "
    "CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) "
    "AS new_users FROM t GROUP BY 1) "
    "SELECT day, dau, new_users, dau - new_users AS returning_users, "
    "ROUND(CAST(new_users AS DOUBLE) / CAST(dau AS DOUBLE), 6) "
    "AS pct_new "
    "FROM g ORDER BY day"
)


# --- Theil / Atkinson inequality indices ---------------------------------------------------

_THEIL_SCALE = 100_000_000  # per-customer ln x terms (~23 -> 2.3e9/term)
_THEIL_XL_SCALE = 10_000  # per-customer x*ln x terms (~3e11 -> 3e15/term)


def agg_theil_atkinson_inequality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Theil T, Theil L (mean log deviation) and Atkinson(ε=1)**
    over customer lifetime revenue (Theil 1967; Atkinson 1970) — the
    DECOMPOSABLE inequality indices beside `agg_gini_customer_revenue`
    (Gini is the familiar number but does not decompose across
    subgroups; Theil does, which is why economists report both):
    T = (Σx·ln x)/S − ln(S/N), L = ln(S/N) − (Σln x)/N,
    Atkinson(1) = 1 − exp(−L) (one minus geometric/arithmetic mean).

    Determinism: customer revenue is an exact 1e4-scaled int64 sum;
    both log sums quantize per CUSTOMER to scaled int64 (the
    entropy-family device — scale invariance of T and L means the 1e4
    factor cancels algebraically, so the indices are computed directly
    on the scaled ints); the indices are fixed-shape doubles off exact
    sums, `dround` 6.

    Scale: one customer rollup (map-side combinable), one dim-sized
    aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    per_c = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        dsum_scaled("o_totalprice").alias("x")
    )
    x_d = F.col("x").cast("double")
    from ..functions.numerics import _nearest_long_away

    # both log sums quantize per row then accumulate in DECIMAL(38,0):
    # x*ln x reaches ~3e11 per customer, so an int64 SUM of 1e8-scaled
    # terms overflows — quantize at 1e4 and sum wide
    agg = per_c.filter(F.col("x") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
        F.sum(
            _nearest_long_away(
                x_d * F.log(x_d) * F.lit(float(_THEIL_XL_SCALE))
            ).cast("decimal(38,0)")
        ).alias("sxlx"),
        F.sum(
            _nearest_long_away(
                F.log(x_d) * F.lit(float(_THEIL_SCALE))
            ).cast("decimal(38,0)")
        ).alias("slx"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    mean_ln = F.log(s_d / n_d)
    theil_t = (
        F.col("sxlx").cast("double") / _THEIL_XL_SCALE / s_d - mean_ln
    )
    theil_l = mean_ln - F.col("slx").cast("double") / _THEIL_SCALE / n_d
    return agg.filter(F.col("n") > 0).select(
        F.col("n").alias("n_customers"),
        dround(theil_t, 6).alias("theil_t"),
        dround(theil_l, 6).alias("theil_l"),
        dround(F.lit(1.0) - F.exp(-theil_l), 6).alias("atkinson_1"),
    )


QUERIES["agg_theil_atkinson_inequality"] = agg_theil_atkinson_inequality

ORACLE["agg_theil_atkinson_inequality"] = (
    "WITH pc AS (SELECT o_custkey, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS x FROM orders GROUP BY 1), "
    "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "SUM(CAST(x AS HUGEINT)) AS s, "
    "SUM(CAST(CAST(ROUND(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)) "
    f"* {_THEIL_XL_SCALE}) AS BIGINT) AS HUGEINT)) AS sxlx, "
    "SUM(CAST(CAST(ROUND(ln(CAST(x AS DOUBLE)) "
    f"* {_THEIL_SCALE}) AS BIGINT) AS HUGEINT)) AS slx "
    "FROM pc WHERE x > 0) "
    "SELECT n AS n_customers, "
    f"ROUND(CAST(sxlx AS DOUBLE) / {_THEIL_XL_SCALE} / CAST(s AS DOUBLE) "
    "- ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS theil_t, "
    "ROUND(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    f"- CAST(slx AS DOUBLE) / {_THEIL_SCALE} / CAST(n AS DOUBLE), 6) "
    "AS theil_l, "
    "ROUND(1.0 - exp(-(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    f"- CAST(slx AS DOUBLE) / {_THEIL_SCALE} / CAST(n AS DOUBLE))), 6) "
    "AS atkinson_1 "
    "FROM a WHERE n > 0"
)


# --- Cross-sectional peer z-score per month -------------------------------------------------


def window_peer_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Peer-group z-score**: each priority's monthly revenue
    standardized against THAT MONTH's cross-priority distribution —
    the benchmarking view dashboards use to ask "which segment is
    unusually hot this month, net of the month itself" (the
    cross-sectional transpose of `dq_anomaly_zscore`'s within-series
    z; seasonality and macro shocks cancel because the peer mean
    absorbs them).

    Determinism: the monthly frame is exact 1e4-scaled int64; each
    month's n·Σx² − (Σx)² moment is exact DECIMAL(38,0) ≡ HUGEINT, so
    z = (n·x − Σx)/√(n·(n·Σx² − (Σx)²)) is one fixed-shape double per
    row off exact ints (the denominators clear by n — no per-month
    mean materializes), `dround` 6. Degenerate months (zero variance)
    drop on the exact integer.

    Scale: one corpus-sized monthly rollup; one window exchange by
    month over the k-per-month frame."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("x"))
    w_m = Window.partitionBy("mon")

    def dd(c):
        return c.cast("decimal(38,0)")

    t = m.select(
        "priority",
        "mon",
        "x",
        F.count(F.lit(1)).over(w_m).alias("n"),
        F.sum(dd(F.col("x"))).over(w_m).alias("s"),
        F.sum(dd(F.col("x")) * F.col("x")).over(w_m).alias("q"),
    )
    m2 = dd(F.col("n")) * F.col("q") - F.col("s") * F.col("s")
    dev = dd(F.col("n")) * F.col("x") - F.col("s")
    z = dev.cast("double") / F.sqrt(
        F.col("n").cast("double") * m2.cast("double")
    )
    return (
        t.filter(m2 > 0)
        .select(
            "priority",
            "mon",
            F.round(F.col("x") / 10_000.0, 4).alias("revenue"),
            dround(z, 6).alias("peer_z"),
        )
        .orderBy("priority", "mon")
    )


QUERIES["window_peer_zscore"] = window_peer_zscore

ORACLE["window_peer_zscore"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS x FROM orders GROUP BY 1, 2), "
    "t AS (SELECT priority, mon, x, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS n, "
    "SUM(CAST(x AS HUGEINT)) OVER w AS s, "
    "SUM(CAST(x AS HUGEINT) * x) OVER w AS q "
    "FROM m WINDOW w AS (PARTITION BY mon)) "
    "SELECT priority, mon, "
    "ROUND(CAST(x AS DOUBLE) / 10000.0, 4) AS revenue, "
    "ROUND(CAST(CAST(n AS HUGEINT) * x - s AS DOUBLE) "
    "/ sqrt(CAST(n AS DOUBLE) * CAST(CAST(n AS HUGEINT) * q - s * s "
    "AS DOUBLE)), 6) AS peer_z "
    "FROM t WHERE CAST(n AS HUGEINT) * q - s * s > 0 "
    "ORDER BY priority, mon"
)


# --- Sessions-per-user distribution off the shared sessionization ---------------------------


def events_sessions_per_user_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Sessions-per-user distribution**: how many users had exactly
    k sessions (30-minute gap sessionization) — the engagement-depth
    histogram that separates one-shot visitors from habitual users
    (the user-grain companion of `events_bounce_rate_daily`'s
    session-grain view; its shape is what DAU/MAU's single stickiness
    number compresses away).

    Determinism: sessions come from the shared exact NTZ-interval gap
    logic; all counts are exact integers; shares are single
    divisions, `dround` 6.

    Scale: one window exchange by user (the sessionize shape), one
    per-user count, one ~max-k-row histogram rollup."""
    from .custom_udf import _sessionize_events

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    s = _sessionize_events(ev)
    per_u = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    w_all = Window.partitionBy()
    g = per_u.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    t = g.select(
        F.col("k").alias("n_sessions"),
        "n_users",
        F.sum("n_users").over(w_all).alias("n_total"),
    )
    return t.select(
        "n_sessions",
        "n_users",
        dround(
            F.col("n_users").cast("double") / F.col("n_total").cast("double"),
            6,
        ).alias("share_of_users"),
    ).orderBy("n_sessions")


QUERIES["events_sessions_per_user_hist"] = events_sessions_per_user_hist

ORACLE["events_sessions_per_user_hist"] = (
    "WITH e AS (SELECT user_id, ts, "
    "CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    ">= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), "
    "s AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e), "
    "pu AS (SELECT user_id, CAST(COUNT(DISTINCT sid) AS BIGINT) AS k "
    "FROM s GROUP BY 1), "
    "g AS (SELECT k AS n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users "
    "FROM pu GROUP BY 1), "
    "t AS (SELECT n_sessions, n_users, SUM(n_users) OVER () AS n_total "
    "FROM g) "
    "SELECT n_sessions, n_users, "
    "ROUND(CAST(n_users AS DOUBLE) / CAST(n_total AS DOUBLE), 6) "
    "AS share_of_users "
    "FROM t ORDER BY n_sessions"
)


# --- Rolling growth stability ("Sharpe") ratio ----------------------------------------------

RSR_W = 6  # trailing window length (months)


def window_rolling_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Rolling growth-stability ratio** — trailing 6-month mean of
    the MoM revenue CHANGE divided by its trailing standard deviation
    (the Sharpe-ratio construction applied to a revenue stream; Sharpe
    1966): the "is growth steady or lumpy" panel beside
    `window_bollinger_bands` (which bands the LEVEL; this scores the
    DIFFERENCES — a segment can sit inside its bands while its growth
    whipsaws).

    Determinism: the MoM change is an exact int64 difference of
    1e4-scaled sums; the rolling second moment is exact per frame
    (w·Σd² − (Σd)², DECIMAL(38,0) ≡ HUGEINT over the SAME WindowSpec);
    the ratio is one fixed-shape double per row, `dround` 6, with the
    zero-variance frame filtered on the exact integer.

    Scale: one corpus-sized monthly rollup; ONE window exchange per
    priority serves the lag, both frame sums and the count."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    w_ord = Window.partitionBy("priority").orderBy("mon")
    d = m.select(
        "priority",
        "mon",
        (F.col("rev_s") - F.lag("rev_s").over(w_ord)).alias("diff_s"),
    ).filter(F.col("diff_s").isNotNull())
    w6 = (
        Window.partitionBy("priority")
        .orderBy("mon")
        .rowsBetween(-(RSR_W - 1), 0)
    )

    def dd(c):
        return c.cast("decimal(38,0)")

    framed = d.select(
        "priority",
        "mon",
        "diff_s",
        F.count(F.lit(1)).over(w6).alias("w"),
        F.sum(dd(F.col("diff_s"))).over(w6).alias("s1"),
        F.sum(dd(F.col("diff_s")) * F.col("diff_s")).over(w6).alias("s2"),
    )
    m2 = dd(F.col("w")) * F.col("s2") - F.col("s1") * F.col("s1")
    w_d = F.col("w").cast("double")
    mean_d = F.col("s1").cast("double") / w_d
    sd_d = F.sqrt(m2.cast("double")) / w_d
    return (
        framed.filter((m2 > 0) & (F.col("w") >= 2))
        .select(
            "priority",
            "mon",
            F.round(F.col("diff_s") / 10_000.0, 4).alias("mom_change"),
            dround(mean_d / 10_000.0, 4).alias("rolling_mean_change"),
            dround(sd_d / 10_000.0, 4).alias("rolling_sd_change"),
            dround(mean_d / sd_d, 6).alias("stability_ratio"),
        )
        .orderBy("priority", "mon")
    )


QUERIES["window_rolling_sharpe"] = window_rolling_sharpe

ORACLE["window_rolling_sharpe"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "d AS (SELECT priority, mon, "
    "rev_s - LAG(rev_s) OVER (PARTITION BY priority ORDER BY mon) "
    "AS diff_s FROM m), "
    "f AS (SELECT priority, mon, diff_s, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS w, "
    "SUM(CAST(diff_s AS HUGEINT)) OVER w AS s1, "
    "SUM(CAST(diff_s AS HUGEINT) * diff_s) OVER w AS s2 "
    "FROM d WHERE diff_s IS NOT NULL "
    "WINDOW w AS (PARTITION BY priority ORDER BY mon "
    f"ROWS BETWEEN {RSR_W - 1} PRECEDING AND CURRENT ROW)) "
    "SELECT priority, mon, "
    "ROUND(CAST(diff_s AS DOUBLE) / 10000.0, 4) AS mom_change, "
    "ROUND(CAST(s1 AS DOUBLE) / CAST(w AS DOUBLE) / 10000.0, 4) "
    "AS rolling_mean_change, "
    "ROUND(sqrt(CAST(CAST(w AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)) "
    "/ CAST(w AS DOUBLE) / 10000.0, 4) AS rolling_sd_change, "
    "ROUND((CAST(s1 AS DOUBLE) / CAST(w AS DOUBLE)) "
    "/ (sqrt(CAST(CAST(w AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)) "
    "/ CAST(w AS DOUBLE)), 6) AS stability_ratio "
    "FROM f WHERE CAST(w AS HUGEINT) * s2 - s1 * s1 > 0 AND w >= 2 "
    "ORDER BY priority, mon"
)


# --- Seasonal subseries table (month-of-year profile) ----------------------------------------


def timeseries_seasonal_subseries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Seasonal subseries table** (the numbers behind Cleveland's
    seasonal-subseries plot; FPP §2.4): for each priority × calendar
    month, the mean revenue across years, its deviation from the
    priority's overall monthly mean, and the min/max range across
    years — the tabulated answer to the reference dashboard's "is
    there a seasonal pattern?" panel that `timeseries_periodogram`
    scores spectrally and `timeseries_classical_decompose` extracts
    additively; this is the view an analyst actually reads.

    Determinism: all sums are exact 1e4-scaled int64; the subseries
    mean and the grand monthly mean are single divisions of exact
    ints; the deviation is a fixed-shape difference of those two
    quotients, `dround` 4.

    Scale: one corpus-sized monthly rollup; one 12·k-row rollup with
    a window for the grand mean."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(dsum_scaled("o_totalprice").alias("rev_s"))
    g = m.groupBy(
        "priority", F.month("mon").cast("int").alias("monum")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        F.sum("rev_s").cast("long").alias("s"),
        F.min("rev_s").cast("long").alias("mn"),
        F.max("rev_s").cast("long").alias("mx"),
    )
    w_p = Window.partitionBy("priority")
    t = g.select(
        "priority",
        "monum",
        "n_years",
        "s",
        "mn",
        "mx",
        F.sum("s").over(w_p).alias("s_all"),
        F.sum("n_years").over(w_p).alias("n_all"),
    )
    sub_mean = F.col("s").cast("double") / F.col("n_years").cast(
        "double"
    ) / F.lit(10_000.0)
    grand = F.col("s_all").cast("double") / F.col("n_all").cast(
        "double"
    ) / F.lit(10_000.0)
    return t.select(
        "priority",
        "monum",
        "n_years",
        dround(sub_mean, 4).alias("subseries_mean"),
        dround(sub_mean - grand, 4).alias("seasonal_deviation"),
        F.round(F.col("mn") / 10_000.0, 4).alias("min_revenue"),
        F.round(F.col("mx") / 10_000.0, 4).alias("max_revenue"),
    ).orderBy("priority", "monum")


QUERIES["timeseries_seasonal_subseries"] = timeseries_seasonal_subseries

ORACLE["timeseries_seasonal_subseries"] = (
    "WITH m AS (SELECT o_orderpriority AS priority, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, "
    "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS BIGINT) "
    "AS rev_s FROM orders GROUP BY 1, 2), "
    "g AS (SELECT priority, CAST(month(mon) AS INT) AS monum, "
    "CAST(COUNT(*) AS BIGINT) AS n_years, "
    "CAST(SUM(rev_s) AS BIGINT) AS s, "
    "CAST(MIN(rev_s) AS BIGINT) AS mn, "
    "CAST(MAX(rev_s) AS BIGINT) AS mx FROM m GROUP BY 1, 2), "
    "t AS (SELECT *, SUM(s) OVER (PARTITION BY priority) AS s_all, "
    "SUM(n_years) OVER (PARTITION BY priority) AS n_all FROM g) "
    "SELECT priority, monum, n_years, "
    "ROUND(CAST(s AS DOUBLE) / CAST(n_years AS DOUBLE) / 10000.0, 4) "
    "AS subseries_mean, "
    "ROUND(CAST(s AS DOUBLE) / CAST(n_years AS DOUBLE) / 10000.0 "
    "- CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE) / 10000.0, 4) "
    "AS seasonal_deviation, "
    "ROUND(CAST(mn AS DOUBLE) / 10000.0, 4) AS min_revenue, "
    "ROUND(CAST(mx AS DOUBLE) / 10000.0, 4) AS max_revenue "
    "FROM t ORDER BY priority, monum"
)


# --- Coefficient of variation per priority ----------------------------------------------------


def agg_coefficient_of_variation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Coefficient of variation** (CV = s/x̄, plus its inverse, the
    signal-to-noise ratio) of order value per priority — the
    SCALE-FREE dispersion table that makes groups with different means
    comparable (raw sds are not: a luxury segment's bigger sd may be
    proportionally smaller), the normalized companion of
    `agg_levene_brown_forsythe`'s dispersion test.

    Determinism: per-group Σv and Σv² accumulate over the 1e4-scaled
    integers (DECIMAL(38,0) ≡ HUGEINT squares); mean, sample sd, CV
    and SNR are fixed-shape doubles off exact sums, `dround`ed (4 dp
    money, 6 dp ratios).

    Scale: one map-side-combinable aggregate; 5-row algebra."""
    from ..functions.numerics import _nearest_long_away

    orders = read_table(spark, sf_dir, "orders")
    v = F.col("v").cast("decimal(18,0)")
    g = orders.select(
        F.col("o_orderpriority").alias("priority"),
        _nearest_long_away(F.col("o_totalprice") * 10000).alias("v"),
    ).groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("decimal(38,0)").alias("s"),
        F.sum(v * F.col("v")).alias("q"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n_d
    m2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q")
        - F.col("s") * F.col("s")
    )
    sd = F.sqrt(m2.cast("double") / (n_d * (n_d - F.lit(1.0))))
    return (
        g.filter((F.col("n") > 1) & (m2 > 0))
        .select(
            "priority",
            F.col("n").alias("n_orders"),
            dround(mean / 10_000.0, 4).alias("mean_price"),
            dround(sd / 10_000.0, 4).alias("sd_price"),
            dround(sd / mean, 6).alias("cv"),
            dround(mean / sd, 6).alias("snr"),
        )
        .orderBy("priority")
    )


QUERIES["agg_coefficient_of_variation"] = agg_coefficient_of_variation

ORACLE["agg_coefficient_of_variation"] = (
    "WITH g AS (SELECT o_orderpriority AS priority, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "SUM(CAST(CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS HUGEINT)) "
    "AS s, "
    "SUM(CAST(CAST(ROUND(o_totalprice * 10000) AS BIGINT) AS HUGEINT) "
    "* CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS q "
    "FROM orders GROUP BY 1) "
    "SELECT priority, n AS n_orders, "
    "ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 4) "
    "AS mean_price, "
    "ROUND(sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0, 4) "
    "AS sd_price, "
    "ROUND(sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) "
    "/ (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv, "
    "ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    "/ sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS snr "
    "FROM g WHERE n > 1 AND CAST(n AS HUGEINT) * q - s * s > 0 "
    "ORDER BY priority"
)


# --- Weekday vs weekend activity split --------------------------------------------------------


def events_weekday_weekend_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Weekday vs weekend split** of event activity and value per
    event type — the calendar-rhythm KPI beside
    `events_hourly_profile`'s diurnal view (consumer products are
    weekend-heavy, B2B tools weekday-heavy; the ratio is the segment
    fingerprint).

    Determinism: day-of-week comes from the NTZ WALL clock (pure
    calendar arithmetic, no session-timezone hop — rule 6a), stated as
    Sunday=0 in both engines (Spark ``dayofweek`` is 1-based
    Sunday=1 → shift by one; DuckDB ``dayofweek`` is already
    Sunday=0); counts and 1e4-scaled value sums are exact; shares and
    per-event means are fixed-shape divisions, `dround` 6/4.

    Scale: one map-side-combinable conditional aggregate per event
    type."""
    ev = read_table(spark, sf_dir, "events")
    wknd = (F.dayofweek("ts") - F.lit(1)).isin(0, 6)
    g = ev.groupBy(F.col("event_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(wknd, 1).otherwise(0)).cast("long").alias("n_wknd"),
        dsum_scaled(F.when(wknd, F.col("value")).otherwise(F.lit(0.0)))
        .alias("v_wknd"),
        dsum_scaled("value").alias("v_all"),
    )
    return g.select(
        "event_type",
        "n_events",
        F.col("n_wknd").alias("n_weekend"),
        (F.col("n_events") - F.col("n_wknd")).alias("n_weekday"),
        dround(
            F.col("n_wknd").cast("double")
            / F.col("n_events").cast("double"),
            6,
        ).alias("weekend_share"),
        dround(
            F.col("v_wknd").cast("double")
            / 10_000.0
            / F.col("n_wknd").cast("double"),
            4,
        ).alias("weekend_mean_value"),
        dround(
            (F.col("v_all") - F.col("v_wknd")).cast("double")
            / 10_000.0
            / (F.col("n_events") - F.col("n_wknd")).cast("double"),
            4,
        ).alias("weekday_mean_value"),
    ).filter(
        (F.col("n_weekend") > 0) & (F.col("n_weekday") > 0)
    ).orderBy("event_type")


QUERIES["events_weekday_weekend_split"] = events_weekday_weekend_split

ORACLE["events_weekday_weekend_split"] = (
    "WITH g AS (SELECT event_type, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_wknd, "
    "CAST(SUM(CAST(ROUND(CASE WHEN dayofweek(ts) IN (0, 6) "
    "THEN value ELSE 0.0 END * 10000) AS BIGINT)) AS BIGINT) AS v_wknd, "
    "CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) "
    "AS v_all FROM events GROUP BY 1) "
    "SELECT event_type, n_events, n_wknd AS n_weekend, "
    "n_events - n_wknd AS n_weekday, "
    "ROUND(CAST(n_wknd AS DOUBLE) / CAST(n_events AS DOUBLE), 6) "
    "AS weekend_share, "
    "ROUND(CAST(v_wknd AS DOUBLE) / 10000.0 / CAST(n_wknd AS DOUBLE), "
    "4) AS weekend_mean_value, "
    "ROUND(CAST(v_all - v_wknd AS DOUBLE) / 10000.0 "
    "/ CAST(n_events - n_wknd AS DOUBLE), 4) AS weekday_mean_value "
    "FROM g WHERE n_wknd > 0 AND n_events - n_wknd > 0 "
    "ORDER BY event_type"
)
