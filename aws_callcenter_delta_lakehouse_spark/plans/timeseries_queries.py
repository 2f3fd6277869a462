"""Time-series batch: gap filling + forward fill, and trailing
event-time rolling windows. Both oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_portable
from ..operators.timeseries import gap_fill_forward, rolling_time_window
from .registry import query


@query(
    "events_gap_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             floor(SUM(value) * 1e2 + 0.5) / 1e2 AS v
      FROM events WHERE user_id < 200 GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
               FROM daily GROUP BY 1),
    spine AS (SELECT user_id,
                     CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                          AS DATE) AS day
              FROM bounds),
    j AS (SELECT s.user_id, s.day, d.v
          FROM spine s LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           v IS NULL AS is_gap
    FROM j
    """,
)
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series densified over each user's own
    [first, last] day with forward fill — the feature-engineering
    densification pass. The daily sum is rounded BEFORE the fill so
    both engines carry identical doubles forward."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(round_portable(F.sum("value"), 2).alias("v"))
    return gap_fill_forward(daily, "user_id", "day", "v")


@query(
    "events_rolling_7day",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           COUNT(*) OVER w AS n_trailing,
           floor(SUM(value) OVER w * 1e2 + 0.5) / 1e2 AS sum_trailing
    FROM events
    WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-user count/sum keyed on EVENT time (RANGE on
    the epoch second — a calendar window, not a row window). One window
    shuffle on user_id."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    rolled = rolling_time_window(
        events, "user_id", "ts", "value", trailing_seconds=604800
    )
    return rolled.select(
        "user_id",
        "ts",
        "n_trailing",
        round_portable(F.col("sum_trailing"), 2).alias("sum_trailing"),
    )


@query(
    "events_twap_per_user",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    seq AS (
      SELECT user_id, cents, t_us,
             lead(t_us) OVER (PARTITION BY user_id
                              ORDER BY t_us, event_id) AS t_next
      FROM e),
    agg AS (
      SELECT user_id,
             SUM(cents * (t_next - t_us)) AS num,
             SUM(t_next - t_us) AS den,
             COUNT(*) AS n_holds
      FROM seq WHERE t_next IS NOT NULL
      GROUP BY user_id)
    SELECT user_id,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS twap_cents,
           CAST(n_holds AS BIGINT) AS n_holds
    FROM agg
    """,
)
def events_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    HOLDS until the user's next event (step-function semantics, the
    standard price/metric time-weighting), so the average weights each
    value by its holding duration instead of over-counting burst
    periods. Last event has no duration and drops out.

    Cross-engine exactness: weights are INTEGER microseconds
    (``unix_micros`` ↔ ``epoch_us``, trap #10), values integer cents
    (trap #13), so num/den are exact BIGINTs and the single final
    division is one correctly-rounded IEEE op on identical operands.

    Scale: ONE shuffle on user_id serves both the lead() window and the
    aggregate (Catalyst reuses the hash partitioning); state per row is
    a single lookahead — no per-user collect, no skew beyond the
    natural user fan-out."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = ev.withColumn("t_next", F.lead("t_us").over(w))
    agg = (
        seq.filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * (F.col("t_next") - F.col("t_us"))).alias("num"),
            F.sum(F.col("t_next") - F.col("t_us")).alias("den"),
            F.count("*").alias("n_holds"),
        )
    )
    return agg.select(
        "user_id",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "twap_cents"
        ),
        F.col("n_holds").cast("bigint").alias("n_holds"),
    )


@query(
    "events_ohlc_daily",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS t_us, event_id
      FROM events),
    seq AS (
      SELECT user_id, day, cents,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY t_us, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY t_us DESC, event_id DESC) AS rn_d
      FROM e)
    SELECT user_id, day,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM seq GROUP BY 1, 2
    """,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candle bars per user — the canonical time-series
    downsampling rollup (open/high/low/close + volume). Spark computes
    open/close with ``min_by``/``max_by`` over a (t_us, event_id)
    struct key, so the whole bar is ONE hash aggregate with map-side
    partial combine — no window, no sort, no second shuffle; the
    oracle states the same semantics with row_number windows (DuckDB's
    arg_min can't take a composite key). Values are integer cents
    (trap #13); the tie-break key is integer microseconds + event_id
    (traps #6/#10), so every column is exact cross-engine."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.struct(F.unix_micros("ts").alias("t"), "event_id").alias("__ord"),
    )
    return ev.groupBy("user_id", "day").agg(
        F.min_by("cents", "__ord").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "__ord").alias("close_cents"),
        F.sum("cents").cast("bigint").alias("volume_cents"),
        F.count("*").cast("bigint").alias("n_events"),
    )


@query(
    "events_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    seq AS (
      SELECT user_id,
             datediff('day', DATE '2024-01-01', day) AS dayn,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days),
    runs AS (
      SELECT user_id, dayn - rn AS grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM seq GROUP BY 1, 2)
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS active_days,
           MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern: distinct active days, then
    ``day_number − row_number`` is CONSTANT within a consecutive run
    (both advance by 1 per day) and jumps at every gap, so a plain
    group-by on that difference labels the islands with no self-join
    and no iteration. Day numbers and row numbers are integers, so
    every derived value is exact cross-engine.

    Scale: one shuffle on user_id drives the distinct, the numbering
    window, and both aggregates (same-key partitioning reused); state
    is O(1) per row."""
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    seq = days.select(
        "user_id",
        F.datediff("day", F.lit("2024-01-01")).alias("dayn"),
        F.row_number().over(w).alias("rn"),
    )
    runs = (
        seq.groupBy("user_id", (F.col("dayn") - F.col("rn")).alias("grp"))
        .agg(F.count("*").cast("bigint").alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("active_days"),
        F.max("len").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


@query(
    "events_rolling_distinct_users",
    oracle="""
    WITH active AS (
      SELECT DISTINCT event_type, user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn
      FROM events),
    spine AS (SELECT DISTINCT dayn FROM active),
    pairs AS (
      SELECT a.event_type, a.user_id, s.dayn AS wend
      FROM active a JOIN spine s ON s.dayn BETWEEN a.dayn AND a.dayn + 6)
    SELECT event_type, CAST(wend AS BIGINT) AS wend,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users_7d
    FROM pairs GROUP BY 1, 2
    """,
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT users per event type — the rolling
    metric Spark windows cannot express (no COUNT(DISTINCT) over a
    frame) and carrying per-day user SETS through a window would ship
    unbounded arrays. Instead each (type, user, active-day) row fans
    out to the ≤7 window-ends it contributes to (a bounded constant),
    then one distinct + count per (type, window-end): exact, integer-
    only, and every stage is a plain hash shuffle that scales with
    |active| × 7, never with set sizes. Window ends are the observed
    active days (same spine both engines)."""
    from ..operators.materialize import cut_once

    # cut once: active feeds the fan-out AND the day spine — uncut, the
    # spine branch's inner distinct collapses (RemoveRedundantAggregates)
    # into its own events scan + agg, so the events scan and the 3-col
    # distinct ran TWICE (no shared exchange between the branches)
    active = cut_once(
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("dayn"),
        )
        .distinct()
    )
    spine = active.select("dayn").distinct()
    contrib = active.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(F.col("dayn"), F.col("dayn") + F.lit(6))
        ).alias("wend"),
    ).join(spine.withColumnRenamed("dayn", "wend"), on="wend", how="left_semi")
    return (
        contrib.groupBy("event_type", F.col("wend").cast("bigint").alias("wend"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("distinct_users_7d"))
    )


@query(
    "events_stl_decompose",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    tr AS (
      SELECT dayn, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS sum7,
             COUNT(*) OVER w AS n7
      FROM daily
      WINDOW w AS (ORDER BY dayn RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT dayn, cents, sum7,
             7 * cents - sum7 AS det7, dayn % 7 AS dow
      FROM tr WHERE n7 = 7),
    seas AS (
      SELECT dow, CAST(SUM(det7) AS BIGINT) AS s_sum,
             CAST(COUNT(*) AS BIGINT) AS s_n
      FROM det GROUP BY dow)
    SELECT d.dayn, d.cents,
           CAST(d.sum7 AS DOUBLE) / 7.0 AS trend_cents,
           CAST(s.s_sum AS DOUBLE) / (7.0 * CAST(s.s_n AS DOUBLE))
             AS seasonal_cents,
           CAST(d.cents AS DOUBLE) - CAST(d.sum7 AS DOUBLE) / 7.0
             - CAST(s.s_sum AS DOUBLE) / (7.0 * CAST(s.s_n AS DOUBLE))
             AS residual_cents
    FROM det d JOIN seas s USING (dow)
    """,
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the site-wide daily revenue
    series: trend = centered 7-day moving average (full windows only),
    weekly seasonal = day-of-week mean of the detrended series,
    residual = remainder.

    EXACT cross-engine despite the divisions: the detrended value
    ``cents − sum7/7`` is a rational with denominator 7, so it is
    carried as the INTEGER ``7·cents − sum7`` — sums and counts stay
    integers until the final single divisions, which are then
    correctly-rounded IEEE ops on identical operands (the trap #13
    integer-moments discipline extended to a two-stage pipeline).

    Scale note: the only unpartitioned window runs on the DAILY table —
    input is |distinct days| (hundreds), produced by a map-side-combined
    aggregate of the events; nothing event-sized crosses a single
    partition."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("dayn")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).cast("bigint").alias("cents")
        )
    )
    w = Window.orderBy("dayn").rangeBetween(-3, 3)
    tr = daily.select(
        "dayn",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("sum7"),
        F.count("*").over(w).alias("n7"),
    )
    det = tr.filter(F.col("n7") == 7).select(
        "dayn",
        "cents",
        "sum7",
        (F.lit(7) * F.col("cents") - F.col("sum7")).alias("det7"),
        F.pmod(F.col("dayn"), F.lit(7)).alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        F.sum("det7").cast("bigint").alias("s_sum"),
        F.count("*").cast("bigint").alias("s_n"),
    )
    trend = F.col("sum7").cast("double") / F.lit(7.0)
    seasonal = F.col("s_sum").cast("double") / (
        F.lit(7.0) * F.col("s_n").cast("double")
    )
    return det.join(F.broadcast(seas), on="dow").select(
        "dayn",
        "cents",
        trend.alias("trend_cents"),
        seasonal.alias("seasonal_cents"),
        (F.col("cents").cast("double") - trend - seasonal).alias(
            "residual_cents"
        ),
    )


@query(
    "events_funnel_timebound",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events),
    v AS (SELECT user_id, MIN(t) AS tv FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.t) AS tc
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click'
            AND e.t > v.tv AND e.t <= v.tv + 3600000000
          GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.t) AS tp
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase'
            AND e.t > c.tc AND e.t <= c.tc + 3600000000
          GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1h,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_1h,
           CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_click,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_purchase
    """,
)
def events_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound 3-step funnel: first view -> first click within 1h of
    it -> first purchase within 1h of that click, counted per user.
    Each stage anchor is a scalar MIN over integer microseconds, so no
    row-identity tie-break is ever needed (events tying at the anchor
    give the same anchor) — three aggregate+join rounds on user_id,
    exact cross-engine, and the final one-row summary is itself a
    DataFrame aggregate (no driver-side counts)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    hour = 3600 * 1000 * 1000
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("tv"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, on="user_id")
        .filter((F.col("t") > F.col("tv")) & (F.col("t") <= F.col("tv") + hour))
        .groupBy("user_id")
        .agg(F.min("t").alias("tc"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .filter((F.col("t") > F.col("tc")) & (F.col("t") <= F.col("tc") + hour))
        .groupBy("user_id")
        .agg(F.min("t").alias("tp"))
    )
    tagged = (
        v.select(F.lit(0).alias("stage"))
        .unionByName(c.select(F.lit(1).alias("stage")))
        .unionByName(p.select(F.lit(2).alias("stage")))
    )
    counts = tagged.agg(
        F.sum((F.col("stage") == 0).cast("bigint")).alias("n_view"),
        F.sum((F.col("stage") == 1).cast("bigint")).alias("n_click_1h"),
        F.sum((F.col("stage") == 2).cast("bigint")).alias("n_purchase_1h"),
    )
    return counts.select(
        "n_view",
        "n_click_1h",
        "n_purchase_1h",
        (
            F.col("n_click_1h").cast("double") / F.col("n_view").cast("double")
        ).alias("view_to_click"),
        (
            F.col("n_purchase_1h").cast("double")
            / F.col("n_view").cast("double")
        ).alias("view_to_purchase"),
    )


@query(
    "orders_ltv_cohorts",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             year(CAST(o_orderdate AS TIMESTAMP)) * 12
               + month(CAST(o_orderdate AS TIMESTAMP)) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders),
    first AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1)
    SELECT CAST(f.m0 AS BIGINT) AS cohort_month,
           CAST(o.m - f.m0 AS BIGINT) AS months_since,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
           CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
    FROM o JOIN first f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def orders_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue LTV cohort matrix: customers cohorted by their FIRST
    order month, revenue and active-customer counts laid out by months
    since acquisition — the standard lifetime-value triangle. Months
    are linearized integers (year*12+month) so cohort distance is
    plain subtraction; revenue is integer cents. Two shuffles on
    o_custkey (first-order aggregate reuses the join partitioning) +
    the final cohort-cell aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        o.join(first, on="o_custkey")
        .groupBy(
            F.col("m0").cast("bigint").alias("cohort_month"),
            (F.col("m") - F.col("m0")).cast("bigint").alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias(
                "active_customers"
            ),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "orders_repurchase_intervals",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             datediff('day', DATE '1992-01-01',
                      CAST(o_orderdate AS TIMESTAMP)) AS dayn
      FROM orders),
    seq AS (
      SELECT o_custkey, dayn,
             lead(dayn) OVER (PARTITION BY o_custkey
                              ORDER BY dayn, o_orderkey) AS next_dayn
      FROM o)
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(next_dayn - dayn) AS BIGINT) AS total_gap_days,
           CAST(SUM(next_dayn - dayn) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_gap_days,
           CAST(MAX(next_dayn - dayn) AS BIGINT) AS max_gap_days
    FROM seq WHERE next_dayn IS NOT NULL
    GROUP BY o_custkey
    """,
)
def orders_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per customer: gaps between consecutive
    orders in integer days (lead over the per-customer order sequence,
    orderkey tie-break for same-day orders), aggregated to
    count/total/mean/max. Integer day numbers keep every value exact;
    the mean is one division of exact integers. One customer-key
    shuffle shared by the window and the aggregate."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("dayn"),
    )
    w = Window.partitionBy("o_custkey").orderBy("dayn", "o_orderkey")
    seq = o.withColumn("next_dayn", F.lead("dayn").over(w))
    gap = F.col("next_dayn") - F.col("dayn")
    return (
        seq.filter(F.col("next_dayn").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(gap).cast("bigint").alias("total_gap_days"),
            (
                F.sum(gap).cast("double") / F.count("*").cast("double")
            ).alias("avg_gap_days"),
            F.max(gap).cast("bigint").alias("max_gap_days"),
        )
    )


@query(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS regionkey, n.n_nationkey AS nationkey,
             n.n_name AS nation,
             CAST(SUM(CAST(floor(CAST(l.l_extendedprice AS DOUBLE) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT regionkey, nation, cents AS revenue_cents,
           CAST(cents AS DOUBLE)
             / CAST(SUM(cents) OVER (PARTITION BY regionkey) AS DOUBLE)
             AS region_share
    FROM rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's supplier revenue: integer-
    cent aggregate per nation (broadcast dimension joins), then a
    region-partitioned window sum for the denominator — the
    share-of-parent rollup pattern. The share is one division of two
    exact integers. Window input is 25 nation rows; the event-sized
    data only ever passes through the hash aggregate."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice").cast("double") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey").alias("regionkey"),
        F.col("n_name").alias("nation"),
    )
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("regionkey", "n_nationkey", "nation")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )
    w = Window.partitionBy("regionkey")
    return rev.select(
        "regionkey",
        "nation",
        "revenue_cents",
        (
            F.col("revenue_cents").cast("double")
            / F.sum("revenue_cents").over(w).cast("double")
        ).alias("region_share"),
    )


def _holt_oracle(n: int = 21) -> str:
    """Unrolled Holt recurrence: one chained CTE per step (trap 12 —
    DuckDB list_reduce miscomputes struct accumulators, so multi-field
    folds unroll; single-reference chains need no MATERIALIZED)."""
    steps = []
    pl, pb = "l2", "b2"
    for k in range(3, n + 1):
        lnew = f"0.25 * xs[{k}] + 0.75 * ({pl} + {pb})"
        steps.append(
            f"s{k} AS (SELECT *, {lnew} AS l{k}, "
            f"0.125 * (({lnew}) - {pl}) + 0.875 * {pb} AS b{k} "
            f"FROM s{k - 1})"
        )
        pl, pb = f"l{k}", f"b{k}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY d DESC) AS rk
      FROM daily),
    series AS (
      SELECT event_type, list(n ORDER BY d) AS xs
      FROM ranked WHERE rk <= {n} GROUP BY 1 HAVING COUNT(*) = {n}),
    s2 AS (SELECT event_type, xs, xs[2] AS l2, xs[2] - xs[1] AS b2
           FROM series),
    {chain}
    SELECT event_type,
           floor({pl} * 1e6 + 0.5) / 1e6 AS level,
           floor({pb} * 1e6 + 0.5) / 1e6 AS trend,
           floor(({pl} + 1.0 * {pb}) * 1e6 + 0.5) / 1e6 AS f_1,
           floor(({pl} + 7.0 * {pb}) * 1e6 + 0.5) / 1e6 AS f_7
    FROM s{n}
    """


@query("forecast_holt_linear", oracle=_holt_oracle())
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) of the
    daily event count per event type over each type's last 21 observed
    days, with 1-day and 7-day-ahead forecasts
    (operators/timeseries.py ``holt_linear``). alpha = 0.25 and
    beta = 0.125 are exact binary fractions, and the fixed step count
    makes the recurrence unrollable: the oracle replays the identical
    floating-point op sequence one CTE per step, so the diff is exact
    to the 1e-6 portable rounding. Scale: one shuffle to the per-group
    ordered series (21 elements per group), then a JVM-side aggregate
    HOF fold — no Python, no driver loop."""
    from ..operators.timeseries import holt_linear

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    out = holt_linear(
        daily, "event_type", "d", "n",
        alpha=0.25, beta=0.125, horizons=(1, 7), n_steps=21,
    )
    return out.select(
        "event_type",
        round_portable(F.col("level"), 6).alias("level"),
        round_portable(F.col("trend"), 6).alias("trend"),
        round_portable(F.col("f_1"), 6).alias("f_1"),
        round_portable(F.col("f_7"), 6).alias("f_7"),
    )


@query(
    "regression_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    pts AS (
      SELECT event_type,
             CAST(d - MIN(d) OVER (PARTITION BY event_type) AS DOUBLE) AS x,
             y
      FROM daily),
    slopes AS (
      SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS v
      FROM pts a JOIN pts b
        ON a.event_type = b.event_type AND b.x > a.x),
    sr AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes),
    slope AS (
      SELECT event_type,
             SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                       OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                      THEN v END)
             / SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                         OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                        THEN 1 END) AS slope
      FROM sr GROUP BY 1),
    resid AS (
      SELECT p.event_type, p.y - sl.slope * p.x AS v
      FROM pts p JOIN slope sl ON p.event_type = sl.event_type),
    rr AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM resid),
    inter AS (
      SELECT event_type,
             SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                       OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                      THEN v END)
             / SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                         OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                        THEN 1 END) AS intercept
      FROM rr GROUP BY 1),
    np AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM daily GROUP BY 1)
    SELECT np.event_type, np.n_points,
           floor(slope.slope * 1e6 + 0.5) / 1e6 AS slope,
           floor(inter.intercept * 1e6 + 0.5) / 1e6 AS intercept
    FROM np
    JOIN slope ON np.event_type = slope.event_type
    JOIN inter ON np.event_type = inter.event_type
    """,
)
def regression_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily event count per type
    (operators/timeseries.py ``theil_sen``): slope = exact median of
    all C(days, 2) pairwise slopes, intercept = exact median of the
    residuals — the outlier-resistant alternative to the OLS battery
    (``regression_ols_battery``). Pair building is a within-group
    equi-join (hash, never cartesian; pinned in test_scale_plans);
    medians are k-th selection, so the SQL oracle replays them
    verbatim — element-exact for odd counts, (a + b)/2 with identical
    op order for even."""
    from pyspark.sql import Window

    from ..operators.timeseries import theil_sen

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    pts = daily.select(
        "event_type",
        F.datediff(
            "d", F.min("d").over(Window.partitionBy("event_type"))
        ).cast("double").alias("x"),
        "y",
    )
    out = theil_sen(pts, "event_type", "x", "y")
    return out.select(
        "event_type",
        "n_points",
        round_portable(F.col("slope"), 6).alias("slope"),
        round_portable(F.col("intercept"), 6).alias("intercept"),
    )


@query(
    "events_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    pre AS (
      SELECT event_type, d,
             SUM(y) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS k,
             SUM(y) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily),
    m AS (
      SELECT event_type, d, n,
             cum / k AS m1, (tot - cum) / (n - k) AS m2, k
      FROM pre WHERE k < n),
    scored AS (
      SELECT event_type, d, n, m1, m2,
             CAST(k AS DOUBLE) * (n - k) / n * (m1 - m2) * (m1 - m2)
               AS score
      FROM m),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY score DESC, d) AS rn
      FROM scored)
    SELECT event_type, CAST(n AS BIGINT) AS n, d AS split_at,
           floor(m1 * 1e6 + 0.5) / 1e6 AS mean_left,
           floor(m2 * 1e6 + 0.5) / 1e6 AS mean_right,
           floor(score * 1e6 + 0.5) / 1e6 AS score
    FROM best WHERE rn = 1
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point per event type over the daily count series
    (operators/timeseries.py ``single_changepoint`` — the one-split
    step of binary segmentation): maximize the between-segment SSE
    reduction ``k(n-k)/n * (m_left - m_right)^2`` over all splits,
    computed from ONE windowed prefix-sum pass — no per-split rescan.
    Integer-valued doubles keep the cumulative sums exact; the argmax
    tie-breaks on the earlier date (trap 6)."""
    from ..operators.timeseries import single_changepoint

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    out = single_changepoint(daily, "event_type", "d", "y")
    return out.select(
        "event_type",
        "n",
        F.col("split_at"),
        round_portable(F.col("mean_left"), 6).alias("mean_left"),
        round_portable(F.col("mean_right"), 6).alias("mean_right"),
        round_portable(F.col("score"), 6).alias("score"),
    )


def _hw_oracle(m: int = 7, n: int = 28) -> str:
    """Unrolled additive Holt-Winters: SELECT *-carrying CTE per step
    with UNIQUE column names per assignment (lateral-alias shadowing
    rules differ across engines; fresh names sidestep them). The
    generator tracks each seasonal slot's latest column name."""
    sum1 = " + ".join(f"xs[{i}]" for i in range(1, m + 1))
    sum2 = " + ".join(f"xs[{i}]" for i in range(m + 1, 2 * m + 1))
    init_cols = [
        f"({sum1}) / {float(m)!r} AS l0",
        f"(({sum2}) / {float(m)!r} - ({sum1}) / {float(m)!r})"
        f" / {float(m)!r} AS b0",
    ] + [
        f"xs[{j}] - (({sum1}) / {float(m)!r}) AS s{j}_0"
        for j in range(1, m + 1)
    ]
    cur = {"l": "l0", "b": "b0"}
    for j in range(1, m + 1):
        cur[j] = f"s{j}_0"
    steps = []
    for i in range(m + 1, n + 1):
        slot = (i - 1) % m + 1
        lex = (
            f"0.25 * (xs[{i}] - {cur[slot]}) + 0.75 * "
            f"({cur['l']} + {cur['b']})"
        )
        cols = [
            f"{lex} AS l{i}",
            f"0.125 * (({lex}) - {cur['l']}) + 0.875 * {cur['b']} AS b{i}",
            f"0.25 * (xs[{i}] - ({lex})) + 0.75 * {cur[slot]}"
            f" AS s{slot}_{i}",
        ]
        steps.append(
            f"h{i} AS (SELECT *, {', '.join(cols)} FROM h{i - 1})"
        )
        cur["l"], cur["b"], cur[slot] = f"l{i}", f"b{i}", f"s{slot}_{i}"
    chain = ",\n    ".join(steps)
    f1_slot = (n + 1 - 1) % m + 1
    f7_slot = (n + 7 - 1) % m + 1
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY d DESC) AS rk
      FROM daily),
    series AS (
      SELECT event_type, list(y ORDER BY d) AS xs
      FROM ranked WHERE rk <= {n} GROUP BY 1 HAVING COUNT(*) = {n}),
    h{m} AS (SELECT event_type, xs, {', '.join(init_cols)} FROM series),
    {chain}
    SELECT event_type,
           floor({cur['l']} * 1e6 + 0.5) / 1e6 AS level,
           floor({cur['b']} * 1e6 + 0.5) / 1e6 AS trend,
           floor(({cur['l']} + 1.0 * {cur['b']} + {cur[f1_slot]})
                 * 1e6 + 0.5) / 1e6 AS f_1,
           floor(({cur['l']} + 7.0 * {cur['b']} + {cur[f7_slot]})
                 * 1e6 + 0.5) / 1e6 AS f_7
    FROM h{n}
    """


@query("forecast_holt_winters", oracle=_hw_oracle())
def forecast_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality) of
    the daily event count per type over each type's last 28 days, with
    1-day and 7-day-ahead seasonal forecasts
    (operators/timeseries.py ``holt_winters_additive``). alpha = 0.25,
    beta = 0.125, gamma = 0.25 — exact binary fractions; the oracle
    unrolls the triple recurrence one CTE per step with fresh column
    names per assignment, replaying the identical float op sequence
    (init sums as left-to-right literal chains). Completes the
    forecasting ladder: seasonal-naive baseline -> Holt linear ->
    Holt-Winters seasonal."""
    from ..operators.timeseries import holt_winters_additive

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    out = holt_winters_additive(
        daily, "event_type", "d", "y",
        period=7, alpha=0.25, beta=0.125, gamma=0.25,
        n_steps=28, horizons=(1, 7),
    )
    return out.select(
        "event_type",
        round_portable(F.col("level"), 6).alias("level"),
        round_portable(F.col("trend"), 6).alias("trend"),
        round_portable(F.col("f_1"), 6).alias("f_1"),
        round_portable(F.col("f_7"), 6).alias("f_7"),
    )


@query(
    "events_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
      GROUP BY 1),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, y, COUNT(*) AS t
            FROM daily GROUP BY 1, 2)
      GROUP BY 1),
    j AS (
      SELECT nn.event_type, nn.n, s.s,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                  AS DOUBLE) / 18.0 AS var_s
      FROM nn JOIN s ON nn.event_type = s.event_type
      JOIN ties ON nn.event_type = ties.event_type)
    SELECT event_type, n, s,
           floor(var_s * 1e6 + 0.5) / 1e6 AS var_s,
           floor((CASE WHEN s > 0
                       THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                       WHEN s < 0
                       THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                       ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS z
    FROM j
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test of the daily event count per
    type (operators/timeseries.py ``mann_kendall``) — the significance
    companion to ``regression_theil_sen``: exact integer S over all
    ordered day pairs, tie-corrected variance, continuity-corrected
    normal score. S and the variance terms never touch floats until
    one division and one sqrt, both replayed identically by the
    oracle."""
    from ..operators.timeseries import mann_kendall

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    out = mann_kendall(daily, "event_type", "d", "y")
    return out.select(
        "event_type",
        "n",
        "s",
        round_portable(F.col("var_s"), 6).alias("var_s"),
        round_portable(F.col("z"), 6).alias("z"),
    )


@query(
    "events_spearman_matrix",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, d,
             CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY event_type, y) - 1
                  AS BIGINT) AS r2
      FROM daily),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.r2) AS BIGINT) AS sx,
             CAST(SUM(b.r2) AS BIGINT) AS sy,
             CAST(SUM(a.r2 * b.r2) AS BIGINT) AS sxy,
             CAST(SUM(a.r2 * a.r2) AS BIGINT) AS sxx,
             CAST(SUM(b.r2 * b.r2) AS BIGINT) AS syy
      FROM ranked a JOIN ranked b
        ON a.d = b.d AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS rho
    FROM pairs
    """,
)
def events_spearman_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank-correlation matrix between the event types' daily
    count series — do types co-move? Ranks use the tie-averaged
    convention carried as DOUBLED integers (2*rank + tie_count - 1),
    so every aggregate (Sx, Sxy, Sxx, ...) is an exact BIGINT and the
    Pearson-on-ranks formula touches floats only in the final
    one-division-two-sqrt step, replayed identically by the oracle
    (the 2x scaling cancels in the ratio). Shape: one window per type,
    one date-keyed equi-join producing C(types, 2) pair groups — days
    bound the join, never raw rows."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    ranked = daily.select(
        "event_type",
        "d",
        (
            2 * F.rank().over(
                Window.partitionBy("event_type").orderBy("y")
            )
            + F.count("*").over(
                Window.partitionBy("event_type", "y")
            )
            - 1
        ).cast("bigint").alias("r2"),
    )
    a = ranked.select(
        F.col("event_type").alias("type_a"), "d", F.col("r2").alias("ra")
    )
    b = ranked.select(
        F.col("event_type").alias("type_b"), "d", F.col("r2").alias("rb")
    )
    pairs = (
        a.join(b, on="d")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ra").cast("bigint").alias("sx"),
            F.sum("rb").cast("bigint").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).cast("bigint").alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).cast("bigint").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    rho = (n * F.col("sxy") - sx * sy).cast("double") / (
        F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
        * F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    )
    return pairs.select(
        "type_a", "type_b", "n", round_portable(rho, 6).alias("rho")
    )


@query(
    "orders_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER (PARTITION BY seg) AS n
      FROM rev),
    agg AS (
      SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(i * cents) AS BIGINT) AS swx,
             CAST(SUM(cents) AS BIGINT) AS sx
      FROM ranked GROUP BY 1)
    SELECT seg, n,
           floor((CAST(2 * swx AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS gini
    FROM agg
    """,
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration per market
    segment — the Lorenz-curve inequality index via the rank formula
    G = 2*sum(i * x_(i)) / (n * sum(x)) - (n + 1)/n over
    ascending-sorted revenues. Revenues are integer cents (trap 13)
    and ranks integer, so both sums are exact BIGINTs (i*cents peaks
    ~3e12 at sf0.1 — comfortably inside the 9.2e18 BIGINT range up to
    ~1e6x this scale; beyond that, pre-scale to dollars) and the only
    float work is the final mirrored expression. Ties on revenue
    tie-break by customer key (trap 6). One join + one window + one
    aggregate, all segment-keyed."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    rev = (
        orders.join(cust, on="o_custkey")
        .groupBy("seg", "o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "seg",
        "cents",
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    agg = ranked.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("swx"),
        F.sum("cents").cast("bigint").alias("sx"),
    )
    n = F.col("n").cast("double")
    gini = (2 * F.col("swx")).cast("double") / (
        n * F.col("sx").cast("double")
    ) - (n + 1.0) / n
    return agg.select(
        "seg", "n", round_portable(gini, 6).alias("gini")
    )


@query(
    "timeseries_classical_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    q AS (
      SELECT event_type, d, y,
             CAST((d - DATE '1970-01-01') % 7 AS INTEGER) AS phase,
             y * 1000000 AS yq
      FROM daily),
    w AS (
      SELECT *,
        SUM(yq) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
        COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tcnt
      FROM q),
    dd AS (
      SELECT *, CASE WHEN tcnt = 7 THEN yq * 7 - tsum END AS det
      FROM w),
    seas AS (
      SELECT event_type, phase, SUM(det) AS snum, COUNT(*) AS sden
      FROM dd WHERE det IS NOT NULL GROUP BY 1, 2)
    SELECT dd.event_type, dd.d, dd.y, dd.phase,
      CASE WHEN dd.tcnt = 7
           THEN floor((CAST(dd.tsum AS DOUBLE) / 7 / 1000000) * 1e6 + 0.5)
                / 1e6 END AS trend,
      CASE WHEN dd.det IS NOT NULL
           THEN floor((CAST(seas.snum AS DOUBLE) / seas.sden / 7 / 1000000)
                      * 1e6 + 0.5) / 1e6 END AS seasonal,
      CASE WHEN dd.det IS NOT NULL
           THEN floor((CAST(dd.det AS DOUBLE) / 7 / 1000000
                       - CAST(seas.snum AS DOUBLE) / seas.sden / 7 / 1000000)
                      * 1e6 + 0.5) / 1e6 END AS remainder
    FROM dd LEFT JOIN seas
      ON dd.event_type = seas.event_type AND dd.phase = seas.phase
    """,
)
def timeseries_classical_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive decomposition of the daily event count per
    type (operators/timeseries.py ``classical_decompose``): centered
    7-point moving-average trend, day-of-week seasonal means of the
    detrended series, remainder — the Persons-method precursor of STL,
    the standard first look at any daily operational metric. Phase is
    the epoch-day mod 7 (engine-neutral; dayofweek() origins differ
    across engines). Exactness: integer micro-unit quantization makes
    the window sum and phase means association-free — every double is
    one fixed final division chain, replayed verbatim by the oracle.
    One window pass + one phase aggregate + a broadcast join back."""
    from ..operators.timeseries import classical_decompose

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
        .withColumn(
            "ph",
            F.pmod(
                F.datediff("d", F.to_date(F.lit("1970-01-01"))), F.lit(7)
            ).cast("int"),
        )
    )
    out = classical_decompose(
        daily, "event_type", "d", "y", period=7, phase_col="ph"
    )
    return out.select(
        "event_type",
        "d",
        F.col("y").cast("bigint").alias("y"),
        "phase",
        round_portable(F.col("trend"), 6).alias("trend"),
        round_portable(F.col("seasonal"), 6).alias("seasonal"),
        round_portable(F.col("remainder"), 6).alias("remainder"),
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    mr AS (
      SELECT event_type, y, d,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily),
    med AS (
      SELECT event_type,
             SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                       OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                      THEN y END)
             / SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                         OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                        THEN 1 END) AS med
      FROM mr GROUP BY 1),
    dev AS (
      SELECT daily.event_type, d, y, med, abs(y - med) AS dv
      FROM daily JOIN med ON daily.event_type = med.event_type),
    dr AS (
      SELECT event_type, dv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev),
    mad AS (
      SELECT event_type,
             SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                       OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                      THEN dv END)
             / SUM(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                         OR rk = CAST(floor(n / 2 + 1) AS BIGINT)
                        THEN 1 END) AS mad
      FROM dr GROUP BY 1),
    scored AS (
      SELECT dev.event_type, d, y, dev.med, mad.mad,
             CASE WHEN mad.mad > 0
                  THEN 0.6745 * (y - dev.med) / mad.mad END AS z
      FROM dev JOIN mad ON dev.event_type = mad.event_type)
    SELECT event_type, d, CAST(y AS BIGINT) AS y,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           med, mad,
           CASE WHEN z IS NOT NULL
                THEN floor(z * 1e6 + 0.5) / 1e6 END AS z,
           COALESCE(abs(z) > 3.5, FALSE) AS is_anomaly
    FROM scored
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the daily event count per type —
    the modified z-score (Iglewicz & Hoaglin 1993) from
    operators/timeseries.py ``mad_anomalies``: median and MAD by exact
    k-th selection (reduce-order-independent, oracle replays them
    verbatim), flag |0.6745 (y - med) / mad| > 3.5. The total report
    (every day, flagged or not) keeps the result set deterministic;
    counts are integer-valued doubles so med/mad are exact halves.
    Two selection medians + one join back — no self-join."""
    from ..operators.timeseries import mad_anomalies

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    out = mad_anomalies(daily, "event_type", "d", "y", threshold=3.5)
    return out.select(
        "event_type",
        "d",
        F.col("y").cast("bigint").alias("y"),
        "n",
        "med",
        "mad",
        round_portable(F.col("z"), 6).alias("z"),
        "is_anomaly",
    )
