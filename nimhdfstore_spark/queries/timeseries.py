"""X52-X55 — event-stream analytics over ``events``: funnel conversion,
retention cohorts, time-range moving average, gap-fill/resample. Extension
surface (the reference stores packet tables, nimtables.nim:94-104, but has
no temporal query layer); each query has an exact-value DuckDB oracle.

All timestamp arithmetic goes through ``cast(ts as timestamp)`` first: the
parquet column is TIMESTAMP_NTZ and Spark refuses a direct NTZ->bigint
cast; under the UTC session timezone the two-step cast equals DuckDB's
``epoch()``.

Scale notes (100 TB): every query shuffles on user_id exactly once (the
funnel's three stage-aggregations reuse the same key, so AQE co-partitions
them); windows are per-user, never global; the gap-fill generates rows via
``sequence``+``explode`` executor-side — no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load


def _ts_sec(col: str = "ts") -> F.Column:
    return F.col(col).cast("timestamp").cast("long")


# --------------------------------------------------------------------------
# x52 — funnel conversion: view -> click -> purchase, strictly ordered
# --------------------------------------------------------------------------

_X52_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
"""


@query("x52_funnel_conversion", _X52_SQL)
def x52(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


# --------------------------------------------------------------------------
# x53 — weekly retention cohorts
# --------------------------------------------------------------------------

_X53_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort)) / 604800 AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity
WHERE week_offset <= 3
GROUP BY cohort, week_offset
ORDER BY cohort, week_offset
"""


@query("x53_retention_cohorts", _X53_SQL)
def x53(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                (
                    F.date_trunc("week", F.col("ts")).cast("timestamp").cast("long")
                    - F.col("cohort").cast("timestamp").cast("long")
                )
                / 604800
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.where(F.col("week_offset") <= 3)
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# x54 — trailing 1-hour moving average per user (range frame on epoch secs)
# --------------------------------------------------------------------------

_X54_SQL = """
WITH p AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
  FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0
)
SELECT user_id, ts_sec,
       ROUND(avg(value) OVER w, 6) AS avg_1h,
       CAST(count(*) OVER w AS BIGINT) AS n_1h
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_sec
"""


# merged into x215 fused suite (round-11): leg body kept, registration moved
def x54(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    p = ev.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 10 == 0)
    ).select("user_id", _ts_sec().alias("ts_sec"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        p.select(
            "user_id",
            "ts_sec",
            F.round(F.avg("value").over(w), 6).alias("avg_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
        )
        .orderBy("user_id", "ts_sec")
    )


# --------------------------------------------------------------------------
# x55 — hourly gap-fill/resample with zero-fill counts and LOCF values
# --------------------------------------------------------------------------

_X55_SQL = """
WITH u AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events WHERE user_id % 25 = 0 GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM u
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         count(*) AS n, avg(value) AS avg_value
  FROM events WHERE user_id % 25 = 0 GROUP BY user_id, date_trunc('hour', ts)
)
SELECT g.user_id, strftime(g.hour, '%Y-%m-%d %H') AS hour,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n,
       ROUND(last_value(a.avg_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour), 6) AS locf_value
FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.hour = a.hour
ORDER BY g.user_id, g.hour
"""


@query("x55_gapfill_locf", _X55_SQL)
def x55(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    u = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = u.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    agg = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("avg_value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.col("hour"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n"),
            F.round(F.last("avg_value", ignorenulls=True).over(w), 6).alias(
                "locf_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH").alias("hour"),
            "n",
            "locf_value",
        )
        .orderBy("user_id", "hour")
    )


# --------------------------------------------------------------------------
# q34 (continuous aggregate) moved into core.py's q34_incremental_suite in
# the ninth core-merge wave (round-10 verdict ask #1) — fused with the
# deletion-vector and incremental-join-view legs under one driver row.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# x147 — OHLC downsampling (candlestick bars): per (user, hour) open/high/
# low/close over the event values — the canonical time-series compaction
# for dashboards and feature stores. One map-side-combined groupBy; the
# open/close picks are min_by/max_by on the event timestamp with event_id
# as the deterministic tie-breaker (duplicate timestamps exist in real
# feeds; an untied min_by would be partition-order-dependent).
# --------------------------------------------------------------------------

_X147_SQL = """
SELECT user_id,
       strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       (list(value ORDER BY epoch_us(ts) ASC, event_id ASC))[1] AS open_v,
       MAX(value) AS high_v,
       MIN(value) AS low_v,
       (list(value ORDER BY epoch_us(ts) DESC, event_id DESC))[1] AS close_v
FROM events
GROUP BY user_id, 2
ORDER BY user_id, bucket
"""


# merged into x215 fused suite (round-11): leg body kept, registration moved
def x147(spark, sf_dir):
    from nimhdfstore_spark.tables import load

    ev = load(spark, sf_dir, "events").withColumn(
        "ts_t", F.col("ts").cast("timestamp")
    )
    # (epoch_us, event_id) packed into a struct gives min_by/max_by the
    # same lexicographic order DuckDB applies to its ordering tuple;
    # unix_micros is exact integer microseconds (a double round-trip
    # through fractional seconds can land one microsecond off)
    order_key = F.struct(
        F.unix_micros(F.col("ts_t")).alias("us"),
        F.col("event_id").alias("eid"),
    )
    return (
        ev.groupBy(
            "user_id",
            F.date_format(F.date_trunc("hour", "ts_t"), "yyyy-MM-dd HH:mm:ss")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", order_key).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", order_key).alias("close_v"),
        )
        .orderBy("user_id", "bucket")
    )


# --------------------------------------------------------------------------
# x150 — z-score anomaly detection per event_type: two passes (moments,
# then per-row scoring against broadcast group stats). Values scale to
# exact integer micros (floor(value*1e6) — identical IEEE product both
# engines); moment sums are exact (Σv int64, Σv² DECIMAL/HUGEINT), so
# mean/std and every per-row z are the same doubles everywhere and the
# outlier threshold cuts identically.
# --------------------------------------------------------------------------

_X150_SQL = """
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(v * v) AS DOUBLE) AS svv
  FROM v GROUP BY event_type
),
stats AS (
  SELECT event_type, n,
         CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
         sqrt((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_v
  FROM m
),
scored AS (
  SELECT v.event_type, s.n,
         (CAST(v.v AS DOUBLE) - s.mean_v) / s.std_v AS z
  FROM v JOIN stats s ON v.event_type = s.event_type
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN z > 3.0 OR z < -3.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       ROUND(MAX(CASE WHEN z >= 0 THEN z ELSE -z END), 4) AS max_abs_z
FROM scored GROUP BY event_type ORDER BY event_type
"""


@query("x150_zscore_outliers", _X150_SQL)
def x150(spark, sf_dir):
    from nimhdfstore_spark.tables import load

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v"),
    )
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
        .cast("double")
        .alias("svv"),
    )
    nd, svd = F.col("n").cast("double"), F.col("sv").cast("double")
    stats = m.select(
        "event_type",
        "n",
        (svd / nd).alias("mean_v"),
        F.sqrt((nd * F.col("svv") - svd * svd) / (nd * nd)).alias("std_v"),
    )
    z = (F.col("v").cast("double") - F.col("mean_v")) / F.col("std_v")
    scored = v.join(F.broadcast(stats), "event_type").select(
        "event_type", F.col("n"), z.alias("z")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when((F.col("z") > 3.0) | (F.col("z") < -3.0), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(
                F.max(F.when(F.col("z") >= 0, F.col("z")).otherwise(-F.col("z"))), 4
            ).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# x160 — first-order Markov transition matrix over per-user event sequences
# --------------------------------------------------------------------------

_X160_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
pairs AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_ppm
FROM pairs
ORDER BY from_type, to_type
"""


@query("x160_event_transitions", _X160_SQL)
def x160(spark, sf_dir):
    """Event-type transition matrix (first-order Markov chain): per user,
    order events by (ts, event_id), pair each with its successor via a
    window ``lead``, then count (from, to) transitions and normalize per
    source state in integer ppm (exact on both engines — no float sums).

    Scale shape: ONE shuffle on user_id for the sequence window, one
    map-side-combined groupBy on the (from,to) pair — the matrix is
    |event_types|² rows at any corpus size. The per-state normalization
    windows over that tiny matrix, not the fact table."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000 div sum(n) over (partition by from_type)").alias(
            "prob_ppm"
        ),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# x164 — median-absolute-deviation outliers: the robust twin of x150's
# z-score (a few extreme points drag mean/std toward themselves; the
# median/MAD cut doesn't move). Exact percentiles are the proven x80
# parity surface; deviations and the 3×MAD comparison are single IEEE ops
# on identical doubles, and the reported counts are integers.
# --------------------------------------------------------------------------

_X164_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS d, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       ROUND(MAX(d.med), 4) AS median_v,
       ROUND(MAX(a.mad), 4) AS mad_v
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


@query("x164_mad_outliers", _X164_SQL)
def x164(spark, sf_dir):
    """Two grouped exact-percentile passes (median, then MAD over the
    broadcast-joined deviations) and one counting aggregate — three
    map-side-combined shuffles on event_type, never a global sort of the
    fact table."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("d"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("d", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.max("med"), 4).alias("median_v"),
            F.round(F.max("mad"), 4).alias("mad_v"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# x168 — SCD Type-2 dimension build: collapse each user's event stream into
# state-validity intervals (state = event_type; consecutive duplicates
# merge; the open interval is the current state). The warehouse
# slowly-changing-dimension construction, done with two windows — no
# self-join, no driver loop.
# --------------------------------------------------------------------------

_X168_SQL = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_ts
  FROM seq
  WHERE prev_type IS NULL OR prev_type != event_type
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), 'current')
         AS valid_to,
       CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
ORDER BY user_id, valid_from
"""


@query("x168_scd2_intervals", _X168_SQL)
def x168(spark, sf_dir):
    """Per-user state intervals. Scale shape: one shuffle on user_id; both
    windows (change detection, interval close) reuse that partitioning, so
    AQE plans a single exchange; output rows = number of state CHANGES,
    not events."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seq.where(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        F.lead("ts").over(w2).alias("next_ts"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return iv.select(
        "user_id",
        "state",
        F.date_format(F.col("ts").cast("timestamp"), fmt).alias("valid_from"),
        F.coalesce(
            F.date_format(F.col("next_ts").cast("timestamp"), fmt),
            F.lit("current"),
        ).alias("valid_to"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "valid_from")


# --------------------------------------------------------------------------
# x169 — time-weighted average (TWAP) over irregular samples: each reading
# holds until the next one, so the mean weights each value by its holding
# duration — the IoT/finance aggregate a plain AVG gets wrong on irregular
# data. All integer: micros durations × value-cents, one final division.
# --------------------------------------------------------------------------

_X169_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t_next
  FROM events
),
seg AS (
  SELECT user_id, v_cents, t_next - t AS dur_us
  FROM s WHERE t_next IS NOT NULL AND t_next > t
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       CAST(SUM(v_cents * dur_us) // SUM(dur_us) AS BIGINT) AS twap_cents
FROM seg GROUP BY user_id
HAVING COUNT(*) >= 5
ORDER BY user_id
"""


# merged into x215 fused suite (round-11): leg body kept, registration moved
def x169(spark, sf_dir):
    """Per-user TWAP. One shuffle on user_id for the lead window, one
    map-side-combined groupBy; duration×cents products stay < 2^63 for
    any realistic span (micros × cents over a year ≈ 3e13 × values)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.expr("unix_micros(cast(ts as timestamp))")
    s = ev.select(
        "user_id",
        t.alias("t"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v_cents"),
        F.lead(t).over(w).alias("t_next"),
    )
    seg = s.where(
        F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t"))
    ).select("user_id", "v_cents", (F.col("t_next") - F.col("t")).alias("dur_us"))
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_us").alias("span_us"),
            F.expr("sum(v_cents * dur_us) div sum(dur_us)").alias("twap_cents"),
        )
        .where(F.col("n_segments") >= 5)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# x181 — leakage-free quantile binning (fit/transform): bin BOUNDARIES are
# fit on the first period only (exact interpolated percentiles — the same
# formula both engines implement, pinned by x80), then SECOND-period rows
# are bucketed with those frozen boundaries. The fit-on-train /
# apply-to-serve discipline every feature pipeline needs — fitting on the
# full data would leak the serving distribution into the transform. The
# fit result is a per-type 3-number table (broadcast); the transform is a
# CASE projection — one scan each, no extra shuffle.
# --------------------------------------------------------------------------

_X181_SPLIT = "2024-01-16"

_X181_SQL = f"""
WITH fit AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.50) AS p50,
         quantile_cont(value, 0.75) AS p75
  FROM events WHERE ts < TIMESTAMP '{_X181_SPLIT}'
  GROUP BY event_type
),
applied AS (
  SELECT e.event_type,
         CASE WHEN e.value < f.p25 THEN 0
              WHEN e.value < f.p50 THEN 1
              WHEN e.value < f.p75 THEN 2
              ELSE 3 END AS bin
  FROM events e JOIN fit f ON e.event_type = f.event_type
  WHERE e.ts >= TIMESTAMP '{_X181_SPLIT}'
)
SELECT event_type, CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_rows
FROM applied GROUP BY event_type, bin ORDER BY event_type, bin
"""


@query("x181_quantile_binning", _X181_SQL)
def x181(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    split = F.lit(_X181_SPLIT).cast("timestamp")
    pct = F.percentile(
        "value", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    fit = (
        ev.where(F.col("ts") < split)
        .groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
        )
    )
    binned = (
        ev.where(F.col("ts") >= split)
        .join(F.broadcast(fit), "event_type")
        .withColumn(
            "bin",
            F.when(F.col("value") < F.col("p25"), 0)
            .when(F.col("value") < F.col("p50"), 1)
            .when(F.col("value") < F.col("p75"), 2)
            .otherwise(3)
            .cast("int"),
        )
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("event_type", "bin")
    )


# --------------------------------------------------------------------------
# x215 — the three time-series rollup rows merged into ONE driver row
# (round-11 extension-side slot economics; rationale in queries/_fused.py).
# ALL legs execute every run in one fused action; the returned leg + its
# DuckDB oracle rotate on the persisted sweep counter (each leg
# engine-verified within 3 rounds).
# --------------------------------------------------------------------------

_X215_LEGS = (
    ("moving_average", "x54", "_X54_SQL"),
    ("ohlc", "x147", "_X147_SQL"),
    ("time_weighted_avg", "x169", "_X169_SQL"),
)

from nimhdfstore_spark.queries import leg_choice as _leg_choice  # noqa: E402

_X215_LEG = _leg_choice("x215_rollup_suite", len(_X215_LEGS))


@query("x215_rollup_suite", globals()[_X215_LEGS[_X215_LEG][2]])
def x215(spark, sf_dir):
    from nimhdfstore_spark.queries._fused import run_fused

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_X215_LEGS)) as ex:
        legs = list(ex.map(
            lambda d: (d[0], globals()[d[1]](spark, sf_dir)), _X215_LEGS
        ))
    return run_fused(spark, legs, _X215_LEG)
