"""Streaming declared queries (north-star QX5): watermarked tumbling-window
counts over ``events`` as a real Structured Streaming job, its batch twin,
and per-user sessionization (gaps-and-islands)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.queries import query
from nimhdfstore_spark.queries.sampling import _h
from nimhdfstore_spark.streaming import (
    sessionize_batch,
    tumbling_counts_batch,
    tumbling_counts_stream,
)
from nimhdfstore_spark.tables import load

_X_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


@query("x60_stream_tumbling_window", _X_TUMBLING_SQL)
def x_stream_tumbling(spark, sf_dir):
    return tumbling_counts_stream(spark, sf_dir, window="10 minutes", watermark="1 hour")


@query("x61_batch_tumbling_window", _X_TUMBLING_SQL)
def x_batch_tumbling(spark, sf_dir):
    return tumbling_counts_batch(load(spark, sf_dir, "events"))


_X_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


@query("x62_sessionize", _X_SESSION_SQL)
def x_sessionize(spark, sf_dir):
    return sessionize_batch(load(spark, sf_dir, "events"), gap_minutes=30)


_X_STATEFUL_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("x63_stateful_user_totals", _X_STATEFUL_SQL)
def x_stateful_user_totals(spark, sf_dir):
    from nimhdfstore_spark.streaming import user_totals_stateful_stream

    return user_totals_stateful_stream(spark, sf_dir)


_X_STREAM_DEDUP_SQL = """
SELECT DISTINCT event_id, user_id, value FROM events ORDER BY event_id
"""


@query("x64_stream_dedup", _X_STREAM_DEDUP_SQL)
def x_stream_dedup(spark, sf_dir):
    from nimhdfstore_spark.streaming import dedup_events_stream

    return dedup_events_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# x79 — interval join: attribute purchase events to the user session that
# contains them. Spark side: sessions as (user_id, [start,end]) intervals,
# then operators/interval.py's bucketized equi-join (no nested-loop plan).
# Oracle: the same session CTE + a plain BETWEEN join.
# --------------------------------------------------------------------------

_X_INTERVAL_SQL = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
),
iv AS (
  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS s_end
  FROM sess GROUP BY user_id, session_seq
)
SELECT p.event_id, p.user_id, iv.session_seq
FROM events p JOIN iv
  ON p.user_id = iv.user_id
 AND CAST(floor(epoch(p.ts)) AS BIGINT) BETWEEN iv.s_start AND iv.s_end
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@query("x79_interval_join", _X_INTERVAL_SQL)
def x_interval_join(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nimhdfstore_spark.operators.interval import interval_join

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    sess = (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                Window.partitionBy("user_id").orderBy("ts").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ).cast("long"),
        )
    )
    intervals = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.col("ts").cast("timestamp").cast("long")).alias("s_start"),
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("s_end"),
    )
    points = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_sec")
    )
    return (
        interval_join(
            points, intervals, "ts_sec", "s_start", "s_end",
            on=["user_id"], bucket=1800,
        )
        .select("event_id", "user_id", "session_seq")
        .orderBy("event_id")
    )


# Append-mode streaming emits only CLOSED sessions: last_ts + gap (the
# session_window end) must be <= the final watermark (max event time -
# delay). The oracle applies the same cutoff at microsecond precision
# (epoch_us truncates ns->us exactly like the Spark reader's nanos->micros).
_X_STREAM_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_seq
HAVING epoch_us(max(ts)) + CAST(1800 AS BIGINT) * 1000000
       <= (SELECT max(epoch_us(ts)) FROM events) - CAST(3600 AS BIGINT) * 1000000
ORDER BY user_id, session_start
"""


@query("x65_stream_session_window", _X_STREAM_SESSION_SQL)
def x_stream_session_window(spark, sf_dir):
    from nimhdfstore_spark.streaming import session_window_stream

    return session_window_stream(spark, sf_dir, gap="30 minutes")


# --------------------------------------------------------------------------
# x66 — stream-stream join: purchases attributed to the same user's clicks
# within the preceding 30 minutes. Inner-join matches emit immediately
# (watermarks bound STATE, not output), so the batch join is the oracle.
# --------------------------------------------------------------------------

# epoch_us truncates ns -> us exactly like the Spark reader's nanosAsLong
# path, so boundary comparisons match at Spark's timestamp precision
_X_ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - CAST(1800 AS BIGINT) * 1000000
 AND epoch_us(c.ts) <= epoch_us(p.ts)
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
"""


@query("x66_stream_stream_join", _X_ATTRIBUTION_SQL)
def x_stream_stream_join(spark, sf_dir):
    from nimhdfstore_spark.streaming import purchase_attribution_stream

    return purchase_attribution_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# x67 — streaming ingest into the store (packet-table WRITE path,
# H5PTappend): the events stream drains through foreachBatch into a
# positional table; result = stored positions 0..49 (canonical ts order).
# --------------------------------------------------------------------------

_X_INGEST_SQL = """
SELECT CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS _rowid,
       event_id, user_id
FROM events QUALIFY _rowid < 50 ORDER BY _rowid
"""


@query("x67_stream_ingest_store", _X_INGEST_SQL)
def x_stream_ingest(spark, sf_dir):
    import os as _os

    from nimhdfstore_spark.queries.core import SCRATCH_ROOT
    from nimhdfstore_spark.rowid import ROWID
    from nimhdfstore_spark.store import Store
    from nimhdfstore_spark.streaming import stream_into_store

    store = Store(
        spark,
        _os.path.join(SCRATCH_ROOT, f"x67-{_os.path.basename(sf_dir)}"),
    )
    if "ingested" in store:
        store.drop("ingested")
    import shutil as _sh

    for e in _os.listdir(store.root):  # stale checkpoints from prior runs
        if e.startswith("_checkpoint_ingested"):
            _sh.rmtree(_os.path.join(store.root, e), ignore_errors=True)
    stream_into_store(spark, sf_dir, store, "ingested")
    t = store.table("ingested")
    return (
        t.df()
        .where(F.col(ROWID) < 50)
        .select(ROWID, "event_id", "user_id")
        .orderBy(ROWID)
    )


# --------------------------------------------------------------------------
# x68 — stateless streaming ETL: the PII scrub (x26's exact transform) run
# as a map-only Structured Streaming job, rolled up per language. The
# oracle is the batch SQL over the same deterministic augmentation — a
# stateless stream over a finite source must equal its batch twin row for
# row.
# --------------------------------------------------------------------------

_X68_SQL = """
WITH aug AS (
  SELECT doc_id, lang,
    text || CASE doc_id % 5
      WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      WHEN 1 THEN ' call +1 415 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      WHEN 2 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
                  || CAST(doc_id * 7 % 200 AS VARCHAR) || '.42 logged'
      ELSE '' END AS t
  FROM documents
)
SELECT lang,
  CAST(count(*) AS INT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS INT) AS total_email,
  CAST(SUM(len(regexp_extract_all(t, '\\+\\d[\\d ()-]{7,}\\d'))) AS INT) AS total_phone,
  CAST(SUM(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))) AS INT) AS total_ip
FROM aug GROUP BY lang ORDER BY lang
"""


@query("x68_stream_pii_scrub", _X68_SQL)
def x_stream_pii_scrub(spark, sf_dir):
    from nimhdfstore_spark.queries.text import _pii_augmented
    from nimhdfstore_spark.streaming import pii_scrub_stream

    return pii_scrub_stream(spark, sf_dir, _pii_augmented)


# --------------------------------------------------------------------------
# x69 — stream-static broadcast join: temperature-sampling a document
# stream against thresholds precomputed from the static table (x93's exact
# arithmetic). The missing streaming join shape: x66 is stream-stream with
# event-time state; this is zero-state broadcast enrichment.
# --------------------------------------------------------------------------

_X69_SQL = f"""
WITH counts AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY lang),
wts AS (SELECT lang, n_g,
               CAST(floor(sqrt(CAST(n_g AS DOUBLE))) AS BIGINT) AS r_g
        FROM counts),
tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
               CAST(SUM(r_g) AS BIGINT) AS r_total FROM wts),
th AS (SELECT lang, n_g,
              least(n_g, (n_total // 2) * r_g // r_total) AS s_g
       FROM wts, tot),
th2 AS (SELECT lang, n_g,
               CAST(floor(CAST(s_g AS DOUBLE) / n_g * 4294967296) AS BIGINT) AS t_g
        FROM th)
SELECT d.lang, CAST(count(*) AS INT) AS n_sampled
FROM documents d JOIN th2 USING (lang)
WHERE {_h('d.doc_id', 0)} < t_g
GROUP BY d.lang ORDER BY d.lang
"""


@query("x69_stream_static_join", _X69_SQL)
def x_stream_static_join(spark, sf_dir):
    from nimhdfstore_spark.streaming import temperature_sample_stream

    return temperature_sample_stream(spark, sf_dir, budget_den=2, salt=0)


# --------------------------------------------------------------------------
# x87 — sliding (hopping) windows: 10-minute windows every 5 minutes, so
# each event lands in exactly two windows. The oracle unnests each event
# into both containing window starts (epoch-aligned, same as Spark's
# window()) and counts.
# --------------------------------------------------------------------------

_X87_SQL = """
WITH starts AS (
  SELECT unnest([
    time_bucket(INTERVAL '5 minutes', ts),
    time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
  ]) AS ws
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM starts GROUP BY ws ORDER BY window_start
"""


@query("x87_stream_sliding_window", _X87_SQL)
def x_stream_sliding(spark, sf_dir):
    from nimhdfstore_spark.streaming import sliding_counts_stream

    return sliding_counts_stream(
        spark, sf_dir, window="10 minutes", slide="5 minutes", watermark="1 hour"
    )


# --------------------------------------------------------------------------
# x125 — streaming sketch maintenance: the Count-Min cell table lives as
# bounded streaming-aggregation state (complete mode, d×w rows forever);
# after the availableNow drain the sketch answers point-frequency queries.
# The oracle recomputes the identical cells batch-side — streaming
# aggregation is just incremental merge of the same integer partials.
# --------------------------------------------------------------------------

def _x125_sql() -> str:
    from nimhdfstore_spark.operators import sketches as SK
    from nimhdfstore_spark.queries.sketches import _sql_positions

    d, w, s0 = SK.CM_DEPTH, SK.CM_WIDTH, SK.CM_SALT0
    return f"""
WITH cpos AS ({_sql_positions('events', 'user_id', d, w, s0)}),
sketch AS (
    SELECT rw, pos, CAST(COUNT(*) AS BIGINT) AS cnt FROM cpos GROUP BY rw, pos
),
probe AS (SELECT DISTINCT user_id FROM events),
ppos AS ({_sql_positions('probe', 'user_id', d, w, s0)}),
est AS (
    SELECT p.key AS user_id, MIN(COALESCE(s.cnt, 0)) AS cm_estimate
    FROM ppos p LEFT JOIN sketch s ON p.rw = s.rw AND p.pos = s.pos
    GROUP BY p.key
),
exact AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
    FROM events GROUP BY user_id
)
SELECT e.user_id, e.cm_estimate, x.true_count
FROM est e JOIN exact x ON e.user_id = x.user_id
ORDER BY e.cm_estimate DESC, e.user_id LIMIT 20
"""


@query("x125_stream_countmin", _x125_sql())
def x_stream_countmin(spark, sf_dir):
    from nimhdfstore_spark.operators.sketches import countmin_estimate
    from nimhdfstore_spark.streaming.windows import countmin_user_stream

    sketch = countmin_user_stream(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select("user_id")
    est = countmin_estimate(ev.distinct(), "user_id", sketch)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(exact, "user_id")
        .select("user_id", "cm_estimate", "true_count")
        .orderBy(F.desc("cm_estimate"), "user_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# x127 — streaming MERGE upsert into the store (CDC-consumer / materialized
# view maintenance): two staged files force >= 2 micro-batches, each batch
# merge-upserts per-user totals in ONE snapshot commit; additive int64
# fixed-point measures make the result independent of batch boundaries, so
# the oracle is the one-shot batch rollup.
# --------------------------------------------------------------------------

_X127_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_fp
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("x127_stream_merge_upsert", _X127_SQL)
def x_stream_merge(spark, sf_dir):
    import os as _os

    from nimhdfstore_spark.queries.core import scratch_store
    from nimhdfstore_spark.streaming.windows import stream_merge_into_store

    store = scratch_store(spark, f"x127-{_os.path.basename(sf_dir)}")
    if "user_totals" in store:
        store.drop("user_totals")
    stream_merge_into_store(spark, sf_dir, store, "user_totals")
    return (
        store.table("user_totals")
        .df()
        .select("user_id", "n", "sum_fp")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# x131 — stream-stream LEFT OUTER join: unmatched purchases emit with null
# click only after the watermark proves no future click can match. The
# oracle mirrors the engine's eviction rule: the global watermark is
# min(max purchase ts, max click ts) - delay (each side's watermark tracks
# its own filtered stream), and null verdicts inside the final watermark
# window are withheld — x65's closed-sessions-only discipline, applied to
# outer joins.
# --------------------------------------------------------------------------

_X131_SQL = """
WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id AS cid, user_id, ts FROM events
      WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM c))
              - INTERVAL 1 HOUR AS cutoff)
SELECT p.pid AS purchase_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS pts,
       c.cid AS click_id
FROM p JOIN c ON p.user_id = c.user_id
  AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
UNION ALL
SELECT p.pid, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S'), NULL
FROM p
WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
                  AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts)
  AND p.ts <= (SELECT cutoff FROM wm)
ORDER BY purchase_id, click_id
"""


@query("x131_stream_stream_left_outer", _X131_SQL)
def x_stream_outer(spark, sf_dir):
    from nimhdfstore_spark.streaming.windows import (
        purchase_attribution_outer_stream,
    )

    out = purchase_attribution_outer_stream(spark, sf_dir)
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("pts"),
        "click_id",
    ).orderBy("purchase_id", "click_id")


# --------------------------------------------------------------------------
# x132 — event-time TIMEOUT sessionization (applyInPandasWithState with
# EventTimeTimeout — the state-timeout API member x63's NoTimeout form and
# x65's engine-native session_window don't cover). Sessions closed by a
# successor event emit in-batch; each user's trailing open session emits
# only if its timeout (last event + gap) fires before the final watermark.
# All arithmetic at epoch-milliseconds on both engines (DuckDB epoch_ms ==
# pandas micros // 1000 truncation), so gap decisions can't straddle a
# seconds-granularity rounding difference.
# --------------------------------------------------------------------------

_X132_SQL = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
wm AS (SELECT max(ms) - 3600000 AS cutoff FROM e),
marked AS (
  SELECT user_id, ms,
    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
         THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)
),
sess AS (
  SELECT user_id, ms,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
agg AS (
  SELECT user_id, sid,
         CAST(min(ms) AS BIGINT) AS start_ms,
         CAST(max(ms) AS BIGINT) AS end_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY user_id, sid
),
ranked AS (
  SELECT *, max(sid) OVER (PARTITION BY user_id) AS max_sid FROM agg
)
SELECT user_id, start_ms, end_ms, n_events FROM ranked
WHERE sid < max_sid OR end_ms + 1800000 <= (SELECT cutoff FROM wm)
ORDER BY user_id, start_ms
"""


@query("x132_stream_timeout_sessions", _X132_SQL)
def x_stream_timeout_sessions(spark, sf_dir):
    from nimhdfstore_spark.streaming.windows import timeout_sessions_stream

    out = timeout_sessions_stream(spark, sf_dir, gap_minutes=30)
    return out.select(
        "user_id", "start_ms", "end_ms", "n_events"
    ).orderBy("user_id", "start_ms")


_X142_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("x142_stream_restart_recovery", _X142_SQL)
def x_stream_restart_recovery(spark, sf_dir):
    """Kill-and-restart exactly-once: a streaming aggregation drains half
    the input, stops, and a NEW query restarted from the same checkpoint
    drains the appended second half. The final totals must equal the batch
    twin over everything — proving the checkpoint restored both the
    aggregation state and the committed source offsets (no loss, no double
    count). The operational property a long-lived ingest depends on."""
    from nimhdfstore_spark.streaming.windows import restart_recovery_stream

    return restart_recovery_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# x166 — streaming positional DELETE consumer over merge-on-read deletion
# vectors (q43's write path driven from a command stream): two micro-
# batches of delete commands apply as O(1) metadata each; the drain
# rewrites ZERO data files. Composition across batches must equal q43's
# composed eager semantics — delete logical [100,199] then [100,149] ⇒ raw
# [100,249] gone (one merged DV range).
# --------------------------------------------------------------------------

_X166_SQL = """
WITH base AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS _rowid,
         doc_id, lang, source
  FROM documents
),
kept AS (
  SELECT _rowid, doc_id, lang, source FROM base WHERE _rowid < 100
  UNION ALL
  SELECT _rowid - 150, doc_id, lang, source FROM base WHERE _rowid > 249
)
SELECT kept.*, (SELECT COUNT(*) FROM kept) AS total_count,
       CAST(1 AS BIGINT) AS n_dv_ranges
FROM kept WHERE _rowid BETWEEN 95 AND 104 ORDER BY _rowid
"""


@query("x166_stream_deferred_deletes", _X166_SQL)
def x166(spark, sf_dir):
    import os as _os

    from nimhdfstore_spark.queries.core import scratch_store
    from nimhdfstore_spark.rowid import ROWID
    from nimhdfstore_spark.streaming.windows import stream_deletes_into_store

    store = scratch_store(spark, f"x166-{_os.path.basename(sf_dir)}")
    stream_deletes_into_store(spark, sf_dir, store, "docs_mor")
    t = store.table("docs_mor")
    return (
        t.df()
        .where(F.col(ROWID).between(95, 104))
        .select(ROWID, "doc_id", "lang", "source")
        .withColumn("total_count", F.lit(t.nrows).cast("long"))
        .withColumn("n_dv_ranges", F.lit(len(t.deletion_vector)).cast("long"))
        .orderBy(ROWID)
    )


# --------------------------------------------------------------------------
# x196 — STREAMING incremental dedup with a GROWING persisted index: the
# crawl-ingest loop end to end. Three staged micro-batches arrive in
# deterministic order; each probes the persisted MinHash signature index
# (corpus + all earlier batches' ACCEPTED docs) and appends its accepted
# signatures back. The oracle unrolls the three batches as chained CTEs —
# batch k's candidate set includes batch j<k docs NOT flagged dup at
# stage j — over the same engine-independent signature arithmetic as x140.
# --------------------------------------------------------------------------

#: x196 signs with a narrower family than x140 (32 hashes / 8 bands, same
#: rows-per-band): the streaming loop pays the signature+agree cost once
#: per micro-batch per index generation, and 32 hashes at tau=0.65 keeps
#: the same verdict structure at half the codegen/index volume.
_X196_NUM, _X196_BANDS = 32, 8


def _x196_sql() -> str:
    from nimhdfstore_spark.operators import dedup as D
    from nimhdfstore_spark.queries.dedup import (
        _DOC_LIMIT, _JACCARD_TAU, _SQL_GRAM_HASHES, _poly_fold_sql,
    )

    r = _X196_NUM // _X196_BANDS
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(pgs, p -> (p * {a} + {b}) % {D.HASH_MOD}))"
        for a, b in D.minhash_coeffs(_X196_NUM)
    )
    bucket = lambda side: _poly_fold_sql(  # noqa: E731
        [f"{side}.sig[{r}*k + {j + 1}]" for j in range(r)], D.HASH_MOD
    )
    est = (
        f"ROUND(len(list_filter(range({_X196_NUM}), i -> a.sig[i+1] = b.sig[i+1]))"
        f" / {_X196_NUM}.0, 6)"
    )
    collide = (
        f"len(list_filter(range({_X196_BANDS}),"
        f" k -> ({bucket('a')}) = ({bucket('b')}))) > 0"
    )

    def member(k: int) -> str:
        # index contents when batch k probes: corpus + accepted of batches < k
        terms = ["b.doc_id % 10 != 0"]
        for j in range(k):
            terms.append(
                f"(b.doc_id % 30 = {10 * j} AND b.doc_id NOT IN "
                f"(SELECT id FROM dup{j}))"
            )
        return "(" + " OR ".join(terms) + ")"

    scored, dups = [], []
    for k in range(3):
        scored.append(f"""scored{k} AS MATERIALIZED (
  SELECT a.doc_id AS id, b.doc_id AS match_id, {est} AS est_jaccard
  FROM s a JOIN s b
    ON a.doc_id % 30 = {10 * k} AND {member(k)}
  WHERE {collide}
    AND ROUND(len(list_filter(range({_X196_NUM}), i -> a.sig[i+1] = b.sig[i+1]))
              / {_X196_NUM}.0, 6) >= {_JACCARD_TAU}
)""")
        dups.append(f"dup{k} AS (SELECT DISTINCT id FROM scored{k})")
    chain = ",\n".join(v for pair in zip(scored, dups) for v in pair)
    return f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
h AS (
  SELECT doc_id, {_SQL_GRAM_HASHES} AS pgs FROM g WHERE len(grams) > 0
),
s AS MATERIALIZED (SELECT doc_id, list_value(
    {sig_exprs}) AS sig FROM h),
{chain},
all_scored AS (
  SELECT * FROM scored0 UNION ALL
  SELECT * FROM scored1 UNION ALL
  SELECT * FROM scored2
),
per_doc AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_candidates,
         (list(match_id ORDER BY est_jaccard DESC, match_id ASC))[1]
             AS best_match_id,
         MAX(est_jaccard) AS best_est
  FROM all_scored GROUP BY id
)
SELECT d.doc_id AS id,
       CAST((d.doc_id % 30) // 10 AS BIGINT) AS batch_no,
       CAST(CASE WHEN p.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
       COALESCE(p.n_dup_candidates, 0) AS n_dup_candidates,
       CAST(COALESCE(p.best_match_id, -1) AS BIGINT) AS best_match_id,
       COALESCE(p.best_est, 0.0) AS best_est
FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
WHERE d.doc_id < {_DOC_LIMIT} AND d.doc_id % 10 = 0
ORDER BY id
"""


@query("x196_stream_incremental_dedup", _x196_sql())
def x196(spark, sf_dir):
    import os as _os

    from nimhdfstore_spark.queries.core import scratch_store
    from nimhdfstore_spark.queries.dedup import _DOC_LIMIT, _JACCARD_TAU
    from nimhdfstore_spark.streaming.windows import stream_incremental_dedup

    store = scratch_store(spark, f"x196-{_os.path.basename(sf_dir)}")
    rows = stream_incremental_dedup(
        spark, sf_dir, store,
        doc_limit=_DOC_LIMIT, num_hashes=_X196_NUM, bands=_X196_BANDS,
        threshold=_JACCARD_TAU,
    )
    from nimhdfstore_spark.tables import local_frame

    return local_frame(
        spark, rows,
        "id long, batch_no long, is_dup long, n_dup_candidates long, "
        "best_match_id long, best_est double",
    ).orderBy("id")
