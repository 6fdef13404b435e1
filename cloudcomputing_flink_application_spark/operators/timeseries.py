"""Time-series operators over the ``events`` table: as-of join and
gap-based sessionization.

Spark has no native AS-OF join (DuckDB does); the union-window composition
below expresses it with one shuffle and no UDFs, which is also the plan
that scales: both sides co-partition by the join key, and the "most recent
right row" is a running ``last_value`` over the merged, time-ordered
stream — O(1) state per key, no per-row probe joins.

Sessionization is the standard lag + gap-flag + running-sum composition.
Both operators carry full DuckDB oracles (ASOF JOIN / window functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Session gap threshold (minutes) — a new session starts after this silence.
SESSION_GAP_MIN = 30


def purchases_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each 'purchase' event gets the most recent prior-or-equal
    'signup' event of the same user.

    Composition: tag both sides, union, sort per user by (ts, side) with
    signups first on ties, and carry the latest signup ts/id forward with
    ``last_value(ignoreNulls)``; keep the purchase rows.  Matches DuckDB's
    ``ASOF JOIN ... ON p.ts >= s.ts`` semantics (ties match).

    Output: (event_id, user_id, ts, signup_event_id, signup_ts) —
    purchases with no prior signup keep nulls (left as-of join).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(0).alias("_side"),  # signups sort first on ts ties
        F.col("event_id").alias("_sig_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_sig_id"),
        "event_id",
    )
    merged = signups.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "event_id",
        "user_id",
        "ts",
        F.last("_sig_id", ignorenulls=True).over(w).alias("signup_event_id"),
    )
    out = carried.filter(F.col("event_id").isNotNull())
    sig_ts = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), F.col("ts").alias("signup_ts")
    )
    return out.join(F.broadcast(sig_ts), "signup_event_id", "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "signup_event_id",
        F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts_s"),
    )


ASOF_SIGNUP_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT event_id AS signup_event_id, user_id, ts AS signup_ts
  FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       s.signup_event_id,
       strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts_s
FROM p ASOF LEFT JOIN s
  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
"""


def sessionize(spark: SparkSession, sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: per-user session ids and session stats.

    A new session starts when the gap since the user's previous event
    exceeds ``gap_min`` minutes (strict ``>`` — verified to be Structured
    Streaming's ``session_window`` convention too: sessions exactly
    ``gap_min`` apart MERGE there, so batch and
    ``streaming.jobs.sessionize_stream`` agree on boundary ties).
    Composition: lag -> boolean gap flag ->
    running sum (session index) -> per-session aggregate.  One shuffle by
    user; the windows and the aggregate share it.

    Output: (user_id, session_seq, n_events, start_s, end_s).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    return sessionize_frame(ev, gap_min)


def sessionize_frame(ev: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """``sessionize`` over any frame with (user_id, ts, event_id) columns."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > gap_min * 60,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    sessioned = flagged.select(
        "user_id",
        "ts",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_s"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_s"),
        )
    )


#: Oracle notes: epoch_us // 1000000 mirrors Spark's truncating
#: timestamp->long cast (epoch() alone returns fractional-second doubles);
#: session_seq is cast from DuckDB's hugeint sum to BIGINT; both windows
#: order by (ts, event_id) so ties sequence identically in both engines.
def rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass, two time grains.

    GROUPING SETS ((user, hour), (user, day)) computes hourly and daily
    rollups in a single scan + aggregate — the batch shape of a
    TimescaleDB-style continuous aggregate, and the pattern a 100 TB events
    table uses to maintain downsampled views.  Value sums are exact integer
    cents, so the multi-set aggregation is order-independent.

    Output: (user_id, grain, bucket_s, n_events, total).
    Expressed through the SQL API (the engine's other declarative surface).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    ev.createOrReplaceTempView("_events_rollup_in")
    return spark.sql(
        """
        SELECT user_id,
               CASE WHEN hour_b IS NOT NULL THEN 'hour' ELSE 'day' END AS grain,
               date_format(coalesce(hour_b, day_b), 'yyyy-MM-dd HH:mm:ss') AS bucket_s,
               CAST(count(*) AS BIGINT) AS n_events,
               -- cast: Spark's bigint/decimal-literal division yields a
               -- DECIMAL; the oracle (and the schema contract) is DOUBLE
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM (
          SELECT user_id, value,
                 date_trunc('hour', ts) AS hour_b,
                 date_trunc('day', ts) AS day_b
          FROM _events_rollup_in
        )
        GROUP BY GROUPING SETS ((user_id, hour_b), (user_id, day_b))
        """
    )


ROLLUP_EVENTS_SQL = """
SELECT user_id,
       CASE WHEN hour_b IS NOT NULL THEN 'hour' ELSE 'day' END AS grain,
       strftime(coalesce(hour_b, day_b), '%Y-%m-%d %H:%M:%S') AS bucket_s,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
FROM (
  SELECT user_id, value,
         date_trunc('hour', ts) AS hour_b,
         date_trunc('day', ts) AS day_b
  FROM events
)
GROUP BY GROUPING SETS ((user_id, hour_b), (user_id, day_b))
"""


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER w
                   > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         CAST(sum(new_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s
FROM sessioned
GROUP BY user_id, session_seq
"""


#: ± window for the bucketed interval self-join (seconds).
RANGE_WINDOW_SEC = 300


def concurrent_events(
    spark: SparkSession, sf_dir: str, window_sec: int = RANGE_WINDOW_SEC
) -> DataFrame:
    """Bucketed range self-join: per event, how many OTHER events (any user)
    fall within ±``window_sec``.

    Spark has no inequality-join optimization (DuckDB plans this as an
    IEJoin; the oracle uses exactly that), so a naive ``|a.ts - b.ts| <= w``
    join is an O(n²) nested loop.  The scale-correct decomposition is band
    blocking on time buckets of width w: a neighbor within ±w must sit in
    the probe row's bucket or an adjacent one, so exploding 3 candidate
    buckets per probe row turns the range predicate into an EQUI-join on
    the bucket id plus a residual band filter — shuffle keyed by bucket,
    per-task work bounded by local event density, never all-pairs.  Each
    true neighbor (and self) matches in exactly one candidate bucket, so
    ``count(*) - 1`` needs no distinct.

    The same shape handles any interval/tolerance join (sensor alignment,
    co-occurrence windows); skewed hot buckets take the salt treatment of
    ngram_jaccard_dedup.  Output: (event_id, n_near) — one row per event.
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    w_us = window_sec * 1_000_000
    ev = read_events(ensure_session_confs(spark), sf_dir).select(
        "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    e = ev.withColumn("_b", F.expr(f"us div {w_us}"))
    probe = e.withColumn(
        "_cb",
        F.explode(F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)),
    )
    pairs = probe.alias("a").join(
        e.alias("b"),
        (F.col("a._cb") == F.col("b._b"))
        & (F.abs(F.col("a.us") - F.col("b.us")) <= w_us),
    )
    return pairs.groupBy(F.col("a.event_id").alias("event_id")).agg(
        (F.count("*") - 1).cast("long").alias("n_near")
    )


CONCURRENT_EVENTS_SQL = f"""
WITH e AS (
  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
)
SELECT a.event_id, CAST(count(*) - 1 AS BIGINT) AS n_near
FROM e a JOIN e b
  ON b.us BETWEEN a.us - {RANGE_WINDOW_SEC * 1_000_000}
              AND a.us + {RANGE_WINDOW_SEC * 1_000_000}
GROUP BY a.event_id
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: aggregate a JSON property per event_type.

    ``props`` is a JSON string column (the common "metadata blob" shape in
    event logs and crawl records).  ``get_json_object`` is a JVM-side
    scan-fused expression — parse + path extraction never leave codegen and
    the shuffle carries only (event_type, partial agg) — so this is the
    scale-correct way to aggregate semi-structured columns: no Python, no
    pre-materialized struct, one partial-agg exchange on a low-cardinality
    key.  All aggregates are exact integers (avg reported as exact sum+cnt
    plus a double quotient of those ints) — order-independent under any
    partial-agg schedule.

    Output: (event_type, n, k_sum, k_min, k_max, k_avg).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir).select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
        .withColumn("k_avg", F.col("k_sum").cast("double") / F.col("n"))
    )


EVENTS_JSON_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max,
       CAST(sum(k) AS BIGINT)::DOUBLE / count(*) AS k_avg
FROM ev
GROUP BY event_type
"""


# --- rolling active users ----------------------------------------------------

#: Trailing window width (days) for the rolling-actives metric.
ROLLING_WINDOW_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (DAU / WAU).

    COUNT(DISTINCT) over a sliding date range has no direct window form in
    either engine; the scalable composition is contribution explode: each
    (user, active-day) row contributes to the ``ROLLING_WINDOW_DAYS``
    target days it falls inside, so WAU(day) = distinct contributors.
    O(7n) intermediate rows, two distinct-agg shuffles on high-cardinality
    keys, no range self-join, no per-day rescan — the shape that holds on
    a 100 TB events table (contrast a correlated ``[d-6, d]`` subquery:
    7 full scans or an interval join).

    Output: (day_s, dau, wau7) for each calendar day with >= 1 event.
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(ROLLING_WINDOW_DAYS - 1))).alias("i"),
        )
        .select("user_id", F.date_add(F.col("day"), F.col("i")).alias("day"))
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count("*").cast("long").alias("wau7"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_s"), "dau", "wau7"
        )
    )


ROLLING_ACTIVE_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
contrib AS (
  SELECT DISTINCT user_id, day + CAST(t.i AS INTEGER) AS day
  FROM ud, range({ROLLING_WINDOW_DAYS}) t(i)
),
wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau7 FROM contrib GROUP BY day)
SELECT strftime(dau.day, '%Y-%m-%d') AS day_s, dau.dau, wau.wau7
FROM dau JOIN wau ON dau.day = wau.day
"""


# --- signup -> purchase funnel -----------------------------------------------

#: Conversion window (days after first signup).
FUNNEL_DAYS = 7


def signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort conversion funnel: per first-signup day, the number of users
    who purchased within ``FUNNEL_DAYS`` days of their FIRST signup.

    Two aggregates and one equi-join, all keyed by user_id (high
    cardinality, no skew): first-signup per user, left-join purchases,
    per-user converted flag via max(), cohort rollup by signup day.  The
    window predicate ``[sig_ts, sig_ts + 7d)`` is exact microsecond
    timestamp arithmetic on both engines; the only double in the output is
    one final division.

    Output: (cohort_s, signups, conversions, conv_rate).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    first_sig = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("sig_ts"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    hit = (F.col("p_ts") >= F.col("sig_ts")) & (
        F.col("p_ts") < F.col("sig_ts") + F.expr(f"INTERVAL {FUNNEL_DAYS} DAYS")
    )
    per_user = (
        first_sig.join(pur, "user_id", "left")
        .groupBy("user_id", "sig_ts")
        .agg(F.max(F.coalesce(hit, F.lit(False))).alias("converted"))
    )
    return (
        per_user.groupBy(F.date_format(F.to_date("sig_ts"), "yyyy-MM-dd").alias("cohort_s"))
        .agg(
            F.count("*").cast("long").alias("signups"),
            F.sum(F.col("converted").cast("long")).cast("long").alias("conversions"),
        )
        .select(
            "cohort_s",
            "signups",
            "conversions",
            (F.col("conversions").cast("double") / F.col("signups")).alias("conv_rate"),
        )
    )


SIGNUP_FUNNEL_SQL = f"""
WITH first_sig AS (
  SELECT user_id, min(ts) AS sig_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
per_user AS (
  SELECT f.user_id, f.sig_ts,
         coalesce(max(p.ts >= f.sig_ts AND p.ts < f.sig_ts + INTERVAL {FUNNEL_DAYS} DAY),
                  FALSE) AS converted
  FROM first_sig f
  LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    ON f.user_id = p.user_id
  GROUP BY f.user_id, f.sig_ts
)
SELECT strftime(CAST(sig_ts AS DATE), '%Y-%m-%d') AS cohort_s,
       CAST(count(*) AS BIGINT) AS signups,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS conversions,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS conv_rate
FROM per_user
GROUP BY CAST(sig_ts AS DATE)
"""


# --- cohort retention matrix -------------------------------------------------

#: Retention horizon: offsets beyond this are aggregated nowhere (cut in
#: both engines) so the matrix stays a fixed small report.
RETENTION_MAX_WEEKS = 8


def retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: for each first-signup week, how many of the
    cohort's users were active (ANY event) 0, 1, .. RETENTION_MAX_WEEKS
    weeks later — the standard product-analytics retention triangle.

    Shape: two aggregates keyed by user_id / (user_id, week) — both
    high-cardinality and skew-free — then one equi-join on user_id and a
    final rollup over the tiny (cohort, offset) key space.  Week
    difference is exact integer day arithmetic / 7 (both engines truncate
    the same: week-truncated dates differ by exact multiples of 7).

    Output: (cohort_week, week_offset, n_active, n_cohort, rate) —
    n_active counts distinct cohort users with any event that week;
    week_offset 0 always has n_active == n_cohort (the signup itself).
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("c_week"))
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("a_week")
    ).distinct()
    joined = (
        cohort.join(active, "user_id")
        .select(
            "user_id",
            "c_week",
            (F.datediff(F.to_date("a_week"), F.to_date("c_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .filter(
            (F.col("week_offset") >= 0)
            & (F.col("week_offset") <= RETENTION_MAX_WEEKS)
        )
    )
    sizes = cohort.groupBy("c_week").agg(
        F.countDistinct("user_id").cast("long").alias("n_cohort")
    )
    return (
        joined.groupBy("c_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .join(sizes, "c_week")
        .select(
            F.date_format(F.to_date("c_week"), "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias("rate"),
        )
    )


RETENTION_MATRIX_SQL = f"""
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS c_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS a_week FROM events
),
joined AS (
  SELECT c.user_id, c.c_week,
         CAST(datediff('day', CAST(c.c_week AS DATE), CAST(a.a_week AS DATE)) / 7 AS INT)
           AS week_offset
  FROM cohort c JOIN active a USING (user_id)
),
sizes AS (
  SELECT c_week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
  FROM cohort GROUP BY c_week
),
cells AS (
  SELECT c_week, week_offset,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM joined
  WHERE week_offset >= 0 AND week_offset <= {RETENTION_MAX_WEEKS}
  GROUP BY c_week, week_offset
)
SELECT strftime(CAST(cells.c_week AS DATE), '%Y-%m-%d') AS cohort_week,
       week_offset, n_active, n_cohort,
       CAST(n_active AS DOUBLE) / n_cohort AS rate
FROM cells JOIN sizes USING (c_week)
"""


# --- hourly volume anomalies -------------------------------------------------

#: Flag threshold: hours more than ANOMALY_SIGMA standard deviations ABOVE
#: the event type's mean hourly volume.
ANOMALY_SIGMA = 2


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-spike detection: hours whose event count sits more than
    ANOMALY_SIGMA std-devs above that event type's hourly mean — the
    monitoring query a pipeline runs over its own ingest telemetry.

    The flag predicate is EXACT INTEGER arithmetic end to end: with
    nh = hours, s = sum of counts, ss = sum of squared counts, an hour n
    is anomalous iff   (n*nh - s) > 0  and  (n*nh - s)^2 > sigma^2 * (nh*ss - s^2)
    — the z > sigma test cross-multiplied so no float (and no engine's
    sum-order) ever decides a flag.  Squared-count sums accumulate as
    DECIMAL(38,0) (the pricing_summary overflow rule: int64 would wrap at
    ~3e9-count hours).  The reported mean/std are doubles derived from the
    same exact integers — one division/sqrt per row, identical in both
    engines.

    Output: (event_type, hour_s, n, mean, std) for flagged hours only.

    Scale: two partial-agg shuffles — (event_type, hour) then event_type —
    with a broadcast join back onto the tiny per-type stats; hour counts
    are the only data-sized aggregation.
    """
    from cloudcomputing_flink_application_spark.registry import ensure_session_confs
    from cloudcomputing_flink_application_spark.sources.readers import read_events

    ev = read_events(ensure_session_confs(spark), sf_dir)
    hours = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    dec = lambda c: c.cast("decimal(38,0)")
    stats = hours.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum("n").cast("long").alias("s"),
        F.sum(dec(F.col("n") * F.col("n"))).alias("ss"),
    )
    dev = dec(F.col("n") * F.col("nh") - F.col("s"))
    var_num = dec(F.col("nh")) * F.col("ss") - dec(F.col("s")) * dec(F.col("s"))
    flagged = (
        hours.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("n") * F.col("nh") - F.col("s") > 0)
            & (dev * dev > F.lit(ANOMALY_SIGMA * ANOMALY_SIGMA) * var_num)
        )
    )
    return flagged.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour_s"),
        "n",
        (F.col("s").cast("double") / F.col("nh")).alias("mean"),
        (
            F.sqrt(var_num.cast("double")) / F.col("nh").cast("double")
        ).alias("std"),
    )


HOURLY_ANOMALIES_SQL = f"""
WITH hours AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(n) AS BIGINT) AS s,
         sum(CAST(n * n AS DECIMAL(38,0))) AS ss
  FROM hours GROUP BY event_type
)
SELECT event_type,
       strftime(hour, '%Y-%m-%d %H:00') AS hour_s,
       n,
       CAST(s AS DOUBLE) / nh AS mean,
       sqrt(CAST(CAST(nh AS DECIMAL(38,0)) * ss
                 - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)) AS DOUBLE)) / nh AS std
FROM hours JOIN stats USING (event_type)
WHERE n * nh - s > 0
  AND CAST(n * nh - s AS DECIMAL(38,0)) * CAST(n * nh - s AS DECIMAL(38,0))
      > {ANOMALY_SIGMA * ANOMALY_SIGMA} * (CAST(nh AS DECIMAL(38,0)) * ss
          - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
"""
