"""Event-stream relational operators: gap sessionization and as-of
(backward) joins.

These are the two event-table primitives every large-scale analytics
engine ends up needing (web/product analytics over the `events`
table; the reference has no event model -- this extends the engine
the same way SURVEY §2.9's training-pipeline ops do).

Both are single-shuffle window compositions -- no range explode, no
cross join, no Python:

- ``sessionize``: one exchange on the user key, two window passes in
  the same sort order (Catalyst runs them in one Window node chain
  without re-sorting).
- ``asof_join``: the classic union-tag trick -- interleave both
  tables in (key, ts) order and carry the last right-side value
  forward with ``last(..., ignorenulls=True)``.  One exchange total;
  the naive alternative (range join + per-left-row max) is a
  quadratic blowup on hot keys.  Skew = per-key row count; at
  10^12-event scale a hot key's window still sorts within its
  partition spill-safely (ExternalSorter), and AQE splits oversized
  partitions.
"""

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(events: DataFrame, user_col: str = 'user_id',
               ts_col: str = 'ts', order_col: str = 'event_id',
               gap_s: int = 1800) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    time since the user's previous event exceeds ``gap_s`` seconds
    (strictly greater; micro-second precision).

    Output: input columns + ``session_seq`` (0-based per-user session
    index) + ``session_id`` (``'<user>_<seq>'``, globally unique).
    ``order_col`` breaks equal-timestamp ties deterministically.

    Scale shape: one exchange on ``user_col``; the lag and the
    running sum share one (user, ts, order) sort, so Catalyst chains
    them in a single Window stage.  150M users x ~anything rows is a
    healthy key distribution; a single pathological user still sorts
    externally rather than OOMing.
    """
    # parquet NTZ timestamps need the cast (session tz is pinned UTC
    # engine-wide; only DIFFERENCES feed the gap test, so the cast is
    # tz-invariant anyway).
    us = F.unix_micros(F.col(ts_col).cast('timestamp'))
    # Order by the CASTED micros, not the raw column: a string ts
    # column would otherwise sort lexicographically while the gap
    # test runs chronologically -- sessions would break in the wrong
    # places.  (For a real timestamp column the two orders agree.)
    w = Window.partitionBy(user_col).orderBy(us, order_col)
    brk = (F.lag(us).over(w).isNull()
           | (us - F.lag(us).over(w) > gap_s * 1_000_000)) \
        .cast('long')
    seq = (F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    return (events
            .withColumn('session_seq', seq.cast('int'))
            .withColumn('session_id',
                        F.concat_ws('_', F.col(user_col).cast('string'),
                                    F.col('session_seq').cast('string'))))


def session_stats(sessions: DataFrame, user_col: str = 'user_id',
                  ts_col: str = 'ts') -> DataFrame:
    """Per-session rollup of a ``sessionize`` output: event count,
    start/end, duration seconds.  One partial-agg exchange on the
    session key."""
    us = F.unix_micros(F.col(ts_col).cast('timestamp'))
    # min_by/max_by on the casted micros so the bounds are
    # chronological even for non-timestamp ts representations.
    return (sessions.groupBy(user_col, 'session_id')
            .agg(F.count('*').alias('n_events'),
                 F.min_by(F.col(ts_col), us).alias('session_start'),
                 F.max_by(F.col(ts_col), us).alias('session_end'),
                 ((F.max(us) - F.min(us)) / 1e6).alias('duration_s')))


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = 'ts', right_ts: str = 'ts',
              value_cols=('value',), suffix: str = '_asof') -> DataFrame:
    """Backward as-of join: attach to every left row the right row
    with the greatest ``right_ts`` <= ``left_ts`` for the same key
    (DuckDB/kdb ASOF JOIN semantics; left rows with no prior right
    row keep nulls).

    ``right`` should be unique per (key, right_ts) -- with duplicates
    the carried row is the last in an engine-determined order;
    pre-aggregate the right side to make it deterministic.

    Implementation: union-tag + forward-fill.  Right rows interleave
    into the left timeline sorted by (ts, is_left) -- right sorts
    FIRST at equal timestamps so a simultaneous right row is visible
    to the left row (ts_r <= ts_l is inclusive).  One exchange on
    ``key``, one window sort, a filter back to left rows.  Never a
    range join (quadratic on hot keys), never a Python crossing.

    Join-semantics edges (matching DuckDB's native ASOF JOIN, the
    oracle): right rows with a null key or null timestamp can never
    match and are dropped; left rows with a null key/timestamp are
    kept with null attached values.  The value columns fill as ONE
    struct, so a left row always receives the fields of a single
    right row -- per-column fills would stitch fields from different
    right rows whenever a right value is null.
    """
    val_list = list(value_cols)
    lcols = [c for c in left.columns]
    rstruct = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in val_list])
    tagged_l = left.select(
        F.col(key), F.col(left_ts).alias('_ts'), F.lit(1).alias('_is_l'),
        *[F.col(c).alias(f'_l_{c}') for c in lcols],
        F.lit(None).cast(rstruct).alias('_r'))
    tagged_r = (right
                .filter(F.col(key).isNotNull()
                        & F.col(right_ts).isNotNull())
                .select(
                    F.col(key), F.col(right_ts).alias('_ts'),
                    F.lit(0).alias('_is_l'),
                    *[F.lit(None).cast(left.schema[c].dataType)
                      .alias(f'_l_{c}') for c in lcols],
                    F.struct(*[F.col(c).alias(c) for c in val_list])
                    .alias('_r')))
    w = (Window.partitionBy(key).orderBy('_ts', '_is_l')
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = tagged_l.unionByName(tagged_r).select(
        '*', F.last('_r', ignorenulls=True).over(w).alias('_f'))
    out_cols = [F.col(f'_l_{c}').alias(c) for c in lcols] + \
        [F.col('_f')[c].alias(f'{c}{suffix}') for c in val_list]
    return filled.filter(F.col('_is_l') == 1).select(*out_cols)


def funnel(events: DataFrame, steps, user_col: str = 'user_id',
           ts_col: str = 'ts', type_col: str = 'event_type') -> DataFrame:
    """Ordered conversion funnel: for each user, the earliest time of
    step 1, then the earliest step-2 event STRICTLY AFTER it, then
    the earliest step-3 event strictly after that, etc. (classic
    product-analytics funnel; earliest-completion greedy is the
    standard well-defined semantics).

    Output: one row per user who completed step 1 --
    ``(user, t_1..t_k, funnel_stage)`` where ``t_i`` is null once the
    chain stops and ``funnel_stage`` counts completed steps.

    Scale shape: k-1 small hash joins between per-step MIN aggregates
    -- each aggregation partial-aggregates map-side, each join keys on
    the user, and raw events are scanned once per step with the type
    filter pushed into the scan.  No windows, no event explosion.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError('funnel needs at least 2 steps')
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias('t_1')))
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step) \
            .select(user_col, F.col(ts_col).alias('_ts'))
        advanced = (cur.join(nxt, user_col)
                    .filter(F.col('_ts') > F.col(f't_{i - 1}'))
                    .groupBy(user_col)
                    .agg(F.min('_ts').alias(f't_{i}')))
        cur = cur.join(advanced, user_col, 'left')
    stage = sum((F.col(f't_{i}').isNotNull().cast('int')
                 for i in range(2, len(steps) + 1)), F.lit(1))
    return cur.withColumn('funnel_stage', stage)


def retention_cohorts(events: DataFrame, user_col: str = 'user_id',
                      ts_col: str = 'ts') -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted distinct in each subsequent week offset.

    Output: (cohort_week date, week_offset int, n_users long).

    Scale shape: first-seen = one partial-agg exchange on the user;
    the attach join keys on the user (broadcast when the user dim
    fits, shuffle otherwise); the final distinct-count aggregates
    (cohort, offset, user) -- all skinny rows, no event payload.
    """
    wk = lambda c: F.date_trunc('week', F.col(c).cast('timestamp'))
    first = events.groupBy(user_col).agg(
        F.min(wk(ts_col)).alias('_cohort'))
    joined = events.join(first, user_col).select(
        user_col,
        F.col('_cohort').cast('date').alias('cohort_week'),
        (F.datediff(wk(ts_col).cast('date'),
                    F.col('_cohort').cast('date')) / 7)
        .cast('int').alias('week_offset'))
    return (joined.groupBy('cohort_week', 'week_offset')
            .agg(F.countDistinct(user_col).alias('n_users')))


def rolling_sum_days(events: DataFrame, days: int = 7,
                     ts_col: str = 'ts', value_col: str = 'value',
                     key_cols=()) -> DataFrame:
    """Daily totals with a trailing ``days``-day rolling sum
    (RANGE frame over day numbers, so gaps in the calendar are
    handled correctly -- a ROWS frame would silently span them).

    Values accumulate in decimal(18,6) so the sums are exact and
    order-independent (double summation order differs between
    engines/partitionings; decimals don't).

    Scale shape: events aggregate to one row per (key, day) FIRST
    (partial agg); the window then runs over the tiny daily table.
    ``key_cols`` partitions both the daily rollup and the window
    (e.g. per-user trailing spend); the unkeyed global window is a
    single-task sort over the daily table -- fine, because that
    table has one row per calendar day, not per event.
    """
    if days < 1:
        raise ValueError(f'days must be >= 1, got {days}')
    key_cols = [key_cols] if isinstance(key_cols, str) \
        else list(key_cols)
    day = F.date_trunc('day', F.col(ts_col).cast('timestamp'))
    # decimal(38,6): 10^32 integral digits of headroom -- a
    # decimal(18,6) cast nulls out (or, under ANSI, fails on) values
    # >= 10^12, silently dropping them from the "exact" sums.
    daily = (events.groupBy(*key_cols, day.alias('day'))
             .agg(F.sum(F.col(value_col).cast('decimal(38,6)'))
                  .alias('_day_sum')))
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.unix_date(F.col('day').cast('date')))
         .rangeBetween(-(days - 1), 0))
    return (daily.select(
        *key_cols,
        F.date_format('day', 'yyyy-MM-dd').alias('day'),
        F.col('_day_sum').cast('double').alias('day_total'),
        F.sum('_day_sum').over(w).cast('double')
        .alias(f'trailing_{days}d')))


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = 'ts', start_col: str = 'start_ts',
                  end_col: str = 'end_ts', keys=(),
                  bucket_s: float = None, max_buckets: int = 4096,
                  broadcast_intervals: bool = None) -> DataFrame:
    """E14: point-in-interval (containment range) join -- every
    (point, interval) pair with ``start <= ts <= end`` (closed on
    both ends, microsecond precision) and equal ``keys``.

    Spark has no native range join; the naive theta-join is a
    broadcast-nested-loop (all-pairs per key -- quadratic on hot
    keys).  This is the classic time-bucketization instead: epoch
    time is chunked into fixed ``bucket_s``-second buckets, each
    interval explodes to the buckets it covers (native ``sequence``,
    no Python), each point computes its ONE bucket, and the pair
    meets in an equi-join on (keys..., bucket) + an exact codegen
    containment filter.  Because a point lives in exactly one
    bucket, every qualifying pair is emitted exactly once -- no
    ``distinct()``, no extra exchange (same exactly-once argument as
    the PBSM reference-point trick in ``spatial/overlap.py``).

    ``bucket_s=None`` auto-sizes from one tiny aggregate over the
    interval side: ``max(avg_span, max_span / max_buckets)``, so the
    average interval explodes to ~2 rows and the widest to at most
    ``max_buckets`` (a degenerate full-history interval costs
    ``max_buckets`` rows, never 10^8).  Intervals with
    ``end < start`` are dropped (malformed), nulls on either side
    never match.

    Scale shape: the exploded interval side carries only (keys,
    bucket, payload) -- ~2 rows per interval at the auto bucket; the
    point side shuffles ONCE on (keys..., bucket) -- or not at all
    when ``broadcast_intervals`` (auto: interval count <= 512k rows
    -> exploded side comfortably under the broadcast cap) keeps the
    10^12-row point side exchange-free.  A hot bucket (many
    concurrent intervals) is genuine output density; AQE's skew
    split handles residual imbalance because the join is a plain
    equi-join.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    p_us = F.unix_micros(F.col(point_ts).cast('timestamp'))
    s_us = F.unix_micros(F.col(start_col).cast('timestamp'))
    e_us = F.unix_micros(F.col(end_col).cast('timestamp'))

    iv = intervals.filter(F.col(start_col).isNotNull()
                          & F.col(end_col).isNotNull()) \
        .withColumn('_s_us', s_us).withColumn('_e_us', e_us) \
        .filter(F.col('_e_us') >= F.col('_s_us'))

    n_iv = avg_us = max_us = None
    if bucket_s is None or broadcast_intervals is None:
        # One skinny pass over the (small) interval side; driver
        # receives a single row.
        row = iv.agg(
            F.count('*').alias('n'),
            F.avg(F.col('_e_us') - F.col('_s_us')).alias('avg_us'),
            F.max(F.col('_e_us') - F.col('_s_us')).alias('max_us')
        ).collect()[0]
        n_iv, avg_us, max_us = row['n'], row['avg_us'], row['max_us']
        if bucket_s is None:
            if not n_iv:
                bucket_us = 1_000_000
            else:
                bucket_us = int(max(avg_us, max_us / max_buckets, 1))
        else:
            bucket_us = max(int(bucket_s * 1_000_000), 1)
            if n_iv and max_us / bucket_us > max_buckets:
                # The explosion cap is not only an auto-path nicety:
                # an explicit 1-second bucket against month-long
                # intervals would explode each to ~10^6 rows.
                # Bucket size is internal (never visible in output),
                # so coarsening it is always safe.
                bucket_us = int(max(bucket_us,
                                    max_us / max_buckets, 1))
    else:
        bucket_us = max(int(bucket_s * 1_000_000), 1)
    if broadcast_intervals is None:
        # Size the decision by the ESTIMATED EXPLODED row count
        # (intervals x avg covered buckets), not the raw interval
        # count -- a wide-interval side explodes far past its row
        # count.
        est = (n_iv or 0) * (1 + (avg_us or 0) / bucket_us)
        broadcast_intervals = est <= 512_000

    # Exact int64 floor-div bucketing: floor(col / lit) goes through
    # a DOUBLE division, which misassigns boundary micros once
    # timestamps exceed 2^53; (a - pmod(a, b)) div b is exact at any
    # magnitude and floors correctly for pre-1970 (negative) epochs.
    def _fdiv(col):
        b = int(bucket_us)
        return F.expr(f'({col} - pmod({col}, {b})) div {b}')

    # Interval payload columns that collide with a point column get
    # an '_iv' suffix so the output schema has no duplicate names.
    taken = set(points.columns)
    iv_cols = [
        F.col(c).alias(f'{c}_iv') if c in taken else F.col(c)
        for c in intervals.columns if c not in keys]
    exploded = iv.select(
        *keys, *iv_cols, '_s_us', '_e_us',
        F.explode(F.sequence(_fdiv('_s_us'), _fdiv('_e_us')))
        .alias('_bkt'))
    if broadcast_intervals:
        exploded = F.broadcast(exploded)

    pt = points.withColumn('_p_us', p_us) \
        .withColumn('_bkt', _fdiv('_p_us'))
    out = pt.join(exploded, keys + ['_bkt']) \
        .filter((F.col('_p_us') >= F.col('_s_us'))
                & (F.col('_p_us') <= F.col('_e_us')))
    return out.drop('_p_us', '_s_us', '_e_us', '_bkt')


def gap_fill(events: DataFrame, key_col: str = 'user_id',
             ts_col: str = 'ts', val_col: str = 'value',
             step_s: int = 86400) -> DataFrame:
    """E15: regular-grid time-series gap fill with forward fill --
    densify each key's observations onto a fixed ``step_s``-second
    grid and carry the last observation forward across the gaps (the
    standard prep before rolling/seasonal features on irregular event
    streams).

    Grid buckets are ``floor(epoch_us / step_us)``; each key's grid
    spans its own [first, last] observed bucket (no global range, so
    a short-lived key never explodes to the corpus's full history).
    Within one (key, bucket) the LAST observation wins (max by
    ``(ts, value)`` -- the value tie-break keeps exact-duplicate
    timestamps deterministic).  Returns one row per (key, grid
    bucket): ``(key, bucket, grid_ts_s, value, is_gap)`` --
    ``is_gap`` marks buckets with NO observation (an observed null
    value is still an observation: is_gap stays false and the null
    carries forward as the value, exactly as recorded); the first
    bucket of every key is observed by construction.  Buckets use
    exact int64 floor division, so pre-1970 (negative-epoch)
    timestamps land on the correct grid line.

    Scale shape: ONE hash exchange total -- an up-front
    ``repartition(key)`` that serves both the per-(key, bucket)
    reduction (hash(key) clusters (key, bucket), so the groupBy adds
    no exchange; its sort is shared with the window) and the per-key
    window.  The forward fill needs no grid join at all: each
    observed bucket looks one observation ahead (``lead``) and
    natively ``sequence``-explodes the gap run it owns -- every grid
    row is emitted exactly once with its carrying observation
    attached, so the old bounds pass + 72M-row grid LEFT JOIN +
    ``last(ignorenulls)`` scan are gone (measured 5.7 s -> 2.0 s at
    20M events / 100k keys).  Rows = span/step per key as before
    (the caller sizes ``step_s`` to the domain); keys are the
    parallelism unit; no Python, no driver state.
    """
    step_us = int(step_s) * 1_000_000
    if step_us < 1:
        raise ValueError(f'step_s must be >= 1, got {step_s}')

    obs = (events
           .filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
           .select(F.col(key_col).alias('key'),
                   F.unix_micros(F.col(ts_col).cast('timestamp'))
                   .alias('_us'),
                   F.col(val_col).alias('_v'))
           .withColumn('bucket', F.expr(
               f'(_us - pmod(_us, {step_us})) div {step_us}'))
           .repartition('key')
           .groupBy('key', 'bucket')
           .agg(F.max(F.struct(F.col('_us').alias('u'),
                               F.col('_v').alias('v')))
                .alias('_last'))
           # one-field struct marker: non-null iff the bucket was
           # observed, even when the observed VALUE is null -- the
           # forward fill then carries whole observations, never
           # skipping a null-valued one.
           .select('key', 'bucket',
                   F.struct(F.col('_last.v').alias('v'))
                   .alias('_ob')))

    # Each observation owns the half-open bucket run up to (not
    # including) the key's next observation; the last observation
    # owns just its own bucket.  Exploding that run emits every
    # (key, grid bucket) exactly once with the forward-filled value
    # already attached (is_gap = the generated bucket is past the
    # observed one).
    w = Window.partitionBy('key').orderBy('bucket')
    return (obs
            .withColumn('_nxt', F.lead('bucket').over(w))
            .select('key', 'bucket', '_ob',
                    F.explode(F.sequence(
                        F.col('bucket'),
                        F.coalesce(F.col('_nxt') - 1, F.col('bucket'))))
                    .alias('_g'))
            .select('key', F.col('_g').alias('bucket'),
                    (F.col('_g') * F.lit(int(step_s)))
                    .alias('grid_ts_s'),
                    F.col('_ob')['v'].alias('value'),
                    (F.col('_g') > F.col('bucket')).alias('is_gap')))
