"""Structured Streaming front-ends.

The reference is strictly batch (single-threaded, eager); these
operators are the engine's streaming ingest path for the same
semantics:

- :func:`stream_tiles` -- continuous tile assignment: a parquet file
  stream of image rows, each micro-batch pushed through the identical
  batch pipeline via ``foreachBatch`` (image_ids are unique per batch,
  so per-batch assignment equals batch assignment; the polygon layer
  is a static broadcast side).
- :func:`stream_events_hourly` -- watermarked hourly rollup of the
  events table (late data bounded by the watermark), the streaming
  counterpart of the ``events_hourly`` batch query.

Both run with ``trigger(availableNow=True)`` in tests: process
everything pending, then stop -- the same code path a 24/7 incremental
ingest would run.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = ('image_id string, bytes binary, w int, h int, '
                'fmt string, caption string, phash long')


def stream_tiles(spark: SparkSession, source_dir: str,
                 polygons: DataFrame, out_dir: str,
                 checkpoint_dir: str, available_now: bool = True):
    """File-stream of image rows -> tile assignments.  Returns the
    started query.

    End-to-end exactly-once: the streaming checkpoint makes each
    micro-batch at-least-once, and the per-batch write is *idempotent*
    -- every batch lands in its own ``batch_id=<id>`` partition with
    dynamic overwrite, so a batch replayed after a crash between the
    parquet write and the checkpoint commit overwrites its own rows
    instead of appending duplicates.  (A blind ``mode('append')``
    here would only be at-least-once.)

    **Output layout** (since round 2): ``out_dir`` is partitioned by
    ``batch_id`` -- readers see one extra int column alongside the
    tile-assignment schema.  This is additive: ``spark.read.parquet
    (out_dir)`` keeps working and existing column references are
    unchanged; drop ``batch_id`` after read if the ingestion batch is
    irrelevant downstream.
    """
    from .pipeline import assign_images_to_tiles

    stream = (spark.readStream.schema(IMAGE_SCHEMA)
              .option('maxFilesPerTrigger', 8)
              .parquet(source_dir))

    def process(batch: DataFrame, batch_id: int):
        assign_images_to_tiles(batch, polygons) \
            .withColumn('batch_id', F.lit(batch_id)) \
            .write.mode('overwrite') \
            .option('partitionOverwriteMode', 'dynamic') \
            .partitionBy('batch_id').parquet(out_dir)

    writer = stream.writeStream.foreachBatch(process) \
        .option('checkpointLocation', checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_first_seen(stream: DataFrame,
                            key_cols=('phash',),
                            id_col: str = 'image_id',
                            ttl_minutes: int = None) -> DataFrame:
    """Cross-micro-batch exact dedup: keep only the FIRST row ever
    seen per key, across the whole lifetime of the stream -- the
    stateful streaming leg of the dedup family (batch legs: exact
    hash / MinHash-LSH / SimHash / embedding-cosine in
    ``operators.textops`` / ``operators.ann``).

    Custom stateful operator via ``applyInPandasWithState``: per-key
    state is one boolean ("emitted already"), kept in the streaming
    state store (RocksDB/HDFS-backed on a cluster, checkpointed --
    survives restarts like any stateful query).  Within a single
    micro-batch, ties collapse deterministically to the smallest
    ``id_col`` value.  State is O(distinct keys); for unbounded key
    spaces pass ``ttl_minutes`` to expire idle keys via a
    processing-time timeout (a key recurring after expiry is emitted
    again -- the standard windowed-dedup tradeoff; leave ``None`` for
    exact lifetime dedup).

    Scale shape: the only shuffle is the hash repartition on
    ``key_cols`` that any stateful op requires; state lookups are
    partition-local.  Equivalent batch semantics: ``dedup_exact`` /
    ``exact_duplicates`` keep-min-id.

    Null keys: rows with ANY null key column pass through UNDEDUPED
    (absence of evidence is not equality -- the G21 caption
    convention; Spark's groupBy would otherwise collapse every
    null-key row into one state group and silently drop all but the
    first for the stream's lifetime).
    """
    out_schema = stream.schema
    state_schema = 'seen byte'
    cols = list(out_schema.fieldNames())
    timeout = 'ProcessingTimeTimeout' if ttl_minutes else 'NoTimeout'

    def first_seen(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if any(k is None for k in key):
            # null-key group: emit everything, keep no state
            for pdf in pdfs:
                if len(pdf):
                    yield pdf[cols]
            return
        already = state.exists
        best = None
        for pdf in pdfs:
            if already or not len(pdf):
                continue   # must still drain the iterator
            cand = pdf.sort_values(id_col, kind='mergesort').iloc[:1]
            if best is None or (cand[id_col].iloc[0]
                                < best[id_col].iloc[0]):
                best = cand
        if not already:
            state.update((1,))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if best is not None:
            yield best[cols]

    return (stream.groupBy(*[F.col(c) for c in key_cols])
            .applyInPandasWithState(first_seen, out_schema, state_schema,
                                    'append', timeout))


def stream_events_hourly(events: DataFrame,
                         watermark: str = '2 hours') -> DataFrame:
    """Watermarked hourly per-type rollup over a streaming events
    DataFrame (ts timestamp, event_type string, value double)."""
    # Watermarks require TIMESTAMP (tz-aware); parquet NTZ columns get
    # cast (session tz is pinned to UTC engine-wide).
    events = events.withColumn('ts', F.col('ts').cast('timestamp'))
    return (events
            .withWatermark('ts', watermark)
            .groupBy(F.window('ts', '1 hour').alias('win'), 'event_type')
            .agg(F.count('*').alias('n_events'),
                 F.sum(F.col('value').cast('decimal(18,6)'))
                 .cast('double').alias('sum_value'))
            .select(F.date_format('win.start', 'yyyy-MM-dd HH')
                    .alias('hour'),
                    'event_type', 'n_events', 'sum_value'))


def stream_sessions(events: DataFrame, gap: str = '30 minutes',
                    watermark: str = '1 hour',
                    user_col: str = 'user_id') -> DataFrame:
    """Watermarked streaming gap-sessionization via the native
    ``session_window`` aggregation: per (user, session) event counts
    and bounds, sessions merging while consecutive events are within
    ``gap`` (window end = last event + gap, Spark's session-window
    convention; the batch ``operators.events.sessionize`` uses the
    inclusive-boundary lag convention instead -- the two differ only
    on exact-gap ties).

    State is bounded by the watermark: a session closes (and its
    state drops) once the watermark passes its end.  The only shuffle
    is the key repartition any stateful aggregation needs;
    ``session_window`` merges windows inside the state store, so
    session length never inflates the shuffle.

    Runs identically over a batch DataFrame (session_window is
    batch-capable) -- the parity test pins stream == batch output.
    """
    events = events.withColumn('ts', F.col('ts').cast('timestamp'))
    return (events
            .withWatermark('ts', watermark)
            .groupBy(F.col(user_col),
                     F.session_window('ts', gap).alias('sw'))
            .agg(F.count('*').alias('n_events'))
            .select(user_col,
                    F.col('sw.start').alias('session_start'),
                    F.col('sw.end').alias('session_end'),
                    'n_events'))


def stream_batch_dealer(stream: DataFrame,
                        key_cols=('bucket_id', 'shard'),
                        batch_size: int = 64,
                        id_col: str = 'image_id') -> DataFrame:
    """Stateful streaming training-batch dealer -- the streaming leg
    of T33's batch assignment: rows arriving on a stream are dealt
    into fixed ``batch_size`` training batches per ``key_cols`` group
    (aspect bucket x shard for images), with the per-group row
    counter held in the checkpointed state store so batch numbering
    continues seamlessly across micro-batches AND restarts.

    Emits every input row + ``(batch_id, pos_in_batch)``.  Within one
    micro-batch a group's rows order by ``id_col`` (deterministic);
    across micro-batches the order is arrival order -- the inherent
    streaming contract (the batch operator ``imageops.aspect_bucket``
    gives the arrival-independent global ordering when the corpus is
    static; this operator is for the ingest-time pipeline that deals
    batches as images land).

    Scale shape: the one shuffle is the hash repartition on
    ``key_cols`` that any stateful op requires; state is ONE int64
    per live group (|buckets| x n_shards rows -- constant-bounded,
    unlike per-key dedup state); the kernel is a vectorized arange
    per Arrow batch, no per-row Python.
    """
    if batch_size < 1:
        raise ValueError(f'batch_size must be >= 1, got {batch_size}')
    import numpy as np
    import pandas as pd

    out_fields = stream.schema.fieldNames()
    out_schema = T.StructType(
        list(stream.schema.fields)
        + [T.StructField('batch_id', T.LongType()),
           T.StructField('pos_in_batch', T.IntegerType())])
    state_schema = 'next_rn long'
    B = int(batch_size)

    def deal(key, pdfs, state):
        nxt = state.get[0] if state.exists else 0
        # A group larger than one Arrow batch arrives as MULTIPLE
        # chunks whose boundaries depend on shuffle fetch order --
        # sorting each chunk independently would make the dealt
        # (batch_id, pos) depend on that order and differ across
        # replays.  Concatenate first, sort once, number once.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1
                   else pd.concat(chunks, ignore_index=True))
            pdf = pdf.sort_values(id_col, kind='mergesort',
                                  ignore_index=True)
            rn = np.arange(len(pdf), dtype=np.int64) + nxt
            pdf = pdf[out_fields]
            pdf['batch_id'] = rn // B
            pdf['pos_in_batch'] = (rn % B).astype('int32')
            nxt += len(pdf)
            yield pdf
        state.update((int(nxt),))

    return (stream.groupBy(*[F.col(c) for c in key_cols])
            .applyInPandasWithState(deal, out_schema, state_schema,
                                    'append', 'NoTimeout'))
