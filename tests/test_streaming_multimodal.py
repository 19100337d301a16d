"""Structured Streaming ingest + multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pytrs_spark import datagen, imagecodec
from pytrs_spark.multimodal import (
    encode_fake_video,
    image_features,
    sample_video_frames,
)
from pytrs_spark.pipeline import (
    assign_images_to_tiles,
    polygon_layer_from_descs,
)
from pytrs_spark.streaming import stream_events_hourly, stream_tiles


def test_stream_tiles_matches_batch(spark, tmp_path):
    src = str(tmp_path / 'src')
    out = str(tmp_path / 'out')
    ckpt = str(tmp_path / 'ckpt')
    images = datagen.gen_images(spark, 200, with_bytes=False, partitions=4)
    images.write.mode('overwrite').parquet(src)
    polygons = polygon_layer_from_descs(datagen.gen_descs(spark)).cache()
    polygons.count()

    q = stream_tiles(spark, src, polygons, out, ckpt)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out).select('image_id', 'trs', 'qq')
    batch = assign_images_to_tiles(
        spark.read.parquet(src), polygons).select('image_id', 'trs', 'qq')
    assert streamed.count() == 200
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()

    # Restart from the checkpoint with no new files: exactly-once, no
    # duplicate output.
    q2 = stream_tiles(spark, src, polygons, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 200


def test_stream_events_hourly_matches_batch(spark, tmp_path):
    sf = '/root/testdata/sf0.001'
    batch_events = spark.read.parquet(f'{sf}/events.parquet')
    src = str(tmp_path / 'events_dir')
    batch_events.write.mode('overwrite').parquet(src)
    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    # File-stream the events table -> rollup -> memory sink (complete
    # mode; the watermark bounds state).
    rolled = stream_events_hourly(
        stream.select('ts', 'event_type', 'value'))
    q = (rolled.writeStream.format('memory').queryName('ev_roll')
         .outputMode('complete').trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.table('ev_roll')
    want = (spark.read.parquet(f'{sf}/events.parquet')
            .groupBy(F.date_format('ts', 'yyyy-MM-dd HH').alias('hour'),
                     'event_type')
            .agg(F.count('*').alias('n_events'),
                 F.sum(F.col('value').cast('decimal(18,6)'))
                 .cast('double').alias('sum_value')))
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_stream_events_hourly_drops_late_data(spark, tmp_path):
    """Watermark semantics pin: in append mode a window only emits
    once the (data-driven) watermark passes its end, and rows arriving
    after the watermark passed their window are dropped.  Batch
    boundaries are forced deterministically by running the query twice
    from one checkpoint (the watermark survives restarts in the
    checkpoint, like any production incremental ingest)."""
    import datetime as dt

    from pyspark.sql import Row

    src = str(tmp_path / 'late_src')
    out = str(tmp_path / 'late_out')
    ckpt = str(tmp_path / 'late_ckpt')
    base = dt.datetime(2026, 1, 1, 0, 30)
    schema = 'ts timestamp, event_type string, value double'

    def write(rows, mode):
        spark.createDataFrame([Row(ts=ts, event_type=et, value=v)
                               for ts, et, v in rows], schema) \
            .coalesce(1).write.mode(mode).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        rolled = stream_events_hourly(stream, watermark='2 hours')
        q = (rolled.writeStream.format('parquet')
             .option('path', out).option('checkpointLocation', ckpt)
             .outputMode('append').trigger(availableNow=True).start())
        q.awaitTermination(300)

    # Run 1: two rows in hour 00, one in hour 05 -> watermark ends at
    # 05:30 - 2h = 03:30, finalizing (and emitting) window 00.
    write([(base, 'a', 1.0),
           (base + dt.timedelta(minutes=5), 'a', 2.0),
           (base + dt.timedelta(hours=5), 'a', 4.0)], 'overwrite')
    run()
    got = {r['hour']: (r['n_events'], r['sum_value'])
           for r in spark.read.parquet(out).collect()}
    assert got['2026-01-01 00'] == (2, 3.0)
    assert '2026-01-01 05' not in got    # not finalized yet

    # Run 2 (same checkpoint; watermark restored at 03:30): a LATE
    # row for hour 00 arrives -> dropped, the emitted window stands.
    write([(base + dt.timedelta(minutes=10), 'a', 100.0)], 'append')
    run()
    got = {r['hour']: (r['n_events'], r['sum_value'])
           for r in spark.read.parquet(out).collect()}
    assert got['2026-01-01 00'] == (2, 3.0)   # late row did NOT land
    assert '2026-01-01 05' not in got


def test_image_features(spark):
    images = datagen.gen_images(spark, 48, with_bytes=True, partitions=4)
    feats = image_features(images).collect()
    assert len(feats) == 48
    # Cross-check one row against a local decode.
    row = feats[0]
    local = {r['image_id']: r['bytes']
             for r in images.select('image_id', 'bytes').collect()}
    px = imagecodec.decode(bytes(local[row['image_id']]))
    assert row['w'] == px.shape[1] and row['h'] == px.shape[0]
    assert abs(row['brightness'] - float(px.mean())) < 1e-9


def test_sample_video_frames(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    vids = []
    for i in range(5):
        frames = rng.integers(0, 256, size=(23, 8, 12, 3), dtype=np.uint8)
        vids.append((f'v{i}', encode_fake_video(frames)))
    df = spark.createDataFrame(vids, 'video_id string, bytes binary')
    out = sample_video_frames(df, every_nth=10).collect()
    # 23 frames sampled every 10th -> idx 0, 10, 20 per video.
    assert len(out) == 15
    assert sorted({r['frame_idx'] for r in out}) == [0, 10, 20]
    f = imagecodec.decode(bytes(out[0]['frame']))
    assert f.shape == (8, 12, 3)


def test_video_real_decode_is_stubbed(spark):
    df = spark.createDataFrame([('v0', b'\x00\x00\x00\x18ftypmp42')],
                               'video_id string, bytes binary')
    with pytest.raises(Exception, match='NotImplementedError|libav'):
        sample_video_frames(df).collect()


def test_audio_window_features(spark):
    """Audio leg: windowed RMS / zero-crossing / peak features over
    the SGA1 synthetic container, verified against a numpy oracle."""
    from pytrs_spark.multimodal import (audio_window_features,
                                        encode_fake_audio)
    rng = np.random.Generator(np.random.PCG64(7))
    rate, window_ms = 8000, 250
    win = rate * window_ms // 1000
    clips = {}
    rows = []
    for i in range(4):
        n = int(rng.integers(win, 4 * win))
        pcm = rng.integers(-2000, 2000, size=n).astype(np.int16)
        clips[f'a{i}'] = pcm
        rows.append((f'a{i}', encode_fake_audio(pcm, rate)))
    # full-scale clipped clip: int16 np.abs wraps -32768 to itself,
    # so a peak computed in int16 would report 0 here -- regression
    # pin for the int32 widening
    pcm = np.full(win + 3, -32768, dtype=np.int16)
    clips['afs'] = pcm
    rows.append(('afs', encode_fake_audio(pcm, rate)))
    df = spark.createDataFrame(rows, 'audio_id string, bytes binary')
    got = {(r['audio_id'], r['window_idx']): r
           for r in audio_window_features(df, window_ms=window_ms).collect()}
    n_expected = sum((len(p) + win - 1) // win for p in clips.values())
    assert len(got) == n_expected
    for (aid, idx), r in got.items():
        seg = clips[aid][idx * win:(idx + 1) * win]
        assert r['peak'] == int(np.abs(seg.astype(np.int32)).max())
        assert r['zero_crossings'] == int(
            np.count_nonzero(np.diff(np.signbit(seg))))
        assert abs(r['rms'] - float(np.sqrt(np.mean(
            seg.astype(np.float64) ** 2)))) < 1e-9


def test_audio_real_decode_is_stubbed(spark):
    from pytrs_spark.multimodal import audio_window_features
    df = spark.createDataFrame([('a0', b'RIFF....WAVEfmt ')],
                               'audio_id string, bytes binary')
    with pytest.raises(Exception, match='NotImplementedError|codec'):
        audio_window_features(df).collect()


def test_stream_dedup_first_seen(spark, tmp_path):
    """Stateful cross-batch dedup: duplicate keys arriving in LATER
    micro-batches are suppressed by the state store; within one batch
    ties collapse to the smallest id."""
    from pytrs_spark.streaming import stream_dedup_first_seen

    src = str(tmp_path / 'dsrc')
    out = str(tmp_path / 'dout')
    ckpt = str(tmp_path / 'dckpt')
    schema = 'image_id string, phash long'

    # Batch 1: keys 1..4, key 1 duplicated in-batch (img_a vs img_b).
    spark.createDataFrame(
        [('img_b', 1), ('img_a', 1), ('img_c', 2), ('img_d', 3),
         ('img_e', 4)], schema) \
        .coalesce(1).write.mode('overwrite').parquet(src)

    stream = (spark.readStream.schema(schema)
              .option('maxFilesPerTrigger', 1).parquet(src))
    deduped = stream_dedup_first_seen(stream, key_cols=('phash',))
    q = (deduped.writeStream.format('parquet')
         .option('path', out).option('checkpointLocation', ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r['image_id'], r['phash'])
           for r in spark.read.parquet(out).collect()}
    assert got == {('img_a', 1), ('img_c', 2), ('img_d', 3),
                   ('img_e', 4)}

    # Batch 2 (new file, restarted query from the same checkpoint):
    # keys 1 and 2 recur -> suppressed by state; key 5 is new.
    spark.createDataFrame(
        [('img_z', 1), ('img_y', 2), ('img_x', 5)], schema) \
        .coalesce(1).write.mode('append').parquet(src)
    stream = (spark.readStream.schema(schema)
              .option('maxFilesPerTrigger', 1).parquet(src))
    deduped = stream_dedup_first_seen(stream, key_cols=('phash',))
    q = (deduped.writeStream.format('parquet')
         .option('path', out).option('checkpointLocation', ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r['image_id'], r['phash'])
           for r in spark.read.parquet(out).collect()}
    assert got == {('img_a', 1), ('img_c', 2), ('img_d', 3),
                   ('img_e', 4), ('img_x', 5)}


def test_stream_batch_dealer_counts_survive_restart(spark, tmp_path):
    """Streaming training-batch dealer: per-(bucket, shard) batch
    numbering continues across micro-batches and query restarts via
    the checkpointed counter state."""
    from pytrs_spark.streaming import stream_batch_dealer

    src = str(tmp_path / 'bsrc')
    out = str(tmp_path / 'bout')
    ckpt = str(tmp_path / 'bckpt')
    schema = 'image_id bigint, bucket_id int, shard int'

    def run():
        stream = (spark.readStream.schema(schema)
                  .option('maxFilesPerTrigger', 1).parquet(src))
        dealt = stream_batch_dealer(stream, batch_size=3)
        q = (dealt.writeStream.format('parquet')
             .option('path', out).option('checkpointLocation', ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    # Batch 1: 5 rows in group (0, 0), 2 in (1, 0)
    spark.createDataFrame(
        [(i, 0, 0) for i in range(1, 6)] + [(10, 1, 0), (11, 1, 0)],
        schema).coalesce(1).write.mode('overwrite').parquet(src)
    run()
    rows = {r.image_id: (r.batch_id, r.pos_in_batch)
            for r in spark.read.parquet(out).collect()}
    assert rows[1] == (0, 0) and rows[2] == (0, 1) and rows[3] == (0, 2)
    assert rows[4] == (1, 0) and rows[5] == (1, 1)
    assert rows[10] == (0, 0) and rows[11] == (0, 1)

    # Batch 2 (restarted query, same checkpoint): counters continue —
    # group (0,0) picks up at rn=5 (batch 1 pos 2), group (1,0) at
    # rn=2 (batch 0 pos 2)
    spark.createDataFrame(
        [(6, 0, 0), (7, 0, 0), (12, 1, 0)], schema) \
        .coalesce(1).write.mode('append').parquet(src)
    run()
    rows = {r.image_id: (r.batch_id, r.pos_in_batch)
            for r in spark.read.parquet(out).collect()}
    assert rows[6] == (1, 2) and rows[7] == (2, 0)
    assert rows[12] == (0, 2)
    assert len(rows) == 10


def test_stream_batch_dealer_restart_mid_stream(spark, tmp_path):
    """Dealer exactly-once under a MID-STREAM kill: a slow-trigger
    query over a 3-file source is stop()ped after its first
    micro-batch commits (later files still unprocessed), then a
    fresh query drains the rest from the same checkpoint.  The file
    sink's commit log + the checkpointed counter must give every row
    exactly once with contiguous per-group numbering -- no gap at
    the interruption point, no replayed duplicates."""
    import time

    from pytrs_spark.streaming import stream_batch_dealer

    src = str(tmp_path / 'msrc')
    out = str(tmp_path / 'mout')
    ckpt = str(tmp_path / 'mckpt')
    schema = 'image_id bigint, bucket_id int, shard int'
    # three source files, one group of 7 rows + one of 2
    files = [[(1, 0, 0), (2, 0, 0), (3, 0, 0)],
             [(4, 0, 0), (10, 1, 0)],
             [(5, 0, 0), (6, 0, 0), (7, 0, 0), (11, 1, 0)]]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode('append').parquet(src)

    def build():
        stream = (spark.readStream.schema(schema)
                  .option('maxFilesPerTrigger', 1).parquet(src))
        return stream_batch_dealer(stream, batch_size=3)

    # leg 1: slow trigger; kill after the first commit
    q = (build().writeStream.format('parquet')
         .option('path', out).option('checkpointLocation', ckpt)
         .trigger(processingTime='2 seconds').start())
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p['numInputRows'] > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    # leg 2: drain everything left from the same checkpoint
    q2 = (build().writeStream.format('parquet')
          .option('path', out).option('checkpointLocation', ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(300)

    rows = spark.read.parquet(out).collect()
    ids = sorted(r.image_id for r in rows)
    assert ids == [1, 2, 3, 4, 5, 6, 7, 10, 11]  # exactly once
    # per group: dealt sequence numbers are contiguous from 0
    for grp, n in ((0, 7), (1, 2)):
        rns = sorted(r.batch_id * 3 + r.pos_in_batch
                     for r in rows if r.bucket_id == grp)
        assert rns == list(range(n)), (grp, rns)
