"""T33 aspect bucketing, T34 patch packing, T35 byte sharding,
G20 zonal overlap, E15 gap fill -- semantics pinned against plain
Python re-derivations (the DuckDB oracles in __spark_entry__.py gate
the same contracts against SQL)."""

import math

import pytest
from pyspark.sql import Row, Window, functions as F

from pytrs_spark.operators.imageops import (
    SDXL_BUCKETS, aspect_bucket, pack_patches,
)


def _geo(spark, n=300):
    return spark.range(1, n + 1).select(
        F.col('id').alias('image_id'),
        (64 + (F.col('id') * 7919) % 1985).alias('w'),
        (64 + (F.col('id') * 104729) % 1985).alias('h'))


BUCKETS = [(256, 1024), (384, 768), (512, 512), (768, 384), (1024, 256)]


class TestAspectBucket:
    def test_bucket_is_log_aspect_argmin(self, spark):
        rows = aspect_bucket(_geo(spark), BUCKETS, batch_size=4,
                             n_shards=2).collect()
        assert len(rows) == 300
        for r in rows:
            dists = [abs(math.log(r.w / r.h) - math.log(bw / bh))
                     for bw, bh in BUCKETS]
            # symmetric-ratio argmin == log-aspect argmin
            assert dists[r.bucket_id] == pytest.approx(min(dists))

    def test_cover_resize_and_center_crop(self, spark):
        for r in aspect_bucket(_geo(spark), BUCKETS).collect():
            # cover: both resized dims reach the bucket, one exactly
            assert r.resize_w >= r.bucket_w and r.resize_h >= r.bucket_h
            assert r.resize_w == r.bucket_w or r.resize_h == r.bucket_h
            # exact round-half-up of the scaled side
            if r.resize_h == r.bucket_h and r.resize_w != r.bucket_w:
                assert r.resize_w == (2 * r.w * r.bucket_h + r.h) \
                    // (2 * r.h)
            # crop centers inside the resize box
            assert r.crop_x == (r.resize_w - r.bucket_w) // 2
            assert r.crop_y == (r.resize_h - r.bucket_h) // 2
            # aspect preserved to within the rounding half-pixel
            got = r.resize_w / r.resize_h
            want = r.w / r.h
            assert abs(got - want) <= 1.0 / min(r.resize_h, r.resize_w) \
                * max(got, want) + 1e-9

    def test_batches_are_dense_and_sized(self, spark):
        out = aspect_bucket(_geo(spark), BUCKETS, batch_size=4,
                            n_shards=2).collect()
        groups = {}
        for r in out:
            groups.setdefault((r.bucket_id, r.shard, r.batch_id),
                              []).append(r)
        for (b, s, k), rows in groups.items():
            assert sorted(r.pos_in_batch for r in rows) \
                == list(range(len(rows)))
            assert len(rows) <= 4
            # only the trailing batch of a (bucket, shard) is short
            if len(rows) < 4:
                assert all(kk <= k for (bb, ss, kk) in groups
                           if (bb, ss) == (b, s))
        # deterministic: ids sort within each (bucket, shard) batch seq
        for (b, s) in {(r.bucket_id, r.shard) for r in out}:
            seq = sorted(((r.batch_id, r.pos_in_batch), r.image_id)
                         for r in out
                         if (r.bucket_id, r.shard) == (b, s))
            ids = [i for _, i in seq]
            assert ids == sorted(ids)

    def test_degenerate_dims_dropped_and_validation(self, spark):
        df = spark.createDataFrame(
            [Row(image_id=1, w=0, h=5), Row(image_id=2, w=5, h=-3),
             Row(image_id=3, w=7, h=7)])
        out = aspect_bucket(df, BUCKETS).collect()
        assert [r.image_id for r in out] == [3]
        with pytest.raises(ValueError):
            aspect_bucket(df, [])
        with pytest.raises(ValueError):
            aspect_bucket(df, BUCKETS, batch_size=0)

    def test_default_bucket_list(self, spark):
        out = aspect_bucket(_geo(spark, 50)).collect()
        assert all(0 <= r.bucket_id < len(SDXL_BUCKETS) for r in out)


def _next_fit_ref(items, budget):
    """Plain-Python next-fit: [(id, seq, off)] in id order."""
    out, base, seq = [], 0, 0
    for i, t in items:
        if base + t > budget and base > 0:
            seq, base = seq + 1, 0
        out.append((i, seq, base))
        base += t
    return out


class TestPackPatches:
    def test_offset_mode_arithmetic(self, spark):
        out = pack_patches(_geo(spark), budget=8192, patch=32,
                           n_shards=2).collect()
        assert len(out) == 300
        by_shard = {}
        for r in sorted(out, key=lambda r: (r.shard, r.image_id)):
            s = by_shard.setdefault(r.shard, 0)
            assert r.n_tok == math.ceil(r.patch_cols) \
                * math.ceil(r.patch_rows)
            assert r.seq_id == s // 8192
            assert r.tok_offset == s % 8192
            by_shard[r.shard] = s + r.n_tok

    def test_strict_mode_equals_next_fit(self, spark):
        out = pack_patches(_geo(spark), budget=8192, patch=32,
                           n_shards=2, mode='strict').collect()
        shards = {}
        for r in out:
            shards.setdefault(r.shard, []).append(r)
        for rows in shards.values():
            rows.sort(key=lambda r: r.image_id)
            ref = _next_fit_ref([(r.image_id, r.n_tok) for r in rows],
                                8192)
            got = [(r.image_id, r.seq_id, r.tok_offset) for r in rows]
            assert got == ref

    def test_strict_budget_holds_except_singletons(self, spark):
        out = pack_patches(_geo(spark), budget=2048, patch=16,
                           n_shards=2, mode='strict')
        agg = out.groupBy('shard', 'seq_id').agg(
            F.sum('n_tok').alias('t'), F.count('*').alias('n')).collect()
        for r in agg:
            assert r.t <= 2048 or r.n == 1

    def test_oversize_images_are_singletons(self, spark):
        df = spark.createDataFrame(
            [Row(image_id=i, w=3200, h=3200) for i in range(1, 5)])
        out = pack_patches(df, budget=100, patch=16,
                           n_shards=1, mode='strict').collect()
        assert sorted(r.seq_id for r in out) == [0, 1, 2, 3]
        assert all(r.tok_offset == 0 for r in out)

    def test_modes_share_tokenization(self, spark):
        a = pack_patches(_geo(spark), 4096, patch=32, n_shards=2) \
            .select('image_id', 'n_tok')
        b = pack_patches(_geo(spark), 4096, patch=32, n_shards=2,
                         mode='strict').select('image_id', 'n_tok')
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_mode_validation(self, spark):
        with pytest.raises(ValueError):
            pack_patches(_geo(spark), 0)
        with pytest.raises(ValueError):
            pack_patches(_geo(spark), 10, mode='greedy')


class TestShardByBytes:
    def _blobs(self, spark, n=500):
        return spark.range(1, n + 1).select(
            F.col('id').alias('k'),
            (100 + (F.col('id') * 2654435761) % 5000).alias('nb'))

    def test_matches_ordered_cumsum(self, spark):
        from pytrs_spark.operators.io import shard_by_bytes
        out = shard_by_bytes(self._blobs(spark), 'nb', 'k',
                             target_bytes=10_000).collect()
        out.sort(key=lambda r: r.k)
        cum = 0
        for r in out:
            assert r.shard == cum // 10_000
            assert r.offset_in_shard == cum % 10_000
            cum += r.nbytes

    def test_n_shards_targets_ceil_total(self, spark):
        from pytrs_spark.operators.io import shard_by_bytes
        blobs = self._blobs(spark)
        total = blobs.agg(F.sum('nb')).collect()[0][0]
        out = shard_by_bytes(blobs, 'nb', 'k', n_shards=7)
        shards = out.groupBy('shard').agg(
            F.sum('nbytes').alias('b')).collect()
        assert len(shards) <= 7
        tgt = (total + 6) // 7
        mx = max(r.nbytes for r in out.collect())
        assert all(r.b <= tgt + mx for r in shards)

    def test_binary_column_uses_octet_length(self, spark):
        from pytrs_spark.operators.io import shard_by_bytes
        df = spark.createDataFrame(
            [Row(k=1, payload=b'abc'), Row(k=2, payload=b'de'),
             Row(k=3, payload=None)])
        out = {r.k: r for r in
               shard_by_bytes(df, 'payload', 'k',
                              target_bytes=4).collect()}
        assert out[1].nbytes == 3 and out[2].nbytes == 2
        assert out[3].nbytes == 0
        assert out[1].shard == 0
        assert out[2].shard == 0 and out[2].offset_in_shard == 3
        assert out[3].shard == 1

    def test_validation(self, spark):
        from pytrs_spark.operators.io import shard_by_bytes
        with pytest.raises(ValueError):
            shard_by_bytes(self._blobs(spark), 'nb', 'k')
        with pytest.raises(ValueError):
            shard_by_bytes(self._blobs(spark), 'nb', 'k',
                           target_bytes=5, n_shards=3)


class TestZonalOverlap:
    def test_matches_bruteforce(self, spark):
        from pytrs_spark.spatial.overlap import zonal_overlap_stats
        zs = [(z, float((z % 3) * 4), float((z // 3) * 4),
               float((z % 3) * 4 + 6), float((z // 3) * 4 + 6))
              for z in range(9)]
        fs = [(i, 1 + i % 7,
               (i * 13 % 160) / 16.0, (i * 29 % 160) / 16.0,
               (i * 13 % 160) / 16.0 + (1 + i % 16) / 16.0,
               (i * 29 % 160) / 16.0 + (1 + (i // 16) % 16) / 16.0)
              for i in range(400)]
        zones = spark.createDataFrame(
            zs, 'zone_id int, xmin double, ymin double, '
                'xmax double, ymax double')
        feats = spark.createDataFrame(
            fs, 'feat_id int, val int, xmin double, ymin double, '
                'xmax double, ymax double')
        got = {r.zone_id: r for r in
               zonal_overlap_stats(zones, feats, res=7).collect()}
        want = {}
        for z, zx0, zy0, zx1, zy1 in zs:
            n = a = va = 0
            for i, v, fx0, fy0, fx1, fy1 in fs:
                dx = min(zx1, fx1) - max(zx0, fx0)
                dy = min(zy1, fy1) - max(zy0, fy0)
                if dx > 0 and dy > 0:
                    n += 1
                    a += dx * dy
                    va += v * dx * dy
            if n:
                want[z] = (n, a, va)
        assert set(got) == set(want)
        for z, (n, a, va) in want.items():
            assert got[z].n_feats == n
            assert got[z].area_sum == pytest.approx(a)
            assert got[z].val_area_sum == pytest.approx(va)
            assert got[z].area_wmean == pytest.approx(va / a)

    def test_edge_touch_excluded(self, spark):
        from pytrs_spark.spatial.overlap import zonal_overlap_stats
        zones = spark.createDataFrame(
            [(0, 0.0, 0.0, 1.0, 1.0)],
            'zone_id int, xmin double, ymin double, xmax double, '
            'ymax double')
        feats = spark.createDataFrame(
            [(1, 5, 1.0, 0.0, 2.0, 1.0),     # shares the x=1 edge
             (2, 5, 0.5, 0.5, 1.5, 1.5)],    # real overlap
            'feat_id int, val int, xmin double, ymin double, '
            'xmax double, ymax double')
        out = zonal_overlap_stats(zones, feats).collect()
        assert len(out) == 1 and out[0].n_feats == 1
        assert out[0].area_sum == pytest.approx(0.25)


class TestGapFill:
    def test_forward_fill_semantics(self, spark):
        from pytrs_spark.operators.events import gap_fill
        rows = [
            # user 1: obs in buckets 0, 3 (gap at 1, 2), two obs in 0
            Row(user_id=1, ts='2024-01-01 00:10:00', value=1.0),
            Row(user_id=1, ts='2024-01-01 00:50:00', value=2.0),
            Row(user_id=1, ts='2024-01-01 03:30:00', value=9.0),
            # user 2: single obs -> single grid row
            Row(user_id=2, ts='2024-01-01 05:05:00', value=7.0),
        ]
        df = spark.createDataFrame(rows).select(
            'user_id', F.col('ts').cast('timestamp').alias('ts'),
            'value')
        out = sorted(gap_fill(df, step_s=3600).collect(),
                     key=lambda r: (r.key, r.bucket))
        u1 = [r for r in out if r.key == 1]
        assert [r.bucket - u1[0].bucket for r in u1] == [0, 1, 2, 3]
        assert [r.value for r in u1] == [2.0, 2.0, 2.0, 9.0]
        assert [r.is_gap for r in u1] == [False, True, True, False]
        assert [r.grid_ts_s for r in u1] \
            == [r.bucket * 3600 for r in u1]
        u2 = [r for r in out if r.key == 2]
        assert len(u2) == 1 and u2[0].value == 7.0 and not u2[0].is_gap

    def test_never_null_and_bounds(self, spark):
        from pytrs_spark.operators.events import gap_fill
        import random
        rnd = random.Random(7)
        data = [Row(user_id=u, ts=f'2024-01-{1 + rnd.randrange(20):02d}'
                    f' {rnd.randrange(24):02d}:00:00',
                    value=float(rnd.randrange(100)))
                for u in range(1, 6) for _ in range(8)]
        df = spark.createDataFrame(data).select(
            'user_id', F.col('ts').cast('timestamp').alias('ts'),
            'value')
        out = gap_fill(df, step_s=86400)
        assert out.filter(F.col('value').isNull()).count() == 0
        # first grid row of every key is an observation
        firsts = out.withColumn(
            'rn', F.row_number().over(
                Window.partitionBy('key').orderBy('bucket'))) \
            .filter('rn = 1')
        assert firsts.filter('is_gap').count() == 0


class TestPlanShapes:
    """Pin the scale-critical plan shapes: exchange counts and the
    slim batch-window projection (the operators' 100-TB contracts)."""

    @staticmethod
    def _plan(df):
        import contextlib
        import io as _io
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain('formatted')
        return buf.getvalue()

    def test_aspect_bucket_single_skinny_exchange(self, spark):
        import re
        p = self._plan(aspect_bucket(_geo(spark), BUCKETS,
                                     batch_size=8, n_shards=4))
        ex = re.findall(r'\(\d+\) Exchange\b', p)
        assert len(ex) == 1
        # the exchanged projection is the slim 5-column row, not the
        # full geometry: no resize/crop columns below the Window
        win = p.index(') Window')
        pre = p[p.index(') Exchange'):p.index('\n', win)]
        assert 'resize_w' not in pre.split('Window')[0]

    def test_pack_patches_offset_single_exchange(self, spark):
        import re
        p = self._plan(pack_patches(_geo(spark), 4096, patch=32,
                                    n_shards=4))
        assert len(re.findall(r'\(\d+\) Exchange\b', p)) == 1
        assert 'BatchEvalPython' not in p and 'ArrowEval' not in p

    def test_shard_by_bytes_numeric_single_data_exchange(self, spark):
        import re
        from pytrs_spark.operators.io import shard_by_bytes
        blobs = spark.range(10_000).select(
            F.col('id').alias('k'), (F.col('id') % 100 + 1).alias('nb'))
        p = self._plan(shard_by_bytes(blobs, 'nb', 'k',
                                      target_bytes=10_000))
        assert len(re.findall(r'hashpartitioning\(_bkt', p)) == 1
        assert 'rangepartitioning' not in p

    def test_zonal_overlap_feature_side_never_shuffles(self, spark):
        from pytrs_spark.spatial.overlap import zonal_overlap_stats
        zones = spark.createDataFrame(
            [(0, 0.0, 0.0, 5.0, 5.0)],
            'zone_id int, xmin double, ymin double, xmax double, '
            'ymax double')
        feats = spark.range(100).select(
            F.col('id').alias('feat_id'), (F.col('id') % 7).alias('val'),
            (F.col('id') % 10).cast('double').alias('xmin'),
            (F.col('id') % 11).cast('double').alias('ymin'),
            ((F.col('id') % 10) + 1.0).alias('xmax'),
            ((F.col('id') % 11) + 1.0).alias('ymax'))
        p = self._plan(zonal_overlap_stats(zones, feats))
        assert 'BroadcastExchange' in p
        # the only hash exchange is the zone-key partial agg -- the
        # exploded feature side joins broadcast-side without moving
        import re
        hashes = re.findall(r'hashpartitioning\((\w+)', p)
        assert hashes and all(h.startswith('zone_id') for h in hashes)


class TestWriteSharded:
    def test_layout_and_order(self, spark, tmp_path):
        from pytrs_spark.operators.io import write_sharded
        df = spark.range(1, 501).select(
            F.col('id').alias('k'),
            (100 + (F.col('id') * 2654435761) % 5000).alias('nb'),
            F.concat(F.lit('payload'), F.col('id')).alias('body'))
        path = str(tmp_path / 'export')
        man = write_sharded(df, path, 'nb', 'k', target_bytes=100_000)
        assert man['rows'] == 500
        back = spark.read.parquet(path)
        assert back.count() == 500
        shards = sorted(r.shard for r in
                        back.select('shard').distinct().collect())
        assert shards == list(range(man['n_shards']))
        # shard contents match the pure assignment, ids contiguous
        from pytrs_spark.operators.io import shard_by_bytes
        want = {r.k: r.shard for r in
                shard_by_bytes(df, 'nb', 'k',
                               target_bytes=100_000).collect()}
        got = {r.k: r.shard for r in back.select('k', 'shard').collect()}
        assert got == want
        # contiguity: max id of shard s < min id of shard s+1
        bounds = sorted(
            (r.shard, r.lo, r.hi) for r in back.groupBy('shard').agg(
                F.min('k').alias('lo'), F.max('k').alias('hi'))
            .collect())
        for (s1, _, hi1), (s2, lo2, _) in zip(bounds, bounds[1:]):
            assert hi1 < lo2


class TestRobustness:
    """Partitioning-independence + edge semantics the oracles can't
    easily reach."""

    def test_pack_patches_partition_independent(self, spark):
        base = _geo(spark)
        a = pack_patches(base, 4096, patch=32, n_shards=4)
        b = pack_patches(base.repartition(7), 4096, patch=32,
                         n_shards=4)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_aspect_bucket_partition_independent(self, spark):
        base = _geo(spark)
        a = aspect_bucket(base, BUCKETS, batch_size=4, n_shards=4)
        b = aspect_bucket(base.repartition(7), BUCKETS, batch_size=4,
                          n_shards=4)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_aspect_tie_breaks_to_lower_bucket_index(self, spark):
        # two buckets with IDENTICAL aspect ratio: index wins
        square2 = [(512, 512), (1024, 1024)]
        out = aspect_bucket(
            spark.createDataFrame([Row(image_id=1, w=300, h=300)]),
            square2).collect()
        assert out[0].bucket_id == 0

    def test_shard_by_bytes_partition_independent(self, spark):
        from pytrs_spark.operators.io import shard_by_bytes
        blobs = spark.range(1, 2001).select(
            F.col('id').alias('k'),
            (100 + (F.col('id') * 2654435761) % 5000).alias('nb'))
        a = shard_by_bytes(blobs, 'nb', 'k', target_bytes=25_000)
        b = shard_by_bytes(blobs.repartition(5), 'nb', 'k',
                           target_bytes=25_000)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_gap_fill_null_values_forward_fill_through(self, spark):
        from pytrs_spark.operators.events import gap_fill
        rows = [
            Row(user_id=1, ts='2024-01-01 00:10:00', value=4.0),
            # bucket 1's only obs has a NULL value: an observed null
            # is still an observation (is_gap=False) and the null is
            # carried as the bucket's value, exactly as recorded
            Row(user_id=1, ts='2024-01-01 01:10:00', value=None),
            Row(user_id=1, ts='2024-01-01 02:10:00', value=9.0),
        ]
        df = spark.createDataFrame(
            rows, 'user_id int, ts string, value double').select(
            'user_id', F.col('ts').cast('timestamp').alias('ts'),
            'value')
        out = sorted(gap_fill(df, step_s=3600).collect(),
                     key=lambda r: r.bucket)
        assert [r.value for r in out] == [4.0, None, 9.0]
        assert [r.is_gap for r in out] == [False, False, False]

    def test_gap_fill_same_ts_ties_prefer_larger_value(self, spark):
        from pytrs_spark.operators.events import gap_fill
        rows = [Row(user_id=1, ts='2024-01-01 00:10:00', value=2.0),
                Row(user_id=1, ts='2024-01-01 00:10:00', value=7.0)]
        df = spark.createDataFrame(
            rows, 'user_id int, ts string, value double').select(
            'user_id', F.col('ts').cast('timestamp').alias('ts'),
            'value')
        out = gap_fill(df, step_s=3600).collect()
        assert len(out) == 1 and out[0].value == 7.0
