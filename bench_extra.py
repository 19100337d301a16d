#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds.

bench.py is FROZEN for measurement, so extra instrumentation lives
here: run any subset of the bench rows in isolation (fresh session,
quiet host), time them with the same warm-up + median-of-N
methodology, and optionally dump ``explain('formatted')`` for each to
plans/<tag>/<query>_<suffix>.txt.

Usage:
  python bench_extra.py [--runs N] [--explain TAG:SUFFIX] [query ...]

With no query names, runs every known row.  Timing uses the same
collapsed actions bench.py uses (collect of a hash/count), so numbers
are comparable to bench.py rows; --noop switches the action to a
noop-sink write (guide 1.4) to time full materialization instead.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402  (frozen harness: reuse helpers only)
from bench import CACHE_DIR, CPUS, RUNS, SF_DIR, _median_time  # noqa: E402


def _mk_session():
    from pytrs_spark.session import get_spark
    spark = get_spark('bench-extra', cores=CPUS)
    B._ACTIVE_SPARK = spark
    return spark


def build_queries(spark, runs):
    """Return {name: (df_factory, action)} for the interesting rows.

    df_factory() -> DataFrame (for explain); action() runs the same
    collapsed collect bench.py times.
    """
    from pyspark.sql import functions as F

    from pytrs_spark import datagen
    from pytrs_spark.operators import textops
    from pytrs_spark.pipeline import (
        assign_images_to_tiles,
        polygon_layer_from_descs,
    )

    li_rows = spark.read.parquet(f'{SF_DIR}/lineitem.parquet').count()
    sf_tag = os.path.basename(os.path.normpath(SF_DIR))
    images = B._prepare_images(spark, li_rows, sf_tag)

    docs = spark.read.parquet(f'{SF_DIR}/documents.parquet') \
        .repartition(CPUS).cache()
    docs.count()

    Q = {}

    def reg(name, factory, action=None):
        if action is None:
            def action():  # noqa: ANN001
                factory().write.format('noop').mode('overwrite').save()
        Q[name] = (factory, action)

    # --- tile pipeline ------------------------------------------------
    polygons_box = {}

    def polygons():
        if 'p' not in polygons_box:
            p = polygon_layer_from_descs(datagen.gen_descs(spark))
            p.cache().count()
            polygons_box['p'] = p
        return polygons_box['p']

    reg('polygon_layer_build_warm',
        lambda: polygon_layer_from_descs(datagen.gen_descs(spark)),
        lambda: polygon_layer_from_descs(datagen.gen_descs(spark))
        .select(F.max(F.xxhash64('trs', 'qq'))).collect())
    reg('tile_assign',
        lambda: assign_images_to_tiles(images, polygons()),
        lambda: assign_images_to_tiles(images, polygons())
        .select(F.max(F.xxhash64('image_id', 'trs', 'qq'))).collect())

    from pytrs_spark.spatial.rollup import tile_pyramid
    reg('tile_pyramid',
        lambda: tile_pyramid(
            assign_images_to_tiles(images, polygons(), payload_cols=())),
        lambda: tile_pyramid(
            assign_images_to_tiles(images, polygons(), payload_cols=()))
        .select(F.max(F.xxhash64('twprge', 'sec', 'qq', 'level',
                                 'n_images'))).collect())

    from pytrs_spark.spatial.knn import knn_section_corners
    pts = images.select('image_id', 'phash')
    reg('knn_corners',
        lambda: knn_section_corners(pts, k=4),
        lambda: knn_section_corners(pts, k=4)
        .select(F.max(F.xxhash64('image_id', 'rank'))).collect())

    from pytrs_spark.raster import zonal_pixel_stats
    _zimgs = B._prepare_ramp_images(spark, 200_000)
    _zassign = _zimgs.select(
        'image_id',
        F.format_string('t%03d', (F.col('image_id') % 256).cast('int'))
        .alias('trs'),
        F.element_at(F.array(F.lit('NE'), F.lit('NW'), F.lit('SE'),
                             F.lit('SW')),
                     ((F.col('image_id') / 256) % 4).cast('int') + 1)
        .alias('qq'))
    reg('zonal_stats_200k',
        lambda: zonal_pixel_stats(_zassign, _zimgs),
        lambda: zonal_pixel_stats(_zassign, _zimgs)
        .agg(F.sum('px_sum'), F.sum('n_px')).collect())

    # --- text ---------------------------------------------------------
    reg('minhash_dedup',
        lambda: textops.minhash_lsh_candidates(docs),
        lambda: textops.minhash_lsh_candidates(docs).count())
    reg('repetition_metrics',
        lambda: textops.repetition_metrics(docs.select('doc_id', 'text')),
        lambda: textops.repetition_metrics(docs.select('doc_id', 'text'))
        .select(F.max(F.xxhash64(F.round('top_2gram_char_frac', 6))))
        .collect())
    reg('tfidf_top_terms',
        lambda: textops.tfidf_top_terms(docs),
        lambda: textops.tfidf_top_terms(docs)
        .select(F.max(F.xxhash64('term'))).collect())
    _footered = docs.select(
        'doc_id', F.concat('text', F.lit('\nSHARED FOOTER v1.0'))
        .alias('text'))
    reg('boilerplate_strip',
        lambda: textops.boilerplate_strip(_footered, min_docs=5),
        lambda: textops.boilerplate_strip(_footered, min_docs=5)
        .select(F.max(F.xxhash64('text'))).collect())
    reg('exact_substr',
        lambda: textops.exact_substr_spans(docs, window=40),
        lambda: textops.exact_substr_spans(docs, window=40)
        .select(F.max(F.xxhash64('span_begin', 'span_end'))).collect())
    reg('exact_substr_trim',
        lambda: textops.exact_substr_trim(docs, window=40),
        lambda: textops.exact_substr_trim(docs, window=40)
        .select(F.max(F.xxhash64('text_kept')),
                F.sum('chars_removed')).collect())
    reg('lm_score',
        lambda: textops.bigram_lm_score(docs.select('doc_id', 'text')),
        lambda: textops.bigram_lm_score(docs.select('doc_id', 'text'))
        .select(F.max(F.xxhash64('lm_score'))).collect())
    reg('decontaminate',
        lambda: textops.decontaminate(
            docs.filter(F.col('doc_id') % 13 != 0),
            docs.filter(F.col('doc_id') % 13 == 0), n=8),
        lambda: textops.decontaminate(
            docs.filter(F.col('doc_id') % 13 != 0),
            docs.filter(F.col('doc_id') % 13 == 0), n=8)
        .agg(F.sum('n_hits')).collect())

    _cdocs = spark.range(1_000_000).select(
        F.col('id').alias('doc_id'),
        F.array_join(F.transform(
            F.sequence(F.lit(0), F.lit(80) + (F.col('id') % 40)),
            lambda i: F.concat(F.lit('w'), i)), ' ').alias('text'))
    reg('chunk_docs_1m',
        lambda: textops.chunk_documents(_cdocs, 32, overlap=4),
        lambda: textops.chunk_documents(_cdocs, 32, overlap=4)
        .agg(F.count(F.lit(1)), F.sum('n_tok'),
             F.bit_xor(F.xxhash64('doc_id', 'chunk_id', 'chunk_text')))
        .collect())

    doubled = docs.select('doc_id', 'text').unionByName(
        docs.select((F.col('doc_id') + 10_000_000).alias('doc_id'),
                    'text'))
    reg('near_dup_pairs',
        lambda: textops.near_duplicate_pairs(doubled),
        lambda: textops.near_duplicate_pairs(doubled).count())
    mutated = docs.select('doc_id', 'text').unionByName(
        docs.select((F.col('doc_id') + 10_000_000).alias('doc_id'),
                    F.concat('text', F.lit(' qq tail')).alias('text')))
    reg('jaccard_pairs_exact',
        lambda: textops.ngram_jaccard_pairs(mutated),
        lambda: textops.ngram_jaccard_pairs(mutated).count())
    reg('simhash',
        lambda: docs.select(textops.simhash_col('text').alias('s')),
        lambda: docs.select(textops.simhash_col('text').alias('s'))
        .select(F.max('s')).collect())
    reg('fingerprint',
        lambda: textops.fingerprint(docs),
        lambda: textops.fingerprint(docs)
        .select(F.max('min_window_hash')).collect())

    # --- phash / multimodal ------------------------------------------
    _n31 = F.lit(2147483648)

    def _ph62(k):
        return (k * 2654435761) % _n31 * _n31 + (k * 1597334677) % _n31

    _ph = spark.range(10_000_000).select(
        F.col('id').alias('image_id'),
        F.when(F.col('id') % 50 == 0,
               _ph62(F.col('id') + 1).bitwiseXOR(F.lit(5)))
        .otherwise(_ph62(F.col('id'))).alias('phash'))
    reg('phash_near_dup_10m',
        lambda: textops.hamming_near_dup_pairs(
            _ph, id_col='image_id', hash_col='phash', max_hamming=2),
        lambda: textops.hamming_near_dup_pairs(
            _ph, id_col='image_id', hash_col='phash',
            max_hamming=2).count())

    from pytrs_spark import multimodal as mm
    _mm2 = spark.range(1_000_000).select(
        F.col('id').alias('image_id'),
        F.when(F.col('id') % 50 == 0,
               _ph62(F.col('id') + 1).bitwiseXOR(F.lit(5)))
        .otherwise(_ph62(F.col('id'))).alias('phash'),
        F.when(F.col('id') % 25 == 0,
               F.concat(F.lit('hot caption '),
                        (F.col('id') % 20_000).cast('string')))
        .otherwise(F.concat(F.lit('cap '), F.col('id').cast('string')))
        .alias('caption'))
    reg('multimodal_keep_one_1m',
        lambda: mm.joint_keep_one(_mm2, max_hamming=2),
        lambda: mm.joint_keep_one(_mm2, max_hamming=2)
        .filter('kept').count())

    # --- spatial ------------------------------------------------------
    from pytrs_spark.spatial.dbscan import dbscan as _dbscan
    _dpts = datagen.gen_blob_points(spark, 200_000)
    reg('dbscan_200k',
        lambda: _dbscan(_dpts, eps=0.12, min_pts=4, res=9),
        lambda: _dbscan(_dpts, eps=0.12, min_pts=4, res=9)
        .groupBy('role').count().collect())

    from pytrs_spark.spatial.cluster import EXTENT
    from pytrs_spark.spatial.overlap import zonal_overlap_stats
    zn = 20_000_000
    zdir = os.path.join(CACHE_DIR, f'zorder_{zn}')
    _zext = EXTENT
    _zones = spark.range(25).select(
        F.col('id').alias('zone_id'),
        (F.lit(_zext[0]) + (F.col('id') % 5)
         * ((_zext[2] - _zext[0]) / 5.0)).alias('xmin'),
        (F.lit(_zext[1]) + F.floor(F.col('id') / 5)
         * ((_zext[3] - _zext[1]) / 5.0)).alias('ymin'),
        (F.lit(_zext[0]) + (F.col('id') % 5 + 1)
         * ((_zext[2] - _zext[0]) / 5.0)).alias('xmax'),
        (F.lit(_zext[1]) + (F.floor(F.col('id') / 5) + 1)
         * ((_zext[3] - _zext[1]) / 5.0)).alias('ymax'))
    if os.path.exists(zdir):
        _feat20 = spark.read.parquet(zdir).select(
            F.col('pid').alias('feat_id'),
            (F.xxhash64('pid') % 97).alias('val'),
            F.col('x').alias('xmin'), F.col('y').alias('ymin'),
            (F.col('x') + 0.05).alias('xmax'),
            (F.col('y') + 0.05).alias('ymax'))
        reg('zonal_overlap_20m',
            lambda: zonal_overlap_stats(_zones, _feat20, res=7),
            lambda: zonal_overlap_stats(_zones, _feat20, res=7)
            .agg(F.sum('n_feats')).collect())

    # --- events -------------------------------------------------------
    from pytrs_spark.operators.events import gap_fill, interval_join
    _gev = spark.range(20_000_000).select(
        (F.col('id') % 100_000).alias('user_id'),
        F.timestamp_seconds(1_700_000_000 + (F.col('id') * 131) % 2_592_000)
        .alias('ts'),
        (F.col('id') % 1000).cast('double').alias('value'))
    reg('gap_fill_20m',
        lambda: gap_fill(_gev, step_s=3600),
        lambda: gap_fill(_gev, step_s=3600)
        .agg(F.count(F.lit(1)), F.sum(F.col('is_gap').cast('long')))
        .collect())

    _jbase = 1_704_067_200_000_000
    _jpts = spark.range(20_000_000).select(
        F.col('id').alias('event_id'), (F.col('id') % 64).alias('grp'),
        F.timestamp_micros(
            F.lit(_jbase)
            + (F.col('id') * 40009 % 10_000_000) * 1_000_000)
        .alias('ts'))
    _jstart = F.lit(_jbase) \
        + (F.col('id') * 104729 % 10_000_000) * 1_000_000
    _jiv = spark.range(20_000).select(
        F.col('id').alias('interval_id'), (F.col('id') % 64).alias('grp'),
        F.timestamp_micros(_jstart).alias('start_ts'),
        F.timestamp_micros(
            _jstart + (60 + F.col('id') % 3600) * 1_000_000)
        .alias('end_ts'))
    reg('interval_join_20m',
        lambda: interval_join(_jpts, _jiv, keys=['grp']),
        lambda: interval_join(_jpts, _jiv, keys=['grp']).count())

    # --- sketches / sampling / layout --------------------------------
    from pytrs_spark.operators.sampling import (
        mixture_sample,
        sample_by_hash,
        weighted_sample,
    )
    ids = spark.range(50_000_000).withColumnRenamed('id', 'doc_id')
    reg('sample_hash_50m',
        lambda: sample_by_hash(ids, 'doc_id', 0.01),
        lambda: sample_by_hash(ids, 'doc_id', 0.01).count())
    grp = ids.withColumn('grp', (F.col('doc_id') % 4).cast('string'))
    reg('mixture_sample_50m',
        lambda: mixture_sample(grp, 'grp', 'doc_id',
                               {'0': 0.5, '1': 0.3, '2': 0.2},
                               budget=100_000, salt=3),
        lambda: mixture_sample(grp, 'grp', 'doc_id',
                               {'0': 0.5, '1': 0.3, '2': 0.2},
                               budget=100_000, salt=3).count())
    _wrows = spark.range(50_000_000).select(
        F.col('id').alias('doc_id'), (1 + F.col('id') % 32).alias('wt'))
    reg('weighted_sample_50m',
        lambda: weighted_sample(_wrows, 'doc_id', 'wt', k=1000,
                                max_weight=32),
        lambda: weighted_sample(_wrows, 'doc_id', 'wt', k=1000,
                                max_weight=32).count())

    from pytrs_spark.operators.stats import (
        bloom_contains,
        bloom_sketch,
        cms_sketch,
        quantiles_exact,
    )
    _big = spark.range(50_000_000).select(
        (F.col('id') % 97_003).alias('k'),
        ((F.col('id') * 1299709 % 9973).cast('double') / 7.0)
        .alias('v'))
    reg('cms_sketch_50m',
        lambda: cms_sketch(_big, 'k', depth=4, width=1024),
        lambda: cms_sketch(_big, 'k', depth=4, width=1024)
        .select(F.sum('n')).collect())
    reg('quantiles_exact_50m',
        lambda: quantiles_exact(_big, 'v', (0.25, 0.5, 0.99),
                                n_bins=1024),
        lambda: quantiles_exact(_big, 'v', (0.25, 0.5, 0.99),
                                n_bins=1024).count())
    _bmem = spark.range(5_000_000).withColumnRenamed('id', 'k')
    reg('bloom_build_5m',
        lambda: bloom_sketch(_bmem, 'k', n_words=65536, depth=4),
        lambda: bloom_sketch(_bmem, 'k', n_words=65536, depth=4)
        .select(F.sum('bits')).collect())
    _bsk_box = {}

    def _bsk():
        if 'b' not in _bsk_box:
            b = bloom_sketch(_bmem, 'k', n_words=65536, depth=4).persist()
            b.count()
            _bsk_box['b'] = b
        return _bsk_box['b']

    _bprobe = spark.range(50_000_000).select(
        (F.col('id') * 7 % 49_999_991).alias('k'))
    reg('bloom_probe_50m',
        lambda: bloom_contains(_bsk(), _bprobe, 'k', n_words=65536,
                               depth=4),
        lambda: bloom_contains(_bsk(), _bprobe, 'k', n_words=65536,
                               depth=4).filter('might_contain').count())

    from pytrs_spark.operators.imageops import aspect_bucket, pack_patches
    _imgs20 = spark.range(20_000_000).select(
        F.col('id').alias('image_id'),
        (64 + (F.col('id') * 7919) % 1985).alias('w'),
        (64 + (F.col('id') * 104729) % 1985).alias('h'))
    reg('aspect_bucket_20m',
        lambda: aspect_bucket(_imgs20, batch_size=64, n_shards=64),
        lambda: aspect_bucket(_imgs20, batch_size=64, n_shards=64)
        .agg(F.count(F.lit(1)), F.max('batch_id'),
             F.bit_xor(F.xxhash64('image_id', 'bucket_id', 'batch_id')))
        .collect())
    reg('pack_patches_20m',
        lambda: pack_patches(_imgs20, budget=8192, patch=32, n_shards=64),
        lambda: pack_patches(_imgs20, budget=8192, patch=32, n_shards=64)
        .agg(F.count(F.lit(1)), F.max('seq_id'),
             F.bit_xor(F.xxhash64('image_id', 'seq_id', 'tok_offset')))
        .collect())

    from pytrs_spark.operators.io import shard_by_bytes
    _blobs20 = spark.range(20_000_000).select(
        F.col('id').alias('image_id'),
        (1024 + (F.col('id') * 2654435761) % 1048576).alias('nbytes'))
    reg('shard_by_bytes_20m',
        lambda: shard_by_bytes(_blobs20, 'nbytes', 'image_id',
                               target_bytes=1 << 32),
        lambda: shard_by_bytes(_blobs20, 'nbytes', 'image_id',
                               target_bytes=1 << 32)
        .agg(F.max('shard'),
             F.bit_xor(F.xxhash64('image_id', 'shard',
                                  'offset_in_shard'))).collect())

    # --- ANN ----------------------------------------------------------
    from pytrs_spark.operators.ann import (
        brute_force_topk,
        embedding_near_dup_pairs,
        semdedup,
    )
    emb = spark.read.parquet(f'{SF_DIR}/embeddings.parquet')
    q = emb.filter(F.col('vec_id') < 8).select(
        F.col('vec_id').alias('query_id'), 'embedding')
    reg('ann_topk',
        lambda: brute_force_topk(emb, q, k=10),
        lambda: brute_force_topk(emb, q, k=10).count())
    reg('dedup_embedding',
        lambda: embedding_near_dup_pairs(emb, threshold=0.4),
        lambda: embedding_near_dup_pairs(emb, threshold=0.4).count())
    reg('semdedup',
        lambda: semdedup(emb, n_cells=64, threshold=0.4),
        lambda: semdedup(emb, n_cells=64, threshold=0.4)
        .filter('kept').count())

    return Q


def main():
    args = sys.argv[1:]
    runs = RUNS
    explain_tag = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == '--runs':
            runs = int(args[i + 1])
            i += 2
        elif args[i] == '--explain':
            explain_tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = _mk_session()
    Q = build_queries(spark, runs)
    todo = names or list(Q)
    out = {}
    for name in todo:
        if name not in Q:
            print(f'!! unknown query {name}', file=sys.stderr)
            continue
        factory, action = Q[name]
        if explain_tag:
            tag, suffix = explain_tag.split(':')
            pdir = os.path.join(REPO, 'plans', tag)
            os.makedirs(pdir, exist_ok=True)
            import io
            from contextlib import redirect_stdout
            buf = io.StringIO()
            with redirect_stdout(buf):
                factory().explain('formatted')
            txt = buf.getvalue()
            with open(os.path.join(pdir, f'{name}_{suffix}.txt'),
                      'w') as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(name)
        t = _median_time(action, runs=runs)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(t, 3)
        print(f'{name}: {t:.3f}s', flush=True)
    print(json.dumps({'queries': out, 'sf': SF_DIR, 'cpus': CPUS,
                      'runs': runs}))


if __name__ == '__main__':
    main()
