"""Image-caption alignment filter (multimodal.alignment_filter).

The CLIP-score curation stage: cosine between the image and caption
embedding columns of one row; fixed-threshold and per-group
top-fraction calibration modes.  Null / ragged / zero-norm vectors
score null, are never kept, and never count toward a group's n.
"""

import math

import pytest
from pyspark.sql import functions as F

from pytrs_spark import multimodal


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, 'image_id long, grp string, image_emb array<float>, '
              'caption_emb array<float>')


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
        sum(y * y for y in b))
    return num / den


BASE = [
    (1, 'en', [1.0, 0.0], [1.0, 0.0]),     # cos 1.0
    (2, 'en', [1.0, 0.0], [1.0, 1.0]),     # cos ~0.707
    (3, 'en', [1.0, 0.0], [0.0, 1.0]),     # cos 0.0
    (4, 'en', [1.0, 0.0], [-1.0, 0.0]),    # cos -1.0
    (5, 'de', [0.0, 2.0], [0.0, 1.0]),     # cos 1.0
    (6, 'de', [1.0, 1.0], [1.0, 0.0]),     # cos ~0.707
]


def test_threshold_mode(spark):
    out = multimodal.alignment_filter(
        _pairs(spark, BASE), threshold=0.5).collect()
    kept = {r['image_id']: r['alignment'] for r in out}
    assert set(kept) == {1, 2, 5, 6}
    for r in BASE:
        if r[0] in kept:
            assert kept[r[0]] == pytest.approx(_cos(r[2], r[3]))


def test_invalid_vectors_never_kept(spark):
    rows = BASE + [
        (7, 'en', None, [1.0, 0.0]),           # null side
        (8, 'en', [0.0, 0.0], [1.0, 0.0]),     # zero norm
        (9, 'en', [1.0, 0.0, 0.0], [1.0, 0.0]),  # ragged dim
    ]
    out = multimodal.alignment_filter(
        _pairs(spark, rows), threshold=-2.0).collect()
    assert {r['image_id'] for r in out} == {1, 2, 3, 4, 5, 6}
    scored = multimodal.alignment_scores(_pairs(spark, rows)) \
        .filter(F.col('alignment').isNull()).collect()
    assert {r['image_id'] for r in scored} == {7, 8, 9}


def test_top_frac_per_group(spark):
    # en: 4 valid scores -> ceil(0.5*4)=2 kept; de: 2 -> 1 kept.
    out = multimodal.alignment_filter(
        _pairs(spark, BASE), top_frac=0.5, by='grp').collect()
    assert {r['image_id'] for r in out} == {1, 2, 5}


def test_top_frac_ignores_null_scores_in_n(spark):
    # grp 'en' has 2 valid + 2 invalid rows: n must be 2, so
    # top_frac=0.5 keeps exactly 1 row (the best-aligned), not 2.
    rows = [
        (1, 'en', [1.0, 0.0], [1.0, 0.0]),
        (2, 'en', [1.0, 0.0], [1.0, 1.0]),
        (3, 'en', None, [1.0, 0.0]),
        (4, 'en', [0.0, 0.0], [1.0, 0.0]),
    ]
    out = multimodal.alignment_filter(
        _pairs(spark, rows), top_frac=0.5, by='grp').collect()
    assert [r['image_id'] for r in out] == [1]


def test_top_frac_deterministic_tie_break(spark):
    # Two rows with the identical score: the smaller id wins the
    # single kept slot.
    rows = [
        (10, 'en', [1.0, 0.0], [1.0, 0.0]),
        (11, 'en', [2.0, 0.0], [3.0, 0.0]),
    ]
    out = multimodal.alignment_filter(
        _pairs(spark, rows), top_frac=0.5, by='grp').collect()
    assert [r['image_id'] for r in out] == [10]


def test_mode_validation(spark):
    df = _pairs(spark, BASE)
    with pytest.raises(ValueError):
        multimodal.alignment_filter(df)
    with pytest.raises(ValueError):
        multimodal.alignment_filter(df, threshold=0.1, top_frac=0.5)
    with pytest.raises(ValueError):
        multimodal.alignment_filter(df, top_frac=0.5)  # no group key
    with pytest.raises(ValueError):
        multimodal.alignment_filter(df, top_frac=1.5, by='grp')


def test_threshold_plan_has_no_exchange(spark):
    plan = multimodal.alignment_filter(
        _pairs(spark, BASE), threshold=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan


def test_threshold_plan_single_udf_eval(spark):
    # the score-then-filter shape must evaluate the cosine kernel
    # ONCE (a deterministic-UDF filter gets pushed below the
    # projection and re-runs the kernel -- cosine_scan barrier)
    plan = multimodal.alignment_filter(
        _pairs(spark, BASE), threshold=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count('ArrowEvalPython') == 1


def test_threshold_from_sample_values(spark):
    # sample_rate=1.0 keeps every row deterministic, so the
    # calibrated threshold is exactly the rank-ceil(q*n) score
    thr = multimodal.alignment_threshold_from_sample(
        _pairs(spark, BASE), 'grp', top_frac=0.5, sample_rate=1.0)
    got = {r['grp']: (round(r['threshold'], 6), r['n_sampled'])
           for r in thr.collect()}
    # en: scores [1.0, .707, 0.0, -1.0], ceil(.5*4)=2 -> .707
    # de: scores [1.0, .707], ceil(.5*2)=1 -> 1.0
    assert got == {'en': (round(_cos([1.0, 0.0], [1.0, 1.0]), 6), 4),
                   'de': (1.0, 2)}


def test_threshold_from_sample_null_scores_excluded(spark):
    rows = BASE + [(7, 'de', None, [1.0, 0.0]),
                   (8, 'fr', None, [1.0, 0.0])]  # fr: only invalid
    thr = multimodal.alignment_threshold_from_sample(
        _pairs(spark, rows), 'grp', top_frac=0.5, sample_rate=1.0)
    got = {r['grp']: r['n_sampled'] for r in thr.collect()}
    # null score doesn't count toward n; all-null group gets no row
    assert got == {'en': 4, 'de': 2}


def test_calibrated_filter_matches_threshold_rerun(spark):
    # at sample_rate=1.0 the calibrated filter keeps exactly the
    # rows a manual threshold re-run would
    rows = [(i, 'en',
             [1.0, 0.0],
             [math.cos(i / 7.0), math.sin(i / 7.0)])
            for i in range(40)]
    cal = multimodal.alignment_filter_calibrated(
        _pairs(spark, rows), 'grp', top_frac=0.3, sample_rate=1.0)
    thr = multimodal.alignment_threshold_from_sample(
        _pairs(spark, rows), 'grp', top_frac=0.3, sample_rate=1.0) \
        .collect()[0]['threshold']
    manual = multimodal.alignment_filter(
        _pairs(spark, rows), threshold=thr)
    assert (sorted(r['image_id'] for r in cal.collect())
            == sorted(r['image_id'] for r in manual.collect()))
    # ~top_frac of the group kept (exact here: full sample)
    assert cal.count() == math.ceil(0.3 * 40 - 1e-9)


def test_calibrated_plan_shape(spark):
    # corpus side: broadcast threshold attach + scan filter, ONE
    # cosine eval; the only hash exchange is the sample leg's
    # group-key window
    cal = multimodal.alignment_filter_calibrated(
        _pairs(spark, BASE), 'grp', top_frac=0.5, sample_rate=0.5)
    plan = cal._jdf.queryExecution().executedPlan().toString()
    assert plan.count('Exchange hashpartitioning') == 1
    assert 'BroadcastExchange' in plan
    # one kernel eval on the sample leg + one on the corpus leg
    assert plan.count('ArrowEvalPython') == 2


def test_cosine_determinism_split(spark):
    """asNondeterministic() mutates its receiver in place: the ND
    scan clone must be a SEPARATE instance so ranking paths keep a
    deterministic UDF (and its pushdown).  Pins both flags and the
    plans: a key filter over alignment_scores pushes below the
    scoring projection; over the threshold path it must not re-split
    the kernel."""
    import pytrs_spark.operators.ann as A
    assert A._cosine_udf.deterministic is True
    assert A._cosine_udf_nd.deterministic is False
    # deterministic scoring: cheap key predicate reaches the scan
    scored = multimodal.alignment_scores(_pairs(spark, BASE))
    plan = scored.filter(F.col('image_id') < 3) \
        ._jdf.queryExecution().executedPlan().toString()
    scan_part = plan.split('ArrowEvalPython')[-1]
    assert 'image_id' in scan_part and 'Filter' in scan_part
    # ND threshold path: still exactly one kernel evaluation
    plan2 = multimodal.alignment_filter(
        _pairs(spark, BASE), threshold=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan2.count('ArrowEvalPython') == 1


def test_calibration_validation(spark):
    df = _pairs(spark, BASE)
    with pytest.raises(ValueError):
        multimodal.alignment_threshold_from_sample(
            df, None, top_frac=0.5, sample_rate=1.0)   # no group key
    with pytest.raises(ValueError):
        multimodal.alignment_threshold_from_sample(
            df, 'grp', top_frac=0.0, sample_rate=1.0)  # frac range
    with pytest.raises(ValueError):
        multimodal.alignment_threshold_from_sample(
            df, 'grp', top_frac=0.5, sample_rate=1.5)  # rate range
