"""Scale-hazard guards: MinHash LSH hot-bucket bounding (a dedup
corpus guarantees giant buckets of identical docs) and the batched,
constant-job-count lineage runner."""

import pytest
from pyspark.sql import functions as F

from pytrs_spark.lineage import run_checkpointed
from pytrs_spark.operators import textops


def test_hot_bucket_bounded_by_prepass(spark):
    """10k copies of one doc: the exact-dup prepass must keep the LSH
    bucket self-join off the identical texts entirely (one rep enters
    LSH), while every true pair is still found via group expansion."""
    n = 10_000
    docs = spark.range(n).select(
        F.col('id').alias('doc_id'),
        F.lit('the same exact document body appears everywhere in this '
              'corpus and would melt a naive bucket self-join')
        .alias('text'))
    # Plus two distinct near-dup docs so the LSH path itself runs.
    extra = spark.createDataFrame(
        [(n + 1, 'a genuinely different document about spark engines '
                 'and their shuffle behavior at warehouse scale'),
         (n + 2, 'a genuinely different document about spark engines '
                 'and their shuffle behaviour at warehouse scale')],
        'doc_id long, text string')
    corpus = docs.unionByName(extra)

    stats = {}
    pairs = textops.near_duplicate_pairs(
        corpus, max_bucket=64, drop_stats=stats)
    # The capped LSH join must stay tiny: count the REP pairs (the
    # quadratic member expansion is inherent to pair enumeration, so
    # assert on the pipeline's internal shape instead: nothing dropped
    # and the two distinct docs found).
    assert stats['dropped_rows'] == 0, stats
    near = pairs.filter((F.col('id_a') == n + 1)
                        & (F.col('id_b') == n + 2))
    assert near.count() == 1
    # Spot-check group expansion: doc 0 pairs with every other copy.
    assert pairs.filter(F.col('id_a') == 0).count() == n - 1

    # Raw LSH *without* the prepass on identical texts needs the cap;
    # with it, the oversized bucket is dropped (and reported).
    raw_stats = {}
    textops.minhash_lsh_candidates(
        corpus, max_bucket=64, drop_stats=raw_stats).count()
    assert raw_stats['dropped_rows'] >= n  # the hot bucket was bounded


def test_lineage_batch_is_constant_jobs(spark, tmp_path):
    """The checkpointed runner must issue a constant number of jobs,
    not O(n_buckets): measured via the Spark status tracker."""
    out = str(tmp_path / 'out')
    lin = str(tmp_path / 'lineage')
    src = spark.range(2000).select(
        F.concat(F.lit('img'), F.col('id')).alias('image_id'),
        (F.col('id') * 7).alias('v'))

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    n = run_checkpointed(
        spark, src, lambda df: df.withColumn('v2', F.col('v') * 2),
        out, lin, n_buckets=64, run_id='jobs')
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert n == 64
    # input count + write + read-back agg + lineage append (+ slack for
    # scheme inference) -- far below one-job-per-bucket.
    assert after - before <= 10, f'{after - before} jobs for 64 buckets'


def test_lineage_corrupt_table_raises(spark, tmp_path):
    """A present-but-unreadable lineage table must raise, not silently
    reprocess everything (ADVICE: only first-run path-not-found is
    swallowed)."""
    from pytrs_spark.lineage import finished_buckets
    lin = tmp_path / 'lineage'
    lin.mkdir()
    (lin / 'part-00000.parquet').write_text('this is not parquet')
    with pytest.raises(Exception):
        finished_buckets(spark, str(lin))


def test_simhash_near_dup_exact_vs_brute_force(spark):
    """The pigeonhole band join must return EXACTLY the brute-force
    all-pairs answer at Hamming <= r (recall 1 by construction, not
    probabilistically), including hamming-0 groups via the
    distinct-simhash prepass."""
    base = ('the quick brown fox jumps over the lazy dog while '
            'seventeen engineers watch a shuffle graph converge')
    rows = []
    # 3 identical docs (hamming 0 within group), small perturbations
    # (low hamming), and unrelated docs (far).
    for i in range(3):
        rows.append((i, base))
    rows += [(10, base + ' tonight'), (11, base.replace('lazy', 'calm')),
             (20, 'completely unrelated text about parquet footers'),
             (21, 'another unrelated doc on iceberg snapshot manifests'),
             (30, '')]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')

    for r in (0, 2, 6, 12):
        got = sorted(
            (x.id_a, x.id_b, x.hamming)
            for x in textops.simhash_near_dup_pairs(
                docs, max_hamming=r).collect())
        sh = docs.select('doc_id',
                         textops.simhash_col('text').alias('sh'))
        a, b = sh.alias('a'), sh.alias('b')
        want = sorted(
            (x.id_a, x.id_b, x.hamming)
            for x in (a.join(b, F.col('a.doc_id') < F.col('b.doc_id'))
                      .withColumn('hamming',
                                  F.bit_count(F.col('a.sh').bitwiseXOR(
                                      F.col('b.sh'))).cast('int'))
                      .filter(F.col('hamming') <= r)
                      .select(F.col('a.doc_id').alias('id_a'),
                              F.col('b.doc_id').alias('id_b'),
                              'hamming')).collect())
        assert got == want, (r, got, want)
    # hamming-0 group of identical docs is fully enumerated
    got0 = {(x.id_a, x.id_b) for x in textops.simhash_near_dup_pairs(
        docs, max_hamming=0).collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= got0

    with pytest.raises(ValueError):
        textops.simhash_near_dup_pairs(docs, max_hamming=3, bands=8)


def test_simhash_hot_bucket_bounded_by_prepass(spark):
    """10k identical docs: only ONE distinct simhash enters the band
    join (the prepass makes the hot group a single rep row), and
    max_bucket never drops anything for it."""
    n = 10_000
    docs = spark.range(n).select(
        F.col('id').alias('doc_id'),
        F.lit('the same exact document body appears everywhere '
              'in this corpus').alias('text'))
    stats = {}
    pairs = textops.simhash_near_dup_pairs(
        docs, max_hamming=3, max_bucket=64, drop_stats=stats)
    assert stats['dropped_rows'] == 0, stats
    assert pairs.filter(F.col('id_a') == 0).count() == n - 1


def test_connected_components_chain_ring_and_clique(spark):
    """Label propagation + pointer jumping must close transitively:
    a 12-node path (worst diameter per edge), a ring, and a clique
    all collapse to min-id components; pairwise keep-one would not."""
    from pytrs_spark.operators.textops import connected_components
    chain = [(i, i + 1) for i in range(100, 111)]        # path of 12
    ring = [(i, i + 1) for i in range(200, 205)] + [(205, 200)]
    clique = [(a, b) for a in range(300, 304)
              for b in range(a + 1, 304)]
    pairs = spark.createDataFrame(chain + ring + clique,
                                  'id_a long, id_b long')
    got = {r['doc_id']: r['component_id']
           for r in connected_components(pairs).collect()}
    assert all(got[i] == 100 for i in range(100, 112))
    assert all(got[i] == 200 for i in range(200, 206))
    assert all(got[i] == 300 for i in range(300, 304))
    # keep-one policy: exactly one representative per component.
    reps = [d for d, c in got.items() if d == c]
    assert sorted(reps) == [100, 200, 300]


def test_connected_components_empty_and_determinism(spark):
    from pyspark.sql import functions as F
    from pytrs_spark.operators.textops import connected_components
    empty = spark.createDataFrame([], 'id_a long, id_b long')
    assert connected_components(empty).count() == 0
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], 'id_a long, id_b long')
    a = sorted(map(tuple, connected_components(pairs).collect()))
    b = sorted(map(tuple, connected_components(
        pairs.repartition(5)).collect()))
    assert a == b == [(3, 3), (7, 3), (9, 3), (20, 20), (21, 20)]


def test_hamming_near_dup_over_raw_fingerprints(spark):
    """G16: the banded Hamming join factored over an arbitrary int64
    column (phash-style image dedup) -- planted twins + an identical
    group, verified against brute force."""
    import itertools
    rows = [(1, 0b1010100), (2, 0b1010101),     # hamming 1
            (3, 0b1010100),                     # identical to 1
            (4, -42), (5, -42 ^ 0b11),          # negative hashes
            (6, 1 << 62)]                       # isolated
    df = spark.createDataFrame(rows, 'image_id long, phash long')
    got = {(r['id_a'], r['id_b']): r['hamming'] for r in
           textops.hamming_near_dup_pairs(
               df, id_col='image_id', hash_col='phash',
               max_hamming=2).collect()}
    brute = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count('1')
        if d <= 2:
            brute[(min(ia, ib), max(ia, ib))] = d
    assert got == brute
    assert got[(1, 3)] == 0 and got[(4, 5)] == 2


def test_hamming_multiblock_parity_and_picker(spark):
    """The Manku multi-block layout (n_blocks > k+1) must emit the
    exact same pair set as the classic k+1 single-block split --
    recall is pigeonhole-exact for every m >= k+1, and the
    least-matching-table dedup must stay exactly-once."""
    import random
    rng = random.Random(7)
    base = [rng.getrandbits(64) - (1 << 63) for _ in range(200)]
    rows = [(i, h) for i, h in enumerate(base)]
    # Planted twins 2 bits away + one identical clone.
    rows += [(1000 + i, base[i] ^ 0b101) for i in range(0, 200, 10)]
    rows += [(2000, base[0])]
    df = spark.createDataFrame(rows, 'image_id long, phash long')

    def pairs(**kw):
        return sorted(map(tuple, textops.hamming_near_dup_pairs(
            df, id_col='image_id', hash_col='phash',
            max_hamming=2, **kw).collect()))

    classic = pairs(n_blocks=3)
    assert classic == pairs(n_blocks=4) == pairs(n_blocks=8) \
        == pairs()                       # auto-picked m agrees too
    assert (0, 2000, 0) in classic and (0, 1000, 2) in classic

    # Picker: small corpora stay on the classic minimum; huge key
    # counts push m up without busting the 64-table cap.
    from math import comb
    from pytrs_spark.operators.textops import _hamming_pick_blocks
    assert _hamming_pick_blocks(1000, 2) == 3
    big = _hamming_pick_blocks(10_000_000_000, 2)
    assert big > 3 and comb(big, 2) <= 64

    with pytest.raises(ValueError):
        pairs(n_blocks=2)                # < k+1
    with pytest.raises(ValueError):
        pairs(bands=3, n_blocks=8)       # disagreeing layouts
    with pytest.raises(ValueError):
        pairs(n_blocks=64)               # C(64,2) past the cap
