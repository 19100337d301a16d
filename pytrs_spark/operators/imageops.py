"""Image-geometry training-pipeline operators.

Engine extensions (SURVEY.md §2.8, no reference counterpart -- pyTRS
has no image runtime): the two geometry stages every large
image-training pipeline runs between ingest and the data loader,

  * T33 ``aspect_bucket`` -- SDXL-style aspect-ratio bucketing: map
    each image to the closest-aspect target shape from a fixed bucket
    list, derive the exact cover-resize + center-crop geometry, and
    deal deterministic fixed-size training batches per bucket.
  * T34 ``pack_patches`` -- NaViT-style patch packing: images keep
    their native resolution, tokenize into (h/p x w/p) ViT patch
    grids, and pack whole (never split) into fixed token-budget
    sequences.

Both operators are pure geometry over the ``(image_id, w, h)``
columns of the input-hint image table -- the ``bytes`` payload is
never touched, so column pruning keeps blobs out of every shuffle
(same discipline as `raster.py` / `multimodal.py`).

Determinism contract: every decision is exact int64 arithmetic plus
at most ONE IEEE-754 double division per comparison (a single
division of two exactly-representable integers is bit-identical
across engines, unlike ``ln``/``pow``), so the DuckDB oracles in
``__spark_entry__.py`` re-derive bucket choices, resize dims, batch
ids, and packing offsets verbatim.
"""

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_mix

# The published SDXL / NovelAI-style 1024^2-area bucket ladder
# (public: SDXL report appendix; NovelAI aspect-bucketing blog).
# Any (w, h) list works -- this is just a sensible default.
SDXL_BUCKETS = [
    (512, 2048), (576, 1728), (640, 1536), (704, 1408), (768, 1344),
    (832, 1216), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1216, 832), (1344, 768), (1408, 704), (1536, 640),
    (1728, 576), (2048, 512),
]


def aspect_bucket(images: DataFrame, buckets=None, batch_size: int = 64,
                  n_shards: int = 64, id_col: str = 'image_id',
                  w_col: str = 'w', h_col: str = 'h') -> DataFrame:
    """T33: SDXL-style aspect-ratio bucketing + deterministic batch
    dealing.

    Each image joins the bucket whose aspect ratio is closest to its
    own; distance is the symmetric ratio ``max(w*bh, h*bw) /
    min(w*bh, h*bw)`` (monotone in ``|log(w/h) - log(bw/bh)|``, but
    computed as ONE double division of exact int64s so the argmin is
    bit-reproducible -- no ``log`` libm variance).  Ties break on the
    lower bucket index.

    Resize is the standard cover-then-center-crop: the closer side
    lands exactly on the bucket edge, the other side scales by exact
    round-half-up int64 arithmetic and center-crops

        wide  (w*bh >= h*bw): resize_h = bh, resize_w = round(w*bh/h)
        tall  (w*bh <  h*bw): resize_w = bw, resize_h = round(h*bw/w)
        crop_x = (resize_w - bw) div 2,  crop_y likewise.

    Batches: within each (bucket, shard) the images sort by
    ``id_col`` and deal into fixed ``batch_size`` batches
    (``batch_id``, ``pos_in_batch``).  ``shard = hash_mix(id) %
    n_shards`` (the spec'd T15 mix), so batch membership is
    reproducible on any cluster layout AND the batch window's
    parallelism is ``|buckets| * n_shards`` instead of ``|buckets|``
    -- size ``n_shards`` to the cluster exactly like
    ``pack_sequences``.  The trailing batch of each (bucket, shard)
    may be short; downstream either drops it or pads (both policies
    read ``pos_in_batch``/``batch_size``).

    Preconditions: ``id_col`` unique and int64-castable (it feeds the
    shard mix and the in-shard sort); ``w/h > 0`` rows only
    (non-positive dims are dropped, documented).

    Scale shape: bucket choice + resize geometry are pure
    whole-stage-codegen expressions evaluated in the scan stage (zero
    shuffle, pushdown-friendly); the only exchange is ONE hash
    partition on (bucket_id, shard) for the batch row_number.
    ``bytes`` is never referenced -- at 10^12 images the blob column
    stays in parquet.
    """
    buckets = list(SDXL_BUCKETS if buckets is None else buckets)
    if not buckets:
        raise ValueError('buckets must be non-empty')
    for bw, bh in buckets:
        if bw < 1 or bh < 1:
            raise ValueError(f'bucket dims must be >= 1, got {(bw, bh)}')
    if batch_size < 1:
        raise ValueError(f'batch_size must be >= 1, got {batch_size}')
    if n_shards < 1:
        raise ValueError(f'n_shards must be >= 1, got {n_shards}')

    wl = F.col(w_col).cast('long')
    hl = F.col(h_col).cast('long')
    cands = []
    for i, (bw, bh) in enumerate(buckets):
        a = wl * F.lit(int(bh))
        b = hl * F.lit(int(bw))
        pen = (F.greatest(a, b).cast('double')
               / F.least(a, b).cast('double'))
        cands.append(F.struct(pen.alias('p'),
                              F.lit(i).alias('i'),
                              F.lit(int(bw)).alias('bw'),
                              F.lit(int(bh)).alias('bh')))
    # least() over struct candidates, NOT array_min(array(...)): both
    # stay in WholeStageCodegen but array_min materializes a 17-struct
    # array per row -- measured 3x slower at 2M rows (same cliff the
    # T32 ticket race documented).
    best = cands[0] if len(cands) == 1 else F.least(*cands)

    # The batch window is the operator's only exchange; keep its rows
    # SKINNY -- (id, w, h, bucket_id, shard) -- and re-derive the
    # bucket dims + resize/crop geometry post-window from codegen
    # lookups (measured: carrying the full geometry through the
    # shuffle costs ~3x the bytes for zero information).
    slim = (images
            .filter((wl > 0) & (hl > 0))
            .select(F.col(id_col), wl.alias('w'), hl.alias('h'),
                    best.getField('i').alias('bucket_id'),
                    (hash_mix(F.col(id_col)) % n_shards).cast('int')
                    .alias('shard')))

    w = Window.partitionBy('bucket_id', 'shard').orderBy(id_col)
    rn = (F.row_number().over(w) - 1).cast('long')
    ranked = slim.withColumn('_rn', rn)

    # bucket dims back from the id: literal when-chains stay in
    # whole-stage codegen (element_at(map) would too, but the chain
    # matches the argmin's shape).
    bwc = F.lit(int(buckets[-1][0]))
    bhc = F.lit(int(buckets[-1][1]))
    for i in range(len(buckets) - 2, -1, -1):
        cond = F.col('bucket_id') == i
        bwc = F.when(cond, F.lit(int(buckets[i][0]))).otherwise(bwc)
        bhc = F.when(cond, F.lit(int(buckets[i][1]))).otherwise(bhc)

    # round-half-up = (2a + b) div (2b); exact int64 `div`, no doubles
    geo = (ranked
           .withColumn('bucket_w', bwc.cast('long'))
           .withColumn('bucket_h', bhc.cast('long'))
           .select(
               id_col, 'w', 'h', 'bucket_id', 'bucket_w', 'bucket_h',
               F.when(F.col('w') * F.col('bucket_h')
                      >= F.col('h') * F.col('bucket_w'),
                      F.expr('(w * bucket_h * 2 + h) div (h * 2)'))
               .otherwise(F.col('bucket_w')).alias('resize_w'),
               F.when(F.col('w') * F.col('bucket_h')
                      >= F.col('h') * F.col('bucket_w'),
                      F.col('bucket_h'))
               .otherwise(F.expr('(h * bucket_w * 2 + w) div (w * 2)'))
               .alias('resize_h'),
               'shard',
               F.expr(f'_rn div {int(batch_size)}').alias('batch_id'),
               (F.col('_rn') % batch_size).cast('int')
               .alias('pos_in_batch')))
    return (geo
            .withColumn('crop_x',
                        F.expr('(resize_w - bucket_w) div 2'))
            .withColumn('crop_y',
                        F.expr('(resize_h - bucket_h) div 2'))
            .select(id_col, 'w', 'h', 'bucket_id', 'bucket_w',
                    'bucket_h', 'resize_w', 'resize_h', 'shard',
                    'crop_x', 'crop_y', 'batch_id', 'pos_in_batch'))


def patch_counts(w_col: str = 'w', h_col: str = 'h',
                 patch: int = 16):
    """(patch_cols, patch_rows, n_tok) ViT tokenization columns:
    ``ceil(dim / patch)`` per axis, exact int64."""
    p = int(patch)
    pc = F.floor((F.col(w_col).cast('long') + p - 1) / p).cast('int')
    pr = F.floor((F.col(h_col).cast('long') + p - 1) / p).cast('int')
    return pc, pr, (pc.cast('long') * pr.cast('long'))


def pack_patches(images: DataFrame, budget: int, patch: int = 16,
                 n_shards: int = 64, mode: str = 'offset',
                 id_col: str = 'image_id', w_col: str = 'w',
                 h_col: str = 'h') -> DataFrame:
    """T34: NaViT-style patch packing -- native-resolution images
    tokenize into ``ceil(w/p) * ceil(h/p)`` ViT patches and pack WHOLE
    (images are never split, unlike T28's GPT text packing) into
    per-shard sequences of ~``budget`` tokens.

    Returns one row per image: ``(shard, seq_id, id_col, patch_cols,
    patch_rows, n_tok, tok_offset)`` -- sequence ``(shard, seq_id)``'s
    content is its images' patch runs concatenated in ``id_col``
    order starting at ``tok_offset``.

    Two packing contracts:

    * ``mode='offset'`` (default, oracle-derivable in pure SQL): with
      ``s`` = the running token offset of the image's first patch in
      the shard's raw stream, ``seq_id = s div budget`` and
      ``tok_offset = s mod budget``.  An image whose run crosses a
      boundary stays whole in the sequence where it STARTS, so a
      sequence holds at most ``budget + max_n_tok - 1`` tokens (soft
      budget -- NaViT's per-image attention mask absorbs the
      variance, and the layout needs only ONE prefix-sum window: no
      sequential dependency anywhere, the 10^12-image shape).
    * ``mode='strict'``: classic next-fit -- a sequence closes when
      the next image would exceed ``budget`` (hard cap; an image with
      ``n_tok > budget`` forms a singleton overflow sequence).
      Boundaries form a sequential recurrence, so this runs as ONE
      Arrow-batched grouped kernel per shard whose Python loop
      advances a whole sequence per iteration via
      ``np.searchsorted`` on the cumsum -- O(n_sequences * log n)
      per shard, never per-image Python.

    Preconditions: ``id_col`` unique + int64-castable (shard mix and
    in-shard order, exactly like ``pack_sequences``); zero-token rows
    (w or h <= 0) are dropped.

    Scale shape: ONE shuffle to shard-partition either way; shards
    are the parallelism unit.  Only (id, w, h) ride the shuffle --
    blobs never move.
    """
    if budget < 1:
        raise ValueError(f'budget must be >= 1, got {budget}')
    if patch < 1:
        raise ValueError(f'patch must be >= 1, got {patch}')
    if n_shards < 1:
        raise ValueError(f'n_shards must be >= 1, got {n_shards}')
    if mode not in ('offset', 'strict'):
        raise ValueError(f"mode must be 'offset' or 'strict', got {mode!r}")

    pc, pr, nt = patch_counts(w_col, h_col, patch)
    toks = (images.select(
        F.col(id_col),
        (hash_mix(F.col(id_col)) % n_shards).cast('int').alias('shard'),
        pc.alias('patch_cols'), pr.alias('patch_rows'),
        nt.alias('n_tok'))
        .filter(F.col('n_tok') > 0))

    if mode == 'offset':
        w = (Window.partitionBy('shard').orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        B = int(budget)
        return (toks
                .withColumn('_s', F.coalesce(F.sum('n_tok').over(w),
                                             F.lit(0)))
                .select('shard',
                        F.expr(f'_s div {B}').alias('seq_id'),
                        id_col, 'patch_cols', 'patch_rows', 'n_tok',
                        (F.col('_s') % B).alias('tok_offset')))

    import numpy as np
    import pandas as pd
    B = int(budget)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind='mergesort',
                              ignore_index=True)
        t = pdf['n_tok'].to_numpy()
        c = np.cumsum(t)
        n = len(t)
        seq = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        cur, base, k = 0, 0, 0
        while cur < n:
            j = int(np.searchsorted(c, base + B, side='right'))
            if j <= cur:          # oversized image: singleton sequence
                j = cur + 1
            seq[cur:j] = k
            off[cur:j] = (c[cur:j] - t[cur:j]) - base
            base = int(c[j - 1])
            cur, k = j, k + 1
        pdf['seq_id'] = seq
        pdf['tok_offset'] = off
        return pdf[['shard', 'seq_id', id_col,
                    'patch_cols', 'patch_rows', 'n_tok', 'tok_offset']]

    id_type = dict(toks.dtypes)[id_col]
    schema = (f'shard int, seq_id long, {id_col} {id_type}, '
              'patch_cols int, patch_rows int, n_tok long, '
              'tok_offset long')
    return toks.groupBy('shard').applyInPandas(pack, schema)
