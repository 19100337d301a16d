"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (parse PLSS descriptions
-> polygon layer -> phash anchors -> broadcast cell join -> exact PIP
-> aliquot tile assignment) on points derived from the sf0.001 orders
table.

``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-checkable oracle wherever the semantics are
SQL-expressible.  Spatial inputs are synthesized deterministically
from the testdata tables (same closed-form phash/anchor derivation on
both sides), so the Spark side exercises the full parse+geometry+join
machinery while the oracle is pure SQL that never parses text.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pytrs_spark import datagen
from pytrs_spark.operators import query as Q
from pytrs_spark.operators.parse import parse_documents_full
from pytrs_spark.session import tune_session
from pytrs_spark.operators import textops
from pytrs_spark.operators.ann import brute_force_topk
from pytrs_spark.operators.parse import (
    parse_documents,
    parse_tract_details,
    trs_struct,
    with_derived,
)
from pytrs_spark.pipeline import (
    assign_images_to_tiles,
    polygon_layer_from_descs,
)
from pytrs_spark.spatial.knn import knn_section_corners

_PHASH_MULT = 2654435761
_PHASH_MOD = 2 ** 62


def _points_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image rows derived from the orders table (same
    formula as the SQL oracle)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    phash = (F.col('o_orderkey') * F.lit(_PHASH_MULT)) % F.lit(_PHASH_MOD)
    return orders.select(
        F.concat(F.lit('img'), F.col('o_orderkey')).alias('image_id'),
        phash.cast('long').alias('phash'),
    ).withColumn('caption', F.col('image_id'))


_ORACLE_XY = f"""
  SELECT 'img' || o_orderkey AS image_id,
         (o_orderkey * {_PHASH_MULT}) % {_PHASH_MOD} AS phash,
         {datagen.X0} + (((o_orderkey * {_PHASH_MULT}) % {_PHASH_MOD})
            // 2147483648) / 2147483648.0 * {datagen.X1 - datagen.X0} AS x,
         {datagen.Y0} + (((o_orderkey * {_PHASH_MULT}) % {_PHASH_MOD})
            % 2147483648) / 2147483648.0 * {datagen.Y1 - datagen.Y0} AS y
  FROM orders
"""

_ORACLE_TILE = f"""
WITH xy AS ({_ORACLE_XY}),
tiled AS (
  SELECT image_id, x, y,
         CAST(ceil(-x / 6.0) AS BIGINT) AS rge,
         CAST(floor(y / 6.0) AS BIGINT) + 1 AS twp
  FROM xy
), sec AS (
  SELECT image_id, x, y, twp, rge,
         CAST(floor(x - (-6.0 * rge)) AS BIGINT) AS col,
         CAST(floor(y - (6.0 * (twp - 1))) AS BIGINT) AS row_s,
         x - (-6.0 * rge) - CAST(floor(x - (-6.0 * rge)) AS BIGINT) AS fx,
         y - (6.0 * (twp - 1))
           - CAST(floor(y - (6.0 * (twp - 1))) AS BIGINT) AS fy
  FROM tiled
), named AS (
  SELECT image_id, twp, rge, fx, fy,
         (5 - row_s) * 6
           + (CASE WHEN (5 - row_s) % 2 = 0 THEN 5 - col ELSE col END)
           + 1 AS secnum,
         (CASE WHEN fy >= 0.5 THEN fy - 0.5 ELSE fy END) AS iy,
         (CASE WHEN fx >= 0.5 THEN fx - 0.5 ELSE fx END) AS ix
  FROM sec
)
SELECT image_id,
       twp || 'n' || rge || 'w' || lpad(CAST(secnum AS VARCHAR), 2, '0')
         AS trs,
       (CASE WHEN iy >= 0.25 THEN 'N' ELSE 'S' END)
       || (CASE WHEN ix >= 0.25 THEN 'E' ELSE 'W' END)
       || (CASE WHEN fy >= 0.5 THEN 'N' ELSE 'S' END)
       || (CASE WHEN fx >= 0.5 THEN 'E' ELSE 'W' END) AS qq
FROM named
"""


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: parse -> polygon layer -> cell join -> PIP -> tile."""
    polygons = polygon_layer_from_descs(datagen.gen_descs(spark))
    points = _points_from_orders(spark, sf_dir)
    tiles = assign_images_to_tiles(points, polygons)
    return tiles.select('image_id', 'trs', 'qq')


def q_tile_assign_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: the explicit salted-key shuffle-join path must produce the
    exact same tile assignment as the broadcast path (same oracle)."""
    polygons = polygon_layer_from_descs(datagen.gen_descs(spark))
    points = _points_from_orders(spark, sf_dir)
    tiles = assign_images_to_tiles(points, polygons, salt=4)
    return tiles.select('image_id', 'trs', 'qq')


def q_raster_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: per-(trs, qq) composited raster tiles; the per-tile image
    count is SQL-checkable, pixel checksums are covered by tests."""
    from pytrs_spark.pipeline import run_raster
    polygons = polygon_layer_from_descs(datagen.gen_descs(spark))
    images = _points_from_orders(spark, sf_dir) \
        .withColumn('bytes', F.lit(None).cast('binary'))
    tiles = run_raster(images, polygons, tile_px=16, patch_px=4)
    return tiles.select('trs', 'qq', 'n_images')


_ORACLE_RASTER = f"""
SELECT trs, qq, COUNT(*) AS n_images
FROM ({_ORACLE_TILE}) GROUP BY trs, qq
"""


def q_knn_corners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=4 nearest section corners per point via ring expansion."""
    points = _points_from_orders(spark, sf_dir)
    return knn_section_corners(points, k=4) \
        .select('image_id', 'rank', 'cx', 'cy')


_ORACLE_KNN = f"""
WITH xy AS ({_ORACLE_XY}),
corners AS (
  SELECT cx.x AS cx, cy.y AS cy
  FROM (SELECT UNNEST(generate_series(CAST({datagen.X0} AS BIGINT),
                                      CAST({datagen.X1} AS BIGINT))) AS x) cx,
       (SELECT UNNEST(generate_series(CAST({datagen.Y0} AS BIGINT),
                                      CAST({datagen.Y1} AS BIGINT))) AS y) cy
), ranked AS (
  SELECT xy.image_id, corners.cx, corners.cy,
         row_number() OVER (
           PARTITION BY xy.image_id
           ORDER BY (xy.x - corners.cx) * (xy.x - corners.cx)
                  + (xy.y - corners.cy) * (xy.y - corners.cy),
                  corners.cx, corners.cy) AS rank
  FROM xy, corners
)
SELECT image_id, rank, CAST(cx AS DOUBLE) AS cx, CAST(cy AS DOUBLE) AS cy
FROM ranked WHERE rank <= 4
"""


def _keyed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col('l_orderkey') * 10 + F.col('l_linenumber')).alias('key'))


def q_trs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native TRS codec: compose a key from numerics, decompose it."""
    keys = _keyed_lineitem(spark, sf_dir)
    twp = (F.col('key') % 299 + 1).cast('string')
    ns = F.when(F.col('key') % 2 == 0, 'n').otherwise('s')
    rge = (F.col('key') % 98 + 1).cast('string')
    ew = F.when(F.col('key') % 3 == 0, 'e').otherwise('w')
    sec = F.lpad((F.col('key') % 40).cast('string'), 2, '0')
    raw = (F.when(F.col('key') % 13 == 0, F.lit('asdf'))
           .when(F.col('key') % 13 == 1, F.lit(''))
           .otherwise(F.concat(twp, ns, rge, ew, sec)))
    df = keys.withColumn('_s', trs_struct(raw))
    return df.select(
        'key',
        F.col('_s.trs').alias('trs'),
        F.col('_s.twp_num').alias('twp_num'),
        F.col('_s.twp_ns').alias('twp_ns'),
        F.col('_s.twp_undef').alias('twp_undef'),
        F.col('_s.rge_num').alias('rge_num'),
        F.col('_s.rge_ew').alias('rge_ew'),
        F.col('_s.sec_num').alias('sec_num'),
        F.col('_s.sec_undef').alias('sec_undef'),
    )


_ORACLE_TRS = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), built AS (
  SELECT key,
         key % 299 + 1 AS twp_n,
         CASE WHEN key % 2 = 0 THEN 'n' ELSE 's' END AS ns,
         key % 98 + 1 AS rge_n,
         CASE WHEN key % 3 = 0 THEN 'e' ELSE 'w' END AS ew,
         key % 40 AS sec_n,
         key % 13 AS mode
  FROM keys
)
SELECT key,
  CASE WHEN mode = 0 THEN 'XXXzXXXzXX'
       WHEN mode = 1 THEN '___z___z__'
       ELSE twp_n || ns || rge_n || ew
            || lpad(CAST(sec_n AS VARCHAR), 2, '0') END AS trs,
  CASE WHEN mode IN (0, 1) THEN NULL ELSE twp_n END AS twp_num,
  CASE WHEN mode IN (0, 1) THEN NULL ELSE ns END AS twp_ns,
  (mode = 1) AS twp_undef,
  CASE WHEN mode IN (0, 1) THEN NULL ELSE rge_n END AS rge_num,
  CASE WHEN mode IN (0, 1) THEN NULL ELSE ew END AS rge_ew,
  CASE WHEN mode IN (0, 1) THEN NULL ELSE sec_n END AS sec_num,
  (mode = 1) AS sec_undef
FROM built
"""


def q_pretty_twprge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12: pretty Twp/Rge formatting + natural<->short round trip
    as pure native columns."""
    from pytrs_spark.operators.parse import (
        pretty_twprge_col,
        twprge_natural_to_short_col,
    )
    d = q_trs_roundtrip(spark, sf_dir)
    pretty = pretty_twprge_col(
        F.col('twp_num'), F.col('twp_ns'),
        F.col('rge_num'), F.col('rge_ew'))
    return d.select(
        'key', pretty.alias('pretty'),
        twprge_natural_to_short_col(pretty).alias('short'))


_ORACLE_PRETTY = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), built AS (
  SELECT key,
         key % 299 + 1 AS twp_n,
         CASE WHEN key % 2 = 0 THEN 'N' ELSE 'S' END AS ns,
         key % 98 + 1 AS rge_n,
         CASE WHEN key % 3 = 0 THEN 'E' ELSE 'W' END AS ew,
         key % 13 AS mode
  FROM keys
), p AS (
  SELECT key,
    CASE WHEN mode IN (0, 1) THEN 'T---X-R---X'
         ELSE 'T' || twp_n || ns || '-R' || rge_n || ew END AS pretty
  FROM built
)
SELECT key, pretty,
       regexp_replace(lower(pretty), '[rt-]', '', 'g') AS short
FROM p
"""


def _docs_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed PLSS documents with numerically-known structure."""
    keys = _keyed_lineitem(spark, sf_dir)
    twp = (F.col('key') % 8 + 150)
    rge = (F.col('key') % 7 + 95)
    a = (F.col('key') % 30 + 1)
    b = a + F.col('key') % 4
    text = F.concat(
        F.lit('T'), twp, F.lit('N-R'), rge, F.lit('W Sec '),
        a, F.lit(' - '), b, F.lit(': NE/4'))
    return keys.select('key', text.alias('raw_desc'),
                       a.alias('_a'), b.alias('_b'))


def q_parse_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full document parse + multi-sec fan-out on constructed docs."""
    docs = _docs_from_lineitem(spark, sf_dir)
    tracts = parse_documents(docs, text_col='raw_desc',
                             keep_cols=['key'])
    return tracts.select('key', 'trs', 'desc', 'orig_index')


_ORACLE_FANOUT = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), built AS (
  SELECT key, key % 8 + 150 AS twp, key % 7 + 95 AS rge,
         key % 30 + 1 AS a, key % 30 + 1 + key % 4 AS b
  FROM keys
)
SELECT key,
       twp || 'n' || rge || 'w' || lpad(CAST(s AS VARCHAR), 2, '0') AS trs,
       'NE/4' AS desc,
       CAST(s - a AS INT) AS orig_index
FROM built, UNNEST(generate_series(a, b)) AS t(s)
"""

# Golden tract descriptions (frozen from the reference's unit tests)
# keyed by key % 6; expected qqs / lots / simplified aliquots below.
_GOLDEN_DESCS = [
    'Lots 1 - 3, S/2N/2, Lot 8(39.21), SE/4SE/4',
    'N/2NE/4',
    'S/2N/2NW/4SW/4, SE/4SE/4',
    'ALL',
    'W½SE¼',
    'Lot 1, S/2NE/4',
]
_GOLDEN_QQS = [
    ['SENE', 'SWNE', 'SENW', 'SWNW', 'SESE'],
    ['NENE', 'NWNE'],
    ['S2N2NWSW', 'SESE'],
    ['NENE', 'NWNE', 'SENE', 'SWNE', 'NENW', 'NWNW', 'SENW', 'SWNW',
     'NESE', 'NWSE', 'SESE', 'SWSE', 'NESW', 'NWSW', 'SESW', 'SWSW'],
    ['NWSE', 'SWSE'],
    ['SENE', 'SWNE'],
]
_GOLDEN_ALIQUOTS = [
    ['S2N2', 'SESE'],
    ['N2NE'],
    ['SESE', 'S2N2NWSW'],
    ['N2', 'S2'],
    ['W2SE'],
    ['S2NE'],
]


def _golden_tract_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = _keyed_lineitem(spark, sf_dir)
    expr = F.element_at(
        F.array(*[F.lit(d) for d in _GOLDEN_DESCS]),
        (F.col('key') % 6 + 1).cast('int'))
    return keys.select('key', expr.alias('desc'))


def q_tract_qqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tract-level lots/QQ parse on the golden description set."""
    parsed = parse_tract_details(_golden_tract_df(spark, sf_dir))
    return parsed.select(
        'key', F.posexplode('qqs').alias('pos', 'qq'))


def _values_oracle(table_rows, col_name) -> str:
    vals = ", ".join(f"({m}, {p}, '{v}')"
                     for m, row in enumerate(table_rows)
                     for p, v in enumerate(row))
    return f"""
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), golden(m, pos, {col_name}) AS (VALUES {vals})
SELECT key, pos, {col_name}
FROM keys JOIN golden ON golden.m = keys.key % 6
"""


def q_aliquot_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ parse + quadtree aliquot reconstruction on the golden set."""
    parsed = parse_tract_details(_golden_tract_df(spark, sf_dir))
    derived = with_derived(parsed, standard=False, lots_qqs=False,
                           ilots=False)
    return derived.select(
        'key', F.posexplode('aliquots').alias('pos', 'aliquot'))


# --- container query ops on a fixed parsed corpus ---------------------

_SORT_CORPUS = ("T154N-R97W Sec 14: NE/4, Sec 1: S2N2, Sec 5: SW/4, "
                "T153N-R98W Sec 36: ALL")


def _sorted_corpus(spark: SparkSession, key: str, reverse=False):
    docs = spark.createDataFrame([(0, _SORT_CORPUS)],
                                 "doc_id long, raw_desc string")
    tracts = parse_documents(docs, text_col='raw_desc', decompose=True)
    exprs = Q.compile_sort_key(key, 'orig_index', reverse)
    exprs.append(F.col('orig_index').desc() if reverse
                 else F.col('orig_index').asc())
    return tracts.select(
        F.row_number().over(Window.orderBy(*exprs)).alias('rank'),
        'trs')


def q_sort_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sorted_corpus(spark, 'i,s,r,t')


def q_sort_by_section(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sorted_corpus(spark, 's')


def _rank_values_oracle(expected) -> str:
    vals = ", ".join(f"({i + 1}, '{t}')" for i, t in enumerate(expected))
    return f"SELECT rank, trs FROM (VALUES {vals}) AS g(rank, trs)"


_CONSOL_DESCS = [
    "T154N-R97W Sec 14: N/2, SE/4, Sec 15: S/2, Lots 5, 3, 1",
    "T154n-R97W Sec 14: SW/4",
    "T155N-R97W Sec 1: Lots 1 - 4, S2N2, SW/4, SE/4NE/4",
    "T155N-R97W Sec 1: SE/4, Lot 1, SE/4SW/4",
    "T155N-R97W Sec 1: SE/4, Lot 1, SE/4SW/4",
]


def q_consolidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-agg-merge by TRS with order-preserving dedup of lots/qqs,
    then aliquot reconstruction (assume-standard)."""
    docs = spark.createDataFrame(
        [(i, d) for i, d in enumerate(_CONSOL_DESCS)],
        "doc_id long, raw_desc string")
    tracts = parse_documents_full(docs, text_col='raw_desc')
    # Global creation order across documents.
    tracts = tracts.withColumn(
        'orig_index',
        F.col('doc_id') * 1000 + F.col('orig_index'))
    consolidated = Q.consolidate(tracts)
    derived = with_derived(consolidated, aliquots=False, lots_qqs=False,
                           ilots=False)
    return derived.select(
        'trs', 'desc',
        F.concat_ws(
            ', ',
            F.concat(
                F.array_sort(
                    F.col('lots'),
                    lambda a, b: (F.regexp_extract(a, r'L(\d+)$', 1)
                                  .cast('int')
                                  - F.regexp_extract(b, r'L(\d+)$', 1)
                                  .cast('int'))),
                F.col('aliquots_standard'))).alias('lots_aliquots'))


_ORACLE_CONSOLIDATE = """
SELECT * FROM (VALUES
  ('154n97w14', 'N/2, SE/4; SW/4', 'ALL'),
  ('154n97w15', 'S/2, Lots 5, 3, 1', 'L1, L3, L5, S2'),
  ('155n97w01',
   'Lots 1 - 4, S2N2, SW/4, SE/4NE/4; SE/4, Lot 1, SE/4SW/4',
   'L1, L2, L3, L4, S2N2, S2')
) AS g(trs, "desc", lots_aliquots)
"""


def q_group_by_twprge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group constructed tract rows by Twp/Rge (Q5)."""
    docs = _docs_from_lineitem(spark, sf_dir)
    tracts = parse_documents(docs, text_col='raw_desc',
                             keep_cols=['key'], decompose=True)
    return tracts.groupBy('twprge').agg(
        F.count('*').alias('n_tracts'),
        F.countDistinct('trs').alias('n_distinct_trs'))


_ORACLE_GROUP = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), built AS (
  SELECT key, key % 8 + 150 AS twp, key % 7 + 95 AS rge,
         key % 30 + 1 AS a, key % 30 + 1 + key % 4 AS b
  FROM keys
), fanned AS (
  SELECT key, twp, rge, s
  FROM built, UNNEST(generate_series(a, b)) AS t(s)
)
SELECT twp || 'n' || rge || 'w' AS twprge,
       COUNT(*) AS n_tracts,
       COUNT(DISTINCT twp || 'n' || rge || 'w'
             || lpad(CAST(s AS VARCHAR), 2, '0')) AS n_distinct_trs
FROM fanned GROUP BY 1
"""


def q_filter_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: select rows whose TRS carries the error sentinel (keeps
    undefined rows out -- tri-state null semantics)."""
    decomposed = q_trs_roundtrip(spark, sf_dir)
    pred = Q.filter_errors(decomposed, rge=False, undef=False)
    return decomposed.filter(pred).select('key', 'trs')


_ORACLE_FILTER_ERRORS = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
)
SELECT key, 'XXXzXXXzXX' AS trs FROM keys WHERE key % 13 = 0
"""


def q_dedup_lots_qqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 method='lots_qqs': duplicates keyed on trs + sorted distinct
    lots+qqs (keep-first)."""
    docs = spark.createDataFrame(
        [(i, d) for i, d in enumerate(_CONSOL_DESCS)],
        "doc_id long, raw_desc string")
    tracts = parse_documents_full(docs, text_col='raw_desc')
    tracts = tracts.withColumn(
        'global_order', F.col('doc_id') * 1000 + F.col('orig_index'))
    dups = Q.filter_duplicates(tracts, method='lots_qqs',
                               order_col='global_order')
    return dups.groupBy('trs').agg(F.count('*').alias('n_dups'))


def q_quick_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: quick_desc formatting in creation order."""
    docs = spark.createDataFrame([(0, _SORT_CORPUS)],
                                 "doc_id long, raw_desc string")
    tracts = parse_documents(docs, text_col='raw_desc')
    return Q.quick_desc(tracts).select('orig_index', 'quick_desc')


def q_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: semi-join membership of a probe TRS list against the
    parsed corpus."""
    docs = spark.createDataFrame([(0, _SORT_CORPUS)],
                                 "doc_id long, raw_desc string")
    tracts = parse_documents(docs, text_col='raw_desc')
    probe = spark.createDataFrame(
        [('154n97w01',), ('154n97w14',), ('999n99w99',)], ['trs'])
    return probe.join(tracts.select('trs'), 'trs', 'left_semi')


def q_dedup_trs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-TRS rows (keep-first semantics) on the fan-out corpus."""
    docs = _docs_from_lineitem(spark, sf_dir)
    tracts = parse_documents(docs, text_col='raw_desc',
                             keep_cols=['key'])
    tracts = tracts.withColumn(
        'global_order', F.col('key') * 100 + F.col('orig_index'))
    dups = Q.filter_duplicates(tracts, method='trs',
                               order_col='global_order')
    return dups.groupBy('trs').agg(F.count('*').alias('n_dups'))


_ORACLE_DEDUP = """
WITH keys AS (
  SELECT l_orderkey * 10 + l_linenumber AS key FROM lineitem
), built AS (
  SELECT key, key % 8 + 150 AS twp, key % 7 + 95 AS rge,
         key % 30 + 1 AS a, key % 30 + 1 + key % 4 AS b
  FROM keys
), fanned AS (
  SELECT twp || 'n' || rge || 'w' || lpad(CAST(s AS VARCHAR), 2, '0')
           AS trs
  FROM built, UNNEST(generate_series(a, b)) AS t(s)
)
SELECT trs, COUNT(*) - 1 AS n_dups
FROM fanned GROUP BY trs HAVING COUNT(*) > 1
"""


# --- training-data pipeline ops over documents / embeddings -----------

def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clone = docs.select((F.col('doc_id') + 1_000_000).alias('doc_id'),
                        'text')
    return docs.select('doc_id', 'text').unionByName(clone)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a corpus where every text is duplicated once."""
    dups = textops.exact_duplicates(_doubled_docs(spark, sf_dir))
    return dups.select('doc_id')


_ORACLE_DEDUP_EXACT = """
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
), hashed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
  FROM doubled
)
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM hashed
) WHERE rn > 1
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        'doc_id',
        F.size(textops.tokens_col(F.col('text'))).alias('n_tokens'))


_ORACLE_TOKENS = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                       t -> t <> '')) AS n_tokens
FROM documents
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = textops.quality_score(docs.select('doc_id', 'text'))
    return scored.select(
        'doc_id', 'n_chars_calc', 'n_tokens',
        F.round('alpha_ratio', 6).alias('alpha_ratio'),
        F.round('digit_ratio', 6).alias('digit_ratio'),
        F.round('stopword_ratio', 6).alias('stopword_ratio'))


_ORACLE_QUALITY = """
WITH t AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n,
         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  len(toks) AS n_tokens,
  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        / greatest(n, 1.0), 6) AS alpha_ratio,
  round(length(regexp_replace(text, '[^0-9]', '', 'g'))
        / greatest(n, 1.0), 6) AS digit_ratio,
  round(len(list_filter(toks, x -> list_contains(
          ['the','a','an','and','or','of','to','in','is','it',
           'that','for','on','with','as'], x)))
        / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stopword_ratio
FROM t
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the first 5 vectors as queries."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col('vec_id') < 5) \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    topk = brute_force_topk(emb, queries, k=10)
    return topk.select('query_id', 'rank', 'vec_id')


_ORACLE_ANN = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.embedding, q.qv)
           / (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
  FROM embeddings e, q
)
SELECT query_id, rank, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 10
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the scale path; bucket recall is
    approximate by construction -> rows-only check).  Candidates are
    exact-reranked, so every returned (query, vec, rank) is the true
    cosine order within the retrieved set."""
    from pytrs_spark.operators.ann import lsh_bucket_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select('embedding').first()[0])
    queries = emb.filter(F.col('vec_id') < 5) \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    # 8-bit buckets x 8 tables: ~vectors/256 candidates per table at
    # this scale, multi-probe via table union.
    topk = lsh_bucket_topk(emb, queries, dim=dim, k=10,
                           planes=8, tables=8)
    return topk.select('query_id', 'rank', 'vec_id',
                       F.round('cos_sim', 6).alias('cos_sim'))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event rollup (decimal sums for exactness)."""
    spark.conf.set('spark.sql.session.timeZone', 'UTC')
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(
        F.date_format('ts', 'yyyy-MM-dd HH').alias('hour'),
        'event_type')
        .agg(F.count('*').alias('n_events'),
             F.sum(F.col('value').cast('decimal(18,6)'))
             .cast('double').alias('sum_value')))


_ORACLE_EVENTS = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- non-SQL-expressible ops: rows-only checks -------------------------

def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified by true Jaccard >= 0.8
    (xxhash64-based; no SQL oracle -> rows-only check)."""
    docs = _doubled_docs(spark, sf_dir)
    cand = textops.minhash_lsh_candidates(docs)
    verified = textops.ngram_jaccard(cand, docs)
    return verified.filter(F.col('jaccard') >= 0.8) \
        .select('id_a', 'id_b', F.round('jaccard', 6).alias('jaccard'))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (rows-only check)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        'doc_id', textops.simhash_col('text').alias('simhash'))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints (rows-only check)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.fingerprint(docs)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (rows-only check)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.language_id(docs.select('doc_id', 'text')) \
        .select('doc_id', 'lang_pred')


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return q_tile_assign(spark, '/root/testdata/sf0.001')


def _tuned(fn):
    """Apply engine runtime confs before running a query (the driver
    owns session creation, so per-call is the only hook)."""
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)
        return fn(spark, sf_dir)
    wrapped.__name__ = getattr(fn, '__name__', 'query')
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _tuned(v) for k, v in _RAW_QUERIES.items()}


_RAW_QUERIES = {
        'tile_assign': q_tile_assign,
        'tile_assign_salted': q_tile_assign_salted,
        'raster_tiles': q_raster_tiles,
        'knn_corners': q_knn_corners,
        'trs_roundtrip': q_trs_roundtrip,
        'pretty_twprge': q_pretty_twprge,
        'parse_fanout': q_parse_fanout,
        'tract_qqs': q_tract_qqs,
        'aliquot_simplify': q_aliquot_simplify,
        'sort_default': q_sort_default,
        'sort_by_section': q_sort_by_section,
        'consolidate': q_consolidate,
        'group_by_twprge': q_group_by_twprge,
        'dedup_trs': q_dedup_trs,
        'filter_errors': q_filter_errors,
        'dedup_lots_qqs': q_dedup_lots_qqs,
        'quick_desc': q_quick_desc,
        'membership': q_membership,
        'dedup_exact': q_dedup_exact,
        'token_count': q_token_count,
        'quality': q_quality,
        'ann_topk': q_ann_topk,
        'ann_lsh': q_ann_lsh,
        'events_hourly': q_events_hourly,
        'minhash_pairs': q_minhash_pairs,
        'simhash': q_simhash,
        'fingerprint': q_fingerprint,
        'lang_id': q_lang_id,
}


def oracle_sql() -> dict[str, str]:
    return {
        'tile_assign': _ORACLE_TILE,
        'tile_assign_salted': _ORACLE_TILE,
        'raster_tiles': _ORACLE_RASTER,
        'knn_corners': _ORACLE_KNN,
        'trs_roundtrip': _ORACLE_TRS,
        'pretty_twprge': _ORACLE_PRETTY,
        'parse_fanout': _ORACLE_FANOUT,
        'tract_qqs': _values_oracle(_GOLDEN_QQS, 'qq'),
        'aliquot_simplify': _values_oracle(_GOLDEN_ALIQUOTS, 'aliquot'),
        'sort_default': _rank_values_oracle(
            ['153n98w36', '154n97w01', '154n97w05', '154n97w14']),
        'sort_by_section': _rank_values_oracle(
            ['154n97w01', '154n97w05', '154n97w14', '153n98w36']),
        'consolidate': _ORACLE_CONSOLIDATE,
        'group_by_twprge': _ORACLE_GROUP,
        'dedup_trs': _ORACLE_DEDUP,
        'filter_errors': _ORACLE_FILTER_ERRORS,
        'dedup_lots_qqs':
            "SELECT '155n97w01' AS trs, CAST(1 AS BIGINT) AS n_dups",
        'quick_desc': """
            SELECT * FROM (VALUES
              (0, '154n97w14: NE/4'), (1, '154n97w01: S2N2'),
              (2, '154n97w05: SW/4'), (3, '153n98w36: ALL')
            ) AS g(orig_index, quick_desc)""",
        'membership': ("SELECT trs FROM (VALUES ('154n97w01'), "
                       "('154n97w14')) AS g(trs)"),
        'dedup_exact': _ORACLE_DEDUP_EXACT,
        'token_count': _ORACLE_TOKENS,
        'quality': _ORACLE_QUALITY,
        'ann_topk': _ORACLE_ANN,
        'events_hourly': _ORACLE_EVENTS,
        # minhash_pairs / simhash / fingerprint / lang_id: hash-function
        # dependent -> rows-only checks.
    }
