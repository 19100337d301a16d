"""Container query operators: the reference's TractList/TRSList
sort/group/filter/dedup/consolidate surface
(``pytrs/parser/containers/containers.py``) re-expressed as DataFrame
recipes.

The reference's containers are driver-side lists; here the DataFrame
*is* the container, so most ops are thin, shuffle-aware wrappers:

- filter / projection -> ``df.filter`` / ``df.select`` (Catalyst).
- dedup -> ``row_number`` windows over the dedup key.
- custom sort DSL ('s.reverse,r.ew,t.ns') -> compiled ``orderBy``
  expressions (stable multi-pass sort == single lexicographic sort on
  the reversed key list).
- group-by / consolidate -> ``groupBy`` + order-preserving aggregation.
"""

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Errors/undefined sort past any real value (reference uses
# max(num)+1 -- containers.py:518-537; any value above the max yields
# the same order, so a constant avoids an extra aggregation pass).
_SORT_END = 1 << 20


def filter_errors(df: DataFrame, twp=True, rge=True, sec=True,
                  undef=False) -> Column:
    """Predicate matching rows with error (optionally undefined)
    Twp/Rge/Sec components (containers.py:184-219).  Needs decomposed
    columns (operators.parse.decompose_trs)."""
    parts = []
    if twp:
        err = F.col('twp_num').isNull() & ~F.col('twp_undef')
        parts.append(err | F.col('twp_undef') if undef else err)
    if rge:
        err = F.col('rge_num').isNull() & ~F.col('rge_undef')
        parts.append(err | F.col('rge_undef') if undef else err)
    if sec:
        err = F.col('sec_num').isNull() & ~F.col('sec_undef')
        parts.append(err | F.col('sec_undef') if undef else err)
    pred = F.lit(False)
    for p in parts:
        pred = pred | p
    return pred


def dedup_key(method: str) -> Column:
    """Dedup key per the reference's filter_duplicates methods
    (containers.py:221-336)."""
    if method == 'trs':
        return F.col('trs')
    if method == 'desc':
        return F.concat_ws('_', F.col('trs'), F.trim(F.col('pp_desc')))
    if method == 'lots_qqs':
        lq = F.array_sort(F.array_distinct(F.concat('lots', 'qqs')))
        return F.concat_ws('_', F.col('trs'), F.array_join(lq, ','))
    raise ValueError(f"unknown dedup method {method!r}")


def filter_duplicates(df: DataFrame, method='trs',
                      order_col='orig_index', keep_first=False) -> DataFrame:
    """Return the duplicate rows (first occurrence is NOT a duplicate),
    or with ``keep_first=True`` drop them instead (the reference's
    ``drop`` split).  Window over the dedup key ordered by creation
    order."""
    w = Window.partitionBy(dedup_key(method)).orderBy(order_col)
    out = df.withColumn('_rn', F.row_number().over(w))
    if keep_first:
        return out.filter(F.col('_rn') == 1).drop('_rn')
    return out.filter(F.col('_rn') > 1).drop('_rn')


# --- custom sort DSL (containers.py:366-673) --------------------------

_KEY_RE = re.compile(
    r"(?P<var>[itrs])(\.(?P<method>ns|sn|ew|we|num))?"
    r"(\.(?P<rev>rev(erse)?))?$")

_LEGAL = {'i': ('num',), 't': ('ns', 'sn', 'num'),
          'r': ('ew', 'we', 'num'), 's': ('num',)}


def _n_to_s(reverse=False) -> Column:
    """North townships sort before south (negative trick); errors to
    the end (containers.py:584-609)."""
    num = F.col('twp_num')
    sign = F.when(F.col('twp_ns') == 'n', -1).otherwise(1)
    if reverse:
        sign = -sign
    return (F.when(num.isNull(), F.lit(_SORT_END))
            .otherwise(sign * num))


def _w_to_e(reverse=False) -> Column:
    """West ranges negative, east positive; errors to the end
    (containers.py:611-634)."""
    num = F.col('rge_num')
    sign = F.when(F.col('rge_ew') == 'w', -1).otherwise(1)
    if reverse:
        sign = -sign
    return (F.when(num.isNull(), F.lit(_SORT_END))
            .otherwise(sign * num))


def _safe_num(col: str) -> Column:
    return F.coalesce(F.col(col), F.lit(_SORT_END))


def compile_sort_key(key: str = 'i,s,r,t', order_col: str = 'orig_index',
                     reverse: bool = False) -> list:
    """Compile the sort-key DSL into orderBy expressions.

    The reference applies each key left-to-right as a full *stable*
    sort, so the rightmost key is the primary -- equivalent to one
    lexicographic sort on the reversed key list.  ``reverse=True``
    flips the final order (reverses every direction).
    """
    key = re.sub(r"\s", "", key.lower())
    key = re.sub(r"reverse", "rev", key)
    exprs = []
    for part in key.split(','):
        mo = _KEY_RE.match(part)
        if not mo:
            raise ValueError(f"could not interpret sort key {part!r}")
        var = mo.group('var')
        method = mo.group('method') or 'num'
        rev = mo.group('rev') is not None
        if method not in _LEGAL[var]:
            raise ValueError(f"invalid sort method: {part!r}")
        if var == 'i':
            expr = F.col(order_col)
        elif var == 's':
            expr = _safe_num('sec_num')
        elif var == 't':
            expr = {'num': _safe_num('twp_num'), 'ns': _n_to_s(False),
                    'sn': _n_to_s(True)}[method]
        else:
            expr = {'num': _safe_num('rge_num'), 'we': _w_to_e(False),
                    'ew': _w_to_e(True)}[method]
        if reverse:
            rev = not rev
        exprs.append(expr.desc() if rev else expr.asc())
    exprs.reverse()   # rightmost key is the primary sort
    return exprs


def custom_sort(df: DataFrame, key: str = 'i,s,r,t', reverse=False,
                order_col: str = 'orig_index') -> DataFrame:
    """Sort by the DSL; ``reverse=True`` flips the final order
    (containers.py:672-673: a full list reversal after the stable
    sorts, so ties also flip -- emulated by appending the creation
    order, descending, as the least-significant key)."""
    exprs = compile_sort_key(key, order_col, reverse)
    if reverse:
        exprs.append(F.col(order_col).desc())
    return df.orderBy(*exprs)


def group_by(df: DataFrame, attributes) -> DataFrame:
    """Group rows, collecting each group's tracts in creation order
    (containers.py:792-948).  Nested grouping (Q6) is the same
    groupBy -- nesting is a presentation artifact."""
    if isinstance(attributes, str):
        attributes = [attributes]
    return (df.groupBy(*attributes)
            .agg(F.sort_array(F.collect_list(F.struct(
                'orig_index', 'trs', 'desc'))).alias('tracts'),
                F.count('*').alias('n_tracts')))


def consolidate(df: DataFrame, desc_delim: str = '; ') -> DataFrame:
    """Merge tracts by TRS: concat unique descs, union lots and qqs
    preserving first-seen order (containers.py:1722-1763).

    Order-preserving dedup: explode with position, keep each value's
    first global position, re-aggregate sorted by it.
    """
    ordered = df.withColumn(
        '_ord', F.row_number().over(
            Window.partitionBy('trs').orderBy('orig_index')))

    def first_seen(col):
        exploded = (ordered
                    .select('trs', '_ord', F.posexplode_outer(col)
                            .alias('_pos', '_val'))
                    .filter(F.col('_val').isNotNull())
                    .groupBy('trs', '_val')
                    .agg(F.min(F.struct('_ord', '_pos')).alias('_first')))
        return (exploded.groupBy('trs')
                .agg(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct('_first', '_val'))),
                    lambda s: s['_val']).alias(col)))

    descs = (ordered.groupBy('trs', 'desc')
             .agg(F.min('_ord').alias('_first'))
             .groupBy('trs')
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct('_first', 'desc'))),
                     lambda s: s['desc']),
                 desc_delim).alias('desc')))
    out = descs
    for col in ('lots', 'qqs'):
        if col in df.columns:
            out = out.join(first_seen(col), 'trs', 'left')
            out = out.withColumn(
                col, F.coalesce(F.col(col), F.array().cast(
                    'array<string>')))
    return out


def list_trs(df: DataFrame, remove_duplicates=False) -> DataFrame:
    """All TRS keys in creation order; optional order-preserving
    distinct (containers.py:1672-1701)."""
    base = df.select('trs', 'orig_index').orderBy('orig_index')
    if not remove_duplicates:
        return base.select('trs')
    w = Window.partitionBy('trs').orderBy('orig_index')
    return (base.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') == 1)
            .orderBy('orig_index').select('trs'))


def contains_trs(df: DataFrame, trs_values, match_all=False) -> bool:
    """Membership test (TRSList.contains -- containers.py:1980-2012):
    ANY (semi-join non-empty) or ALL (anti-join empty)."""
    if isinstance(trs_values, str):
        trs_values = [trs_values]
    spark = df.sparkSession
    probe = spark.createDataFrame([(v,) for v in trs_values], ['trs'])
    if match_all:
        missing = probe.join(df.select('trs'), 'trs', 'left_anti')
        return missing.isEmpty()
    found = probe.join(df.select('trs'), 'trs', 'left_semi')
    return not found.isEmpty()


def quick_desc(df: DataFrame, delim: str = ': ') -> DataFrame:
    """'154n97w01: Lot 1, S/2NE/4' lines (tract.py quick_desc)."""
    return df.select(
        F.concat(F.col('trs'), F.lit(delim), F.col('desc'))
        .alias('quick_desc'), 'orig_index').orderBy('orig_index')
