"""Driver-style correctness simulation.

Runs every ``queries()`` entry side-by-side with its ``oracle_sql()``
string on the same parquet tables and compares row count, schema
(column names), and a value hash over columns sorted by name — the
same comparison shape the driver uses for CORRECTNESS_r{N}.json.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, '.')

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
ONLY = set(sys.argv[2:])

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append('NULL')
            elif isinstance(v, float):
                cells.append(f'{v:.6g}')
            elif isinstance(v, (list, tuple)) or hasattr(v, 'tolist'):
                cells.append(json.dumps(
                    [x.item() if hasattr(x, 'item') else x for x in v]))
            elif isinstance(v, bool):
                cells.append(str(bool(v)).lower())
            else:
                cells.append(str(v))
        rows.append('|'.join(cells))
    rows.sort()
    return hashlib.md5('\n'.join(rows).encode()).hexdigest()


def main():
    from pytrs_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            report[name] = {'status': 'SPARK_ERROR', 'err': str(ex)[:300]}
            print(f'{name}: SPARK_ERROR {str(ex)[:200]}')
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            report[name] = {'status': 'ROWS_ONLY', 'rows': len(sdf),
                            'spark_s': round(t_spark, 2)}
            print(f'{name}: ROWS_ONLY rows={len(sdf)} '
                  f'({t_spark:.1f}s)')
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            report[name] = {'status': 'ORACLE_ERROR', 'err': str(ex)[:300]}
            print(f'{name}: ORACLE_ERROR {str(ex)[:200]}')
            continue
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = cols_ok and canon(sdf) == canon(odf)
        # Driver-canon guard: the %.6g float formatting above masks
        # int64-vs-float64 dtype splits that a stricter str()-based
        # canon (the driver's) fails on -- the r5 exact_substr_trim
        # signature.  Flag any numeric-kind mismatch per column.
        dtype_bad = []
        if cols_ok:
            for c in sdf.columns:
                ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
                if ks != ko and {ks, ko} <= {'i', 'u', 'f'}:
                    dtype_bad.append(f'{c}:{ks}!={ko}')
        status = 'MATCH' if (cols_ok and rows_ok and hash_ok
                             and not dtype_bad) else 'MISMATCH'
        report[name] = {
            'status': status, 'rows_spark': len(sdf), 'rows_oracle': len(odf),
            'cols_ok': cols_ok, 'hash_ok': hash_ok,
            'dtype_bad': dtype_bad,
            'spark_s': round(t_spark, 2),
        }
        print(f'{name}: {status} rows={len(sdf)}/{len(odf)} '
              f'cols_ok={cols_ok} hash_ok={hash_ok}'
              + (f' dtype_bad={dtype_bad}' if dtype_bad else '')
              + f' ({t_spark:.1f}s)')
        if status == 'MISMATCH' and cols_ok:
            s = sdf[sorted(sdf.columns)].astype(str).apply(
                '|'.join, axis=1).sort_values().reset_index(drop=True)
            o = odf[sorted(odf.columns)].astype(str).apply(
                '|'.join, axis=1).sort_values().reset_index(drop=True)
            only_s = set(s) - set(o)
            only_o = set(o) - set(s)
            for r in list(only_s)[:3]:
                print(f'   spark-only: {r}')
            for r in list(only_o)[:3]:
                print(f'   oracle-only: {r}')

    bad = [k for k, v in report.items()
           if v['status'] not in ('MATCH', 'ROWS_ONLY')]
    print(f"\n{len(report) - len(bad)}/{len(report)} ok; bad: {bad}")
    spark.stop()


if __name__ == '__main__':
    main()
