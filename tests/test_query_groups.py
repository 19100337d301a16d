"""Q5/Q7 grouped-array field selection: the reference's grouped lists
carry full Tract objects (containers.py:950-1023), so the grouped
structs must be able to carry any parsed column, not a fixed trio."""

from pyspark.sql import functions as F

from pytrs_spark.operators import query as Q


def _tracts(spark):
    rows = [
        (0, '154n97w01', 1, 'NE/4', ['L1'], ['NENE', 'NWNE'], '154n97w'),
        (1, '154n97w14', 14, 'W/2', [], ['NWNW'], '154n97w'),
        (2, '153n96w03', 3, 'ALL', ['L2', 'L3'], [], '153n96w'),
        (3, '154n97w02', 2, 'SE/4', [], ['SESE'], '154n97w'),
    ]
    return spark.createDataFrame(
        rows, 'orig_index int, trs string, sec_num int, desc string, '
              'lots array<string>, qqs array<string>, twprge string')


def test_group_by_carries_requested_fields(spark):
    g = Q.group_by(_tracts(spark), 'twprge',
                   tract_fields=('trs', 'lots', 'qqs'))
    row = {r['twprge']: r for r in g.collect()}
    t = row['154n97w']['tracts']
    assert [x['trs'] for x in t] == ['154n97w01', '154n97w14', '154n97w02']
    assert t[0]['lots'] == ['L1'] and t[0]['qqs'] == ['NENE', 'NWNE']
    assert row['153n96w']['tracts'][0]['lots'] == ['L2', 'L3']


def test_sort_grouped_carries_requested_fields(spark):
    g = Q.sort_grouped(_tracts(spark), 'twprge', sort_key='s',
                       tract_fields=('orig_index', 'trs', 'qqs'))
    t = {r['twprge']: r for r in g.collect()}['154n97w']['tracts']
    # section order: 01, 02, 14
    assert [x['trs'] for x in t] == ['154n97w01', '154n97w02', '154n97w14']
    assert t[0]['qqs'] == ['NENE', 'NWNE']
    # unpack preserves the per-group order and exposes the fields
    flat = Q.unpack_group(g).filter(F.col('twprge') == '154n97w') \
        .orderBy('pos').collect()
    assert [r['qqs'] for r in flat] == [['NENE', 'NWNE'], ['SESE'], ['NWNW']]


def test_group_by_default_fields_unchanged(spark):
    g = Q.group_by(_tracts(spark), 'twprge')
    f = [fld.name for fld in
         g.schema['tracts'].dataType.elementType.fields]
    assert f == ['orig_index', 'trs', 'desc']
