"""Executor-mode smoke test: the tile pipeline under Spark's
``local-cluster`` master (real separate executor JVMs with their own
Python workers -- the scaling probe's and the north rule's topology)
must produce the exact rows the single-JVM master produces.

Runs in a subprocess because one JVM allows one SparkContext and the
suite's session fixture owns it.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os
from pyspark.sql import functions as F
from pytrs_spark import datagen
from pytrs_spark.pipeline import (assign_images_to_tiles,
                                  polygon_layer_from_descs)
from pytrs_spark.session import get_spark

spark = get_spark('lc-smoke', cores=4)
spark.sparkContext.setLogLevel('ERROR')
polygons = polygon_layer_from_descs(datagen.gen_descs(spark))
images = datagen.gen_images(spark, 5000, with_bytes=False)
out = assign_images_to_tiles(images, polygons, payload_cols=())
agg = out.agg(
    F.count('*').alias('rows'),
    F.expr('bit_xor(xxhash64(image_id, trs, qq))').alias('checksum'),
).collect()[0]
print('RESULT ' + json.dumps({'rows': agg['rows'],
                              'checksum': agg['checksum'],
                              'master': spark.sparkContext.master}))
spark.stop()
"""


def _run(master):
    env = {**os.environ, 'SPARK_GRAFT_MASTER': master,
           'SPARK_GRAFT_EXECUTOR_MEM': '2g'}
    out = subprocess.run([sys.executable, '-c', _CHILD], env=env,
                         capture_output=True, text=True, cwd=REPO,
                         timeout=420)
    lines = [ln for ln in out.stdout.splitlines()
             if ln.startswith('RESULT ')]
    assert lines, f'no result from {master}:\n{out.stdout[-2000:]}' \
                  f'\n{out.stderr[-2000:]}'
    return json.loads(lines[-1][len('RESULT '):])


def test_local_cluster_matches_local():
    lc = _run('local-cluster[2,2,3072]')
    lo = _run('local[4]')
    assert lc['master'] == 'local-cluster[2,2,3072]'
    assert lc['rows'] == lo['rows'] == 5000
    assert lc['checksum'] == lo['checksum']


_CHILD_IMGGEO = r"""
import json, os
from pyspark.sql import functions as F
from pytrs_spark.operators.imageops import aspect_bucket, pack_patches
from pytrs_spark.session import get_spark

spark = get_spark('lc-imggeo', cores=4)
spark.sparkContext.setLogLevel('ERROR')
imgs = spark.range(1, 5001).select(
    F.col('id').alias('image_id'),
    (64 + (F.col('id') * 7919) % 1985).alias('w'),
    (64 + (F.col('id') * 104729) % 1985).alias('h'))
ab = aspect_bucket(imgs, batch_size=16, n_shards=8).agg(
    F.count('*').alias('ab_rows'),
    F.expr('bit_xor(xxhash64(image_id, bucket_id, batch_id, '
           'pos_in_batch))').alias('ab_ck')).collect()[0]
# strict mode = the grouped-pandas kernel: the Python worker path
# must serialize identically across real executor JVMs
ps = pack_patches(imgs, budget=4096, patch=32, n_shards=8,
                  mode='strict').agg(
    F.count('*').alias('ps_rows'),
    F.expr('bit_xor(xxhash64(image_id, seq_id, tok_offset))')
    .alias('ps_ck')).collect()[0]
print('RESULT ' + json.dumps({'ab_rows': ab['ab_rows'],
                              'ab_ck': ab['ab_ck'],
                              'ps_rows': ps['ps_rows'],
                              'ps_ck': ps['ps_ck'],
                              'master': spark.sparkContext.master}))
spark.stop()
"""


def _run_imggeo(master):
    env = {**os.environ, 'SPARK_GRAFT_MASTER': master,
           'SPARK_GRAFT_EXECUTOR_MEM': '2g'}
    out = subprocess.run([sys.executable, '-c', _CHILD_IMGGEO], env=env,
                         capture_output=True, text=True, cwd=REPO,
                         timeout=420)
    lines = [ln for ln in out.stdout.splitlines()
             if ln.startswith('RESULT ')]
    assert lines, f'no result from {master}:\n{out.stdout[-2000:]}' \
                  f'\n{out.stderr[-2000:]}'
    return json.loads(lines[-1][len('RESULT '):])


def test_imggeo_local_cluster_matches_local():
    """Aspect bucketing (pure codegen) AND strict patch packing (the
    grouped-pandas next-fit kernel) must be byte-identical between
    real separate executor JVMs and the single-JVM master."""
    lc = _run_imggeo('local-cluster[2,2,3072]')
    lo = _run_imggeo('local[4]')
    assert lc['ab_rows'] == lo['ab_rows'] == 5000
    assert lc['ps_rows'] == lo['ps_rows'] == 5000
    assert lc['ab_ck'] == lo['ab_ck']
    assert lc['ps_ck'] == lo['ps_ck']
