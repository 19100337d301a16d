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
