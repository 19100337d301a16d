"""Self-contained demo job for ``spark-submit --py-files`` deployment
(the north-rule run shape).  Everything imports from the shipped zip;
no repo checkout is needed on the cluster.

    python scripts/package.py
    spark-submit \
        --master local-cluster[2,2,2048] \
        --conf spark.executor.memory=1g \
        --conf spark.python.daemon.module=pytrs_spark.daemon \
        --py-files dist/pytrs_spark.zip \
        scripts/submit_job.py [n_images]

Builds the PLSS polygon layer from synthetic legal descriptions,
generates ``n_images`` synthetic image rows (input_hint schema),
assigns every image to its (trs, qq) aliquot tile, and prints one
JSON line with the row count and an order-independent checksum --
the same numbers for any master / cluster size, which is the point.
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # The session comes from spark-submit; apply the engine's runtime
    # confs to it instead of building our own.
    spark = SparkSession.builder.appName('pytrs-submit-demo') \
        .getOrCreate()
    from pytrs_spark import datagen
    from pytrs_spark.pipeline import (
        assign_images_to_tiles,
        polygon_layer_from_descs,
    )
    from pytrs_spark.session import tune_session
    tune_session(spark)

    t0 = time.time()
    polygons = polygon_layer_from_descs(datagen.gen_descs(spark))
    polygons.cache()
    n_polys = polygons.count()
    images = datagen.gen_images(spark, n_images, with_bytes=False)
    out = assign_images_to_tiles(images, polygons, payload_cols=())
    agg = out.agg(
        F.count('*').alias('rows'),
        # bit_xor: order-independent and cannot overflow under the
        # ANSI-mode default (sum(xxhash64) throws ARITHMETIC_OVERFLOW).
        F.expr('bit_xor(xxhash64(image_id, trs, qq))').alias('checksum'),
    ).collect()[0]
    print(json.dumps({
        'master': spark.sparkContext.master,
        'executors': spark.sparkContext.defaultParallelism,
        'n_polygons': n_polys,
        'assigned_rows': agg['rows'],
        'checksum': agg['checksum'],
        'wall_s': round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
