"""Build the --py-files artifact for spark-submit deployment.

Usage:  python scripts/package.py   ->  dist/pytrs_spark.zip

Cluster submission (the north-rule deployment shape; verified
end-to-end in this sandbox against ``local-cluster[2,2,2048]`` --
2 real executor JVMs -- with ``scripts/submit_job.py``, checksum
identical to a ``local[4]`` run):

    spark-submit \
        --master <cluster master> \
        --py-files dist/pytrs_spark.zip \
        --conf spark.python.daemon.module=pytrs_spark.daemon \
        --conf spark.executorEnv.PYTHONPATH=<path>/pytrs_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf "spark.sql.optimizer.excludedRules=org.apache.spark.sql.\
catalyst.optimizer.InferFiltersFromGenerate" \
        your_job.py

The zip contains only the package (no tests/bench).  The
``executorEnv.PYTHONPATH`` line matters iff you keep the pre-import
daemon: executors launch the Python worker daemon BEFORE the
--py-files path injection, so the daemon module must already be on
the worker interpreter's path (ship the zip to a fixed path via your
cluster's file distribution, or pip-install the package on
executors).  Without that conf, drop the daemon line too -- the
engine runs fine on the stock daemon, just without the worker
pre-import warm-up.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_dir = os.path.join(REPO, 'dist')
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, 'pytrs_spark.zip')
    pkg = os.path.join(REPO, 'pytrs_spark')
    with zipfile.ZipFile(out, 'w', zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if '__pycache__' in root:
                continue
            for f in files:
                if not f.endswith('.py'):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == '__main__':
    main()
