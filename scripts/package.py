"""Build the --py-files artifact for spark-submit deployment.

Usage:  python scripts/package.py   ->  dist/pytrs_spark.zip

Cluster submission (the north-rule deployment shape):

    spark-submit \
        --py-files dist/pytrs_spark.zip \
        --conf spark.python.daemon.module=pytrs_spark.daemon \
        --conf spark.sql.adaptive.enabled=true \
        --conf "spark.sql.optimizer.excludedRules=org.apache.spark.sql.\
catalyst.optimizer.InferFiltersFromGenerate" \
        your_job.py

The zip contains only the package (no tests/bench); the pre-import
daemon module rides along so executors can use it.
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
