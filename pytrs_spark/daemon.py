"""Custom PySpark worker daemon that pre-imports heavy modules.

``spark.python.daemon.module=pytrs_spark.daemon`` makes executors
launch this module instead of ``pyspark.daemon``.  The daemon process
imports pandas / pyarrow / numpy and the parse kernels ONCE; every
worker it forks inherits the loaded modules copy-on-write, so per-
worker startup drops from ~1-2 s of imports to ~0.  With chained
Arrow-batched UDF stages (document parse -> tract parse -> geometry)
a single task can hold 3 workers; across 32 task slots that is ~100
worker spawns per job, which made import cost the dominant wall-clock
term on small inputs.

The protocol is unchanged: ``pyspark.daemon`` resolves the worker
module from ``sys.argv`` at import time, and ``manager()`` does the
rest.
"""

# Heavy third-party imports first (shared library init dominates).
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # Parse kernels (compiled regexes etc.); optional so a worker
    # env without the repo on PYTHONPATH still comes up.
    import pytrs_spark.plss.aliquot  # noqa: F401
    import pytrs_spark.plss.document  # noqa: F401
    import pytrs_spark.plss.simplify  # noqa: F401
    import pytrs_spark.plss.tract  # noqa: F401
    import pytrs_spark.plss.trs  # noqa: F401
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
