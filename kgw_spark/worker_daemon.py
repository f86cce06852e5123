"""PySpark worker daemon with heavy modules preloaded before fork.

Python workers fork from the daemon process per task slot; stock
workers then import pandas/numpy/pyarrow on their first Arrow batch,
costing ~4 CPU-s EACH (mostly sys time faulting in the shared libs).
At local[8] that is ~30 CPU-s of per-leg overhead that scales with
the worker count — i.e. it taxes exactly the bigger cluster size in
the north rule's N-vs-4N scaling measurement. Importing them in the
daemon ONCE means every forked worker inherits the initialized modules
via copy-on-write for free — the same trick as
``spark.python.daemon.module`` deployments that preload model weights.

Enabled by ``session.get_spark`` via
``spark.python.daemon.module=kgw_spark.worker_daemon``.
"""

try:  # preload failures must never take down the daemon itself
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
except Exception:  # pragma: no cover - environment-dependent
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
