"""PySpark worker daemon with the engine's kernel imports preloaded.

Used via ``spark.python.daemon.module=lse.spark_daemon`` (set in
:func:`lse.session.get_spark`). The stock daemon forks a bare worker per
task; any task whose UDF references numpy/pandas or an ``lse`` kernel
module then pays the full import chain (~150 ms) inside the task the
first time that particular pooled worker sees it — and because the idle
pool is drained FIFO, a serving query keeps landing on workers that have
never imported the kernels. Importing them HERE, before the daemon ever
forks, means every worker inherits hot modules through fork
copy-on-write: imports cost once per executor, not once per worker.

Falls back silently when the repo modules are not importable (the daemon
must never fail to start — a bare worker is merely slower).
"""

try:  # the heavy scientific stack first — always available on workers
    import numpy  # noqa: F401
    import pandas  # noqa: F401
except Exception:  # pragma: no cover — leave the worker bare
    pass

try:  # engine kernel modules referenced by serving/build UDF closures
    from . import codec  # noqa: F401
    from . import local_exec  # noqa: F401
    from . import phrase  # noqa: F401
    from . import tokenizer  # noqa: F401
    from . import wand  # noqa: F401
except Exception:  # pragma: no cover — workers outside the repo tree
    pass


# ---------------------------------------------------------------------------
# Per-task importlib.invalidate_caches() throttle.
#
# pyspark.worker_util.setup_spark_files runs importlib.invalidate_caches()
# on EVERY task. When pyspark is imported from pyspark.zip (the default
# PYTHONPATH spark-submit hands to workers), sys.path_importer_cache holds
# one zipimporter per pyspark subpackage, and CPython's
# zipimporter.invalidate_caches() re-reads the entire multi-MB zip
# directory — measured ~120 ms per task, the single largest fixed cost of
# every python-eval job. The invalidation only has observable effect when
# sys.path gained an entry (a newly shipped py-file) or an archive
# changed; both are one-time per application here. Re-validate when
# add_path actually adds something, plus a 30 s staleness backstop.
# ---------------------------------------------------------------------------
import time as _time

try:
    import pyspark.worker_util as _wu

    _orig_add_path = _wu.add_path
    _inval_state = {"dirty": True, "last": 0.0}

    def _add_path_tracking(path):
        import sys as _sys

        if path not in _sys.path:
            _inval_state["dirty"] = True
        _orig_add_path(path)

    class _ThrottledImportlib:
        """importlib facade: invalidate_caches only when the path set
        changed or 30 s elapsed; everything else passes through."""

        def __getattr__(self, name):
            import importlib as _il

            return getattr(_il, name)

        def invalidate_caches(self):
            import importlib as _il

            now = _time.monotonic()
            if _inval_state["dirty"] or now - _inval_state["last"] >= 30.0:
                _inval_state["dirty"] = False
                _inval_state["last"] = now
                _il.invalidate_caches()

    _wu.add_path = _add_path_tracking
    _wu.importlib = _ThrottledImportlib()
except Exception:  # pragma: no cover — stock behavior is merely slower
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
