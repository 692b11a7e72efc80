"""Worker-side code shipping.

Plans that leave the JVM (pandas UDFs, mapInPandas) close over functions
defined in this package. By default cloudpickle serializes module-level
functions *by reference*, which makes executors try to
``import etl_cnpjs_spark`` — and on a real cluster (or any driver whose
CWD isn't the repo) the package isn't on the Python workers' sys.path.

Registering the defining module for pickle-by-value makes the closure
self-contained: the code ships inside the serialized task, no
installation or --py-files required on executors. Only the 2–3 modules
that actually define worker-side code register themselves — JVM-only
plans are unaffected.
"""

from __future__ import annotations

import sys


def pickle_by_value(module_name: str) -> None:
    """Register ``module_name`` so its functions serialize by value into
    Spark tasks. Call as ``pickle_by_value(__name__)`` at the bottom of any
    module that defines pandas-UDF / mapInPandas code."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        # best-effort: falls back to by-reference pickling (works whenever
        # the package is importable on workers, e.g. repo-CWD local mode)
        pass
