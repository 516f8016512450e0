"""Ship this package to executor Python workers.

Executors inherit PYTHONPATH from session start, not from driver-side
sys.path edits — so when a harness imports the engine from a foreign cwd on
an already-running session, functions shipped to workers (mapInPandas /
applyInPandasWithState closures) can't import the package. addPyFile fixes
that at runtime: the zip lands on every executor and joins the worker path.
On a real cluster this is also the correct deployment story (one archive,
no per-node installs)."""

from __future__ import annotations

import os
import shutil
import tempfile

_FLAG = "_logstream_pkg_shipped"


def ensure_executor_package(spark) -> None:
    """Idempotently add a zip of this package to the SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    import spark_streaming_logservice_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    parent = os.path.dirname(pkg_dir)
    zip_base = os.path.join(
        tempfile.gettempdir(), f"logstream-pkg-{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=parent, base_dir=os.path.basename(pkg_dir)
    )
    sc.addPyFile(zip_path)
    setattr(sc, _FLAG, True)
