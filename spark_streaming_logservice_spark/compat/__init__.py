"""Thin compatibility layer mirroring the reference's public factory surface
(SURVEY.md §2.1 S16/S17, §7.2 M6).

The reference exposes ~20 ``createStream`` / ``createDirectStream`` /
``createRDD`` overloads (DS/LoghubUtils.scala:36-1061) plus a py4j-shimmed
Python API (PY/loghub.py:26-196). DStreams are EOL in Spark 4; each factory
here returns the Structured-Streaming/DataFrame equivalent with keyword
arguments instead of positional overload walls.
"""

from spark_streaming_logservice_spark.compat.factories import (  # noqa: F401
    commit_async,
    create_direct_stream,
    create_rdd,
    create_stream,
)
from spark_streaming_logservice_spark.compat.retry import retry_with_backoff  # noqa: F401
