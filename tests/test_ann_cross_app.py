"""Cross-APPLICATION train-once proof for the persisted ANN index
(VERDICT r9 item 2): a FRESH Spark application serving a corpus that a
previous application already indexed must reattach to the durable store —
zero training/encode jobs — and return bit-identical results.

Two subprocesses (each its own Python + JVM = its own applicationId):
the first builds the index through the registered served queries; the
second has ``build_ann_index`` poisoned to raise, so the run can only
succeed by reattaching, and its results must equal the first's exactly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_CHILD = """
import json, os, sys

mode, root, sf_dir, out = sys.argv[1:5]
os.environ["SPARK_GRAFT_ANN_STORE_ROOT"] = root

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.session import get_spark
from spark_streaming_logservice_spark.streaming import ann_index as AI

registry.load_all()

if mode == "serve":
    # a fresh serving application must NEVER train: poison the build path
    def _no_build(*a, **k):
        raise AssertionError(
            "build_ann_index called in the serving application — the "
            "store was not reattached"
        )

    AI.build_ann_index = _no_build

spark = get_spark(
    app_name=f"ann-crossapp-{mode}", master="local[4]", shuffle_partitions=4
)
res = {"app": spark.sparkContext.applicationId}
res["store"] = AI.ensure_index(spark, sf_dir)
for name in ("s24_ann_ivf_served", "s25_ann_pq_served"):
    rows = registry.QUERIES[name](spark, sf_dir).collect()
    res[name] = sorted(repr(tuple(r)) for r in rows)
with open(out, "w") as f:
    json.dump(res, f)
spark.stop()
"""


def _run_child(mode: str, root: str, out: str) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_ANN_STORE_ROOT", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, root, SF_DIR, out],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{mode} application failed:\n{proc.stderr[-4000:]}"
    )
    with open(out) as f:
        return json.load(f)


def test_fresh_application_serves_without_training(tmp_path):
    root = str(tmp_path / "stores")
    built = _run_child("build", root, str(tmp_path / "build.json"))
    data = os.path.join(built["store"], "centroids", "data")
    built_mtime = os.stat(data).st_mtime_ns

    served = _run_child("serve", root, str(tmp_path / "serve.json"))

    assert served["app"] != built["app"], "distinct applications required"
    assert served["store"] == built["store"]
    assert (
        os.stat(data).st_mtime_ns == built_mtime
    ), "serving application must not rewrite the frozen artifacts"
    for name in ("s24_ann_ivf_served", "s25_ann_pq_served"):
        assert served[name] == built[name], f"{name} drifted across apps"
