"""Quick single-query parity check: python scripts/check_one.py NAME [SF_DIR]

Runs the registered Spark query and its DuckDB oracle on the same parquet
tables and diffs rows the same way tests/test_oracle_parity.py does.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.session import get_spark
from spark_streaming_logservice_spark.tables import TABLES

registry.load_all()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = [tuple(norm_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sf_dir = next((a for a in sys.argv[1:] if a.startswith("/")), "/root/testdata/sf0.01")
    spark = get_spark(app_name="check-one", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    rc = 0
    for name in names:
        t0 = time.time()
        sdf = registry.QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        ts = time.time() - t0
        if name not in registry.ORACLES:
            print(f"{name}: rows-only, spark={len(srows)} rows in {ts:.2f}s")
            continue
        t0 = time.time()
        res = con.execute(registry.ORACLES[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        td = time.time() - t0
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ns, nd = _normalize(srows, scols), _normalize(drows, dcols)
        mism = [(a, b) for a, b in zip(ns, nd) if a != b]
        status = "PASS" if (ok_cols and ok_rows and not mism) else "FAIL"
        if status == "FAIL":
            rc = 1
        print(
            f"{name}: {status} spark={len(srows)} duck={len(drows)} "
            f"cols={'ok' if ok_cols else (sorted(scols), sorted(dcols))} "
            f"spark_t={ts:.2f}s duck_t={td:.2f}s"
        )
        for a, b in mism[:3]:
            print(f"  spark={a}\n  duck ={b}")
    con.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
