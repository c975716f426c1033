"""Run the FULL driver-contract battery locally and write CORRECTNESS_LOCAL.json.

The round-2 driver recorded only the first 50 ``queries()`` entries; this
runner replicates its compare (Spark result vs DuckDB oracle over the
same parquet: row count, sorted column names, canonicalized sorted row
values) for EVERY registered query and commits the artifact, so full
coverage is independently checkable.

Usage: python tools/run_correctness_local.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sql_graph_visualizer_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES.split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    oracles = E.oracle_sql()
    ok = True
    for name, fn in E.queries().items():
        t0 = time.time()
        row: dict = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(canon(r[c]) for c in scols) for r in sdf.collect()), key=repr
            )
            res = con.sql(oracles[name])
            order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
            dcols = [res.columns[i] for i in order]
            drows = sorted(
                (tuple(canon(r[i]) for i in order) for r in res.fetchall()), key=repr
            )
            row["spark_rows"], row["oracle_rows"] = len(srows), len(drows)
            row["rows_match"] = len(srows) == len(drows)
            row["schema_match"] = scols == dcols
            row["hash_match"] = srows == drows
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"{type(ex).__name__}: {ex}"[:300]
        row["secs"] = round(time.time() - t0, 1)
        results[name] = row
        good = row["rows_match"] and row["schema_match"] and row["hash_match"]
        ok = ok and good
        print(("ok " if good else "FAIL ") + name, flush=True)

    artifact = {"sf_dir": sf_dir, "n_queries": len(results), "all_green": ok, "queries": results}
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(("ALL GREEN " if ok else "FAILURES ") + f"({len(results)} queries) -> {out_path}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
