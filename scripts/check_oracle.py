"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given scale factor, compares row count, column names and
order-insensitive values. Usage:

    python scripts/check_oracle.py [--json OUT.json] [sf_dir] [name ...]

``--json`` writes a committed-evidence artifact (``SWEEP_rN.json``):
``{"sf_dir": ..., "results": {name: bool}, "errors": {name: msg}}``.
``scripts/gen_registry.py`` folds these into REGISTRY.md, so replica sweeps
of queries outside the driver's 50-slot gate window are auditable instead
of living only in a round's prose.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Type-tagged normalization.

    The driver's hasher is TYPE-SENSITIVE: DuckDB types a window ``SUM`` over
    integers as HUGEINT, which pandas materializes as float64, and the driver
    then hashes ``0.0`` differently from Spark's ``0``. Python's cross-type
    equality (``0.0 == 0``) used to hide exactly that here, so every cell is
    tagged with its type category — int vs float vs bool vs str vs
    date/timestamp — and a category mismatch fails the compare just like the
    driver. numpy scalars collapse into the same category as their Python
    counterparts (both engines round-trip through pandas/collect)."""
    import datetime

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):  # bool BEFORE int: bool ⊂ int
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", round(f, 7))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, datetime.datetime):  # pd.Timestamp ⊂ datetime
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    return (type(v).__name__, str(v))


def norm_rows(rows, cols):
    return sorted(
        [tuple(norm_cell(r[c]) for c in cols) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # data-derived oracles (IVF centroids) must read the same scale factor
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        # the sf0.1 sweep's self-join-heavy dedup queries spill-OOM on the
        # 1g default driver heap (single-JVM local mode: driver = executor)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, bool] = {}
    from alphastats_spark.operators import ordered

    for name, fn in queries.items():
        if only and name not in only:
            continue
        results[name] = False
        # scope this query's tracked persists (shingle/token/band tables
        # registered via ordered.persist_tracked) to the query: without the
        # release, a 158-query session accumulates every intermediate cache
        # and OOMs at larger scale factors
        mark = ordered.pass_cache_mark()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        finally:
            ordered.release_pass_caches(mark)
        if name not in oracles:
            results[name] = True
            print(f"ok(rows-only) {name}: {len(s_rows)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        o_cols = list(odf.columns)
        if sorted(s_cols) != sorted(o_cols):
            failures.append((name, f"columns {s_cols} vs {o_cols}"))
            print(f"FAIL  {name}: columns {s_cols} vs {o_cols}")
            continue
        o_rows = odf.to_dict("records")
        if len(s_rows) != len(o_rows):
            failures.append((name, f"rows {len(s_rows)} vs {len(o_rows)}"))
            print(f"FAIL  {name}: rows {len(s_rows)} vs {len(o_rows)}")
            continue
        sn = norm_rows([r.asDict() for r in s_rows], sorted(s_cols))
        on = norm_rows(o_rows, sorted(s_cols))
        if sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL  {name}: values differ: {diff}")
            continue
        results[name] = True
        print(f"ok    {name}: {len(s_rows)} rows match")

    print(f"\n{len(failures)} failures / {len(queries)} queries")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "checked": len(results),
                    "failures": len(failures),
                    "results": results,
                    "errors": dict(failures),
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
