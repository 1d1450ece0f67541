"""One-off empirical scale validation (~sf1, 10x the bench inputs).

The small-SF gates prove correctness; this run converts the scale DESIGN
claims (two-phase prefixes, per-pass persisted windowed frames, keyed
long-frame O(1) plans) into measurements:

1. Synthesizes an sf1-equivalent orders/lineitem pair (1.5M / 6M rows,
   same 1992-1998 date range as the TPC-H testdata so the derived daily
   returns frame keeps its calendar shape) and runs the six headline
   bench queries on it via bench.py.
2. Runs ``long_frame.metrics_by_key`` at two asset counts (200 and 2000
   assets x ~2500 days, 0.5M and 5M input rows) and reports the wall-time
   scaling exponent log(t2/t1)/log(10) — the keyed prefix machinery's
   claim is sub-linear-in-rows wall time on a fixed-core box until the
   cores saturate (partitions grow, per-partition work stays windowed).

Usage:  python scripts/scale_run.py [workdir] [scale]   (default /tmp/as_scale 1.0)
``scale`` multiplies the sf1 synthetic (10.0 = sf10: 15M orders / 60M
lineitem, long-frame probe at 2k -> 20k assets — the second decade).
Prints one JSON line; paste the result into the bench notes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize(spark, out_dir: str, scale: float) -> None:
    from pyspark.sql import functions as F

    n_orders = int(1_500_000 * scale)
    n_lines = int(6_000_000 * scale)
    days = 2400  # ~1992-1998, matching the TPC-H testdata calendar
    orders = (
        spark.range(0, n_orders, 1, 32)
        .select(
            F.date_add(
                F.lit("1992-01-01").cast("date"), F.pmod(F.hash("id"), F.lit(days))
            ).alias("o_orderdate"),
            (F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(100_000)) / 100.0 + 900.0).alias(
                "o_totalprice"
            ),
        )
    )
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    lineitem = (
        spark.range(0, n_lines, 1, 32)
        .select(
            F.date_add(
                F.lit("1992-01-01").cast("date"), F.pmod(F.hash(F.col("id") + 13), F.lit(days))
            ).alias("l_shipdate"),
            (F.pmod(F.hash(F.col("id") * 11 + 3), F.lit(90_000)) / 100.0 + 100.0).alias(
                "l_extendedprice"
            ),
            (F.pmod(F.hash(F.col("id") * 17 + 5), F.lit(10)) / 100.0).alias("l_discount"),
        )
    )
    lineitem.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def long_frame_run(spark, n_assets: int, n_days: int = 2520) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from alphastats_spark import long_frame

    rows = n_assets * n_days
    df = (
        spark.range(0, rows, 1, 32)
        .select(
            F.concat(F.lit("a"), (F.col("id") % n_assets).cast("string")).alias("asset"),
            F.date_add(
                F.lit("2015-01-01").cast("date"),
                (F.col("id") / n_assets).cast("int"),
            ).alias("d"),
            (F.pmod(F.hash(F.col("id") * 31 + 7), F.lit(2001)) / 50_000.0 - 0.02).alias("r"),
        )
    )
    t0 = time.perf_counter()
    out = long_frame.metrics_by_key(df, key_col="asset", value_col="r", temporal="d")
    n = out.count()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 3), n


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/as_scale"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    sf_dir = f"{work}/sf{scale}"
    os.makedirs(sf_dir, exist_ok=True)

    from alphastats_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="alphastats-scale-run",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{sf_dir}/orders.parquet/_SUCCESS"):
        synthesize(spark, sf_dir, scale=scale)

    # keyed long-frame scaling: 10x assets at fixed calendar; asset counts
    # ride the requested decade (scale=10 probes 2k -> 20k assets / 50M rows)
    base_assets = max(1, int(200 * scale))
    t_small, n_small = long_frame_run(spark, base_assets)
    t_big, n_big = long_frame_run(spark, base_assets * 10)
    import math

    exponent = round(math.log(t_big / t_small) / math.log(10), 3)
    spark.stop()
    print(
        json.dumps(
            {
                "long_frame": {
                    "assets_200_rows_504k_sec": t_small,
                    "assets_2000_rows_5040k_sec": t_big,
                    "keys_out": [n_small, n_big],
                    "scaling_exponent_base10": exponent,
                }
            }
        ),
        flush=True,
    )

    # headline bench at synthetic sf1 through the UNMODIFIED bench harness
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, f"{REPO}/bench.py"], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit("bench.py produced no JSON at the synthetic SF")
    bench = json.loads(lines[-1])

    print(
        json.dumps(
            {
                "metric": "scale_validation",
                "synthetic_sf": scale,
                "bench": {"total_sec": bench["value"], "queries": bench["queries"]},
                "long_frame": {
                    "assets": [base_assets, base_assets * 10],
                    "seconds": [t_small, t_big],
                    "keys_out": [n_small, n_big],
                    "scaling_exponent_base10": exponent,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
