"""Microbench: interpreted HOF dot/sqdist vs flat unrolled F.expr forms.

Proves (a) the flat form is bit-identical (leading 0.0D reproduces the
aggregate fold's sum order; per-ELEMENT cast replicates _as_double's
widening), and (b) its wall delta on a knn_join-sized pair volume.

MEASURED CAVEAT (round 14): the flat form's 2.1× win here (26.1 s →
12.5 s over persisted 2M×64-dim pairs) DOES NOT TRANSFER to a join
stage. The same expression in the projection of the knn_join's bucket
self-join measured 2.7× SLOWER than the HOF fold (49.1 s vs 18.0 s over
the same 2M pairs): the join's whole-stage-codegen method grows past the
JIT's compile limit and the 64-term expression runs in interpreted
generated code. Chunked partial sums keep methods small but change the
addition order (1.18M/2M pre-round bitwise mismatches — not identical).
Every production pair-scoring site therefore keeps the HOF fold; the
shipped optimization is scoring each DISTINCT pair once
(similarity.knn_join / dedup.embedding_near_dup_pairs_lsh, round 14).
This script is kept as the record of WHERE the flat form is valid: a
projection over a materialized (persisted/scan) input.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alphastats_spark.session import build_session

spark = build_session(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "12g"})
spark.sparkContext.setLogLevel("ERROR")

from pyspark import StorageLevel  # noqa: E402

DIM = 64
N = 2_000_000  # same order as the sf0.1 knn_join pair volume

pairs = spark.range(N).select(
    F.transform(F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (F.col("id") % 97 + i).cast("double") / 97.0).alias("a"),
    F.transform(F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (F.col("id") % 89 + i * 2).cast("double") / 89.0).alias("b"),
).persist(StorageLevel.MEMORY_AND_DISK)
pairs.count()


def _dot_hof(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _dot_flat(a: str, b: str, dim: int):
    terms = "+".join(
        f"(element_at(`{a}`,{i})*element_at(`{b}`,{i}))" for i in range(1, dim + 1)
    )
    return F.expr(f"(0.0D+{terms})")


# bit-equality over every row
from pyspark.sql import types as T  # noqa: E402

chk = pairs.select(
    _dot_hof(F.col("a"), F.col("b")).alias("h"),
    _dot_flat("a", "b", DIM).alias("f"),
).select(
    # value mismatch, or zero with a different sign (1/±0 = ±Inf)
    F.sum(
        F.when(
            ~(F.col("h").eqNullSafe(F.col("f")))
            | ((F.col("h") == 0.0) & ~((1.0 / F.col("h")).eqNullSafe(1.0 / F.col("f")))),
            1,
        ).otherwise(0)
    ).alias("mismatch")
).first()
print("bitwise mismatches:", chk["mismatch"])


def timeit(label, df):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s")


timeit("hof  dot", pairs.select(_dot_hof(F.col("a"), F.col("b")).alias("d")))
timeit("flat dot", pairs.select(_dot_flat("a", "b", DIM).alias("d")))

spark.stop()
