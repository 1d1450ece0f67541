"""Microbench: let-binding for repeated HOF capture re-evaluation.

``_centroid_id_expr``/``pq_encode_expr``/``bucket_expr`` reference the
``_as_double(vec)`` cast (and per-subspace slices) once per centroid /
plane / codebook entry; interpreted HOF lambdas re-evaluate captured
subexpressions per reference, so a 16-centroid argmin casts the full
array 16x per row. ``element_at(transform(array(e), v -> body(v)), 1)``
binds ``e`` once: the body sees a BOUND lambda variable, not the
expression. This proves (a) bit-identical outputs, and (b) measures the
wall delta, for both the centroid argmin and the PQ encode shapes.

MEASURED RESULT (local[32], 500k x 64-dim float32 rows, best of 3 noop
writes): the bound form is SLOWER, not faster —
  centroid_id cur 4.572s / bound 7.855s   (+72%)
  pq_encode   cur 12.084s / bound 17.577s (+45%)
mismatches=0 both shapes. The extra array wrap + element_at per row costs
more than the repeated `_as_double` cast saves (the cast's transform is
itself cheap, and Spark appears to cache the interpreted HOF's evaluated
capture per row). Kept as evidence: do NOT apply let-binding to
`_centroid_id_expr`/`pq_encode_expr`.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from alphastats_spark.session import build_session
from alphastats_spark.functions import similarity as S

spark = build_session(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
spark.sparkContext.setLogLevel("ERROR")

DIM = 64
N = 500_000

# float32-typed source column, like embeddings.parquet
vecs = spark.range(N).select(
    F.col("id"),
    F.transform(F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: ((F.col("id") % 997 + i * 13).cast("double") / 997.0)
                .cast("float")).alias("embedding"),
).persist()
vecs.count()

rng = np.random.default_rng(7)
CENTS = rng.standard_normal((16, DIM)).round(6).tolist()
BOOKS = rng.standard_normal((4, 16, DIM // 4)).round(6).tolist()


def bind_once(expr, fn):
    return F.element_at(F.transform(F.array(expr), fn), 1)


def centroid_id_bound(vec, centroids):
    def body(v):
        dists = [S._sqdist(v, c) for c in centroids]
        return S._argmin_expr(dists)
    return bind_once(S._as_double(vec), body)


def pq_encode_bound(vec, codebooks):
    sub = len(codebooks[0][0])

    def sub_argmin(cb):
        # factory keeps the transform lambda UNARY (a 2-arg lambda would
        # be handed the array index as its second argument)
        return lambda sv: S._argmin_expr([S._sqdist(sv, c) for c in cb])

    def body(v):
        parts = [
            bind_once(F.slice(v, s_i * sub + 1, sub), sub_argmin(cb))
            for s_i, cb in enumerate(codebooks)
        ]
        return F.array(*parts)
    return bind_once(S._as_double(vec), body)


def check(label, cur, new):
    bad = vecs.select(cur.alias("a"), new.alias("b")).where(
        ~F.col("a").eqNullSafe(F.col("b"))).count()
    print(f"{label}: mismatches={bad}", flush=True)


def timeit(label, col):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        vecs.select(col.alias("x")).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s", flush=True)


e = F.col("embedding")
check("centroid_id", S._centroid_id_expr(e, CENTS), centroid_id_bound(e, CENTS))
check("pq_encode", S.pq_encode_expr(e, BOOKS), pq_encode_bound(e, BOOKS))

timeit("centroid_id cur  ", S._centroid_id_expr(e, CENTS))
timeit("centroid_id bound", centroid_id_bound(e, CENTS))
timeit("pq_encode cur  ", S.pq_encode_expr(e, BOOKS))
timeit("pq_encode bound", pq_encode_bound(e, BOOKS))

spark.stop()
