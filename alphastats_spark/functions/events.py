"""Event-log analytics: sequential funnels and cohort retention.

The batch product-analytics layer over the ``events`` table, complementing
the sessionization operators in :mod:`alphastats_spark.streaming.metrics`.
Neither exists in the reference (a single-frame stats library); both are
standard warehouse workloads a Spark-native engine must cover.

Scale design
------------
* **Funnel** — the ClickHouse-``windowFunnel``-style sequence match is a
  per-user FOLD, not a per-step self-join: one shuffle collects each user's
  events, ``array_sort`` + ``F.aggregate`` run the step machine JVM-side
  (whole-stage codegen, no Python), and the per-user state is a 2-field
  struct. A k-step funnel over 100 TB is therefore one groupBy(user) plus a
  driver-free one-row summary agg — versus k shuffled self-joins in the
  naive translation. Per-user event counts bound the array; heavy hitters
  (bot users) are the only skew and can be pre-capped with a count filter.
* **Retention** — cohort = each user's first active week; activity is
  de-duplicated to (user, week) BEFORE the cohort join, so the join and the
  final rollup run on |users| × |weeks-active| rows, not raw events. All
  three aggregations are map-side combinable; the cohort join is
  co-partitioned on ``user_id`` with the groupBy that produced it, so AQE
  plans no extra shuffle for it.

Time is **integer epoch microseconds** end to end (the caller converts its
timestamp physical type once): no float epochs in boundary comparisons, no
session-timezone or week-start locale dependence (weeks are
``floor(us / 604800e6)`` since the epoch), and the DuckDB oracles mirror
the arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

US_PER_WEEK = 7 * 24 * 3600 * 1_000_000


def funnel(
    df: DataFrame,
    steps: list[str],
    max_gap_s: int = 86_400,
    user_col: str = "user_id",
    us_col: str = "us",
    type_col: str = "event_type",
    per_user: bool = False,
) -> DataFrame:
    """Ordered k-step conversion funnel with a per-step gap cap.

    A user converts to step ``i`` when an event of type ``steps[i]`` occurs
    STRICTLY after their step ``i-1`` conversion and within ``max_gap_s``
    seconds of it; the conversion instant is the earliest such event
    (chained-min semantics — deterministic, tie-break-free: simultaneous
    events never chain because the comparison is strict).

    Implemented as a sorted fold per user: ``collect_list`` the (us, type)
    pairs, ``array_sort``, then ``F.aggregate`` advances a
    ``(level, last_ts)`` accumulator — ascending order makes "first
    qualifying event" equal "min qualifying event", so the fold reproduces
    the chained-min definition in one pass. The summary is a single global
    aggregation of conditional counters, unpivoted to one row per step —
    no window over a single partition anywhere.

    Output: ``(step int, event_type string, n_users bigint)`` — one row per
    step, n_users non-increasing. ``per_user=True`` instead returns the
    per-user detail ``(user_col, lvl int, t_first bigint, t_last bigint)``
    — the reached level and the first/last conversion instants (0 when the
    user never reached step 1), from which time-to-convert distributions
    aggregate directly. Events whose type is not in ``steps`` are filtered
    before the per-user fold (semantics-preserving, see plan note below),
    so ``per_user=True`` emits rows only for users with at least one
    step-type event — a lvl-0 user with zero step events is absent rather
    than present-at-zero (no funnel metric distinguishes the two).
    """
    gap_us = F.lit(int(max_gap_s) * 1_000_000)
    seq = F.array_sort(
        F.collect_list(F.struct(F.col(us_col).alias("us"), F.col(type_col).alias("et")))
    )

    def advance(acc: Column, e: Column) -> Column:
        out = F.struct(
            acc["lvl"].alias("lvl"), acc["t"].alias("t"), acc["t0"].alias("t0")
        )
        for i, s in enumerate(steps):
            ok = (acc["lvl"] == i) & (e["et"] == s)
            if i > 0:
                ok = ok & (e["us"] > acc["t"]) & (e["us"] - acc["t"] <= gap_us)
            t0 = e["us"].cast("long") if i == 0 else acc["t0"]
            out = F.when(
                ok,
                F.struct(
                    (acc["lvl"] + 1).alias("lvl"),
                    e["us"].cast("long").alias("t"),
                    t0.alias("t0"),
                ),
            ).otherwise(out)
        return out

    zero = F.struct(
        F.lit(0).alias("lvl"),
        F.lit(0).cast("long").alias("t"),
        F.lit(0).cast("long").alias("t0"),
    )
    acc = F.aggregate(seq, zero, advance)
    # the fold can only advance on events whose type is one of `steps`
    # (every `ok` predicate requires e.et == steps[i], and the strict-after/
    # gap comparisons reference only accumulator timestamps set by such
    # events), so restricting the collect_list input to step types is
    # semantics-preserving — and shrinks the shuffle and per-user array by
    # the non-step fraction, which is also the cheap power-user-skew
    # mitigation (a user's 10⁶ page-views no longer ride along)
    levels = (
        df.select(user_col, us_col, type_col)
        .where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            acc["lvl"].alias("lvl"),
            acc["t0"].alias("t_first"),
            acc["t"].alias("t_last"),
        )
    )
    if per_user:
        return levels
    counters = [
        F.count(F.when(F.col("lvl") >= i + 1, True)).alias(f"s{i}")
        for i in range(len(steps))
    ]
    def _lit(v: str) -> str:
        # step names land in single-quoted SQL literals — escape so an
        # event type like o'reilly_click cannot break the stack() expr
        return v.replace("\\", "\\\\").replace("'", "\\'")

    stack = ", ".join(f"{i + 1}, '{_lit(s)}', s{i}" for i, s in enumerate(steps))
    return (
        levels.agg(*counters)
        .select(
            F.expr(
                f"stack({len(steps)}, {stack}) AS (step, event_type, n_users)"
            )
        )
        .select(F.col("step").cast("int").alias("step"), "event_type", "n_users")
    )


def cohort_retention(
    df: DataFrame,
    bucket_us: int = US_PER_WEEK,
    user_col: str = "user_id",
    us_col: str = "us",
) -> DataFrame:
    """Cohort retention: users active N buckets after their first activity.

    Cohort = ``floor(first_activity_us / bucket_us)`` (epoch-anchored
    buckets — no calendar/locale dependence; default weekly, pass
    ``bucket_us=86_400_000_000`` for daily cohorts). Activity collapses to
    distinct (user, bucket) first, so everything downstream of the raw scan
    is user×bucket-sized. Output:
    ``(cohort_bucket bigint, bucket_offset bigint, n_users bigint)`` where
    the ``bucket_offset`` 0 row counts the cohort itself.
    """
    act = (
        df.select(
            F.col(user_col).alias("u"),
            F.expr(f"CAST({us_col} AS BIGINT) div {int(bucket_us)}").alias("wk"),
        )
        .distinct()
    )
    cohort = act.groupBy("u").agg(F.min("wk").alias("cw"))
    return (
        act.join(cohort, on="u")
        .groupBy(
            F.col("cw").alias("cohort_bucket"),
            (F.col("wk") - F.col("cw")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def session_paths(
    df: DataFrame,
    gap_s: int = 1800,
    k: int = 5,
    top: int = 20,
    user_col: str = "user_id",
    us_col: str = "us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common session journeys: per gap-based session, the ordered
    sequence of its first ``k`` event types joined with ``>``, counted
    corpus-wide — ``(path, n_sessions)``, top ``top`` by frequency (path
    ascending on ties, so the cut is deterministic).

    Plan shape: the lag-window sessionizer partitions by user (parallel
    across users, never a global window), each session reduces through one
    groupBy whose payload is a bounded sorted (us, id, type) array, and
    the final top-N is a TakeOrderedAndProject over |distinct paths| rows
    — at 100 TB nothing beyond per-session arrays and the path count table
    ever materializes.
    """
    from pyspark.sql import Window

    gap_us = F.lit(int(gap_s) * 1_000_000)
    w = Window.partitionBy(user_col).orderBy(us_col, id_col)
    brk = F.when(
        F.lag(us_col).over(w).isNull()
        | (F.col(us_col) - F.lag(us_col).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = df.withColumn("__brk", brk).withColumn("__sid", F.sum("__brk").over(w))

    per = sess.groupBy(user_col, "__sid").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(us_col).alias("us"),
                    F.col(id_col).alias("eid"),
                    F.col(type_col).alias("et"),
                )
            )
        ).alias("__seq")
    )
    path = F.concat_ws(
        ">", F.transform(F.slice("__seq", 1, k), lambda e: e["et"])
    )
    counts = (
        per.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    return counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top)


def path_transition_matrix(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    us_col: str = "us",
    type_col: str = "event_type",
    id_col: str = "event_id",
    start_token: str = "__start__",
    end_token: str = "__end__",
) -> DataFrame:
    """First-order Markov transition matrix over session journeys:
    ``(src, dst, n_transitions, prob)`` where ``prob`` is the
    row-stochastic share ``n / Σ n over src``.

    Sessions use the same gap-based sessionizer as :func:`session_paths`
    (a new session starts after ``gap_s`` seconds of silence). Sentinel
    transitions are included — ``__start__ → first type`` and
    ``last type → __end__`` — so entry and exit probabilities fall out of
    the same matrix (P(exit | checkout) is the abandonment rate).

    Plan shape: the sessionizer and the next-event lookup are both
    lag/lead windows partitioned by user (parallel across users, never a
    global window); transitions then reduce through one map-side-combined
    groupBy over |event-type|² keys, and the probability normalizer is a
    window over that already-tiny matrix. At 100 TB the only full-data
    shuffles are the user partitioning (shared by both windows) and one
    combinable count — no self-join of the event log against itself.
    """
    from pyspark.sql import Window

    gap_us = F.lit(int(gap_s) * 1_000_000)
    w = Window.partitionBy(user_col).orderBy(us_col, id_col)
    brk = F.when(
        F.lag(us_col).over(w).isNull()
        | (F.col(us_col) - F.lag(us_col).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = df.select(user_col, us_col, id_col, type_col).withColumn(
        "__sid", F.sum(brk).over(w)
    )

    ws = Window.partitionBy(user_col, "__sid").orderBy(us_col, id_col)
    first = F.lag(type_col).over(ws).isNull()
    nxt = F.lead(type_col).over(ws)
    stepped = sess.select(
        F.col(type_col).alias("__t"),
        first.alias("__first"),
        nxt.alias("__next"),
    )
    # each event emits its outgoing edge (to the next type, or __end__);
    # session-first events additionally emit the __start__ entry edge
    out_edge = stepped.select(
        F.col("__t").alias("src"),
        F.coalesce(F.col("__next"), F.lit(end_token)).alias("dst"),
    )
    in_edge = stepped.where("__first").select(
        F.lit(start_token).alias("src"), F.col("__t").alias("dst")
    )
    counts = (
        out_edge.unionByName(in_edge)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    norm = Window.partitionBy("src")
    return counts.withColumn(
        "prob",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(norm), 7),
    )


def value_anomalies(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust per-type outlier detection: modified z-score from the median
    and the MAD (× the 1.4826 normal-consistency constant) — the
    quality-control pass run over a metric column before it is trusted,
    insensitive to the very outliers it hunts (a mean/stddev z-score
    inflates its own threshold).

    Returns flagged rows only: ``(id, type, value, robust_z > z)``; groups
    whose MAD is 0 (over half the values identical) flag nothing rather
    than dividing by zero. Plan: two grouped percentile aggregations
    (median, then MAD of residuals) over ≤|types| rows each, broadcast
    back — the event log shuffles only by ``type_col``. ``exact=False``
    swaps in the KLL-sketch ``approx_percentile`` at 100 TB.
    """
    from alphastats_spark import expressions as X

    v = F.col(value_col).cast("double")
    med = df.groupBy(type_col).agg(
        X.percentile(v, 0.5, exact=exact).alias("__med")
    )
    with_med = df.join(F.broadcast(med), type_col)
    resid = F.abs(v - F.col("__med"))
    mad = with_med.groupBy(type_col).agg(
        X.percentile(resid, 0.5, exact=exact).alias("__mad")
    )
    scored = with_med.join(F.broadcast(mad), type_col).select(
        F.col(id_col),
        F.col(type_col),
        v.alias(value_col),
        F.round(resid / (F.lit(1.4826) * F.col("__mad")), 7).alias("robust_z"),
        F.col("__mad"),
    )
    return scored.where(
        (F.col("__mad") > 0) & (F.col("robust_z") > F.lit(float(z)))
    ).drop("__mad")


def inter_event_gaps(
    df: DataFrame,
    user_col: str = "user_id",
    us_col: str = "us",
    type_col: str = "event_type",
    id_col: str = "event_id",
    exact: bool = True,
) -> DataFrame:
    """Per-type inter-event latency profile: for each event type, the
    count, median and p95 of the gap (µs) since the user's PREVIOUS event
    of any type — the ops-telemetry pass that surfaces stuck funnels and
    bot cadences (a p95 gap near 0 for 'click' is automation; a median
    gap exploding for 'purchase' is a checkout regression).

    Plan: one ``lag`` window partitioned by user (parallel across users,
    never a global sort) then a grouped percentile aggregation per type —
    the log shuffles once by user and once by type. ``exact=False`` swaps
    in the KLL-sketch ``approx_percentile`` at 100 TB.
    """
    from pyspark.sql import Window

    from alphastats_spark import expressions as X

    # id tiebreak: simultaneous events would otherwise attribute their
    # 0-gap to an engine-dependent type
    w = Window.partitionBy(user_col).orderBy(
        F.col(us_col).asc(), F.col(id_col).asc()
    )
    gap = (F.col(us_col) - F.lag(F.col(us_col)).over(w)).cast("long")
    gaps = df.select(F.col(type_col), gap.alias("__gap")).where(
        F.col("__gap").isNotNull()
    )
    g = F.col("__gap").cast("double")
    # 0.1 µs rounding: the gaps are ~1e11 µs, so full-precision doubles
    # expose last-ulp interpolation-order differences between engines
    return gaps.groupBy(type_col).agg(
        F.count("__gap").cast("long").alias("n_gaps"),
        F.round(X.percentile(g, 0.5, exact=exact), 1).alias("median_gap_us"),
        F.round(X.percentile(g, 0.95, exact=exact), 1).alias("p95_gap_us"),
    )


def attribute_conversions(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_us: int = 7 * 24 * 3600 * 1_000_000,
    model: str = "last_touch",
    half_life_us: int = 24 * 3600 * 1_000_000,
    user_col: str = "user_id",
    us_col: str = "us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion event,
    the touch event that gets credit under ``model`` —

    * ``"last_touch"``: the latest touch at or before the conversion and
      within ``window_us``;
    * ``"first_touch"``: the EARLIEST touch inside the window (the window
      anchors at the conversion: first touch in
      ``[conv - window_us, conv]``);
    * ``"linear"``: EVERY touch inside the window shares the conversion
      equally — output becomes one row per (conversion, touch) with
      ``credit = 1 / n_touches`` (an unattributed conversion still emits
      one sentinel row with ``credit = 0.0``, so conversions are never
      silently dropped and ``SUM(credit)`` = attributed conversions);
    * ``"position"``: U-shaped credits over the same per-touch rows —
      40% to the first touch in the window, 40% to the last, 20% split
      evenly across the middle; journeys with one touch keep 100%, with
      two split 50/50, so ``SUM(credit)`` per attributed conversion is
      always exactly 1;
    * ``"time_decay"``: exponential-recency credits over the same
      per-touch rows — raw weight ``0.5 ** (gap / half_life_us)``,
      normalized per conversion so credits still sum to 1 (a touch one
      half-life older than another earns half its credit).

    Output one row per conversion (one per credited touch for the
    multi-touch models ``linear`` / ``position`` / ``time_decay``):
    ``(event_id, user_id, us, touch_event_id, touch_type,
    gap_us, attributed)`` — plus ``credit`` for the multi-touch models —
    with ``-1`` /
    ``"none"`` / ``-1`` sentinels for unattributed conversions (not null —
    nullable ints coerce to NaN through arrow interchange).

    Plan (the 100 TB shape): ONE window pass partitioned by user over the
    type-filtered union of touches and conversions — never a touches ×
    conversions self-join (which re-pays the touch table once per
    conversion and explodes on power users). The frame is filtered to the
    participating event types at the scan (a pushable ``IN`` predicate,
    like the funnel's step pre-filter), so non-participating traffic never
    enters the shuffle. Per-user windows parallelize across users; a
    simultaneous touch+conversion (equal ``us``) counts for the
    conversion, ties within a timestamp break by event id — both pinned so
    the DuckDB oracle agrees row-for-row.

    ``first_touch`` runs the same single pass with a running-window trick:
    the first touch inside a trailing RANGE window is the minimum
    (us, event_id) struct over touch rows in ``[conv - window_us, conv]``.
    The multi-touch models collect the window's touch structs with a
    ``collect_list`` over the same trailing RANGE frame and explode to
    per-touch credit rows — the list is bounded by one user's touches
    inside ONE window span (the same per-user-activity bound as the
    funnel's sorted fold), never by the corpus.
    """
    if model not in ("last_touch", "first_touch", "linear", "position",
                     "time_decay"):
        raise ValueError(
            "model must be last_touch, first_touch, linear, position or "
            f"time_decay, got {model}"
        )
    if half_life_us < 1:
        raise ValueError(f"half_life_us must be >= 1, got {half_life_us}")
    if conversion_type in touch_types:
        # a conversion typed as a touch would be tagged __is_touch and
        # silently filtered out of the output — zero rows, no error
        raise ValueError(
            f"conversion_type {conversion_type!r} must not appear in "
            f"touch_types {tuple(touch_types)!r}"
        )
    from pyspark.sql import Window

    participating = [conversion_type, *touch_types]
    base = df.where(F.col(type_col).isin(participating)).select(
        F.col(user_col),
        F.col(us_col).cast("long").alias(us_col),
        F.col(type_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(type_col).isin(list(touch_types)).alias("__is_touch"),
    )
    if model == "last_touch":
        # touches sort BEFORE conversions at the same us (a simultaneous
        # touch counts), later touches win, id breaks exact ties
        w = Window.partitionBy(user_col).orderBy(
            F.col(us_col).asc(),
            F.col("__is_touch").desc(),
            F.col(id_col).asc(),
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t_struct = F.when(
            F.col("__is_touch"),
            F.struct(
                F.col(us_col).alias("t_us"),
                F.col(id_col).alias("t_id"),
                F.col(type_col).alias("t_type"),
            ),
        )
        picked = F.last(t_struct, ignorenulls=True).over(w)
    else:
        # first/linear share the trailing range frame: touch rows with
        # us in [conv - window_us, conv]
        w = (
            Window.partitionBy(user_col)
            .orderBy(F.col(us_col).asc())
            .rangeBetween(-int(window_us), 0)
        )
        t_struct = F.when(
            F.col("__is_touch"),
            F.struct(
                F.col(us_col).alias("t_us"),
                F.col(id_col).alias("t_id"),
                F.col(type_col).alias("t_type"),
            ),
        )
        if model in ("linear", "position", "time_decay"):
            # collect_list skips the null (conversion-row) structs; the
            # frame bound guarantees every collected touch is in-window.
            # array_sort orders the list by (t_us, t_id) — struct field
            # order — so touch POSITION is deterministic for the U-shaped
            # credits (and harmless for linear).
            convs = (
                base.withColumn(
                    "__ts", F.array_sort(F.collect_list(t_struct).over(w))
                )
                .where(~F.col("__is_touch"))
                .select(
                    F.col(id_col),
                    F.col(user_col),
                    F.col(us_col),
                    F.size("__ts").alias("__n"),
                    # the full list rides along for time_decay's in-row
                    # weight normalization (dropped by the final select)
                    F.col("__ts"),
                    # posexplode_outer: an empty touch list still emits ONE
                    # null row, so unattributed conversions surface as
                    # sentinel rows instead of vanishing
                    F.posexplode_outer("__ts").alias("__p", "__t"),
                )
            )
            gap = F.col(us_col) - F.col("__t.t_us")
            hit = F.col("__t").isNotNull()
            n, p = F.col("__n"), F.col("__p")
            if model == "linear":
                credit = F.lit(1.0) / n
            elif model == "time_decay":
                # normalize inside the row: the exploded row still carries
                # the full touch list, so the weight sum is an array
                # aggregate — no second window or per-conversion join
                hl = F.lit(float(half_life_us))
                wsum = F.aggregate(
                    F.col("__ts"),
                    F.lit(0.0),
                    lambda acc, t: acc
                    + F.pow(F.lit(0.5), (F.col(us_col) - t["t_us"]) / hl),
                )
                credit = F.pow(F.lit(0.5), gap / hl) / wsum
            else:
                # U-shaped: 40% first, 40% last, 20% split across the
                # middle; degenerate journeys renormalize (1 touch keeps
                # 100%, 2 touches split 50/50) so SUM(credit) stays 1.0
                credit = (
                    F.when(n == 1, F.lit(1.0))
                    .when(n == 2, F.lit(0.5))
                    .when((p == 0) | (p == n - 1), F.lit(0.4))
                    .otherwise(F.lit(0.2) / (n - 2))
                )
            return convs.select(
                F.col(id_col),
                F.col(user_col),
                F.col(us_col),
                F.when(hit, F.col("__t.t_id"))
                .otherwise(F.lit(-1))
                .cast("long")
                .alias("touch_event_id"),
                F.when(hit, F.col("__t.t_type"))
                .otherwise(F.lit("none"))
                .alias("touch_type"),
                F.when(hit, gap).otherwise(F.lit(-1)).cast("long").alias("gap_us"),
                F.when(hit, credit).otherwise(F.lit(0.0)).alias("credit"),
                hit.alias("attributed"),
            )
        picked = F.min(t_struct).over(w)

    gap = F.col(us_col) - F.col("__t.t_us")
    in_window = F.col("__t").isNotNull() & (gap <= F.lit(int(window_us)))
    return (
        base.withColumn("__t", picked)
        .where(~F.col("__is_touch"))
        .select(
            F.col(id_col),
            F.col(user_col),
            F.col(us_col),
            F.when(in_window, F.col("__t.t_id")).otherwise(F.lit(-1)).cast("long").alias(
                "touch_event_id"
            ),
            F.when(in_window, F.col("__t.t_type")).otherwise(F.lit("none")).alias(
                "touch_type"
            ),
            F.when(in_window, gap).otherwise(F.lit(-1)).cast("long").alias("gap_us"),
            in_window.alias("attributed"),
        )
    )
