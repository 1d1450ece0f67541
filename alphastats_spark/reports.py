"""QuantStats-style metrics report (reference ``alphastats/reports.py``).

API parity: ``metrics(returns, benchmark=None, rf=0.0, display=True,
mode="basic"|"full", sep=False, compounded=True, periods_per_year=252,
match_dates=True, strategy_title=..., benchmark_title=...)`` produces the
same ~36-row (basic) / ~70-row (full) Metric×Strategy[×Benchmark] string
table in the legacy QuantStats row order
(``tests/test_quantstats_parity.py:57-167``).

Execution parity is deliberately NOT kept: the reference evaluates each cell
as its own ``collect()`` (``reports.py:397-447``) — O(rows×columns)
mini-queries, hundreds of Spark jobs if translated naively (SURVEY §3C).
Here the whole report runs in a fixed small number of Spark jobs regardless
of column count:

1. one metadata pass (max date, per-column first/last non-null date);
2. ONE main aggregation pass computing every scalar metric expression for
   every column — including trailing-window returns as conditional
   aggregates with literal date bounds, streak lengths via the prefix-max
   trick, and autocorrelation coefficients for smart ratios;
3. one dependent pass for CVaR / serenity (literal-injected thresholds);
4. one calendar pass per granularity (month / quarter / year);
5. one gaps-and-islands pass for drawdown episode rows.

Report-only semantics preserved from the reference: NaN→null→**0** fill on
the series (``reports.py:376-378`` — unlike the raw stats API which keeps
nulls), start/end dates from the pre-fill null pattern, the CAGR row's
per-period rf subtraction (``reports.py:470-476``), alpha annualized with
252 regardless of ``periods_per_year`` (``reports.py:509``), and
``"-"`` for non-finite cells (``reports.py:547-548``).
"""

from __future__ import annotations

import calendar as _calendar
import datetime as dt
import math
from concurrent.futures import ThreadPoolExecutor
from statistics import NormalDist
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alphastats_spark import expressions as X
from alphastats_spark._utils import (
    get_temporal_column_name,
    numeric_column_names,
    prepare_benchmark,
    to_returns_df,
)
from alphastats_spark.operators import islands, joins, ordered

_NORMAL = NormalDist()


# ---------------------------------------------------------------------------
# public entry point


def metrics(
    returns,
    benchmark=None,
    rf: float = 0.0,
    display: bool = True,
    mode: str = "basic",
    sep: bool = False,
    compounded: bool = True,
    periods_per_year: int = 252,
    prepare_returns: bool = True,
    match_dates: bool = True,
    numeric: bool = False,
    **kwargs: Any,
):
    """Build the QuantStats-style performance report (reference ``reports.py:22-290``).

    ``numeric=True`` (with ``display=False``) returns the pre-formatting
    scalar table instead of the legacy string table: one ``Metric`` string
    column plus one ``double`` column per strategy, keeping only rows whose
    cells are numbers (date rows and benchmark ``"-"`` placeholders are
    dropped). This is the value-checkable surface — formatting applies
    2-decimal rounding and renders non-finite as ``"-"``, which destroys
    hash comparability.
    """
    del prepare_returns

    frame, output_names, benchmark_name, temporal = _prepare_frame(
        returns,
        benchmark,
        match_dates=match_dates,
        strategy_title=kwargs.get("strategy_title", "Strategy"),
        benchmark_title=kwargs.get("benchmark_title", "Benchmark"),
    )
    pct = 100 if display or "internal" in kwargs or kwargs.get("as_pct", False) else 1
    full = mode.lower() == "full"
    has_bench = benchmark_name is not None

    # The report makes ~6 passes (meta, main agg, stage-2, calendar×3,
    # islands), and every prefix-sum pass carries a broadcast-join branch
    # that would otherwise recompute the whole ingest lineage (the branch
    # count doubles per pass). Persisting the prepared frame makes every
    # pass and branch read one cached copy. A returns frame is bounded by
    # time-grain × assets — tiny relative to the raw inputs it was derived
    # from — so MEMORY_AND_DISK is safe at any scale.
    frame.persist()

    # Pool + persisted frames are released on EVERY exit path: an
    # exception mid-report must not leak the executor threads or cached
    # RDDs (the per-chunk rdf persists below are also registered here;
    # their success-path unpersist makes the finally a no-op for them).
    # The prefix passes inside the chunk loop persist their own windowed
    # frames — the report fully materializes everything it returns, so
    # those are released too, via the scoped pass-cache mark.
    # Cap rendered-plan text: the chunk loop chains ~6 persisted prefix
    # passes, and each InMemoryRelation prints its whole cached adaptive
    # subtree — listener-event plan strings grow geometrically with pass
    # depth and can OOM the driver (the query itself is fine). Sessions
    # from build_session already carry this; set it here too because the
    # report must survive on a caller-provided session.
    frame.sparkSession.conf.set("spark.sql.maxPlanStringLength", "1048576")

    pool = ThreadPoolExecutor(max_workers=6)
    _persisted = [frame]
    _cache_mark = ordered.pass_cache_mark()
    try:

        # ---- job A: date metadata (pre-fill null pattern) --------------------
        # Submitted as a future: nothing before the main aggregation needs it —
        # the enrichment (order/drawdown prefix) passes are metadata-free, so
        # the meta job overlaps their materialization below.
        meta_aggs = []
        if temporal:
            meta_aggs.append(F.max(F.col(temporal)).alias("__max_ts"))
            for c in output_names:
                meta_aggs.append(
                    F.min(F.when(F.col(c).isNotNull(), F.col(temporal))).alias(f"start_{c}")
                )
                meta_aggs.append(
                    F.max(F.when(F.col(c).isNotNull(), F.col(temporal))).alias(f"end_{c}")
                )
        meta_fut = pool.submit(lambda: frame.agg(*meta_aggs).first()) if meta_aggs else None

        # ---- fill nulls with 0 (report-only policy) --------------------------
        filled = frame.select(
            *([F.col(temporal)] if temporal else []),
            *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in output_names],
        )

        # ---- enrichment + aggregation, chunked over asset-column groups ------
        # A single pass over a WIDE frame explodes Janino codegen superlinearly
        # (~35 aggregate expressions per column incl. exact-percentile object
        # aggregates, plus 4 window/prefix expressions per column in the
        # drawdown machinery): measured driver OOM at 30 columns on a 4 GB
        # heap, and minutes of compile time just below that. Processing groups
        # of ``agg_chunk_columns`` (default 8) bounds every generated method,
        # at the cost of ceil(cols/chunk) scans of the CACHED base frame —
        # versus the reference's O(rows × cols) collects. The benchmark column
        # rides along in every group so benchmark-relative aggregates stay
        # single-pass.
        chunk = max(1, int(kwargs.get("agg_chunk_columns", 8)))
        main: dict[str, Any] = {}
        stage2: dict[str, Any] = {}
        episodes: dict[str, dict[str, float]] = {}

        # Independent report passes run as CONCURRENT Spark jobs (submitted
        # from threads — the standard Spark multi-job pattern): the calendar
        # aggregates depend only on the filled frame, so they overlap the whole
        # chunk loop; within a chunk, the enrichment materialization overlaps
        # the meta job, then the episode islands pass (which never reads the
        # main aggregate) overlaps the main aggregation, and the stage-2
        # CVaR agg (literal thresholds from main) runs while episodes finish.
        # Per-asset report frames are tiny, so each pass is dominated by fixed
        # job/stage overhead — overlapping them buys wall-clock roughly equal
        # to the sum of the shorter passes, and on a real cluster concurrent
        # small jobs interleave harmlessly under FIFO scheduling.
        cal_futs = {}
        if temporal:
            cal_futs["month"] = pool.submit(
                _calendar_agg, filled, temporal, output_names, "month", rf
            )
            if full:
                cal_futs["quarter"] = pool.submit(
                    _calendar_agg, filled, temporal, output_names, "quarter", rf
                )
                cal_futs["year"] = pool.submit(
                    _calendar_agg, filled, temporal, output_names, "year", rf
                )

        windows = None
        meta = None
        max_ts = None
        for start in range(0, len(output_names), chunk):
            group = list(output_names[start : start + chunk])
            sel = ([F.col(temporal)] if temporal else []) + [F.col(c) for c in group]
            if full and has_bench and benchmark_name not in group:
                sel.append(F.col(benchmark_name))
            gframe = filled.select(*sel)

            rdf = ordered.with_order(gframe, temporal)
            # ONE fused enrichment: peak positions (= episode ids, so the
            # episode stats below need no island pass), the full-mode row
            # index and lag columns all ride the drawdown SUMS pass, and the
            # streak-break maxes (which read the row index) ride the PEAK
            # pass — two ordered passes total where the naive chain runs
            # five (drawdowns×2, row index, streak maxes, lags), each with
            # its own persist, bucket aggregate and broadcast join.
            extra_sums: dict = {}
            extra_maxes: dict = {}
            extra_lags: dict = {}
            if full:
                extra_sums["__idx"] = F.lit(1).cast("long")
                for c in group:
                    extra_maxes[f"__lbw_{c}"] = (
                        F.when(F.col(c) > 0, F.lit(None)).otherwise(F.col("__idx"))
                    )
                    extra_maxes[f"__lbl_{c}"] = (
                        F.when(F.col(c) < 0, F.lit(None)).otherwise(F.col("__idx"))
                    )
                    extra_lags[f"__prev_{c}"] = c
            rdf = ordered.add_drawdown_columns(
                rdf,
                {f"__dd_{c}": c for c in group},
                with_peak_pos=True,
                extra_sums=extra_sums,
                extra_maxes=extra_maxes,
                extra_lags=extra_lags,
            )
            rdf.persist()
            _persisted.append(rdf)
            # materialize the enrichment concurrently with the meta job; the
            # main agg and episode pass below then both read one cached copy
            mat_fut = pool.submit(rdf.count)

            if meta_fut is not None and meta is None:
                meta = meta_fut.result()
                max_ts = meta["__max_ts"]
                if isinstance(max_ts, dt.datetime):
                    max_ts = max_ts.date()
                windows = _window_bounds(max_ts) if temporal else None

            aggs: list = []
            for c in group:
                aggs.extend(_column_aggs(c, rf, compounded, periods_per_year, full, windows))
                if full and has_bench and c != benchmark_name:
                    aggs.extend(_bench_aggs(c, benchmark_name))
            mat_fut.result()

            # episodes never read the main aggregate — overlap it with the
            # main aggregation on the now-cached enrichment frame
            eps_fut = pool.submit(
                islands.drawdown_episode_stats,
                rdf, group, None,
                {c: f"__dd_{c}" for c in group},
                {c: f"__dd_{c}__pos" for c in group},
            )
            main.update(rdf.agg(*aggs).first().asDict())

            # dependent pass: CVaR + serenity (serenity is in basic mode too)
            s2_aggs = []
            for c in group:
                ddvar = main[f"ddvar_{c}"]
                if ddvar is not None and not math.isnan(ddvar):
                    dd = F.col(f"__dd_{c}")
                    s2_aggs.append(
                        F.coalesce(
                            F.mean(X.when_pl(dd < F.lit(ddvar), dd, None)), F.lit(ddvar)
                        ).alias(f"ddcvar_{c}")
                    )
                if full:
                    v = main[f"var_{c}"]
                    if v is not None and not math.isnan(v):
                        col = F.col(c)
                        s2_aggs.append(
                            F.coalesce(
                                F.mean(X.when_pl(col < F.lit(v), col, None)), F.lit(v)
                            ).alias(f"cvar_{c}")
                        )
            if s2_aggs:
                stage2.update(rdf.agg(*s2_aggs).first().asDict())
            episodes.update(eps_fut.result())
            rdf.unpersist()
            _persisted.remove(rdf)

        # ---- calendar passes (submitted before the chunk loop) ----------------
        cal: dict[str, Any] = {k: f.result() for k, f in cal_futs.items()}
    finally:
        pool.shutdown(wait=True, cancel_futures=True)
        for _p in _persisted:
            _p.unpersist()
        ordered.release_pass_caches(_cache_mark)

    # ---- assemble ----------------------------------------------------------
    rows: list[tuple[str, dict[str, Any]]] = []

    def add(label: str, values: dict[str, Any]) -> None:
        rows.append((label, values))

    def add_sep() -> None:
        if sep:
            rows.append(("", dict.fromkeys(output_names, "")))

    def per_col(fn) -> dict[str, Any]:
        return {c: fn(c) for c in output_names}

    def bench_row(fn) -> dict[str, Any]:
        values = dict.fromkeys(output_names, "-")
        if has_bench:
            for c in output_names:
                if c != benchmark_name:
                    values[c] = fn(c)
        return values

    def g(name: str, c: str) -> float:
        v = main[f"{name}_{c}"]
        return math.nan if v is None else float(v)

    n_by_col = {c: int(g("n", c)) for c in output_names}

    if temporal and meta is not None:
        add("Start Period", per_col(lambda c: _format_date(meta[f"start_{c}"])))
        add("End Period", per_col(lambda c: _format_date(meta[f"end_{c}"])))
    else:
        add("Start Period", dict.fromkeys(output_names, "-"))
        add("End Period", dict.fromkeys(output_names, "-"))
    add("Risk-Free Rate", dict.fromkeys(output_names, rf * pct))
    add("Time in Market", per_col(lambda c: g("exposure", c) * pct))
    add_sep()

    if compounded:
        add("Cumulative Return", per_col(lambda c: g("comp", c) * pct))
    else:
        add("Total Return", per_col(lambda c: g("sum", c) * pct))
    add("CAGR﹪", per_col(lambda c: _cagr_value(main, c, compounded, periods_per_year) * pct))
    add_sep()

    add("Sharpe", per_col(lambda c: g("sharpe", c)))

    def _psr(c: str, base: float) -> float:
        # guards mirror the Spark expression path (F.sqrt of a negative
        # radicand -> NaN, fdiv by 0 -> inf): a high per-period SR or
        # strong positive skew can push the radicand negative, and a
        # 1-row frame divides by n-1=0 - neither may abort the report
        n = n_by_col[c]
        if n is None or n <= 1:
            return math.nan
        skew_v, kurt_v = g("skew", c), g("kurt", c)
        radicand = (
            1 + (0.5 * base**2) - (skew_v * base) + (((kurt_v - 3) / 4) * base**2)
        ) / (n - 1)
        if not radicand > 0:  # negative, zero or nan
            return math.nan
        return _NORMAL.cdf((base - rf) / math.sqrt(radicand))

    add("Prob. Sharpe Ratio", per_col(lambda c: _psr(c, g("sr0", c)) * pct))
    penalties = {}
    if full:
        for c in output_names:
            coef = main[f"acorr_{c}"]
            coef = math.nan if coef is None else abs(float(coef))
            penalties[c] = X.geometric_sum_penalty(coef, n_by_col[c])
        add("Smart Sharpe", per_col(lambda c: g("sharpe", c) / penalties[c]))
    add("Sortino", per_col(lambda c: g("sortino", c)))
    if full:
        add("Smart Sortino", per_col(lambda c: g("sortino", c) / penalties[c]))
    add("Sortino/√2", per_col(lambda c: g("sortino", c) / math.sqrt(2)))
    if full:
        add("Smart Sortino/√2", per_col(lambda c: g("sortino", c) / penalties[c] / math.sqrt(2)))
    add("Omega", per_col(lambda c: g("omega", c)))
    add_sep()

    add("Max Drawdown", per_col(lambda c: g("maxdd", c) * pct))
    add("Longest DD Days", per_col(lambda c: episodes[c]["longest_days"]))

    if full:
        add_sep()
        add("Volatility (ann.)", per_col(lambda c: g("vol", c) * pct))
        if has_bench:
            add("R^2", bench_row(lambda c: g("corrb", c) ** 2))
            add("Information Ratio", bench_row(lambda c: g("ir", c)))
        add(
            "Calmar",
            per_col(
                lambda c: _calmar_value(main, c, compounded, periods_per_year)
            ),
        )
        # the Skew/Kurtosis rows read the SAME bias-corrected aggregates
        # the PSR computation already builds (skew_/kurt_) - the former
        # skew_corr_/kurt_corr_ aliases were byte-identical duplicates in
        # the codegen-width-bound aggregate pass
        add("Skew", per_col(lambda c: g("skew", c)))
        add("Kurtosis", per_col(lambda c: g("kurt", c)))
        add("Expected Daily", per_col(lambda c: g("geo", c) * pct))
        add("Expected Monthly", _cal_row(cal, "month", "geo", output_names, pct))
        add("Expected Yearly", _cal_row(cal, "year", "geo", output_names, pct))
        add("Kelly Criterion", per_col(lambda c: g("kelly", c) * pct))
        add("Risk of Ruin", per_col(lambda c: g("ror", c)))
        add("Daily Value-at-Risk", per_col(lambda c: g("var", c) * pct))
        add(
            "Expected Shortfall (cVaR)",
            per_col(lambda c: _stage2_value(stage2, f"cvar_{c}", main, f"var_{c}") * pct),
        )
        add("Max Consecutive Wins", per_col(lambda c: int(g("cwin", c))))
        add("Max Consecutive Losses", per_col(lambda c: int(g("closs", c))))

    add_sep()
    add("Gain/Pain Ratio", per_col(lambda c: g("g2p", c)))
    add("Gain/Pain (1M)", _cal_row(cal, "month", "g2p_sum", output_names, 1))
    add_sep()
    add("Payoff Ratio", per_col(lambda c: g("payoff", c)))
    add("Profit Factor", per_col(lambda c: g("pf", c)))
    add("Common Sense Ratio", per_col(lambda c: g("csr", c)))
    add("CPC Index", per_col(lambda c: g("cpc", c)))
    add("Tail Ratio", per_col(lambda c: g("tail", c)))
    add("Outlier Win Ratio", per_col(lambda c: g("outw", c)))
    add("Outlier Loss Ratio", per_col(lambda c: g("outl", c)))
    add_sep()

    def window_row(key: str, annualized: bool = False) -> dict[str, Any]:
        # an EMPTY prepared frame (e.g. a disjoint-date benchmark under
        # match_dates=True) has no window aggregates at all - emit "-"
        # rows rather than KeyError deep in assembly
        if not temporal or f"w_{key}_{output_names[0]}" not in main:
            return dict.fromkeys(output_names, "-")
        values = {}
        for c in output_names:
            compv = g(f"w_{key}", c)
            if annualized:
                n = g(f"wn_{key}", c)
                base = 1 + compv
                # negative base ** fractional is a COMPLEX number in
                # Python (not an exception); Spark's F.pow says NaN -
                # mirror it (odd count of sub--100% returns in a window)
                values[c] = (
                    math.nan
                    if n == 0 or base < 0
                    else (base ** (periods_per_year / n) - 1) * pct
                )
            else:
                values[c] = compv * pct
        return values

    add("MTD", window_row("mtd"))
    add("3M", window_row("3m"))
    add("6M", window_row("6m"))
    add("YTD", window_row("ytd"))
    add("1Y", window_row("1y"))
    add("3Y (ann.)", window_row("3y", annualized=True))
    add("5Y (ann.)", window_row("5y", annualized=True))
    add("10Y (ann.)", window_row("10y", annualized=True))
    alltime_key = "comp" if compounded else "sum"
    add(
        "All-time (ann.)",
        per_col(
            lambda c: _cagr_value(main, c, compounded, periods_per_year, rf_key=alltime_key) * pct
        ),
    )

    if full:
        add_sep()
        add("Best Day", per_col(lambda c: g("best", c) * pct))
        add("Worst Day", per_col(lambda c: g("worst", c) * pct))
        add("Best Month", _cal_row(cal, "month", "best", output_names, pct))
        add("Worst Month", _cal_row(cal, "month", "worst", output_names, pct))
        add("Best Year", _cal_row(cal, "year", "best", output_names, pct))
        add("Worst Year", _cal_row(cal, "year", "worst", output_names, pct))

    add_sep()
    add("Avg. Drawdown", per_col(lambda c: episodes[c]["avg_dd"] * pct))
    add("Avg. Drawdown Days", per_col(lambda c: episodes[c]["avg_days"]))
    add("Recovery Factor", per_col(lambda c: g("recov", c)))
    add("Ulcer Index", per_col(lambda c: g("ulcer", c)))
    add(
        "Serenity Index",
        per_col(lambda c: _serenity_value(main, stage2, c, rf)),
    )

    if full:
        add_sep()
        add("Avg. Up Month", _cal_row(cal, "month", "avg_win", output_names, pct))
        add("Avg. Down Month", _cal_row(cal, "month", "avg_loss", output_names, pct))
        add("Win Days", per_col(lambda c: g("winrate", c) * pct))
        add("Win Month", _cal_row(cal, "month", "winrate", output_names, pct))
        add("Win Quarter", _cal_row(cal, "quarter", "winrate", output_names, pct))
        add("Win Year", _cal_row(cal, "year", "winrate", output_names, pct))
        if has_bench:
            add_sep()
            add("Beta", bench_row(lambda c: g("beta", c)))
            # alpha annualized with 252 regardless of periods_per_year —
            # reference reports.py:509 calls stats.greeks with its default.
            add("Alpha", bench_row(lambda c: (g("mean", c) - g("beta", c) * g("mean", benchmark_name)) * 252))
            add("Correlation", bench_row(lambda c: g("corrb", c) * pct))
            add(
                "Treynor Ratio",
                bench_row(lambda c: (g("comp", c) - rf) / g("beta", c) * pct if g("beta", c) else math.nan),
            )

    if numeric:
        return _build_numeric_df(rows, output_names)
    result_rows = [
        (label, {name: _format_value(values.get(name)) for name in output_names})
        for label, values in rows
    ]
    if display:
        _print_table(result_rows, output_names)
        return None
    return _build_output_df(result_rows, output_names)


# ---------------------------------------------------------------------------
# frame preparation


def _prepare_frame(returns, benchmark, *, match_dates, strategy_title, benchmark_title):
    df, _ = to_returns_df(returns)
    temporal = get_temporal_column_name(df)
    return_names = numeric_column_names(df)
    if not return_names:
        raise ValueError("`returns` must contain at least one numeric return column")

    if len(return_names) == 1 and isinstance(strategy_title, str):
        output_names = [strategy_title]
    elif isinstance(strategy_title, list):
        output_names = strategy_title
    else:
        output_names = list(return_names)
    if len(output_names) != len(return_names):
        raise ValueError("`strategy_title` must match the number of strategy return columns")

    selected = [
        F.col(name).alias(out) for name, out in zip(return_names, output_names)
    ]
    if temporal:
        selected.insert(0, F.col(temporal))
    frame = df.select(*selected)

    benchmark_name = None
    if benchmark is not None:
        bdf, _ = to_returns_df(benchmark)
        bdf = prepare_benchmark(bdf)
        b_temporal = get_temporal_column_name(bdf)
        benchmark_name = benchmark_title
        bvalue = numeric_column_names(bdf)[0]
        if temporal and b_temporal:
            bsel = bdf.select(F.col(b_temporal).alias("__bts"), F.col(bvalue).alias(benchmark_name))
            how = "inner" if match_dates else "left"
            frame = frame.join(
                bsel, on=frame[temporal] == bsel["__bts"], how=how
            ).drop("__bts")
        else:
            bsel = bdf.select(F.col(bvalue).alias(benchmark_name))
            frame = joins.positional_join(frame, bsel)
        output_names = [benchmark_name, *output_names]

    return frame, output_names, benchmark_name, temporal


# ---------------------------------------------------------------------------
# main-pass expression builders


def _window_bounds(max_ts: dt.date | None) -> dict[str, Any] | None:
    if max_ts is None:
        return None
    return {
        "mtd": ("ym", (max_ts.year, max_ts.month)),
        "3m": ("ge", _add_months(max_ts, -3)),
        "6m": ("ge", _add_months(max_ts, -6)),
        "ytd": ("y", max_ts.year),
        "1y": ("ge", _add_months(max_ts, -12)),
        "3y": ("ge", _add_months(max_ts, -36)),
        "5y": ("ge", _add_months(max_ts, -60)),
        "10y": ("ge", _add_months(max_ts, -120)),
    }


def _add_months(d: dt.date, n: int) -> dt.date:
    y = d.year + (d.month - 1 + n) // 12
    m = (d.month - 1 + n) % 12 + 1
    return d.replace(year=y, month=m, day=min(d.day, _calendar.monthrange(y, m)[1]))


_COLUMN_AGGS_CACHE: dict = {}


def _column_aggs(c, rf, compounded, ppy, full, windows):
    """Memoized: the returned aggregates are UNRESOLVED Column trees — pure
    functions of the arguments, frame-agnostic and immutable — but building
    them costs ~400 py4j round-trips (~0.7s measured), which dominates
    repeated report calls in one session. Keyed on the JVM application id
    so a restarted SparkContext can't serve stale JavaObject handles."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    app = sc.applicationId if sc is not None else None
    wkey = tuple(sorted(windows.items())) if windows else None
    key = (app, c, rf, compounded, ppy, full, wkey)
    hit = _COLUMN_AGGS_CACHE.get(key)
    if hit is not None:
        return list(hit)
    out = _column_aggs_build(c, rf, compounded, ppy, full, windows)
    if len(_COLUMN_AGGS_CACHE) > 256:  # bound: one entry per (asset, params)
        _COLUMN_AGGS_CACHE.clear()
    _COLUMN_AGGS_CACHE[key] = out
    return list(out)


def _column_aggs_build(c, rf, compounded, ppy, full, windows):
    col = F.col(c)
    dd = F.col(f"__dd_{c}")
    excess = col - F.lit(float(rf)) if rf else col
    out = [
        F.count(col).alias(f"n_{c}"),
        X.exposure(col).alias(f"exposure_{c}"),
        X.comp(col).alias(f"comp_{c}"),
        F.sum(col).alias(f"sum_{c}"),
        (X.comp(excess) if compounded else F.sum(excess)).alias(f"cagrbase_{c}"),
        X.sharpe(col, rf, ppy, True).alias(f"sharpe_{c}"),
        X.sharpe(col, None, ppy, False).alias(f"sr0_{c}"),
        X.skew(col).alias(f"skew_{c}"),
        X.kurtosis(col).alias(f"kurt_{c}"),
        X.sortino(col, rf, ppy, True).alias(f"sortino_{c}"),
        X.omega(col).alias(f"omega_{c}"),
        F.min(dd).alias(f"maxdd_{c}"),
        X.gain_to_pain_ratio(col, rf).alias(f"g2p_{c}"),
        X.payoff_ratio(col).alias(f"payoff_{c}"),
        X.profit_factor(col).alias(f"pf_{c}"),
        X.common_sense_ratio(col).alias(f"csr_{c}"),
        X.cpc_index(col).alias(f"cpc_{c}"),
        X.tail_ratio(col).alias(f"tail_{c}"),
        X.outlier_win_ratio(col).alias(f"outw_{c}"),
        X.outlier_loss_ratio(col).alias(f"outl_{c}"),
        X.fdiv(F.abs(F.sum(col)), F.abs(F.min(dd))).alias(f"recov_{c}"),
        F.sqrt(X.fdiv(F.sum(F.pow(dd, 2)), F.count(col) - 1)).alias(f"ulcer_{c}"),
        (F.mean(dd) + F.lit(_NORMAL.inv_cdf(0.05)) * F.stddev_samp(dd)).alias(f"ddvar_{c}"),
        F.stddev_samp(col).alias(f"rstd_{c}"),
    ]
    if full:
        out += [
            X.volatility(col, ppy, True).alias(f"vol_{c}"),
            X.expected_return(col).alias(f"geo_{c}"),
            X.kelly_criterion(col).alias(f"kelly_{c}"),
            X.risk_of_ruin(col).alias(f"ror_{c}"),
            X.value_at_risk(col).alias(f"var_{c}"),
            F.max(col).alias(f"best_{c}"),
            F.min(col).alias(f"worst_{c}"),
            X.win_rate(col).alias(f"winrate_{c}"),
            F.mean(col).alias(f"mean_{c}"),
            F.corr(col, F.col(f"__prev_{c}")).alias(f"acorr_{c}"),
            F.coalesce(
                F.max(
                    F.when(
                        col > 0,
                        F.col("__idx") - F.coalesce(F.col(f"__lbw_{c}"), F.lit(0)),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias(f"cwin_{c}"),
            F.coalesce(
                F.max(
                    F.when(
                        col < 0,
                        F.col("__idx") - F.coalesce(F.col(f"__lbl_{c}"), F.lit(0)),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias(f"closs_{c}"),
        ]
    else:
        out += [
            X.expected_return(col).alias(f"geo_{c}"),
        ]
    if windows:
        ts = F.col(ordered.ORDER_COL)
        for key, (kind, bound) in windows.items():
            if kind == "ym":
                cond = (F.year(ts) == bound[0]) & (F.month(ts) == bound[1])
            elif kind == "y":
                cond = F.year(ts) == bound
            else:
                cond = ts.cast("date") >= F.lit(bound)
            out.append((F.product(F.when(cond, col + 1)) - 1).alias(f"w_{key}_{c}"))
            if key in ("3y", "5y", "10y"):
                out.append(F.count(F.when(cond, col)).alias(f"wn_{key}_{c}"))
    return out


def _bench_aggs(c, bench_name):
    col, b = F.col(c), F.col(bench_name)
    active = col - b
    return [
        F.corr(col, b).alias(f"corrb_{c}"),
        X.fdiv(F.covar_samp(col, b), F.var_samp(b)).alias(f"beta_{c}"),
        X.fdiv(F.mean(active), F.stddev_samp(active)).alias(f"ir_{c}"),
    ]


# ---------------------------------------------------------------------------
# calendar pass


def _calendar_agg(filled, temporal, output_names, granularity, rf):
    ts = F.col(temporal)
    if granularity == "month":
        keys = [F.year(ts).alias("__y"), F.month(ts).alias("__m")]
    elif granularity == "quarter":
        keys = [F.year(ts).alias("__y"), F.quarter(ts).alias("__m")]
    else:
        keys = [F.year(ts).alias("__y")]
    per_col = []
    for c in output_names:
        per_col.append(X.comp(F.col(c)).alias(f"cmp_{c}"))
        per_col.append(F.sum(F.col(c)).alias(f"sm_{c}"))
    bucketed = filled.groupBy(*keys).agg(*per_col)
    aggs = []
    for c in output_names:
        comp_c, sum_c = F.col(f"cmp_{c}"), F.col(f"sm_{c}")
        aggs += [
            X.expected_return(comp_c).alias(f"geo_{c}"),
            F.max(comp_c).alias(f"best_{c}"),
            F.min(comp_c).alias(f"worst_{c}"),
            X.avg_win(comp_c).alias(f"avg_win_{c}"),
            X.avg_loss(comp_c).alias(f"avg_loss_{c}"),
            X.win_rate(comp_c).alias(f"winrate_{c}"),
            X.gain_to_pain_ratio(sum_c, rf).alias(f"g2p_sum_{c}"),
        ]
    return bucketed.agg(*aggs).first()


def _cal_row(cal, granularity, key, output_names, multiplier):
    row = cal.get(granularity)
    if row is None:
        return dict.fromkeys(output_names, "-")
    out = {}
    for c in output_names:
        v = row[f"{key}_{c}"]
        out[c] = math.nan if v is None else float(v) * multiplier
    return out


# ---------------------------------------------------------------------------
# driver-side scalar assembly


def _cagr_value(main, c, compounded, ppy, rf_key: str = "cagrbase") -> float:
    base = main[f"{rf_key}_{c}"]
    n = main[f"n_{c}"]
    if base is None or not n:
        return math.nan
    total = float(base) + 1
    if total < 0:
        # negative ** fractional yields a COMPLEX in Python (no exception
        # fires); Spark's F.pow yields NaN for the same input - mirror it
        return math.nan
    n_years = int(n) / ppy
    try:
        return total ** (1 / n_years) - 1
    except (ZeroDivisionError, ValueError):
        return math.nan


def _calmar_value(main, c, compounded, ppy) -> float:
    cagr_v = _cagr_value(main, c, compounded, ppy, rf_key="comp" if compounded else "sum")
    maxdd = main[f"maxdd_{c}"]
    max_dd = abs(float(maxdd)) if maxdd is not None else 0.0
    return cagr_v / max_dd if max_dd else math.nan


def _stage2_value(stage2, key, main, fallback_key) -> float:
    if key in stage2 and stage2[key] is not None:
        return float(stage2[key])
    v = main[fallback_key]
    return math.nan if v is None else float(v)


def _serenity_value(main, stage2, c, rf) -> float:
    dd_cvar = stage2.get(f"ddcvar_{c}")
    if dd_cvar is None:
        return math.nan
    std = main[f"rstd_{c}"]
    ulcer = main[f"ulcer_{c}"]
    total = main[f"sum_{c}"]
    if std is None or ulcer is None or total is None or not std:
        return math.nan
    pitfall = -float(dd_cvar) / float(std)
    denom = float(ulcer) * pitfall
    return (float(total) - rf) / denom if denom else math.nan


# ---------------------------------------------------------------------------
# formatting (reference reports.py:502-564)


def _format_date(value) -> str:
    if value is None:
        return "-"
    if isinstance(value, dt.datetime):
        return value.date().isoformat()
    if isinstance(value, dt.date):
        return value.isoformat()
    return str(value)


def _format_value(value) -> str:
    if value is None:
        return "-"
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            return "-"
        rounded = round(value, 2)
        if rounded == 0:
            rounded = 0
        return str(rounded)
    return str(value)


def _local_df(data, columns, schema) -> DataFrame:
    """Local-table DataFrame via the Arrow path.

    ``createDataFrame`` on a list of tuples goes through the row-at-a-time
    RDD converter (~0.35s measured for a 36-row report table, runs on the
    report's critical path); the pandas input rides Arrow (~0.03s). NaN
    survives the Arrow float path as NaN, same as the tuple path — pinned
    by the report_numeric oracle, which hashes non-finite cells."""
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    return spark.createDataFrame(pd.DataFrame(data, columns=columns), schema)


def _build_numeric_df(rows, output_names) -> DataFrame:
    """Pre-formatting scalar table: rows whose every cell is a number."""
    data = []
    for label, values in rows:
        cells = []
        for name in output_names:
            v = values.get(name)
            if isinstance(v, (str, bool)) or v is None:
                cells = None
                break
            cells.append(float(v))
        if cells is not None:
            data.append((label, *cells))
    schema = ", ".join(["`Metric` string"] + [f"`{n}` double" for n in output_names])
    return _local_df(data, ["Metric", *output_names], schema)


def _build_output_df(rows, output_names) -> DataFrame:
    data = [(label, *[values[name] for name in output_names]) for label, values in rows]
    schema = ", ".join(["`Metric` string"] + [f"`{n}` string" for n in output_names])
    return _local_df(data, ["Metric", *output_names], schema)


def _print_table(rows, output_names) -> None:
    headers = ["Metric", *output_names]
    widths = [
        max(len(headers[0]), *(len(label) for label, _ in rows)) if rows else len(headers[0])
    ]
    for name in output_names:
        widths.append(
            max(len(name), *(len(values[name]) for _, values in rows)) if rows else len(name)
        )
    line = "  ".join(h.ljust(w) for h, w in zip(headers, widths))
    print(line)
    print("  ".join("-" * w for w in widths))
    for label, values in rows:
        cells = [label.ljust(widths[0])] + [
            values[name].rjust(w) for name, w in zip(output_names, widths[1:])
        ]
        print("  ".join(cells))
