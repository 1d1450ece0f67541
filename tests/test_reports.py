"""Report parity tests: legacy row order + cell values vs a pure-Python oracle.

Row orders are the exact legacy lists from the reference
(``tests/test_quantstats_parity.py:57-167``). Cell values are cross-checked
against independent plain-Python computations of the QuantStats formulas on
the F6/F8 fixtures (FIXTURES.md).
"""

from __future__ import annotations

import datetime as dt
import math
import statistics

import pytest

from alphastats_spark import reports

DAILY = [0.01, -0.02, 0.03, -0.01, 0.02, 0.0, 0.015, -0.005, 0.01, -0.015]
BENCH = [0.005, -0.01, 0.015, -0.005, 0.01, 0.0, 0.007, -0.002, 0.004, -0.006]
DATES = [dt.date(2023, 1, 2) + dt.timedelta(days=i) for i in range(10)]

LEGACY_BASIC = [
    "Start Period", "End Period", "Risk-Free Rate", "Time in Market",
    "Cumulative Return", "CAGR﹪", "Sharpe", "Prob. Sharpe Ratio", "Sortino",
    "Sortino/√2", "Omega", "Max Drawdown", "Longest DD Days",
    "Gain/Pain Ratio", "Gain/Pain (1M)", "Payoff Ratio", "Profit Factor",
    "Common Sense Ratio", "CPC Index", "Tail Ratio", "Outlier Win Ratio",
    "Outlier Loss Ratio", "MTD", "3M", "6M", "YTD", "1Y", "3Y (ann.)",
    "5Y (ann.)", "10Y (ann.)", "All-time (ann.)", "Avg. Drawdown",
    "Avg. Drawdown Days", "Recovery Factor", "Ulcer Index", "Serenity Index",
]

LEGACY_FULL = [
    "Start Period", "End Period", "Risk-Free Rate", "Time in Market",
    "Cumulative Return", "CAGR﹪", "Sharpe", "Prob. Sharpe Ratio",
    "Smart Sharpe", "Sortino", "Smart Sortino", "Sortino/√2",
    "Smart Sortino/√2", "Omega", "Max Drawdown", "Longest DD Days",
    "Volatility (ann.)", "R^2", "Information Ratio", "Calmar", "Skew",
    "Kurtosis", "Expected Daily", "Expected Monthly", "Expected Yearly",
    "Kelly Criterion", "Risk of Ruin", "Daily Value-at-Risk",
    "Expected Shortfall (cVaR)", "Max Consecutive Wins",
    "Max Consecutive Losses", "Gain/Pain Ratio", "Gain/Pain (1M)",
    "Payoff Ratio", "Profit Factor", "Common Sense Ratio", "CPC Index",
    "Tail Ratio", "Outlier Win Ratio", "Outlier Loss Ratio", "MTD", "3M",
    "6M", "YTD", "1Y", "3Y (ann.)", "5Y (ann.)", "10Y (ann.)",
    "All-time (ann.)", "Best Day", "Worst Day", "Best Month", "Worst Month",
    "Best Year", "Worst Year", "Avg. Drawdown", "Avg. Drawdown Days",
    "Recovery Factor", "Ulcer Index", "Serenity Index", "Avg. Up Month",
    "Avg. Down Month", "Win Days", "Win Month", "Win Quarter", "Win Year",
    "Beta", "Alpha", "Correlation", "Treynor Ratio",
]


@pytest.fixture
def daily_df(spark):
    return spark.createDataFrame(list(zip(DATES, DAILY)), "date date, asset double")


@pytest.fixture
def bench_df(spark):
    return spark.createDataFrame(list(zip(DATES, BENCH)), "date date, benchmark double")


def report_dict(df, **kw):
    out = reports.metrics(df, display=False, **kw)
    rows = out.collect()
    cols = out.columns[1:]
    return [r["Metric"] for r in rows], {r["Metric"]: {c: r[c] for c in cols} for r in rows}


def fmt(v: float) -> str:
    if v is None or math.isnan(v) or math.isinf(v):
        return "-"
    rounded = round(v, 2)
    if rounded == 0:
        rounded = 0
    return str(rounded)


class TestReportBasic:
    def test_row_order(self, daily_df):
        labels, _ = report_dict(daily_df)
        assert labels == LEGACY_BASIC

    def test_row_order_full_with_benchmark(self, daily_df, bench_df):
        labels, _ = report_dict(daily_df, benchmark=bench_df, mode="full")
        assert labels == LEGACY_FULL

    def test_cells(self, daily_df):
        _, cells = report_dict(daily_df)
        col = "Strategy"

        assert cells["Start Period"][col] == "2023-01-02"
        assert cells["End Period"][col] == "2023-01-11"
        assert cells["Risk-Free Rate"][col] == "0"
        # 9 of 10 days non-zero
        assert cells["Time in Market"][col] == fmt(0.9)

        comp = math.prod(1 + r for r in DAILY) - 1
        assert cells["Cumulative Return"][col] == fmt(comp)

        cagr = (1 + comp) ** (252 / 10) - 1
        assert cells["CAGR﹪"][col] == fmt(cagr)

        sharpe = statistics.mean(DAILY) / statistics.stdev(DAILY) * math.sqrt(252)
        assert cells["Sharpe"][col] == fmt(sharpe)

        downside = math.sqrt(sum(min(r, 0) ** 2 for r in DAILY) / len(DAILY))
        sortino = statistics.mean(DAILY) / downside * math.sqrt(252)
        assert cells["Sortino"][col] == fmt(sortino)
        assert cells["Sortino/√2"][col] == fmt(sortino / math.sqrt(2))

        omega = sum(max(0, r) for r in DAILY) / sum(max(0, -r) for r in DAILY)
        assert cells["Omega"][col] == fmt(omega)

        # drawdowns
        wealth, peak, dds = 1.0, 0.0, []
        peak = -math.inf
        for r in DAILY:
            wealth *= 1 + r
            peak = max(peak, wealth)
            dds.append(min(wealth / peak - 1, 0))
        assert cells["Max Drawdown"][col] == fmt(min(dds))

        profit = sum(r for r in DAILY if r >= 0)
        loss = abs(sum(r for r in DAILY if r < 0))
        assert cells["Profit Factor"][col] == fmt(profit / loss)
        assert cells["Gain/Pain Ratio"][col] == fmt(sum(DAILY) / loss)

        avg_win = statistics.mean([r for r in DAILY if r > 0])
        avg_loss = statistics.mean([r for r in DAILY if r < 0])
        assert cells["Payoff Ratio"][col] == fmt(avg_win / abs(avg_loss))

        # MTD: all rows in Jan 2023 → same as cumulative
        assert cells["MTD"][col] == fmt(comp)
        assert cells["YTD"][col] == fmt(comp)
        assert cells["All-time (ann.)"][col] == fmt(cagr)

        ulcer = math.sqrt(sum(d * d for d in dds) / (len(dds) - 1))
        assert cells["Ulcer Index"][col] == fmt(ulcer)
        assert cells["Recovery Factor"][col] == fmt(abs(sum(DAILY)) / abs(min(dds)))

    def test_full_cells_with_benchmark(self, daily_df, bench_df):
        _, cells = report_dict(daily_df, benchmark=bench_df, mode="full")
        col, bcol = "Strategy", "Benchmark"

        vol = statistics.stdev(DAILY) * math.sqrt(252)
        assert cells["Volatility (ann.)"][col] == fmt(vol)

        corr = statistics.correlation(DAILY, BENCH)
        assert cells["Correlation"][col] == fmt(corr)
        assert cells["R^2"][col] == fmt(corr**2)
        assert cells["Correlation"][bcol] == "-"

        cov = statistics.covariance(DAILY, BENCH)
        beta = cov / statistics.variance(BENCH)
        assert cells["Beta"][col] == fmt(beta)
        alpha = (statistics.mean(DAILY) - beta * statistics.mean(BENCH)) * 252
        assert cells["Alpha"][col] == fmt(alpha)

        active = [r - b for r, b in zip(DAILY, BENCH)]
        ir = statistics.mean(active) / statistics.stdev(active)
        assert cells["Information Ratio"][col] == fmt(ir)

        comp = math.prod(1 + r for r in DAILY) - 1
        assert cells["Treynor Ratio"][col] == fmt(comp / beta)

        assert cells["Best Day"][col] == fmt(max(DAILY))
        assert cells["Worst Day"][col] == fmt(min(DAILY))
        # wins at idx 0,2,4,6,8 are each followed by a loss/zero → max run 1
        assert cells["Max Consecutive Wins"][col] == "1"
        assert cells["Max Consecutive Losses"][col] == "1"
        assert cells["Win Days"][col] == fmt(5 / 9)

        # single month of data → Expected Monthly == Cumulative Return
        assert cells["Expected Monthly"][col] == fmt(comp)

    def test_display_prints(self, daily_df, capsys):
        assert reports.metrics(daily_df, display=True) is None
        out = capsys.readouterr().out
        assert "Sharpe" in out and "Strategy" in out

    def test_sep_rows(self, daily_df):
        labels, _ = report_dict(daily_df, sep=True)
        assert "" in labels
        assert [l for l in labels if l] == LEGACY_BASIC


class TestFailureCleanup:
    def test_midreport_exception_leaks_no_caches(self, spark, daily_df, monkeypatch):
        """An exception mid-report must release the thread pool and every
        persisted frame — both the report's own persists and the prefix
        passes' internal caches — so a long-lived session that survives
        report failures does not accumulate cached RDDs."""
        before = int(spark.sparkContext._jsc.getPersistentRDDs().size())

        def boom(*a, **k):
            raise RuntimeError("injected calendar failure")

        monkeypatch.setattr(reports, "_calendar_agg", boom)
        with pytest.raises(RuntimeError, match="injected calendar failure"):
            reports.metrics(daily_df, display=False)

        after = int(spark.sparkContext._jsc.getPersistentRDDs().size())
        assert after == before

    def test_success_path_leaks_no_caches(self, spark, daily_df):
        before = int(spark.sparkContext._jsc.getPersistentRDDs().size())
        reports.metrics(daily_df, display=False).collect()
        after = int(spark.sparkContext._jsc.getPersistentRDDs().size())
        assert after == before


class TestNumericReport:
    def test_numeric_basic_rows_and_values(self, spark):
        """numeric=True returns the pre-formatting scalar table: every
        LEGACY_BASIC row except the (string) date rows, values unformatted
        doubles matching the raw stats API."""
        from alphastats_spark import stats

        df = spark.createDataFrame(list(zip(DATES, DAILY)), "d date, r double")
        out = reports.metrics(df, display=False, mode="basic", numeric=True)
        assert out.schema["Metric"].dataType.typeName() == "string"
        assert out.schema["Strategy"].dataType.typeName() == "double"
        rows = {r["Metric"]: r["Strategy"] for r in out.collect()}
        expected_rows = [m for m in LEGACY_BASIC if m not in ("Start Period", "End Period")]
        assert [r["Metric"] for r in out.collect()] == expected_rows
        assert rows["Sharpe"] == pytest.approx(stats.sharpe(DAILY), rel=1e-12)
        assert rows["Cumulative Return"] == pytest.approx(stats.comp(DAILY), rel=1e-12)
        assert rows["Max Drawdown"] == pytest.approx(stats.max_drawdown(DAILY), rel=1e-12)
        # unformatted: more precision than the 2-decimal string table
        assert rows["Sharpe"] != round(rows["Sharpe"], 2)
