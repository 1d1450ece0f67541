"""Golden-value parity tests against the reference suite's pinned snapshots.

Every expected literal below is an inline-snapshot value from the reference
(``tests/test_stats.py``, cited per test). Tolerance follows the reference's
oracle-parity bar: rel=1e-9 (``tests/test_quantstats_parity.py:170-178``).
"""

from __future__ import annotations

import math

import pytest

from alphastats_spark import stats

approx = lambda v: pytest.approx(v, rel=1e-9, abs=1e-12)  # noqa: E731


def one_row(df):
    return df.first().asDict()


class TestComp:
    def test_series(self, spark, simple_returns_series):
        assert stats.comp(simple_returns_series) == approx(0.02948504120000006)  # ref :113

    def test_dataframe(self, simple_returns_df):
        row = one_row(stats.comp(simple_returns_df))
        assert row["asset_a"] == approx(0.02948504120000006)  # ref :118-120
        assert row["asset_b"] == approx(0.02948504120000006)

    def test_nulls(self, spark, returns_with_nulls):
        assert stats.comp(returns_with_nulls) == approx(0.029897000000000062)  # ref :125

    def test_extreme(self, spark, extreme_returns):
        assert stats.comp(extreme_returns) == approx(-0.9142)  # ref :130

    def test_single_value(self, spark):
        assert stats.comp([0.05]) == approx(0.050000000000000044)  # ref :143

    def test_all_zeros(self, spark):
        assert stats.comp([0.0, 0.0, 0.0, 0.0]) == approx(0.0)  # ref :149


class TestCagr:
    def test_basic(self, simple_returns_df):
        row = one_row(stats.cagr(simple_returns_df, periods=252))
        assert row["asset_a"] == approx(3.325636719291219)  # ref :158-160
        assert row["asset_b"] == approx(3.325636719291219)

    def test_with_rf(self, simple_returns_df):
        row = one_row(stats.cagr(simple_returns_df, rf=0.002, periods=252))
        assert row["asset_a"] == approx(1.6192689635571114)  # ref :165-167

    def test_non_compound(self, simple_returns_df):
        row = one_row(stats.cagr(simple_returns_df, compound=False, periods=252))
        assert row["asset_a"] == approx(3.4360468598701495)  # ref :172-174

    def test_monthly_periods(self, simple_returns_df):
        row = one_row(stats.cagr(simple_returns_df, periods=12))
        assert row["asset_a"] == approx(0.0722303532497861)  # ref :179-181

    def test_extreme(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            list(zip([dt.date(2023, 1, i) for i in range(1, 6)], [0.5, -0.8, 1.2, -0.9, 0.3])),
            "date date, asset double",
        )
        assert one_row(stats.cagr(df, periods=252))["asset"] == approx(-1.0)  # ref :192

    def test_requires_temporal(self, spark):
        from alphastats_spark.exceptions import NoTemporalColumnError

        df = spark.createDataFrame([(0.01,), (0.02,)], "asset double")
        with pytest.raises(NoTemporalColumnError):
            stats.cagr(df)


class TestMaxDrawdown:
    def test_series(self, spark, simple_returns_series):
        assert stats.max_drawdown(simple_returns_series) == approx(-0.020000000000000018)  # ref :224

    def test_dataframe(self, simple_returns_df):
        row = one_row(stats.max_drawdown(simple_returns_df))
        assert row["asset_a"] == approx(-0.020000000000000018)  # ref :229-231
        assert row["asset_b"] == approx(-0.020000000000000018)

    def test_extreme(self, spark, extreme_returns):
        assert stats.max_drawdown(extreme_returns) == approx(-0.956)  # ref :236

    def test_single_value(self, spark):
        assert stats.max_drawdown([0.05]) == approx(0.0)  # ref :242

    def test_all_zeros(self, spark):
        assert stats.max_drawdown([0.0, 0.0, 0.0, 0.0]) == approx(0.0)  # ref :248


class TestSharpe:
    def test_series(self, spark, simple_returns_series):
        assert stats.sharpe(simple_returns_series) == approx(4.593220484431882)  # ref :280

    def test_dataframe(self, simple_returns_df):
        row = one_row(stats.sharpe(simple_returns_df))
        assert row["asset_a"] == approx(4.593220484431882)  # ref :285-287

    def test_with_rf(self, spark, simple_returns_series):
        assert stats.sharpe(simple_returns_series, rf=0.002) == approx(3.062146989621255)  # ref :292

    def test_non_annualized(self, spark, simple_returns_series):
        assert stats.sharpe(simple_returns_series, annualize=False) == approx(
            0.28934569330224724
        )  # ref :297

    def test_monthly(self, spark, simple_returns_series):
        assert stats.sharpe(simple_returns_series, periods=12) == approx(1.002322883501468)  # ref :302

    def test_extreme(self, spark, extreme_returns):
        assert stats.sharpe(extreme_returns) == approx(1.0629032821934614)  # ref :307

    def test_all_zeros_nan(self, spark):
        assert math.isnan(stats.sharpe([0.0, 0.0, 0.0, 0.0]))  # ref :313


class TestSortino:
    def test_series(self, spark, simple_returns_series):
        assert stats.sortino(simple_returns_series) == approx(9.524704719832526)  # ref :385

    def test_with_rf_non_annualized(self, spark, simple_returns_series):
        assert stats.sortino(simple_returns_series, rf=0.002, annualize=False) == approx(
            0.35691530512412484
        )  # ref :399

    def test_non_annualized(self, spark, simple_returns_series):
        assert stats.sortino(simple_returns_series, annualize=False) == approx(0.6)  # ref :404

    def test_monthly(self, spark, simple_returns_series):
        assert stats.sortino(simple_returns_series, periods=12) == approx(2.0784609690826525)  # ref :409

    def test_extreme(self, spark, extreme_returns):
        assert stats.sortino(extreme_returns) == approx(1.7686932639858621)  # ref :414

    def test_all_zeros_nan(self, spark):
        assert math.isnan(stats.sortino([0.0, 0.0, 0.0, 0.0]))  # ref :420


class TestPsr:
    def test_basic(self, spark, simple_returns_series):
        assert stats.probabilistic_sharpe_ratio(simple_returns_series) == approx(
            0.7180057951953357
        )  # ref :341

    def test_rf_ordering(self, spark, simple_returns_series):
        assert stats.psr(simple_returns_series, rf=0.1) <= stats.psr(simple_returns_series, rf=0.0)

    def test_dataframe_bounds(self, simple_returns_df):
        row = one_row(stats.psr(simple_returns_df))
        assert set(row) == {"asset_a", "asset_b"}
        for v in row.values():
            assert 0.0 <= v <= 1.0


class TestVolatility:
    def test_series(self, spark, simple_returns_series):
        assert stats.volatility(simple_returns_series) == approx(0.3291808013842849)  # ref :452

    def test_non_annualized(self, spark, simple_returns_series):
        assert stats.volatility(simple_returns_series, annualize=False) == approx(
            0.020736441353327723
        )  # ref :464

    def test_monthly(self, spark, simple_returns_series):
        assert stats.volatility(simple_returns_series, periods=12) == approx(
            0.07183313998427189
        )  # ref :469

    def test_extreme(self, spark, extreme_returns):
        assert stats.volatility(extreme_returns) == approx(14.225188926689164)  # ref :474

    def test_all_zeros(self, spark):
        assert stats.volatility([0.0, 0.0, 0.0, 0.0]) == approx(0.0)  # ref :480


class TestToDrawdowns:
    def test_series(self, spark, simple_returns_series):
        vals = stats.to_drawdowns(simple_returns_series)
        assert vals == approx([0.0, -0.020000000000000018, 0.0, -0.01000000000000012, 0.0])  # ref :512-514

    def test_dataframe(self, simple_returns_df):
        rows = stats.to_drawdowns(simple_returns_df).collect()
        assert [r["asset_a"] for r in rows] == approx(
            [0.0, -0.020000000000000018, 0.0, -0.01000000000000012, 0.0]
        )  # ref :529
        assert [r["asset_b"] for r in rows] == approx(
            [0.0, -0.010000000000000009, -0.00010000000000010001, 0.0, -0.020000000000000018]
        )  # ref :530-536

    def test_extreme(self, spark, extreme_returns):
        assert stats.to_drawdowns(extreme_returns) == approx(
            [0.0, -0.8, -0.56, -0.956, -0.9428]
        )  # ref :543

    def test_all_zeros(self, spark):
        assert stats.to_drawdowns([0.0, 0.0, 0.0, 0.0]) == approx([0.0, 0.0, 0.0, 0.0])  # ref :549

    def test_single(self, spark):
        assert stats.to_drawdowns([0.05]) == approx([0.0])  # ref :555


class TestGreeks:
    def test_no_temporal(self, spark):
        returns = spark.createDataFrame(
            list(zip([0.01, -0.02, 0.03, -0.01, 0.02], [0.02, -0.01, 0.01, 0.03, -0.02])),
            "asset_a double, asset_b double",
        )
        bench = spark.createDataFrame(
            [(v,) for v in [0.005, -0.01, 0.015, -0.005, 0.01]], "_benchmark_returns double"
        )
        row = one_row(stats.greeks(returns, bench))
        # ref :619-624
        assert row["asset_a"]["alpha"] == pytest.approx(2.185751579730777e-16, abs=1e-12)
        assert row["asset_a"]["beta"] == approx(1.9999999999999998)
        assert row["asset_b"]["alpha"] == approx(1.6702325581395348)
        assert row["asset_b"]["beta"] == approx(-0.20930232558139525)

    def test_asof_different_dates(self, simple_returns_df, benchmark_different_dates):
        row = one_row(stats.greeks(simple_returns_df, benchmark_different_dates))
        # ref :655-660
        assert row["asset_a"]["beta"] == approx(1.9999999999999998)
        assert row["asset_b"]["alpha"] == approx(1.6702325581395348)
        assert row["asset_b"]["beta"] == approx(-0.20930232558139525)

    def test_matched_dates(self, simple_returns_df, simple_benchmark_df):
        row = one_row(stats.greeks(simple_returns_df, simple_benchmark_df))
        assert row["asset_a"]["beta"] == approx(1.9999999999999998)

    def test_extreme(self, spark):
        import datetime as dt

        dates = [dt.date(2023, 1, i) for i in range(1, 6)]
        returns = spark.createDataFrame(
            list(zip(dates, [0.5, -0.8, 1.2, -0.9, 0.3])), "date date, asset double"
        )
        bench = spark.createDataFrame(
            list(zip(dates, [0.1, -0.2, 0.3, -0.15, 0.05])), "date date, _benchmark_returns double"
        )
        row = one_row(stats.greeks(returns, bench))
        assert row["asset"]["alpha"] == approx(-6.957055214723923)  # ref :683-685
        assert row["asset"]["beta"] == approx(4.380368098159508)


class TestSimpleAggregates:
    def test_misc_goldens(self, spark, simple_returns_series):
        s = simple_returns_series
        # reference tests/test_stats.py:1092-1106
        assert stats.risk_free_rate(0.05, periods=252) == approx((1.05 ** (1 / 252)) - 1)
        assert stats.skew(s) == approx(-0.2355139364088061)
        assert stats.kurtosis(s) == approx(-1.9632233639805297)
        assert stats.win_rate(s) == approx(3 / 5)
        assert stats.avg_return(s) == approx(0.006)
        assert stats.avg_win(s) == approx(0.02)
        assert stats.avg_loss(s) == approx(-0.015)
        assert stats.payoff_ratio(s) == approx(0.02 / 0.015)
        assert stats.profit_factor(s) == approx(2.0)
        assert stats.gain_to_pain_ratio(s) == approx(1.0)
        assert stats.kelly_criterion(s) == approx(0.3)
        assert stats.risk_of_ruin(s) == approx((0.4 / 1.6) ** 5)
        assert stats.cpc_index(s) == approx(1.6)  # ref :932
        assert stats.omega(s) == approx(2.0)  # FIXTURES.md
        assert stats.recovery_factor(s) == approx(1.5)  # ref :1124

    def test_cpc_dataframe(self, simple_returns_df):
        row = one_row(stats.cpc_index(simple_returns_df))
        assert row["asset_a"] == approx(1.6)  # ref :937
        assert row["asset_b"] == approx(1.6)

    def test_exposure(self, spark):
        assert stats.exposure([0.0, 0.01, 0.0, -0.02, 0.0, 0.03]) == approx(0.5)

    def test_smart_identities(self, spark, simple_returns_series):
        s = simple_returns_series
        penalty = stats.autocorr_penalty(s)
        assert stats.smart_sharpe(s) == approx(stats.sharpe(s) / penalty)  # ref :1136
        assert stats.smart_sortino(s) == approx(stats.sortino(s) / penalty)  # ref :1139
        assert stats.adjusted_sortino(s) == approx(stats.sortino(s) / math.sqrt(2))  # ref :1142
        assert stats.smart_adjusted_sortino(s) == approx(
            stats.smart_sortino(s) / math.sqrt(2)
        )  # ref :1145

    def test_streaks(self, spark):
        assert stats.consecutive_wins([0.01, 0.02, -0.01, 0.03, 0.04, 0.05]) == 3
        assert stats.consecutive_losses([0.01, -0.02, -0.01, 0.03, -0.04]) == 2
        assert stats.consecutive_wins([0.01, None, 0.03, 0.02, -0.01]) == 2
        assert stats.consecutive_wins([-0.01, -0.02]) == 0


class TestBenchmarkMetrics:
    def test_correlation_r2(self, simple_returns_df, simple_benchmark_df):
        corr = one_row(stats.correlation(simple_returns_df, simple_benchmark_df))
        r2 = one_row(stats.r_squared(simple_returns_df, simple_benchmark_df))
        assert r2["asset_a"] == approx(corr["asset_a"] ** 2)  # ref :1200
        assert corr["asset_a"] == approx(1.0)

    def test_information_ratio_series(self, spark, simple_returns_series, simple_benchmark_series):
        ir = stats.information_ratio(simple_returns_series, simple_benchmark_series)
        # active = r − b = [.005,-.01,.015,-.005,.01]; mean/std
        import statistics

        active = [0.005, -0.01, 0.015, -0.005, 0.01]
        expected = statistics.mean(active) / statistics.stdev(active)
        assert ir == approx(expected)


class TestDrawdownEpisodes:
    def test_episode_frame(self, spark):
        import datetime as dt

        dates = [dt.date(2023, 1, i) for i in range(1, 8)]
        vals = [0.02, -0.01, -0.02, 0.05, -0.01, -0.01, 0.03]
        df = spark.createDataFrame(list(zip(dates, vals)), "date date, asset double")
        # reference tests/test_stats.py:1210-1215 — two 2-day episodes
        assert one_row(stats.longest_drawdown_days(df))["asset"] == 2
        assert one_row(stats.avg_drawdown_days(df))["asset"] == approx(2.0)

    def test_episode_null_breaks(self, spark):
        """A null return mid-drawdown ends the episode (reference
        ``stats.py:1585``: ``value is not None and value < 0``) — the fused
        peak-pos path, the legacy island-sum fallback, and the keyed path
        must all split the two dd<0 runs around the null row."""
        import datetime as dt

        from alphastats_spark.operators import islands, keyed, ordered

        dates = [dt.date(2023, 1, i) for i in range(1, 10)]
        vals = [0.02, -0.01, -0.02, None, -0.01, -0.01, 0.06, -0.02, 0.01]
        df = spark.createDataFrame(list(zip(dates, vals)), "date date, asset double")

        # three 2-day episodes (Jan2-3, Jan5-6, Jan8-9); a merged null-run
        # would instead report a 5-day longest (Jan2-6)
        assert one_row(stats.longest_drawdown_days(df))["asset"] == 2
        assert one_row(stats.avg_drawdown_days(df))["asset"] == approx(2.0)

        # legacy island fallback (externally supplied dd, no pos columns)
        # agrees with the fused path on the same frame
        odf = ordered.with_order(df, "date")
        odf = ordered.add_drawdown_columns(odf, {"__dd_asset": "asset"})
        legacy = islands.drawdown_episode_stats(
            odf, ["asset"], "date", dd_cols={"asset": "__dd_asset"}
        )
        assert legacy["asset"]["longest_days"] == 2
        assert legacy["asset"]["avg_days"] == approx(2.0)

        # keyed path: same series under one key, peak-pos episode ids
        long_rows = [("k", d, v) for d, v in zip(dates, vals)]
        ldf = spark.createDataFrame(long_rows, "key string, date date, value double")
        ldf = keyed.with_order_keyed(ldf, "date")
        ldf = keyed.add_drawdown_columns_keyed(
            ldf, ["key"], {"__dd": "value"}, with_peak_pos=True
        )
        got = keyed.episode_stats_keyed(
            ldf, ["key"], "__dd", length_mode="days",
            temporal_name="date", pos_col="__dd__pos",
        ).first()
        assert got["longest_days"] == 2
        assert got["avg_days"] == approx(2.0)

    def test_ulcer(self, spark, simple_returns_series):
        dd = [0.0, -0.020000000000000018, 0.0, -0.01000000000000012, 0.0]
        expected = math.sqrt(sum(d * d for d in dd) / (len(dd) - 1))
        assert stats.ulcer_index(simple_returns_series) == approx(expected)


class TestErrors:
    def test_multiple_temporal(self, spark):
        from alphastats_spark.exceptions import MultipleTemporalColumnsError

        import datetime as dt

        df = spark.createDataFrame(
            [(dt.date(2023, 1, 1), dt.datetime(2023, 1, 1), 0.01)],
            "date date, datetime timestamp, asset double",
        )
        with pytest.raises(MultipleTemporalColumnsError):
            stats.cagr(df)

    def test_benchmark_no_numeric(self, spark, simple_returns_df):
        from alphastats_spark.exceptions import NoReturnColumnError

        import datetime as dt

        bench = spark.createDataFrame([(dt.date(2023, 1, 1), "x")], "date date, name string")
        with pytest.raises(NoReturnColumnError):
            stats.greeks(simple_returns_df, bench)

    def test_benchmark_ambiguous(self, spark, simple_returns_df):
        from alphastats_spark.exceptions import AmbiguousBenchmarkReturnsError

        import datetime as dt

        bench = spark.createDataFrame(
            [(dt.date(2023, 1, 1), 0.01, 0.02)], "date date, b1 double, b2 double"
        )
        with pytest.raises(AmbiguousBenchmarkReturnsError):
            stats.greeks(simple_returns_df, bench)


class TestAliases:
    def test_reference_aliases_point_at_targets(self, spark):
        """The reference export list's aliases (SURVEY §2.8) must be the
        same callables as their targets (psr delegates — the reference
        re-declares its defaults, reference ``stats.py:326``)."""
        import pandas as pd

        from alphastats_spark import stats as s

        assert s.geometric_mean is s.expected_return
        series = pd.Series([0.01, -0.02, 0.03, 0.015, -0.005])
        assert s.psr(series) == s.probabilistic_sharpe_ratio(series)
        assert s.ror is s.risk_of_ruin
        assert s.var is s.value_at_risk
        assert s.cvar is s.conditional_value_at_risk
        assert s.expected_shortfall is s.conditional_value_at_risk
        assert s.gain_to_pain_ratio_monthly is s.gain_to_pain_ratio_1m
        assert s.sortino_sqrt2 is s.adjusted_sortino
        assert s.smart_sortino_sqrt2 is s.smart_adjusted_sortino
        assert s.r2 is s.r_squared


class TestCalendarAggregation:
    def test_aggregated_metric_schema_is_clean(self, spark):
        """Calendar-aggregated metrics must emit ONLY the return columns —
        the reference's _simple_returns ends with .select(return_col_names)
        (reference ``stats.py:772-774``), so e.g. best(df, aggregate='month')
        is a 1-row × 1-col frame, and row[0] is a return, not a group year."""
        import datetime as dt

        df = spark.createDataFrame(
            [
                (dt.date(2021, 1, 4), 0.01),
                (dt.date(2021, 1, 5), -0.02),
                (dt.date(2021, 2, 1), 0.03),
                (dt.date(2021, 3, 1), 0.005),
            ],
            "d date, r double",
        )
        out = stats.best(df, aggregate="month")
        assert out.columns == ["r"]
        assert abs(out.first()[0]) < 1.0  # a return, not a year
        assert stats.gain_to_pain_ratio_1m(df).columns == ["r"]
        assert stats.expected_monthly(df).columns == ["r"]

    def test_weekly_first_appearance_order(self, spark):
        """Week-aggregated streaks must follow first-appearance order:
        early-January rows belonging to ISO week 52/53 of the prior year
        sort by their first date, not by the (calendar-year, 53) tuple
        (reference maintain_order=True, ``stats.py:749-761``)."""
        import datetime as dt

        # 2022-01-01 is ISO week 52 (of 2021); with calendar-year grouping it
        # gets key (2022, 52), which a (year, week)-tuple sort would place
        # AFTER (2022, 1)... breaking the win streak. First-appearance order
        # keeps it first: weeks = [+, +, -] -> longest win streak 2.
        df = spark.createDataFrame(
            [
                (dt.date(2022, 1, 1), 0.01),   # ISO week 52 -> group (2022, 52)
                (dt.date(2022, 1, 4), 0.02),   # ISO week 1  -> group (2022, 1)
                (dt.date(2022, 1, 11), -0.02), # ISO week 2  -> group (2022, 2)
            ],
            "d date, r double",
        )
        res = stats.consecutive_wins(df, aggregate="week")
        assert res.first()[0] == 2


class TestApproxPercentilePath:
    def test_exact_default_matches_and_approx_close(self, spark, simple_returns_series):
        """exact=True (default) is the parity path; exact=False flips to
        approx_percentile and must agree closely on a small series (the
        sketch is exact for tiny inputs at default accuracy)."""
        exact_v = stats.tail_ratio(simple_returns_series)
        approx_v = stats.tail_ratio(simple_returns_series, exact=False)
        assert approx_v == pytest.approx(exact_v, rel=0.15)

        for fn in (stats.common_sense_ratio, stats.outlier_win_ratio, stats.outlier_loss_ratio):
            assert fn(simple_returns_series, exact=False) == pytest.approx(
                fn(simple_returns_series), rel=0.25
            )

    def test_approx_plan_has_no_exact_percentile(self, spark):
        """The approx path must not contain the exact sort-based percentile
        aggregate in its physical plan."""
        df = spark.range(1000).select((F_col_rand()).alias("r"))
        plan_exact = stats.tail_ratio(df)._jdf.queryExecution().executedPlan().toString()
        plan_approx = stats.tail_ratio(df, exact=False)._jdf.queryExecution().executedPlan().toString()
        assert "approx_percentile" not in plan_exact
        assert "approx_percentile" in plan_approx


def F_col_rand():
    from pyspark.sql import functions as F

    return F.rand(seed=7) - 0.5
