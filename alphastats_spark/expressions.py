"""Reusable Column-expression builders — the library's extension mechanism.

The reference's metrics are all composable Polars expression builders (e.g.
``_comp`` at ``alphastats/stats.py:49-50``). Here each metric is a pure
function ``Column -> Column`` so that:

* every public metric is a single ``df.agg(...)`` / ``df.select(...)`` —
  Catalyst sees one declarative plan, whole-stage codegen covers the math;
* ``reports.metrics`` can batch ~40 metrics × N columns into ONE aggregation
  pass instead of launching one Spark job per cell (reference launches one
  ``collect()`` per cell, ``reports.py:397-447`` — fine in-memory, fatal on a
  cluster).

Polars-vs-Spark semantic shims (critical for parity):

* ``when_pl`` — Polars ``when/then/otherwise`` yields NULL when the condition
  is NULL; Spark's ``F.when`` falls through to ``otherwise``. Metrics like
  sortino's downside mean depend on null rows staying null (so aggregate
  means skip them).
* ``fdiv`` — Polars float division yields ``±inf``/``NaN`` on zero
  denominators; Spark yields NULL. The reference's tests pin NaN/inf results
  (e.g. ``tests/test_stats.py:309-313``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from alphastats_spark._utils import to_excess_returns

def NAN() -> Column:
    return F.lit(float("nan"))


def INF() -> Column:
    return F.lit(float("inf"))


def NEG_INF() -> Column:
    return F.lit(float("-inf"))


def when_pl(cond: Column, then: Column | float, otherwise: Column | float | None) -> Column:
    """Polars-semantics when/then/otherwise: NULL condition → NULL result."""
    out = F.when(cond.isNull(), F.lit(None)).when(cond, then)
    if otherwise is not None:
        out = out.otherwise(otherwise)
    return out


def fdiv(num: Column, den: Column) -> Column:
    """Float division with IEEE semantics (x/0 → ±inf, 0/0 → NaN) like Polars."""
    num = num.cast("double")
    den = den.cast("double")
    return (
        F.when(num.isNull() | den.isNull(), F.lit(None))
        .when(den != 0, num / den)
        .when(F.isnan(num) | (num == 0), NAN())
        .when(num > 0, INF())
        .otherwise(NEG_INF())
    )


def comp(c: Column) -> Column:
    """Total compounded return ``∏(1+r) − 1`` (reference ``stats.py:49-50``)."""
    return F.product(c + 1) - 1


def cagr(c: Column, rf: float | None = None, compound: bool = True, periods: int = 252) -> Column:
    """CAGR over excess returns (reference ``stats.py:53-89``)."""
    excess = to_excess_returns(c, rf)
    n_years = F.count(c) / F.lit(float(periods))
    if compound:
        total = comp(excess) + 1
    else:
        total = F.sum(excess) + 1
    return F.pow(total, fdiv(F.lit(1.0), n_years)) - 1


def mean_std_ratio(c: Column, rf: float | None, periods: int, annualize: bool) -> Column:
    """Shared core of sharpe (reference ``stats.py:142-175``)."""
    excess = to_excess_returns(c, rf)
    ratio = fdiv(F.mean(excess), F.stddev_samp(excess))
    if annualize:
        ratio = ratio * F.lit(periods**0.5)
    return ratio


sharpe = mean_std_ratio


def sortino(c: Column, rf: float | None = None, periods: int = 252, annualize: bool = True) -> Column:
    """Sortino: mean / sqrt(mean(min(r,0)²)) — denominator mean is over *all*
    (non-null) rows, not only negatives (reference ``stats.py:219-220``)."""
    excess = to_excess_returns(c, rf)
    downside = when_pl(excess < 0, excess, F.lit(0.0))
    downside_risk = F.sqrt(F.mean(F.pow(downside, 2)))
    ratio = fdiv(F.mean(excess), downside_risk)
    if annualize:
        ratio = ratio * F.lit(periods**0.5)
    return ratio


def volatility(c: Column, periods: int = 252, annualize: bool = True) -> Column:
    """Sample standard deviation (reference ``stats.py:349-377``)."""
    out = F.stddev_samp(c)
    if annualize:
        out = out * F.lit(periods**0.5)
    return out


def cpc_index(c: Column) -> Column:
    """Profit factor × payoff ratio × win rate (reference ``stats.py:590-632``)."""
    gains_sum = F.sum(when_pl(c >= 0, c, F.lit(0.0)))
    losses_sum_abs = F.abs(F.sum(when_pl(c < 0, c, F.lit(0.0))))
    wins_count = F.sum((c > 0).cast("long"))
    losses_count = F.sum((c < 0).cast("long"))
    non_zero_count = F.sum((c != 0).cast("long"))
    avg_win = fdiv(gains_sum, wins_count)
    avg_loss_abs = fdiv(losses_sum_abs, losses_count)
    profit_factor_ = fdiv(gains_sum, losses_sum_abs)
    payoff_ratio_ = fdiv(avg_win, avg_loss_abs)
    win_rate_ = fdiv(wins_count, non_zero_count)
    return profit_factor_ * payoff_ratio_ * win_rate_


def exposure(c: Column) -> Column:
    """Non-zero periods / non-null periods (reference ``stats.py:643-668``)."""
    return fdiv(F.sum((c != 0).cast("long")), F.count(c))


def omega(c: Column, threshold: float = 0.0) -> Column:
    """Σmax(0, r−θ) / Σmax(0, θ−r) (reference ``stats.py:679-711``)."""
    diff = c - F.lit(float(threshold))
    gains = F.sum(F.greatest(diff, F.lit(0.0)))
    losses = F.sum(F.greatest(-diff, F.lit(0.0)))
    return fdiv(gains, losses)


def expected_return(c: Column) -> Column:
    """Geometric mean ``∏(1+r)^(1/n) − 1`` (reference ``stats.py:799-807``)."""
    return F.pow(F.product(c + 1), fdiv(F.lit(1.0), F.count(c))) - 1


def skew(c: Column) -> Column:
    """Bias-corrected (pandas-style G1) skewness (reference ``stats.py:859-869``).

    Spark's ``F.skewness`` is the population g1 = m3/m2^1.5 computed with a
    numerically-stable streaming central-moment update (safe at 100 TB, no
    catastrophic cancellation). The reference applies the bias correction
    G1 = sqrt(n(n−1))/(n−2) · g1 — we apply the same factor on top.
    """
    n = F.count(c).cast("double")
    return fdiv(F.sqrt(n * (n - 1)), (n - 2)) * F.skewness(c)


def kurtosis(c: Column) -> Column:
    """Bias-corrected excess kurtosis G2 (reference ``stats.py:880-891``).

    Spark's ``F.kurtosis`` is the population excess g2 = m4/m2² − 3;
    G2 = ((n−1)/((n−2)(n−3)))·((n+1)·g2 + 6).
    """
    n = F.count(c).cast("double")
    return fdiv((n - 1), ((n - 2) * (n - 3))) * ((n + 1) * F.kurtosis(c) + 6)


def avg_return(c: Column) -> Column:
    """Mean of non-zero returns (reference ``stats.py:906-914``)."""
    return F.mean(when_pl(c != 0, c, None))


def avg_win(c: Column) -> Column:
    """Mean of positive returns (reference ``stats.py:927-935``)."""
    return F.mean(when_pl(c > 0, c, None))


def avg_loss(c: Column) -> Column:
    """Mean of negative returns (reference ``stats.py:950-958``)."""
    return F.mean(when_pl(c < 0, c, None))


def win_rate(c: Column) -> Column:
    """count(r>0) / count(r≠0) (reference ``stats.py:973-983``)."""
    wins = F.sum((c > 0).cast("long"))
    non_zero = F.sum((c != 0).cast("long"))
    return fdiv(wins, non_zero)


def payoff_ratio(c: Column) -> Column:
    """avg_win / |avg_loss| (reference ``stats.py:994-1000``)."""
    return fdiv(avg_win(c), F.abs(avg_loss(c)))


def profit_factor(c: Column) -> Column:
    """Σ(r≥0) / |Σ(r<0)| (reference ``stats.py:1011-1017``)."""
    wins = F.sum(when_pl(c >= 0, c, F.lit(0.0)))
    losses = F.abs(F.sum(when_pl(c < 0, c, F.lit(0.0))))
    return fdiv(wins, losses)


def gain_to_pain_ratio(c: Column, rf: float = 0.0) -> Column:
    """Σ(r−rf) / |Σ negative (r−rf)| (reference ``stats.py:1028-1035``)."""
    r = to_excess_returns(c, rf)
    downside = F.abs(F.sum(when_pl(r < 0, r, F.lit(0.0))))
    return fdiv(F.sum(r), downside)


def percentile(c: Column, q: float, exact: bool = True, accuracy: int = 10000) -> Column:
    """Percentile aggregate: exact by default for reference parity, approx
    on request for extreme scale.

    ``F.percentile`` is exact (sort-based linear interpolation, matching
    Polars ``interpolation="linear"``, reference ``stats.py:1068-1090``) but
    buffers the group server-side; ``exact=False`` switches to
    ``F.approx_percentile`` (KLL-sketch, bounded memory, mergeable partial
    aggregation) — the difference between feasible and not at 100 TB.
    """
    if exact:
        return F.percentile(c, F.lit(float(q)))
    return F.approx_percentile(c, F.lit(float(q)), F.lit(int(accuracy)))


def common_sense_ratio(c: Column, exact: bool = True) -> Column:
    """Profit factor × tail ratio (reference ``stats.py:1059-1071``).

    Exact linear-interpolation percentile by default for parity; see
    ``percentile`` for the ``exact=False`` scale path.
    """
    return profit_factor(c) * tail_ratio(c, exact=exact)


def tail_ratio(c: Column, cutoff: float = 0.95, exact: bool = True) -> Column:
    """|q_cutoff| / |q_{1−cutoff}| (reference ``stats.py:1082-1092``)."""
    hi = F.abs(percentile(c, cutoff, exact))
    lo = F.abs(percentile(c, 1 - cutoff, exact))
    return fdiv(hi, lo)


def outlier_win_ratio(c: Column, quantile: float = 0.99, exact: bool = True) -> Column:
    """q99 / mean(r≥0) (reference ``stats.py:1105-1114``)."""
    positive_mean = F.mean(when_pl(c >= 0, c, None))
    return fdiv(percentile(c, quantile, exact), positive_mean)


def outlier_loss_ratio(c: Column, quantile: float = 0.01, exact: bool = True) -> Column:
    """q01 / mean(r<0) (reference ``stats.py:1127-1136``)."""
    negative_mean = F.mean(when_pl(c < 0, c, None))
    return fdiv(percentile(c, quantile, exact), negative_mean)


def kelly_criterion(c: Column) -> Column:
    """((W·p) − (1−p)) / W with W=payoff ratio, p=win rate (reference ``stats.py:1147-1158``)."""
    win_loss = payoff_ratio(c)
    win_prob = win_rate(c)
    lose_prob = 1 - win_prob
    return fdiv((win_loss * win_prob) - lose_prob, win_loss)


def risk_of_ruin(c: Column) -> Column:
    """((1−p)/(1+p))^n (reference ``stats.py:1169-1178``)."""
    win_prob = win_rate(c)
    return F.pow(fdiv(1 - win_prob, 1 + win_prob), F.count(c))


def value_at_risk(c: Column, sigma: float = 1.0, confidence: float = 0.95) -> Column:
    """Parametric (variance-covariance) VaR (reference ``stats.py:1194-1205``).

    The Φ⁻¹ z-score is driver-side scalar math, mirroring the reference's use
    of ``statistics.NormalDist`` (``stats.py:18,1202``).
    """
    from statistics import NormalDist

    if confidence > 1:
        confidence = confidence / 100
    z = NormalDist().inv_cdf(1 - confidence)
    return F.mean(c) + F.lit(z * sigma) * F.stddev_samp(c)


def recovery_factor_parts(c: Column, rf: float = 0.0) -> Column:
    """Numerator |Σr − rf| of recovery factor (reference ``stats.py:1514-1522``);
    the denominator is a drawdown-window aggregate composed in ``stats.py``."""
    return F.abs(F.sum(c) - F.lit(float(rf)))


def geometric_sum_penalty_col(coef: Column, n: Column) -> Column:
    """Column form of :func:`geometric_sum_penalty` — the same closed-form
    geometric sums as Spark expressions, so a PER-KEY penalty computes
    inside the plan (a million keys never touch the driver).

    ``coef`` is the |lag-1 autocorrelation| aggregate for the key, ``n``
    its non-null count.
    """
    n = n.cast("double")
    m = n - 1
    c_ = F.abs(coef)
    cm = F.pow(c_, m)
    s1 = c_ * (1 - cm) / (1 - c_)
    s2 = c_ * (1 - (m + 1) * cm + m * cm * c_) / F.pow(1 - c_, 2)
    corr = F.when(c_ == 1.0, m - (m * (m + 1) / 2) / n).otherwise(s1 - s2 / n)
    return (
        F.when((n < 2) | coef.isNull() | F.isnan(coef), NAN())
        .otherwise(F.sqrt(1 + 2 * corr))
    )


def geometric_sum_penalty(coef: float, n: int) -> float:
    """Driver-side autocorrelation penalty (reference ``stats.py:1292-1315``).

    penalty = sqrt(1 + 2·Σ_{x=1}^{n−1} ((n−x)/n)·coef^x). The reference loops
    O(n) in Python; we use the closed-form geometric sums so the driver cost
    is O(1) regardless of row count:
        Σ c^x = c(1−c^m)/(1−c);  Σ x·c^x = c(1−(m+1)c^m + m c^{m+1})/(1−c)^2
    """
    if n < 2 or math.isnan(coef):
        return math.nan
    m = n - 1
    if coef == 1.0:
        corr = m - (m * (m + 1) / 2) / n
    else:
        cm = coef**m
        s1 = coef * (1 - cm) / (1 - coef)
        s2 = coef * (1 - (m + 1) * cm + m * cm * coef) / ((1 - coef) ** 2)
        corr = s1 - s2 / n
    return math.sqrt(1 + 2 * corr)
