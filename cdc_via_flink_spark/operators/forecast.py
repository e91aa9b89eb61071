"""Holt linear-trend recurrence (plans/stats_queries.py::
q_holt_forecast) — model-sized sequential smoothing.

The DISTRIBUTED part — the monthly revenue aggregate — happens in the
plans layer (one shuffle). The recurrence l_t = a*y_t +
(1-a)(l_{t-1}+b_{t-1}), b_t = g*(l_t-l_{t-1}) + (1-g)*b_{t-1} is
inherently sequential over the BOUNDED month grid (24 points), so the
series is collected once and folded in exact driver-side DECIMAL
(the kmeans-centroid / markov precedent). Every step applies the
exact products of DECIMAL coefficients (a = 0.30, g = 0.10) and ONE
half-up round to 6 dp — bit-identical to the oracle's chained
MATERIALIZED CTEs, association-order independent by construction
(each step is a 1-row fold)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, getcontext

_Q6 = Decimal("1e-6")
ALPHA = Decimal("0.30")
GAMMA = Decimal("0.10")


def holt_fold(ys: list[Decimal]) -> tuple[Decimal, Decimal]:
    """(level, trend) after folding the ordered series.

    Requires >= 1 point; a 1-point series degrades to (y0, trend 0)
    rather than crashing (the trend seed y1 - y0 needs two points)."""
    if not ys:
        raise ValueError("holt_fold requires a non-empty series")
    getcontext().prec = 50
    level = ys[0]
    if len(ys) == 1:
        return level, Decimal(0)
    trend = ys[1] - ys[0]
    one_a = Decimal(1) - ALPHA
    one_g = Decimal(1) - GAMMA
    for y in ys[1:]:
        prev = level
        level = (ALPHA * y + one_a * (prev + trend)).quantize(
            _Q6, ROUND_HALF_UP
        )
        trend = (GAMMA * (level - prev) + one_g * trend).quantize(
            _Q6, ROUND_HALF_UP
        )
    return level, trend


def holt_forecast_frame(spark, series_df, horizon: int):
    """Collect the model-sized (mo, y DECIMAL) monthly frame, fold the
    recurrence, and return the (h, forecast, level, trend) frame."""
    rows = sorted(series_df.collect(), key=lambda r: r["mo"])
    level, trend = holt_fold([r["y"] for r in rows])
    q2 = Decimal("1e-2")

    def r2(x: Decimal) -> float:
        return float(x.quantize(q2, ROUND_HALF_UP))

    out = [
        (h, r2(level + h * trend), r2(level), r2(trend))
        for h in range(1, horizon + 1)
    ]
    return spark.createDataFrame(
        out, "h int, forecast double, level double, trend double"
    ).orderBy("h")


_Q12 = Decimal("1e-12")


def pacf_frame(spark, rho_df, max_lag: int):
    """Durbin-Levinson partial autocorrelations from the collected
    model-sized (lag, rho DECIMAL(14,12)) frame — exact DECIMAL
    vector updates, one double divide per level rounded half-up to
    12 dp (bit-identical to the oracle's chained CTEs). Returns
    (lag, acf, pacf) with 6-dp display rounding."""
    getcontext().prec = 50
    rho = {int(r["lag"]): r["rho"] for r in rho_df.collect()}
    q6 = Decimal("1e-2") ** 3  # 1e-6
    v = {1: rho[1]}
    out = [(1, rho[1], rho[1])]
    for k in range(2, max_lag + 1):
        num = float(rho[k]) - float(
            sum(v[j] * rho[k - j] for j in v)
        )
        den = 1.0 - float(sum(v[j] * rho[j] for j in v))
        kk = Decimal(num / den).quantize(_Q12, ROUND_HALF_UP)
        v = {
            j: (v[j] - kk * v[k - j]).quantize(_Q12, ROUND_HALF_UP) for j in v
        } | {k: kk}
        out.append((k, rho[k], kk))
    rows = [
        (
            lag,
            float(a.quantize(q6, ROUND_HALF_UP)),
            float(p.quantize(q6, ROUND_HALF_UP)),
        )
        for lag, a, p in out
    ]
    return spark.createDataFrame(
        rows, "lag int, acf double, pacf double"
    ).orderBy("lag")
