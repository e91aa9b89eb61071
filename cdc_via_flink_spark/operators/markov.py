"""Absorbing-Markov-chain model algebra for removal-effect
attribution (plans/sequence_queries.py::q_attribution_markov).

The DISTRIBUTED part of the operator — journey windowing and
transition counting over the event log — happens in the plans layer
(one user-keyed shuffle). What lives here is the MODEL-sized step:
the normalized transition matrix is bounded by the state space
(start + |channels| + conv/drop, <=7x7 for the synthetic vocabulary),
so it is collected once and powered by log-step squaring in exact
driver-side DECIMAL arithmetic — the kmeans-centroid precedent
(operators/kmeans.py collects k-row centroid tables per iteration).
A Spark-side squaring lineage would duplicate the upstream subtree
2^squarings times per chain (the exponential-inlining trap the
DuckDB oracle avoids with AS MATERIALIZED); collecting the 49-row
model is the honest, scale-correct alternative.

Exactness contract: matrix entries arrive as DECIMAL(18,12) (python
``decimal.Decimal``); each squaring sums exact products and applies
ONE half-up round to 12 dp — bit-identical to the oracle's
``CAST(round(sum(a.p*b.p),12) AS DECIMAL(18,12))`` and independent of
association order.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, getcontext

from pyspark.sql import DataFrame, SparkSession

_Q12 = Decimal("1e-12")
_Q6 = Decimal("1e-6")

Matrix = dict[tuple[str, str], Decimal]


def _squared(m: Matrix) -> Matrix:
    out: Matrix = {}
    for (af, at), ap in m.items():
        for (bf, bt), bp in m.items():
            if at == bf:
                out[(af, bt)] = out.get((af, bt), Decimal(0)) + ap * bp
    return {k: v.quantize(_Q12, ROUND_HALF_UP) for k, v in out.items()}


def _p_absorb(m: Matrix, squarings: int, src: str, dst: str) -> float:
    for _ in range(squarings):
        m = _squared(m)
    return float(m.get((src, dst), Decimal(0)))


def _removed(m: Matrix, channel: str) -> Matrix:
    """Reroute edges into ``channel`` to 'drop' and delete its
    outgoing row — the standard removal counterfactual."""
    out: Matrix = {}
    for (f, t), p in m.items():
        if f == channel:
            continue
        t2 = "drop" if t == channel else t
        out[(f, t2)] = out.get((f, t2), Decimal(0)) + p
    return out


def removal_effect_attribution(
    spark: SparkSession,
    m_full: DataFrame,
    channels: tuple[str, ...],
    squarings: int,
) -> DataFrame:
    """Collect the model-sized matrix (from_type, to_type, p DECIMAL)
    and return the per-channel removal-effect credit frame."""
    getcontext().prec = 50
    model: Matrix = {
        (row["from_type"], row["to_type"]): row["p"] for row in m_full.collect()
    }
    p_full = _p_absorb(model, squarings, "start", "conv")
    effs = []
    for c in channels:
        p_rm = _p_absorb(_removed(model, c), squarings, "start", "conv")
        raw = 1.0 - p_rm / p_full if p_full > 0 else 0.0
        eff = max(Decimal(0), Decimal(raw).quantize(_Q12, ROUND_HALF_UP))
        effs.append((c, p_rm, eff))
    total = sum(e for _, _, e in effs)

    def _r6(x: float) -> float:
        return float(Decimal(x).quantize(_Q6, ROUND_HALF_UP))

    out_rows = [
        (
            c,
            _r6(p_full),
            _r6(p_rm),
            _r6(float(eff)),
            _r6(float(eff) / float(total)) if total != 0 else 0.0,
        )
        for c, p_rm, eff in sorted(effs)
    ]
    return spark.createDataFrame(
        out_rows,
        "channel string, p_conv_full double, p_conv_removed double, "
        "removal_effect double, credit_share double",
    ).orderBy("channel")
