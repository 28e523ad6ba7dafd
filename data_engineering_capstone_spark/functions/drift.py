"""Shared drift-metric expression builders (PSI family).

The Population Stability Index definition — probability floor, term
formula, decimal precision, and the boundary-array bucket assignment —
is used by the batch gate (``queries_etl.etl_psi_drift`` and its KLL
twin) AND the streaming ingestion monitor
(``queries_streaming.stream_psi_drift``). It lives here exactly once so
the batch and streaming gates cannot drift apart: a floor or precision
change propagates to every caller (each caller's SQL oracle mirrors
these constants — change them together).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the standard empty-bin guard: probabilities are floored here before
# the log-ratio so an empty current-period bucket contributes a large
# finite term instead of +/-inf
PSI_FLOOR = 1e-6

# decimal type for exact, order-independent term summation
PSI_TERM_DECIMAL = "decimal(28,15)"


def bucket_expr(bounds_col: str, value_col: str) -> Column:
    """Bucket index 0..len(bounds): count of boundaries <= value.

    ``bounds_col`` names an array<double> column (broadcast 1-row
    boundary table joined onto the fact); the lambda stays inside the
    codegen'd projection (measured equal to a when-chain, BASELINE.md
    round-5 fifth session).

    NULL handling: a NULL ``value_col`` makes every lambda result NULL,
    which ``F.filter`` drops, so NULL values land in bucket 0 alongside
    the lowest-value range (identically in the callers' SQL oracles,
    where ``NULL <= bound`` is never true). Callers gating on columns
    that can be NULL should exclude or count NULLs separately before
    bucketing if conflating them with the low bucket would mask drift.
    """
    return (
        F.size(F.filter(bounds_col, lambda x: x <= F.col(value_col)))
        .cast("int")
    )


def psi_term(p_cur: Column, p_ref: Column) -> Column:
    """One bucket's PSI contribution as an exact-summable DECIMAL.

    (p_cur' - p_ref') * ln(p_cur'/p_ref') with both probabilities
    floored at PSI_FLOOR — the identical double expression tree the
    callers' DuckDB oracles use, cast to DECIMAL so the cross-bucket
    sum is order-free and partitioning-exact.
    """
    pc = F.greatest(p_cur, F.lit(PSI_FLOOR))
    pr = F.greatest(p_ref, F.lit(PSI_FLOOR))
    return ((pc - pr) * F.log(pc / pr)).cast(PSI_TERM_DECIMAL)
