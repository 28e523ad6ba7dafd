"""Model-based document scoring plumbing — hashed-feature linear
classifier over bag-of-tokens (the fastText-style quality-classifier
shape every pretraining pipeline runs after the cheap heuristics).

The *plumbing* is the engine's contribution: hash each token into a
weight-table slot, sum the looked-up weights, squash with a sigmoid —
one scan, no shuffle, whole plan a Column expression. Real deployments
broadcast a trained weight vector; here the weight table is a
deterministic pseudo-random stand-in derived from md5 so the DuckDB
oracle can recompute bit-identical scores (the engine-portability
contract every exact catalog entry keeps).

Scale: per-document work is linear in token count, embarrassingly
parallel, zero shuffles before the caller's own aggregation — the same
plan shape at 100 TB.

The logit fold is a higher-order ``F.aggregate`` lambda, which runs
interpreted (CodegenFallback). Measured at 64x sf0.1 (320k docs,
round 4): this form 4.9 s vs explode + groupBy integer-sum 14.1 s
(pays a doc_id shuffle) vs an Arrow pandas-UDF kernel 12.4 s (pays
per-token hashlib) vs the DuckDB oracle 25.5 s — the per-token md5
dominates all forms, the interpreted fold is NOT the bottleneck, and
the zero-shuffle lambda plan wins by 2.5-2.9x. Kept deliberately; the
repo's CodegenFallback rule (BASELINE.md) applies where the lambda IS
the hot loop (vector math), not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.strings import tokens

#: weight-table modulus: token -> integer in [0, _SLOTS) -> centered weight
_SLOTS = 2001


def _token_weight(tok: Column) -> Column:
    """Deterministic pseudo-weight in [-1, 1] for one token.

    Mixes the first four md5 hex characters with a base-31 fold —
    ``ascii``/``substr``/``md5`` exist with identical semantics in
    Spark and DuckDB, so the oracle reproduces the exact doubles.
    """
    m = F.md5(tok)

    def a(i: int) -> Column:
        return F.ascii(F.substring(m, i, 1)).cast("long")

    h = ((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)
    return (h % _SLOTS - F.lit(1000)) / F.lit(1000.0)


def quality_classifier_score(text_col: Column | str) -> Column:
    """Linear-classifier quality score in (0, 1).

    ``sigmoid( sum(w[h(token)]) / sqrt(n_tokens) )`` — the 1/sqrt(n)
    scaling keeps long documents from saturating the logit, the
    standard bag-of-features normalization. Empty documents score 0.5
    (zero logit).
    """
    t = tokens(text_col)
    n = F.size(t)
    logit_sum = F.aggregate(
        F.transform(t, _token_weight), F.lit(0.0), lambda acc, x: acc + x
    )
    z = F.when(n > 0, logit_sum / F.sqrt(n.cast("double"))).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
