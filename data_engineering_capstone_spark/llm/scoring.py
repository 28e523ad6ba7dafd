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

Round-10 kernel fix (tools/r10_races2.py): the weight lambda
referenced ``F.md5(tok)`` FOUR times, and interpreted higher-order
lambdas do not common-subexpression-eliminate — md5 ran 4× per token.
Chaining two transforms (tokens → md5 array → weight array) binds the
hash once per token with IDENTICAL doubles (oracle untouched):
8.04 → 5.06 s at the 64× replica, 1.35× vs the DuckDB oracle's 3.74 s.
Counter-measurement of record: pmod(xxhash64(tok), 2001) runs 2.20 s
(fully codegen'd hash), but DuckDB has no xxhash64 — shipping it would
demote the entry to rows-only, not worth the 2.3× on a sub-2× entry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.strings import tokens

#: weight-table modulus: token -> integer in [0, _SLOTS) -> centered weight
_SLOTS = 2001


def _hash_weight(m: Column) -> Column:
    """Deterministic pseudo-weight in [-1, 1] from one md5 hex digest.

    Mixes the first four hex characters with a base-31 fold —
    ``ascii``/``substr``/``md5`` exist with identical semantics in
    Spark and DuckDB, so the oracle reproduces the exact doubles.
    Takes the DIGEST, not the token: the caller binds md5 once per
    token (see the round-10 kernel note in the module docstring).
    """

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
    # tokens → digests → weights as CHAINED transforms so md5 is
    # evaluated once per token (interpreted lambdas don't CSE)
    logit_sum = F.aggregate(
        F.transform(F.transform(t, F.md5), _hash_weight),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = F.when(n > 0, logit_sum / F.sqrt(n.cast("double"))).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
