"""String/tokenization helpers shared by text-analysis operators.

Pure Column expressions (JVM-side). The token model is deliberately
simple and engine-portable: split on whitespace runs, drop empties —
identical results in Spark and ANSI oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def ngrams(col: Column | str, n: int) -> Column:
    """Token n-grams as space-joined strings (array<string>).

    Built as a ``zip_with`` fold over n shifted slices of the token
    array — one lambda pass concatenating element-wise. Replaced the
    ``transform(sequence, i -> array_join(slice(t, i, n)))`` form in
    round 4: that shape allocates an n-element array per OUTPUT gram
    inside an interpreted lambda, measured 2.69 s vs 0.40 s for the
    bigram explode over 80k docs (6.7×). Both forms are higher-order
    (CodegenFallback); the win is per-element work, not codegen. No
    UDF, no explode/re-group round trip.
    """
    from functools import reduce

    t = tokens(col)
    cnt = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
    slices = [F.slice(t, i + 1, cnt) for i in range(n)]
    grams = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y)),
        slices,
    )
    return (
        F.when(t.isNull(), F.lit(None).cast("array<string>"))
        .when(F.size(t) >= n, grams)
        .otherwise(F.array().cast("array<string>"))
    )
