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

    Built from ``slice`` over the token array inside ``transform`` —
    no UDF, no explode/re-group round trip.
    """
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return (
        F.when(t.isNull(), F.lit(None).cast("array<string>"))
        .when(F.size(t) >= n, grams)
        .otherwise(F.array().cast("array<string>"))
    )
