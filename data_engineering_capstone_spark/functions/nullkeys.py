"""Type-legal defaults for materialized null-safe key normal forms.

The repo's null-safe join/width convention (operators/cdc.py,
operators/prefix.py) materializes ``(coalesce(k, default), isnull(k))``
as REAL columns and uses plain equality everywhere — one explicit
exchange then serves repartition + aggregate + window + join, and
nothing depends on Catalyst's internal eqNullSafe rewrite (whose
``Literal.default`` differs by type: 0 for numerics but '' for strings,
so a hand-written ``coalesce(k, 0)`` silently mismatches a STRING key's
derived distribution and the explicit width is discarded — round-11
self-review finding).

The default's VALUE never affects semantics — the ``isnull`` companion
column disambiguates a real 0/''/epoch key from a NULL key — it only
has to be type-legal: ``F.lit(0).cast(DateType)`` is an ILLEGAL cast in
Spark (DATATYPE_MISMATCH at analysis), which is why this helper exists
instead of a bare ``lit(0).cast(dtype)``.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def null_default(dtype: T.DataType) -> Column:
    """A non-null literal of ``dtype`` usable as a coalesce default in a
    materialized null-safe normal form. Raises for types that cannot be
    equality-join keys in this repo's operators."""
    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    if isinstance(dtype, T.DateType):
        return F.lit(datetime.date(1970, 1, 1))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.lit(datetime.datetime(1970, 1, 1)).cast(dtype)
    if isinstance(dtype, T.BinaryType):
        return F.lit(b"")
    if isinstance(
        dtype,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        return F.lit(0).cast(dtype)
    raise TypeError(f"no null-safe join-key default for type {dtype}")
