"""Date semantics from the reference's I94 data model (SURVEY.md §2 B5, B6).

* SAS date numerics: ``arrdate``/``depdate`` are days since 1960-01-01
  with no format applied (reference: I94_SAS_Labels_Descriptions.SAS:
  966-968, 1038-1040).
* Character dates: ``dtadfile`` is ``yyyyMMdd``, ``dtaddto`` is
  ``MMddyyyy`` and carries sentinel values like ``D/S`` (duration of
  status) that must become NULL, not errors (reference:
  I94_SAS_Labels_Descriptions.SAS:1056,1080; notebook cell-4 row 1).

All pure Column expressions — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date_to_date(col: Column | str) -> Column:
    """SAS day-number (double) → DATE: date_add('1960-01-01', int(col))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.lit(SAS_EPOCH).cast("date"), c.cast("int"))


def date_to_sas_day(col: Column | str) -> Column:
    """DATE → SAS day-number (the inverse, for round-trip checks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(c.cast("date"), F.lit(SAS_EPOCH).cast("date"))


def parse_char_date(col: Column | str, fmt: str) -> Column:
    """Parse a character date, returning NULL on sentinels/garbage.

    ``try_to_date`` keeps ANSI mode on (errors elsewhere still raise)
    while giving this one parse null-on-failure semantics — exactly the
    'D/S' sentinel behavior the I94 ``dtaddto`` field needs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(c, fmt)


def date_parts(col: Column | str, prefix: str = "") -> dict[str, Column]:
    """Derive the date-dimension attributes (year/month/day/week/dow).

    ``dow`` is ISO-normalized to Monday=1..Sunday=7 (``F.dayofweek`` is
    Sunday=1, a portability trap vs ANSI engines).
    """
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"{prefix}year": F.year(c),
        f"{prefix}month": F.month(c),
        f"{prefix}day": F.dayofmonth(c),
        f"{prefix}week": F.weekofyear(c),
        f"{prefix}dow": ((F.dayofweek(c) + 5) % 7) + 1,
    }
