"""Range (interval) join via bucketization (SURVEY.md §2 C-join: theta/
range joins).

Joining points to intervals (``start <= point < end``) is a non-equi
join: Spark's only generic plan is a nested loop, which is quadratic and
only acceptable when one side broadcasts. The scale path is
bucketization: quantize the range domain into fixed-width buckets, give
every interval a row per bucket it overlaps, join POINTS⋈INTERVALS as an
EQUI-join on the bucket id, then re-check the exact predicate. Shuffle
is linear in data size + interval spans; a hot bucket is still subject
to AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Equi-join plan for ``start <= point < end``.

    ``bucket_width`` trades replication for pruning: intervals get
    ceil(span/width) rows each; points get exactly one. Pick it near the
    typical interval span.
    """
    w = F.lit(bucket_width)
    b_points = points.withColumn(BUCKET_COL, F.floor(F.col(point_col) / w))
    b_intervals = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.floor((F.col(end_col) - F.lit(1e-9)) / w),
            )
        ),
    )
    joined = b_points.join(b_intervals, BUCKET_COL, how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop(BUCKET_COL)
