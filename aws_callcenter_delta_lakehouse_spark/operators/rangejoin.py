"""Range join (points into intervals) — SURVEY.md §2.3 gap row.

A naive ``points JOIN intervals ON lo <= p AND p < hi`` has no equi
conjunct, so Spark plans a broadcast-nested-loop join — quadratic and
fatal at 100 TB. The scale path bucketizes: each interval is exploded
into the fixed-width buckets it covers, points map to one bucket, and
the join becomes an equi-join on the bucket id followed by an exact
range filter. Shuffle volume = |points| + sum(interval widths)/width,
not |points| x |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (half-open). ``bucket_width`` should be on the
    order of the typical interval width: too small explodes the interval
    side, too large degrades to a near-cross-join within buckets.

    Only ``how="inner"`` is supported: the exact range predicate is
    applied as a post-join filter, which would silently discard the
    null-extended rows any outer variant exists to keep. (An outer
    range join additionally can't be expressed on the bucketized
    equi-join without also deduplicating the multi-bucket fan-out of
    unmatched intervals.)
    """
    if how != "inner":
        raise ValueError(
            f"range_join supports how='inner' only (got {how!r}): the exact "
            "range predicate is a post-join filter, which drops the "
            "null-extended rows of outer joins"
        )
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=_BUCKET, how=how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo: str,
    hi: str,
    bucket_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Interval-x-interval OVERLAP join (``a.lo < b.hi AND b.lo < a.hi``,
    half-open) — the other non-equi join shape (concurrency analysis,
    schedule conflicts, session co-presence). Same bucketization idea as
    ``range_join``, one extra step: BOTH sides explode into the buckets
    they cover, overlapping pairs meet in >= 1 shared bucket, and the
    multi-bucket double-count is removed WITHOUT a distinct — a pair is
    kept only in the FIRST bucket it shares, ``max(floor(a.lo/w),
    floor(b.lo/w))``, which both sides can compute locally. Shuffle =
    sum(interval widths)/width per side; no pair-set dedup shuffle.

    Right-side columns are renamed with ``suffix``. The exact overlap
    predicate filters after the bucket equi-join.

    Precondition: ``lo <= hi`` per row. A malformed (inverted) interval
    matches nothing under the half-open overlap predicate anyway, so
    its bucket sequence is guarded to empty — without the guard
    ``F.sequence(lb, hb)`` would silently auto-step -1 and explode a
    DESCENDING bucket run (wasted work the exact predicate then
    discards).
    """

    def _buckets(lb_col, hb_col):
        return F.when(
            lb_col <= hb_col, F.sequence(lb_col, hb_col)
        ).otherwise(F.array().cast("array<long>"))

    lb = F.floor(F.col(lo) / F.lit(bucket_width)).cast("long")
    hb = F.floor(F.col(hi) / F.lit(bucket_width)).cast("long")
    l = left.withColumn("__lb", lb).withColumn(
        _BUCKET, F.explode(_buckets(lb, hb))
    )
    r = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns]
    )
    rlb = F.floor(F.col(f"{lo}{suffix}") / F.lit(bucket_width)).cast("long")
    rhb = F.floor(F.col(f"{hi}{suffix}") / F.lit(bucket_width)).cast("long")
    r = r.withColumn("__rb", rlb).withColumn(_BUCKET, F.explode(_buckets(rlb, rhb)))
    joined = (
        l.join(r, on=_BUCKET)
        .filter(
            (F.col(lo) < F.col(f"{hi}{suffix}"))
            & (F.col(f"{lo}{suffix}") < F.col(hi))
            # first-shared-bucket guard: emit each pair exactly once
            & (F.col(_BUCKET) == F.greatest(F.col("__lb"), F.col("__rb")))
        )
        .drop(_BUCKET, "__lb", "__rb")
    )
    return joined
