"""Grid-bucketized spatial radius join.

The scale-shaped way to answer "which (left, right) point pairs lie
within distance R of each other" WITHOUT a cross join: snap both sides
to an R-sized square grid (`cell = (floor(x/R), floor(y/R))`), explode
ONE side into its 3x3 cell neighborhood, equi-join on the cell id, and
apply the exact distance predicate after the join. Any pair within R
is at most one cell apart on each axis, so it always meets in the
right side's home cell — and meets there EXACTLY ONCE, because only
the left side explodes (the right row keeps a single cell), so no
pair-dedup pass is needed.

Shuffle cost: 9x the left side + 1x the right side, both keyed on the
cell — never |L| x |R|. Per-cell density bounds the join fan-out, the
same argument as the interval bucketization in
``operators/rangejoin.py``. This is the standard distributed spatial
join (e.g. Sedona's partitioned KDB/grid join) expressed with plain
DataFrame ops.

Distances are PLANAR. For geographic coordinates at city scale,
project first (or use an equirectangular approximation column);
haversine trig is deliberately avoided on the oracle-checked path
because libm sin/cos are not bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CELL = "__cell"


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    x: str,
    y: str,
    radius: float,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with planar distance <= ``radius``.

    Both inputs need ``x`` and ``y`` double columns; right-side columns
    come back renamed with ``suffix``. Adds ``dist_sq`` (the exact
    squared distance — integer-free arithmetic only, so it diffs
    exactly across engines; take sqrt outside if needed).
    """
    r = right.select(*[F.col(c).alias(f"{c}{suffix}") for c in right.columns])
    rx, ry = F.col(f"{x}{suffix}"), F.col(f"{y}{suffix}")

    cx = F.floor(F.col(x) / F.lit(radius)).cast("long")
    cy = F.floor(F.col(y) / F.lit(radius)).cast("long")
    # 3x3 neighborhood of the left point's home cell, encoded as one
    # long so the join key is a single column (cells are |coord|/R
    # bounded; 2^20 per axis is plenty for any projected extent)
    neighbors = F.flatten(
        F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dx: F.transform(
                F.sequence(F.lit(-1), F.lit(1)),
                lambda dy: (cx + dx) * F.lit(1 << 20) + (cy + dy),
            ),
        )
    )
    l_exploded = left.withColumn(_CELL, F.explode(neighbors))
    r_celled = r.withColumn(
        _CELL,
        F.floor(rx / F.lit(radius)).cast("long") * F.lit(1 << 20)
        + F.floor(ry / F.lit(radius)).cast("long"),
    )

    dx = F.col(x) - rx
    dy = F.col(y) - ry
    return (
        l_exploded.join(r_celled, on=_CELL)
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= F.lit(radius) * F.lit(radius))
        .drop(_CELL)
    )
