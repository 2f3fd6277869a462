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

from pyspark.sql import Column, DataFrame
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


# -- geohash ------------------------------------------------------------------

#: Standard geohash base-32 alphabet (Niemeyer 2008; public spec).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_bits(precision: int) -> tuple[int, int, int]:
    total = 5 * precision
    return total, (total + 1) // 2, total // 2  # total, lon, lat


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Geohash cell id of a WGS-84 point as the standard base-32 string.

    Pure integer/bit algebra after one quantization division per axis —
    no trig, no UDF, engine-portable (``geohash_oracle_sql`` emits the
    mirror-image DuckDB SQL): quantize each axis to its bit budget
    (longitude gets the extra bit at odd precisions, per the spec's
    lon-first interleave), Morton-interleave with longitude in the
    leading position, then map each 5-bit group through the alphabet.
    The whole thing is one codegen-friendly expression tree — at 100 TB
    this is a per-row map, no shuffle; cell-keyed joins/aggregations
    after it shuffle on a short string key with spatial locality.
    """
    if precision < 1 or precision > 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    total, lon_bits, lat_bits = _gh_bits(precision)
    latq = F.least(
        F.greatest(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                    * F.lit(float(1 << lat_bits))).cast("bigint"),
            F.lit(0),
        ),
        F.lit((1 << lat_bits) - 1),
    )
    lonq = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                    * F.lit(float(1 << lon_bits))).cast("bigint"),
            F.lit(0),
        ),
        F.lit((1 << lon_bits) - 1),
    )
    morton = None
    for j in range(lon_bits):
        term = F.shiftright(lonq, lon_bits - 1 - j).bitwiseAND(
            F.lit(1)
        ) * F.lit(1 << (total - 1 - 2 * j))
        morton = term if morton is None else morton + term
    for j in range(lat_bits):
        term = F.shiftright(latq, lat_bits - 1 - j).bitwiseAND(
            F.lit(1)
        ) * F.lit(1 << (total - 2 - 2 * j))
        morton = morton + term
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(morton, 5 * (precision - 1 - k)).bitwiseAND(
                    F.lit(31)
                )
            ).cast("int")
            + F.lit(1),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_oracle_sql(lat_expr: str, lon_expr: str, precision: int = 6) -> str:
    """ANSI-SQL scalar expression computing the SAME geohash as
    :func:`geohash` — generated from the same bit layout so the two
    can never drift. Inline-expanded (no CTE), so callers can drop it
    into any SELECT list."""
    total, lon_bits, lat_bits = _gh_bits(precision)
    latq = (
        f"LEAST(GREATEST(CAST(floor((({lat_expr}) + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    lonq = (
        f"LEAST(GREATEST(CAST(floor((({lon_expr}) + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    terms = [
        f"(({lonq} >> {lon_bits - 1 - j}) & 1) * {1 << (total - 1 - 2 * j)}"
        for j in range(lon_bits)
    ] + [
        f"(({latq} >> {lat_bits - 1 - j}) & 1) * {1 << (total - 2 - 2 * j)}"
        for j in range(lat_bits)
    ]
    morton = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(({morton} >> {5 * (precision - 1 - k)}) & 31 AS INTEGER) + 1, 1)"
        for k in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def geohash_oracle_parts(precision: int = 6) -> dict[str, str]:
    """CTE-staged pieces of the DuckDB mirror (keeps generated oracle
    SQL small when the hash is used more than once): ``latq``/``lonq``
    are ``str.format`` templates taking the axis SQL expression;
    ``morton`` references columns named latq/lonq; ``chars`` references
    a column named mz. Same bit layout as :func:`geohash`."""
    total, lon_bits, lat_bits = _gh_bits(precision)
    latq = (
        "LEAST(GREATEST(CAST(floor((({expr}) + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    lonq = (
        "LEAST(GREATEST(CAST(floor((({expr}) + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    terms = [
        f"((lonq >> {lon_bits - 1 - j}) & 1) * {1 << (total - 1 - 2 * j)}"
        for j in range(lon_bits)
    ] + [
        f"((latq >> {lat_bits - 1 - j}) & 1) * {1 << (total - 2 - 2 * j)}"
        for j in range(lat_bits)
    ]
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((mz >> {5 * (precision - 1 - k)}) & 31 AS INTEGER) + 1, 1)"
        for k in range(precision)
    ]
    return {
        "latq": latq,
        "lonq": lonq,
        "morton": "(" + " + ".join(terms) + ")",
        "chars": "(" + " || ".join(chars) + ")",
    }
