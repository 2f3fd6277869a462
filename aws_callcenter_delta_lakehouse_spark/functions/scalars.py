"""Scalar helpers shared by operators and query plans."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_portable(col: Column, digits: int) -> Column:
    """Engine-portable rounding: ``floor(x * 10^d + 0.5) / 10^d``.

    ``F.round`` rounds the shortest decimal representation (HALF_UP via
    BigDecimal) while DuckDB/C round the binary value — they disagree on
    values like 0.96125 whose nearest double sits just below the
    boundary. The floor formulation is pure IEEE arithmetic, so any
    engine computing the same input double produces the same output.
    Matching oracle SQL: ``floor(x * 1eD + 0.5) / 1eD``.
    """
    scale = F.lit(float(10**digits))
    return F.floor(col * scale + F.lit(0.5)) / scale
