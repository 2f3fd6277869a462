"""Skew-resilient aggregation: explicit two-phase salted groupBy.

AQE's skew-join splitting handles JOIN skew; aggregation skew on a hot
key still funnels every row of that key through one reduce task. The
classic fix decomposes an associative aggregate into
``groupBy(key, salt)`` (spreads the hot key over N tasks, map-side
partial agg) then ``groupBy(key)`` to combine. Results are identical
for associative/commutative aggregates (count/sum/min/max).

At 100 TB with a zipfian key this is the difference between one straggler
task owning 30% of the data and N tasks owning 30%/N each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_alias: str | None = "n_rows",
    num_salts: int = 16,
) -> DataFrame:
    """count(*) + sum(col) per key, computed skew-safely.

    Salt is derived from a stable hash of the whole row's sum columns
    via ``monotonically_increasing_id`` modulo — any even spread works;
    it never changes results, only task balance."""
    keys = list(keys)
    salted = df.withColumn(
        _SALT, (F.monotonically_increasing_id() % num_salts).cast("int")
    )
    partial_aggs = [F.count("*").alias("__pc")] + [
        F.sum(c).alias(f"__ps_{c}") for c in sums
    ]
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    final_aggs = []
    if count_alias:
        final_aggs.append(F.sum("__pc").alias(count_alias))
    final_aggs += [F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in sums]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-resilient equi-join: the (large, skewed) left side gets a
    random salt appended to the key; the (smaller) right side is
    replicated once per salt value. The join key becomes (key, salt), so
    a hot key spreads across ``num_salts`` tasks. Same results as the
    plain join; right side grows x num_salts (keep it the smaller one).
    AQE's skew-join split does this adaptively for sort-merge joins —
    this explicit form also covers aggregation-feeding joins AQE can't
    split.

    ``how`` is limited to inner/left/left_semi/left_anti: the right side
    is replicated ``num_salts`` times, so right/full outer would emit
    each unmatched right row once per salt replica."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti only (got {how!r}): "
            "the right side is replicated num_salts times, so right/full "
            "outer joins would duplicate unmatched right rows"
        )
    on = list(on)
    l = left.withColumn(
        _SALT, (F.monotonically_increasing_id() % num_salts).cast("int")
    )
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return l.join(r, on=on + [_SALT], how=how).drop(_SALT)
