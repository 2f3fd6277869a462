"""Config-driven data-quality validation engine.

Generalizes the reference's inline rule block
(``/root/reference/glue_jobs/01_silver_delta_upsert.py:48-78``) into a
declarative rule set with identical semantics:

- per column, an ordered chain of checks — the FIRST failing check
  contributes that column's message (``F.when(...).when(...)`` chain);
- all column messages fold into one ``Reject_reason`` via
  ``concat_ws(" | ", ...)`` — NULL contributions are skipped;
- all-clear rows get ``Reject_reason IS NULL`` (the reference's
  empty-string marker trick, quirk Q1 in SURVEY.md §2.10).

Everything compiles to built-in Column expressions (whole-stage
codegen) — zero UDFs, so validation runs at scan speed at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REJECT_COL = "Reject_reason"


@dataclass(frozen=True)
class Check:
    """One predicate in a column's chain: message applies when the
    condition holds."""

    condition: Column
    message: str


def not_null(col: str) -> Check:
    return Check(F.col(col).isNull(), f"{col} must not be NULL")


def numeric(col: str) -> Check:
    """rlike('^[0-9]+$') on the string cast — NOTE: negative integers
    fail this on purpose (reference quirk Q2, 01_silver_delta_upsert.py:53)."""
    return Check(~F.col(col).cast("string").rlike("^[0-9]+$"), f"{col} must be numeric")


def matches(col: str, pattern: str, message: str | None = None) -> Check:
    return Check(~F.col(col).rlike(pattern), message or f"invalid {col}")


def in_set(col: str, values: Sequence[str], message: str | None = None) -> Check:
    """Case-insensitive membership (upper + isin), as the reference
    validates call_status (01_silver_delta_upsert.py:73)."""
    return Check(
        ~F.upper(F.col(col)).isin([v.upper() for v in values]),
        message or f"invalid {col} values",
    )


@dataclass(frozen=True)
class ColumnRule:
    column: str
    checks: Sequence[Check] = field(default_factory=list)

    def expr(self) -> Column:
        """when(c1, m1).when(c2, m2)... — first failing check wins."""
        out: Column | None = None
        for check in self.checks:
            out = (
                F.when(check.condition, check.message)
                if out is None
                else out.when(check.condition, check.message)
            )
        if out is None:
            raise ValueError(f"rule for {self.column} has no checks")
        return out


def validate(df: DataFrame, rules: Sequence[ColumnRule]) -> DataFrame:
    """Append ``Reject_reason`` (NULL == valid)."""
    all_errors = F.concat_ws(" | ", *[r.expr() for r in rules])
    return df.withColumn(
        REJECT_COL, F.when(all_errors == "", None).otherwise(all_errors)
    )


def validate_observed(df: DataFrame, rules: Sequence["ColumnRule"]):
    """``validate`` plus a single-pass metrics side-channel: returns
    (validated_df, Observation). The Observation yields
    ``{n_rows, n_invalid}`` after the FIRST action on the returned
    DataFrame — pipeline observability with ZERO extra scans (the
    reference-style alternative is a second count() pass over Silver).

    At 100 TB a second metrics pass is a second 100 TB scan;
    ``df.observe`` folds the aggregates into the existing job."""
    from pyspark.sql import Observation

    validated = validate(df, rules)
    obs = Observation("validation")
    observed = validated.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(REJECT_COL).isNotNull().cast("long")).alias("n_invalid"),
    )
    return observed, obs


def expectation_report(
    df: DataFrame, expectations: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Delta-Live-Tables-style expectations: each (name, predicate that
    should HOLD) becomes one row of ``(expectation, violations, total)``
    — the per-rule quality dashboard a pipeline publishes per batch.

    Single aggregate pass: every expectation is a ``sum(when(~p, 1))``
    over the same scan (no per-rule scans, no explode); the unpivot to
    rows touches only the k-row aggregate result. NULL predicate
    results count as violations (a rule that cannot evaluate did not
    hold)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)).alias(
            f"__e{i}"
        )
        for i, (_, pred) in enumerate(expectations)
    ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("expectation"),
                        F.col(f"__e{i}").cast("long").alias("violations"),
                        F.col("__total").cast("long").alias("total"),
                    )
                    for i, (name, _) in enumerate(expectations)
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.expectation", "s.violations", "s.total")


def split_valid_invalid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One validated input, two complementary outputs
    (01_silver_delta_upsert.py:91-92)."""
    return (
        df.filter(F.col(REJECT_COL).isNull()),
        df.filter(F.col(REJECT_COL).isNotNull()),
    )


# The reference's exact rule set (01_silver_delta_upsert.py:46-74).
TIME_PATTERN = "^[0-9]{2}:[0-9]{2}:[0-9]{2}$"
VALID_STATUSES = ("COMPLETED", "DROPPED", "FAILED")


def callcenter_rules() -> list[ColumnRule]:
    return [
        ColumnRule("call_id", [not_null("call_id"), numeric("call_id")]),
        ColumnRule("caller_id", [not_null("caller_id"), numeric("caller_id")]),
        ColumnRule("agent_id", [not_null("agent_id"), numeric("agent_id")]),
        ColumnRule(
            "call_start_time",
            [not_null("call_start_time"), matches("call_start_time", TIME_PATTERN)],
        ),
        ColumnRule(
            "call_end_time",
            [not_null("call_end_time"), matches("call_end_time", TIME_PATTERN)],
        ),
        ColumnRule(
            "call_status",
            [not_null("call_status"), in_set("call_status", VALID_STATUSES)],
        ),
    ]
