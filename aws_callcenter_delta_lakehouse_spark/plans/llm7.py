"""Seventh batch: tokenizer training and entity resolution.

- bpe_merges — distributed BPE merge training over the documents corpus
  (rows-only: the iterative argmax has no tractable SQL oracle; exact
  parity vs a pure-Python reference BPE is pinned in tests/test_bpe.py),
- linkage_customer_supplier — blocked Fellegi–Sunter-style record
  linkage (nation block, name-edit-distance + balance-closeness score),
  oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..operators.bpe import bpe_apply, bpe_train
from ..operators.linkage import linkage_topk
from .registry import query


@query("bpe_merges")  # iterative argmax — rows-only; Python parity in tests
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 5 BPE merges learned from the documents corpus: the
    corpus collapses to its distinct-word frequency table once, then
    each round is a pair-count aggregate + a merge projection over that
    table only."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    return bpe_train(docs, "text", rounds=5)


# Fixed merge table for the TOKENIZATION query — the production shape:
# a tokenizer ships as constants (vocab + merges); training is a
# separate, rarer job (bpe_merges above). The SAME tuple generates both
# the Spark merge DataFrame and the DuckDB oracle below (the
# hyperplane-LSH embedded-constants pattern), so the query became
# oracle-checkable in r6. Round 5 merges a round-1 product ("er"+"s"),
# exercising compound-symbol semantics.
_BPE_FIXED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("i", "n"),
    ("s", "t"),
    ("o", "w"),
    ("er", "s"),
)


def _bpe_tokenize_oracle() -> str:
    """DuckDB mirror of char-split + greedy left-to-right merge rounds.

    Each round is one chained CTE (trap 12: multi-field fold state must
    not go through list_reduce) whose accumulator is a SCALAR varchar:
    the emitted symbols joined by chr(2), with a trailing chr(1)
    sentinel playing the engine's ``skip`` flag — when position i
    merges (a, b), the sentinel makes position i+1 emit nothing and
    clear. An out-of-bounds list index is NULL in DuckDB exactly like
    ``try_element_at``, so the last position needs no guard. Safe
    because the corpus is printable ASCII (32..121 — checked), so
    chr(1)/chr(2) cannot occur in a symbol."""
    steps = []
    prev = "s0"
    for r, (a, b) in enumerate(_BPE_FIXED_MERGES, start=1):
        steps.append(
            f"""
    s{r} AS MATERIALIZED (
        SELECT string_split(substr(list_reduce(
            list_prepend('', list_transform(range(1, len(syms) + 1),
                                            i -> CAST(i AS VARCHAR))),
            (acc, ix) -> CASE
                WHEN right(acc, 1) = chr(1)
                    THEN substr(acc, 1, length(acc) - 1)
                WHEN syms[CAST(ix AS INT)] = '{a}'
                     AND syms[CAST(ix AS INT) + 1] = '{b}'
                    THEN acc || chr(2) || '{a + b}' || chr(1)
                ELSE acc || chr(2) || syms[CAST(ix AS INT)]
            END), 2), chr(2)) AS syms, freq
        FROM {prev})"""
        )
        prev = f"s{r}"
    return f"""
    WITH w AS MATERIALIZED (
        SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w
    ),
    s0 AS MATERIALIZED (
        SELECT list_transform(range(1, length(w) + 1),
                              i -> substr(w, CAST(i AS INT), 1)) AS syms,
               freq
        FROM w
    ),{",".join(steps)}
    SELECT token, CAST(SUM(freq) AS BIGINT) AS "count"
    FROM (SELECT unnest(syms) AS token, freq FROM {prev})
    GROUP BY token
    ORDER BY "count" DESC, token ASC
    LIMIT 20
    """


@query("bpe_tokenize_top_tokens", oracle=_bpe_tokenize_oracle())
def bpe_tokenize_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the FIXED 5-merge BPE table
    ``_BPE_FIXED_MERGES`` (greedy left-to-right, merge order preserved
    via per-round 1-row broadcast joins — the merge table never touches
    the driver as a collection) and return the top-20 tokens of the
    resulting vocabulary distribution (count DESC, token ASC).

    ORACLE-CHECKED since r6 (was rows-only): tokenization with a fixed
    merge table is pure deterministic string algebra — only TRAINING
    (``bpe_merges``) has the iterative argmax that resists SQL. The
    merge constants are embedded in both the plan and the oracle from
    the same tuple."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    merges = spark.createDataFrame(
        [(r, a, b) for r, (a, b) in enumerate(_BPE_FIXED_MERGES, start=1)],
        "round int, pair_a string, pair_b string",
    )
    toks = bpe_apply(docs, "text", merges, rounds=len(_BPE_FIXED_MERGES))
    return toks.orderBy(F.desc("count"), F.asc("token")).limit(20)


@query(
    "linkage_customer_supplier",
    oracle="""
    WITH cand AS (
      SELECT c_custkey, s_suppkey,
             floor((0.6 * (1.0 - levenshtein(substr(c_name, 10),
                                             substr(s_name, 10)) / 9.0)
                    + 0.4 * exp(-abs(c_acctbal - s_acctbal) / 1000.0))
                   * 1e4 + 0.5) / 1e4 AS match_score
      FROM customer JOIN supplier ON c_nationkey = s_nationkey)
    SELECT c_custkey, s_suppkey, match_score,
           CAST(row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY match_score DESC, s_suppkey)
                AS INT) AS rank
    FROM cand
    QUALIFY rank <= 3
    """,
)
def linkage_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 supplier matches per customer: blocked on nation (the
    candidate space is Σ per-nation |C|×|S|, never |C|×|S| global),
    scored 0.6·name-digit-agreement + 0.4·exp-decayed balance gap.
    Score rounded BEFORE ranking; ties on s_suppkey — deterministic
    k-th row on both engines."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nk"),
        F.substring("c_name", 10, 20).alias("c_digits"),
        F.col("c_acctbal").cast("double").alias("c_bal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("nk"),
        F.substring("s_name", 10, 20).alias("s_digits"),
        F.col("s_acctbal").cast("double").alias("s_bal"),
    )
    score = 0.6 * (
        1.0 - F.levenshtein("c_digits", "s_digits") / F.lit(9.0)
    ) + 0.4 * F.exp(-F.abs(F.col("c_bal") - F.col("s_bal")) / F.lit(1000.0))
    return linkage_topk(
        c, s, "nk", score, "c_custkey", "s_suppkey", k=3
    )
