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


@query("bpe_tokenize_top_tokens")  # rows-only; Python parity in tests
def bpe_tokenize_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 5 BPE merges, tokenize the corpus with them (greedy
    left-to-right, merge order preserved via per-round 1-row broadcast
    joins — the merge table never touches the driver), and return the
    top-20 tokens of the resulting vocabulary distribution."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", rounds=5)
    toks = bpe_apply(docs, "text", merges, rounds=5)
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
