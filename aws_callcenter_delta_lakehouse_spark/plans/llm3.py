"""Third LLM-pipeline batch: benchmark decontamination and the
filter->dedup->shard curation/export pipeline. Both oracle-checked —
the shard hash is an md5 prefix both engines compute identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..operators.curation import (
    curate,
    curation_summary,
    decontaminate,
    pack_sequences,
)
from ..operators.similarity import quantized_topk
from .registry import query


@query(
    "decontaminate_benchmark_overlap",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= 5
                   THEN list_transform(range(1, len(w) - 3),
                        i -> array_to_string(w[i:i+4], ' '))
                   ELSE [] END) AS gs
          FROM words),
    bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 20 = 0),
    train AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 20 <> 0)
    SELECT t.doc_id, CAST(COUNT(*) AS INT) AS n_overlap_grams
    FROM train t JOIN bench USING (gram)
    GROUP BY t.doc_id
    """,
)
def decontaminate_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training decontamination: flag corpus documents sharing any
    5-gram with a held-out benchmark set (here: every 20th doc stands in
    for the eval suite). The benchmark gram set is distinct'd and
    broadcast — the only shuffle is the per-doc overlap count."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(train, bench, "doc_id", "text", n=5)


@query(
    "curation_pipeline",
    oracle="""
    WITH filt AS (
      SELECT doc_id, text, len(text) AS n_chars
      FROM documents
      WHERE lang = 'en'
        AND len(string_split(text, ' ')) >= 30
        AND len(text) BETWEEN 100 AND 20000),
    dedup AS (
      SELECT md5(text) AS h, MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars
      FROM filt GROUP BY md5(text)),
    sharded AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 16 AS INT) AS shard,
             n_chars
      FROM dedup)
    SELECT shard, CAST(COUNT(*) AS INT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(doc_id) AS min_doc_id
    FROM sharded GROUP BY shard
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training export: language + length filters (pushed to
    the scan), exact dedup on md5(text) keeping the lowest doc_id (the
    shuffle carries 32-char hashes, never document text), deterministic
    md5-prefix shard assignment, per-shard manifest."""
    docs = load_table(spark, sf_dir, "documents")
    return curation_summary(curate(docs, "doc_id", "text"))


@query(
    "pack_training_batches",
    oracle="""
    WITH n AS (SELECT source, doc_id,
                      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
               FROM documents),
    packed AS (SELECT source, doc_id, n_tokens,
                      CAST(floor(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        / 512.0) AS INT) AS batch_id
               FROM n)
    SELECT source, batch_id, CAST(COUNT(*) AS INT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens, MIN(doc_id) AS first_doc_id
    FROM packed GROUP BY source, batch_id
    """,
)
def pack_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget batch packing (concat-and-split layout): one
    window per source partition assigns each doc a batch, then a batch
    manifest aggregate. No global ordering — parallel across sources."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "text", "source", token_budget=512)
    return packed.groupBy("source", "batch_id").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("batch_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


@query(
    "similarity_quantized_int8",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                                         y -> abs(CAST(y AS DOUBLE)))) / 127.0
                   AS scale
          FROM embeddings),
    z AS (SELECT vec_id,
                 CASE WHEN scale > 0
                      THEN list_transform(embedding,
                             x -> floor(CAST(x AS DOUBLE) / scale + 0.5))
                      ELSE list_transform(embedding, x -> CAST(0 AS DOUBLE))
                 END AS qvec
          FROM s)
    SELECT z.vec_id,
           floor(
             list_sum(list_transform(range(1, 65),
                        i -> z.qvec[i] * CAST(q.qv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> z.qvec[i] * z.qvec[i])))
              * sqrt(list_sum(list_transform(range(1, 65),
                        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
             * 10000 + 0.5) / 10000 AS sim
    FROM z, q
    ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def similarity_quantized_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 to vec_id=0 over int8-quantized vectors — the
    4x-smaller memory-bandwidth path. Recall vs the exact float path is
    pinned in tests (cosine is scale-invariant so no dequantization).
    The affine quantization itself is exact integer math (floor of a
    double division), so the whole query is oracle-checkable — the
    DuckDB side replays quantize-then-cosine verbatim."""
    emb = load_table_parallel(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    corpus = emb.join(F.broadcast(qvec))
    return quantized_topk(corpus, F.col("q"), k=10)


@query(
    "dedup_levenshtein_blocked",
    oracle="""
    WITH d AS (SELECT doc_id, lang, substr(text, 1, 80) AS prefix,
                      substr(text, 1, 4) AS head,
                      CAST(floor(len(text) / 100) AS INT) AS len_bucket
               FROM documents)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(levenshtein(a.prefix, b.prefix) AS INT) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.head = b.head AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 20
    """,
)
def dedup_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup by edit distance on 80-char prefixes, BLOCKED on
    (lang, length-bucket, 4-char head) so the quadratic comparison runs
    only within blocks — the classic blocking-key pattern (levenshtein
    is O(n*m) per pair; never run it all-pairs). The head block alone
    cuts candidate pairs ~30x at sf0.1 with zero lost matches; pair
    work is sum over blocks of block-size², bounded by the blocking
    key's selectivity."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 80).alias("prefix"),
        F.substring("text", 1, 4).alias("head"),
        F.floor(F.length("text") / 100).cast("int").alias("len_bucket"),
    )
    a = d.select(
        F.col("doc_id").alias("d1"),
        "lang",
        "len_bucket",
        "head",
        F.col("prefix").alias("p1"),
    )
    b = d.select(
        F.col("doc_id").alias("d2"),
        "lang",
        "len_bucket",
        "head",
        F.col("prefix").alias("p2"),
    )
    return (
        a.join(b, on=["lang", "len_bucket", "head"])
        # cheap pruning BEFORE the O(n*m) comparison: levenshtein >=
        # |len(p1) - len(p2)|, so the length bound discards pairs free
        .filter(
            (F.col("d1") < F.col("d2"))
            & (F.abs(F.length("p1") - F.length("p2")) <= 20)
        )
        .select(
            "d1",
            "d2",
            # bounded levenshtein (Spark 3.5+): early-terminates past
            # the threshold — O(threshold*len) per pair, not O(len^2);
            # returns -1 above threshold
            F.levenshtein("p1", "p2", 20).alias("edit_dist"),
        )
        .filter(F.col("edit_dist").between(0, 20))
    )


@query(
    "udtf_word_split",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(w, 1) - 1 AS INTEGER) AS word_idx,
           unnest(w) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 10)
    """,
)
def udtf_word_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): per-row word explosion as
    a lateral join. The PYTHON-TIER escape hatch for one-row-to-many
    transforms the built-ins can't express — deliberately oracle-checked
    against the same semantics as the built-in posexplode formulation
    (`posexplode_words`), which remains the production path. The UDTF
    class is defined inline so cloudpickle ships it by value."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_idx int, word string")
    class _WordSplit:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield (i, w)

    spark.udtf.register("word_split", _WordSplit)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.word_idx, s.word
        FROM __udtf_docs d, LATERAL word_split(d.text) s
        """
    )


@query(
    "multimodal_audio_windows",
    # The stand-in decode treats each UTF-8 payload byte as one int8
    # PCM sample; the corpus is pure ASCII, so DuckDB can replay the
    # framing with code points. RMS is sqrt(integer_ssq / n) — one
    # correctly-rounded division + sqrt, bit-equal across engines.
    oracle="""
    WITH d AS (SELECT doc_id, text, len(text) AS n
               FROM documents WHERE doc_id < 50),
    s AS (SELECT doc_id, n,
                 list_transform(range(1, n + 1),
                                i -> CAST(unicode(text[i]) AS BIGINT)) AS pcm
          FROM d),
    w AS (SELECT doc_id, n, pcm,
                 unnest(range(0, greatest(n - 400 + 1, 1), 160)) AS start
          FROM s),
    f AS (SELECT doc_id,
                 CAST(start // 160 AS INT) AS window_idx,
                 start * 1000.0 / 16000 AS start_ms,
                 (start + least(400, n - start)) * 1000.0 / 16000 AS end_ms,
                 CAST(least(400, n - start) AS INT) AS n_samples,
                 list_sum(list_transform(
                     range(start + 1, start + least(400, n - start) + 1),
                     i -> pcm[i] * pcm[i])) AS ssq
          FROM w)
    SELECT doc_id, window_idx, start_ms, end_ms, n_samples,
           CASE WHEN n_samples > 0
                THEN sqrt(CAST(ssq AS DOUBLE) / n_samples)
                ELSE 0.0 END AS rms
    FROM f
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing (25ms window / 10ms hop at 16kHz) over opaque
    payloads via Arrow-batched mapInPandas — window timestamps + RMS
    per frame, payloads never shuffled. Decode is the declared
    deterministic stand-in (no audio codec in this container)."""
    from ..operators.multimodal import attach_binary_payload, audio_windows

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return audio_windows(attach_binary_payload(docs, "doc_id", "text"))


@query(
    "stats_battery",
    oracle="""
    SELECT l_returnflag,
           floor(stddev_samp(l_quantity) * 1e4 + 0.5) / 1e4 AS sd_qty,
           floor(var_pop(l_quantity) * 1e4 + 0.5) / 1e4 AS var_qty,
           floor(corr(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS corr_qp,
           floor(covar_pop(l_quantity, l_extendedprice) * 1e2 + 0.5) / 1e2
             AS covar_qp,
           floor(regr_slope(l_extendedprice, l_quantity) * 1e4 + 0.5) / 1e4
             AS slope_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery: stddev/variance/correlation/
    covariance/regression slope per return flag — all single-pass
    mergeable aggregates (one shuffle, map-side partials), all
    engine-portable to 4 decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        round_portable(F.stddev_samp(q), 4).alias("sd_qty"),
        round_portable(F.var_pop(q), 4).alias("var_qty"),
        round_portable(F.corr(q, p), 4).alias("corr_qp"),
        round_portable(F.covar_pop(q, p), 2).alias("covar_qp"),
        round_portable(F.regr_slope(p, q), 4).alias("slope_pq"),
    )


@query(
    "length_decile_buckets",
    oracle="""
    WITH n AS (SELECT source, doc_id,
                      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
               FROM documents)
    SELECT source, doc_id, n_tokens,
           CAST(ntile(10) OVER (PARTITION BY source
                                ORDER BY n_tokens, doc_id) AS INT) AS bucket
    FROM n
    """,
)
def length_decile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-decile bucketing per source (padding-efficient batch
    grouping): deterministic ntile with a full tie-break, one window
    shuffle on the group key — never a global sort."""
    from ..operators.curation import length_buckets

    docs = load_table(spark, sf_dir, "documents")
    return length_buckets(docs, "doc_id", "text", "source")


@query("text_compression_ratio")  # zlib (no SQL equivalent) — rows-only
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per doc (repetitive/templated text
    compresses far below prose — the RefinedWeb-style signal).
    Python-tier mapInPandas with stdlib zlib; known-value behavior
    pinned in unit tests."""
    from ..operators.curation import compression_ratio

    docs = load_table_parallel(spark, sf_dir, "documents")
    return compression_ratio(docs, "doc_id", "text").select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        round_portable(F.col("ratio"), 4).alias("ratio"),
    )


def _pagerank_oracle_sql(iterations: int) -> str:
    """Unrolled power iteration as chained CTEs, mirroring the engine's
    float arithmetic EXACTLY per round (same association order:
    ``(1.0 - 0.85) + 0.85 * m / n`` then ``base + 0.85 * in_share`` —
    a literal 0.15 would already diverge from Python's 1.0-0.85).
    Dangling mass and per-sink contribution sums are FP-order-dependent
    in the last ulp; the 1e-4 rounding both sides apply absorbs that.
    AS MATERIALIZED is load-bearing: each round references the previous
    rank CTE 2x and inlining would re-evaluate the chain 2^rounds
    times."""
    head = """
    e AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS s, l.l_suppkey + 10000000 AS d
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    v AS (SELECT s AS v FROM e UNION SELECT d FROM e),
    nn AS (SELECT COUNT(*) AS n FROM v),
    od AS MATERIALIZED (SELECT s, COUNT(*) AS od FROM e GROUP BY s),
    r0 AS MATERIALIZED (SELECT v.v, 1.0 AS rank FROM v)"""
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(
            f"""
    m{i} AS (
        SELECT COALESCE(SUM(r.rank), 0.0) AS m
        FROM r{i - 1} r LEFT JOIN od ON r.v = od.s
        WHERE od.s IS NULL
    ),
    inb{i} AS (
        SELECT e.d AS v, SUM(r.rank / od.od) AS in_share
        FROM e JOIN r{i - 1} r ON e.s = r.v JOIN od ON od.s = e.s
        GROUP BY e.d
    ),
    r{i} AS MATERIALIZED (
        SELECT v.v,
               ((1.0 - 0.85) + 0.85 * (SELECT m FROM m{i})
                                     / (SELECT n FROM nn))
               + 0.85 * COALESCE(inb.in_share, 0.0) AS rank
        FROM v LEFT JOIN inb{i} inb ON v.v = inb.v
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT v - 10000000 AS suppkey,
           floor(rank * 1e4 + 0.5) / 1e4 AS rank
    FROM r{iterations} WHERE v >= 10000000
    ORDER BY floor(rank * 1e4 + 0.5) / 1e4 DESC, suppkey ASC LIMIT 20"""
    )


@query("pagerank_suppliers", oracle=_pagerank_oracle_sql(iterations=5))
def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier purchase graph (edges from
    orders x lineitem): authority scoring as an iterative DataFrame
    power-iteration — 2 vertex-keyed shuffles per round, scalars only to
    the driver, lineage checkpoint-truncated per round. Invariants
    (sum = N, uniform cycle, star center) pinned in unit tests.

    ORACLE-CHECKED now (was rows-only through r4): 5 unrolled DuckDB
    CTE rounds replicate the power iteration with matched FP
    association order; 1e-4 rounding on both sides absorbs last-ulp
    sum-order noise."""
    from ..operators.components import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_custkey").alias("src"),
        # supplier vertices offset so customer/supplier key spaces
        # cannot collide in one vertex id space
        (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
    )
    pr = pagerank(edges, iterations=5)
    return (
        pr.filter(F.col("v") >= 10_000_000)
        .select(
            (F.col("v") - 10_000_000).alias("suppkey"),
            round_portable(F.col("rank"), 4).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("suppkey"))
        .limit(20)
    )


@query("events_approx_percentiles")  # sketch-based — rows-only
def events_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles of event value per
    type — the sketch path for 100 TB (exact percentiles need a full
    sort; the sketch is one mergeable aggregate). Accuracy vs the exact
    quantiles is pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)), 10000
    )
    return (
        ev.groupBy("event_type")
        .agg(pcts.alias("p"))
        .select(
            "event_type",
            round_portable(F.col("p")[0], 4).alias("p25"),
            round_portable(F.col("p")[1], 4).alias("p50"),
            round_portable(F.col("p")[2], 4).alias("p75"),
            round_portable(F.col("p")[3], 4).alias("p95"),
        )
    )


@query(
    "pandas_udaf_geomean",
    oracle="""
    SELECT lang,
           floor(exp(AVG(ln(n_chars))) * 1e4 + 0.5) / 1e4 AS geo_mean_chars
    FROM documents WHERE n_chars > 0
    GROUP BY lang
    """,
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (the UDAF tier: one scalar per
    group, Arrow-batched): geometric mean of document length per
    language. Deliberately oracle-checked against the exp(avg(ln))
    built-in identity — the UDAF tier exists for aggregations built-ins
    can't express; this one can, so it doubles as a parity check."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.astype("float64")).mean()))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return docs.groupBy("lang").agg(
        round_portable(geo_mean("n_chars"), 4).alias("geo_mean_chars")
    )


@query(
    "arrow_batch_bytelen",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_utf8_bytes
    FROM documents
    """,
)
def arrow_batch_bytelen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (zero-copy Arrow RecordBatch tier — below mapInPandas,
    no pandas conversion): UTF-8 byte length per doc via
    pyarrow.compute. Oracle-checked against the built-in
    octet_length-equivalent semantics; the Arrow tier exists for
    batch-level ops where even pandas materialization is waste."""

    def _bytelen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = pc.cast(
                pc.binary_length(pc.cast(batch.column("text"), pa.binary())),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n], names=["doc_id", "n_utf8_bytes"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_bytelen, schema="doc_id long, n_utf8_bytes long")
