"""Fourth LLM-pipeline batch: corpus-level token statistics and
source-cap curation, plus event cohort analytics.

- text_top_bigrams — exact corpus-wide frequent n-grams (the phrase
  inventory a tokenizer/quality pass reads),
- text_vocab_coverage — Zipf head with cumulative token coverage,
- curation_source_cap — C4/RefinedWeb-style per-domain document cap,
- curation_train_split — deterministic content-hash train/val/test split,
- text_unigram_logprob — unigram-LM mean log-prob (CCNet filter signal),
- events_retention_cohorts — first-seen cohort x day-offset retention,
- curation_mixture_sample — deterministic source-mixing weights,
- dedup_semantic — SemDeDup-style cluster-blocked cosine dedup.

All oracle-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..operators.curation import per_source_cap, top_ngrams, vocab_coverage
from .registry import query


@query(
    "text_top_bigrams",
    oracle="""
    WITH b AS (
      SELECT unnest(list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i + 1])) AS ngram
      FROM (SELECT string_split(text, ' ') AS l FROM documents))
    SELECT ngram, COUNT(*) AS cnt
    FROM b GROUP BY ngram
    ORDER BY cnt DESC, ngram LIMIT 50
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams across the corpus, exact counts. Map-side
    partial aggregation collapses hot grams before the shuffle; top-k
    plans as TakeOrderedAndProject."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    return top_ngrams(docs, "text", n=2, k=50)


@query(
    "text_vocab_coverage",
    oracle="""
    WITH counts AS (
      SELECT w AS word, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    total AS (SELECT SUM(cnt) AS t FROM counts),
    head AS (SELECT word, cnt FROM counts ORDER BY cnt DESC, word LIMIT 100)
    SELECT word, cnt,
           floor((SUM(cnt) OVER (ORDER BY cnt DESC, word
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) * 1.0 / t) * 1e6 + 0.5)
             / 1e6 AS cum_frac
    FROM head, total
    ORDER BY cnt DESC, word
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency head with cumulative corpus coverage (the Zipf
    curve tokenizer training reads). The cumulative window runs over
    the top-k head only — never a global single-partition window."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", k=100)


@query(
    "curation_source_cap",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents)
    WHERE rn <= 50
    ORDER BY source, n_chars DESC, doc_id
    """,
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (keep the 50 longest per source) — the
    domain-balancing pass that stops one hot domain from dominating the
    training mix. One shuffle on the source key."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return per_source_cap(docs, "doc_id", "source", "n_chars", k=50).orderBy(
        "source", F.desc("n_chars"), "doc_id"
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id),
    acts AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT cohort_date, (d - cohort_date) AS day_offset,
           COUNT(*) AS active_users
    FROM firsts JOIN acts USING (user_id)
    GROUP BY cohort_date, day_offset
    ORDER BY cohort_date, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date, counted at
    each day offset they return. Both the cohort aggregate and the
    distinct-activity set shuffle on user_id, so the join between them
    is co-partitioned — one exchange per side, reused by the join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    acts = ev.distinct()
    return (
        firsts.join(acts, "user_id")
        .groupBy("cohort_date", F.datediff("d", "cohort_date").alias("day_offset"))
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_date", "day_offset")
    )


@query(
    "curation_train_split",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100
                  AS INT) AS b
      FROM documents)
    SELECT CASE WHEN b < 96 THEN 'train'
                WHEN b < 98 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM s GROUP BY 1 ORDER BY split
    """,
)
def curation_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 96/2/2 content-hash train/val/test split with
    per-split stats. The assignment is a pure projection (no shuffle,
    no sampling state) and content-keyed, so exact duplicates can never
    straddle train and eval."""
    from ..operators.curation import assign_split

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    return (
        assign_split(docs, "text")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("split")
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    c AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    t AS (SELECT SUM(c) AS t FROM c),
    lm AS (SELECT word, ln(c * 1.0 / t) AS logp FROM c, t)
    SELECT doc_id, COUNT(*) AS n_tokens,
           floor(AVG(logp) * 1e4 + 0.5) / 1e4 AS avg_logprob
    FROM w JOIN lm USING (word)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM mean token log-probability per document (the CCNet
    perplexity-filter signal, with the LM trained on the corpus
    itself). Model lookup is a word-keyed shuffle join — vocabulary is
    never a driver-side dictionary."""
    from ..operators.text import unigram_logprob

    docs = load_table_parallel(spark, sf_dir, "documents")
    scored = unigram_logprob(docs, "doc_id", "text")
    return scored.select(
        "doc_id",
        "n_tokens",
        round_portable(F.col("avg_logprob"), 4).alias("avg_logprob"),
    ).orderBy("doc_id")


@query(
    "curation_mixture_sample",
    oracle="""
    WITH s AS (
      SELECT source, n_chars,
             CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10000 AS b
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s
    WHERE b < (CASE source WHEN 'src0' THEN 0.25
                           WHEN 'src1' THEN 0.5
                           ELSE 1.0 END) * 10000
    GROUP BY source ORDER BY source
    """,
)
def curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixing: downsample src0 to 25% and src1 to
    50% by content-hash bucket (projection-only, reproducible on any
    cluster layout); per-source counts of the kept mix."""
    from ..operators.curation import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(docs, "text", "source", {"src0": 0.25, "src1": 0.5})
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "dedup_semantic",
    oracle="""
    WITH cents AS MATERIALIZED (
        SELECT vec_id AS cid, embedding AS cv,
               sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE)))) AS nrm
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cid,
               -(list_sum(list_transform(range(1, 65),
                  i -> CAST(e.embedding[i] AS DOUBLE)
                       * (CAST(c.cv[i] AS DOUBLE) / c.nrm)))) AS negsim
        FROM embeddings e, cents c
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, embedding, cid AS centroid_id FROM (
            SELECT vec_id, embedding, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY negsim ASC, cid ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    losers AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.embedding, b.embedding)
                    * 1e4 + 0.5) / 1e4 >= 0.98
    )
    SELECT centroid_id, COUNT(*) AS n_survivors, MIN(vec_id) AS min_vec_id
    FROM assign WHERE vec_id NOT IN (SELECT vec_id FROM losers)
    GROUP BY centroid_id ORDER BY centroid_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table:
    zero-shuffle IVF cluster assignment, exact within-cluster cosine
    pairs (work bounded by sum(cluster²)), greedy min-id survivors.
    Behavior pinned by unit tests on constructed duplicates.

    ORACLE-CHECKED now (was rows-only through r4): the IVF seeding is
    the 16 lowest-id vectors with NO Lloyd iterations, so the whole
    pipeline is deterministic algebra — the oracle mirrors the engine's
    exact FP association (centroids normalized per element FIRST, then
    the dot; negsim ASC + centroid_id ASC tie-break) and the rounded
    within-cluster cosine threshold."""
    from ..catalog import load_table_parallel
    from ..operators.similarity import semantic_dedup

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    survivors = semantic_dedup(emb, threshold=0.98)
    return survivors.groupBy("centroid_id").agg(
        F.count("*").alias("n_survivors"), F.min("vec_id").alias("min_vec_id")
    ).orderBy("centroid_id")


@query(
    "embedding_standardize",
    oracle="""
    WITH ex AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings),
    stats AS (
      SELECT pos, AVG(val) AS mu, stddev_pop(val) AS sigma
      FROM ex GROUP BY pos),
    z AS (
      SELECT vec_id, ex.pos,
             CASE WHEN sigma > 0 THEN (val - mu) / sigma
                  ELSE 0.0 END AS zv
      FROM ex JOIN stats USING (pos))
    SELECT vec_id,
           list_transform(list(zv ORDER BY pos),
                          x -> floor(x * 1e4 + 0.5) / 1e4) AS z_embedding
    FROM z GROUP BY vec_id ORDER BY vec_id
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embeddings table —
    dimension stats reduce to dim rows and broadcast back; element
    order is deterministic via (pos, z) struct sort."""
    from ..operators.similarity import standardize_embeddings

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    return standardize_embeddings(emb).orderBy("vec_id")


@query(
    "curation_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || chr(31) || '7'),
                        doc_id) AS rn
      FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM ranked WHERE rn <= 40 GROUP BY 1
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform 40-per-source sample
    (operators/curation.py ``stratified_sample``): md5(doc_id, salt)
    rank per stratum — reservoir-sampling semantics with zero state,
    reproducible on any layout; the oracle replays the EXACT row set
    (md5 is engine-identical, doc_id tie-break per trap 6) and the
    per-source id/char sums pin it. Complements curation_source_cap
    (top-k by quality) with the unbiased draw a held-out eval slice
    needs. One shuffle on the stratum key."""
    from ..operators.curation import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = stratified_sample(docs, "doc_id", "source", k=40, salt=7)
    return out.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "curation_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                     || chr(31) || '3'), 1, 15) AS BIGINT)
                 + 0.5) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS k
      FROM documents WHERE n_chars > 0),
    ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY k DESC, doc_id) AS rn
      FROM keyed)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM ranked WHERE rn <= 40 GROUP BY 1
    """,
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted 40-per-source sample by Efraimidis-Spirakis A-ES keys
    (operators/curation.py ``weighted_sample``): u from the portable
    md5 of (doc_id, salt), rank ln(u)/n_chars descending — longer
    documents proportionally likelier, the draw reproducible from ids
    alone. The oracle replays the exact row set (ln and the division
    are cross-engine-stable; doc_id tie-break per trap 6); per-source
    id/char sums pin it. Completes the sampling trio: cap (top-k by
    quality) / stratified (uniform) / weighted (proportional)."""
    from ..operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = weighted_sample(docs, "doc_id", "source", "n_chars", k=40, salt=3)
    return out.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks WHERE w <> '' GROUP BY 1),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r FROM freq),
    head AS (SELECT * FROM ranked WHERE r <= 1000),
    terms AS (
      SELECT
        CAST(floor(ln(CAST(r AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xq,
        CAST(floor(ln(CAST(f AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS yq,
        CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE)) * 1e9
                   + 0.5) AS BIGINT) AS xyq,
        CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1e9
                   + 0.5) AS BIGINT) AS xxq
      FROM head),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(xq) AS sx, SUM(yq) AS sy,
             SUM(xyq) AS sxy, SUM(xxq) AS sxx
      FROM terms),
    fit AS (
      SELECT n,
        (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
         - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
        / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
           - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9))
          AS slope_raw,
        CAST(sx AS DOUBLE) / 1e9 AS sxd, CAST(sy AS DOUBLE) / 1e9 AS syd
      FROM s)
    SELECT n AS n_terms,
           floor(slope_raw * 1e6 + 0.5) / 1e6 AS zipf_slope,
           floor(((syd - slope_raw * sxd) / n) * 1e6 + 0.5) / 1e6
             AS ln_intercept
    FROM fit
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution: OLS slope of
    ln(freq) on ln(rank) over the top-1000 terms — natural text sits
    near -1; a synthetic or templated corpus shows up as a flat or
    kinked slope, making this a one-number corpus-health probe. The
    regression terms are quantized to 1e-9 units before the sums
    (association-free integers — the round-11 playbook), so the oracle
    replays the fit bit-for-bit; ranks tie-break on the token (trap 6).
    One token explode + hash aggregate + a 1000-row window. The
    top-1000 head is selected by distributed top-k (orderBy+limit ->
    TakeOrderedAndProject) BEFORE any window, so the only global
    row_number runs over a GlobalLimit-bounded 1000-row frame — the
    r11 formulation ranked the FULL vocabulary on one task, which is
    the single-partition-window hazard at corpus scale."""
    from pyspark.sql import Window

    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode_outer(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    freq = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("f"))
    head = (
        freq.orderBy(F.desc("f"), F.asc("w"))
        .limit(1000)
        .withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.desc("f"), F.asc("w"))
            ).cast("bigint"),
        )
    )
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("f").cast("double"))
    q = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("bigint")  # noqa: E731
    terms = head.select(
        q(lx).alias("xq"), q(ly).alias("yq"),
        q(lx * ly).alias("xyq"), q(lx * lx).alias("xxq"),
    )
    s = terms.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xq").alias("sx"), F.sum("yq").alias("sy"),
        F.sum("xyq").alias("sxy"), F.sum("xxq").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double") / F.lit(1e9)
    syd = F.col("sy").cast("double") / F.lit(1e9)
    sxyd = F.col("sxy").cast("double") / F.lit(1e9)
    sxxd = F.col("sxx").cast("double") / F.lit(1e9)
    slope_raw = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        F.col("n").alias("n_terms"),
        round_portable(slope_raw, 6).alias("zipf_slope"),
        round_portable((syd - slope_raw * sxd) / F.col("n"), 6).alias(
            "ln_intercept"
        ),
    )


@query(
    "features_hashing_trick",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents),
    b AS (
      SELECT source,
             CAST((CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 16)
                  AS INTEGER) AS bucket
      FROM toks WHERE w <> '')
    SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM b GROUP BY 1, 2
    """,
)
def features_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick featurizer (operators/text.py
    ``hashed_features`` — Weinberger 2009, the Vowpal-Wabbit
    vectorizer): every document becomes a fixed 16-bucket token-count
    vector with NO vocabulary pass and no fit state; here the per-doc
    vectors element-wise-sum per source (posexplode -> long format),
    and the oracle recomputes every (source, bucket) mass from the
    same portable-md5 bucket hash — each vector component is
    oracle-pinned. One projection + two hash aggregates; per-doc state
    is the doc's own bucket list, never k columns through a shuffle."""
    from ..operators.text import hashed_features

    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    vecs = hashed_features(docs, "doc_id", "text", k=16)
    joined = vecs.join(
        docs.select("doc_id", "source"), on="doc_id"
    ).select("source", F.posexplode_outer("features").alias("bucket", "n"))
    return (
        joined.groupBy("source", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .select(
            "source", F.col("bucket").cast("int").alias("bucket"), "n_tokens"
        )
    )
