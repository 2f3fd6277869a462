"""Twelfth LLM-pipeline batch: retrieval surface.

- text_phrase_search — exact phrase occurrence counting over a POSITIONAL
  inverted index: postings are (term, doc, pos), and a phrase match is a
  self-equi-join on (doc, pos+1). This is the scalable formulation — the
  shuffle carries only the two probed terms' postings, never the corpus —
  and it is exactly how a search engine stores proximity data. Oracle:
  DuckDB recomputes the adjacency with list lambdas.
- retrieval_hybrid_rrf — hybrid lexical+vector retrieval fused with
  Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): BM25 top-20 and
  exact-cosine top-20 are fused by summed 1/(60+rank). Both rank lists
  are deterministic (scores rounded, id tie-breaks) and the fusion is a
  two-term float sum, so the whole query is oracle-checked end to end.

Extends the reference's Athena keyword filtering (`athena_queries.sql`
uses LIKE-level text predicates) to a real retrieval stack — capability
extension, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from .registry import query

_PHRASE = ("big", "data")
_RRF_K = 60
_TOPN = 20


@query(
    "text_phrase_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           len(list_filter(range(1, len(t)),
                           i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}'))
             AS n_occurrences
    FROM toks
    WHERE len(list_filter(range(1, len(t)),
                          i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}')) > 0
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("big data") via a positional inverted index.

    Scale shape: posexplode emits (term, doc, pos) postings; both sides
    are FILTERED to one term each BEFORE the join, so the equi-join on
    (doc_id, pos) shuffles only the postings of the two probed terms
    (O(df(term)), not O(corpus tokens)). The count is a hash aggregate
    on doc_id. At 100 TB the postings build is one scan and the join
    carries kilobytes per probed term — the same plan an external
    inverted index would execute, expressed relationally.
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    postings = docs.select(
        "doc_id", F.posexplode("words").alias("pos", "term")
    )
    first = postings.filter(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    second = postings.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("p0")
    )
    return (
        first.join(second, ["doc_id", "p0"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


_CMS_PHI = 0.02


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term, COUNT(*) AS exact_count
    FROM toks
    GROUP BY term
    HAVING COUNT(*) >= {_CMS_PHI} * (SELECT COUNT(*) FROM toks)
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi=2% heavy hitters via the CMS two-pass algorithm.

    Pass 1 builds the depth-4 x width-1024 counter grid (a few KB
    regardless of corpus size); candidates are the vocabulary terms
    whose ESTIMATE >= phi*N — a superset of the truth because CMS errors
    are strictly one-sided — and pass 2 exact-counts candidates only.
    The output equals the true heavy hitters under ANY hash-collision
    pattern, so the exact GROUP BY/HAVING oracle holds by construction,
    not by dataset luck (``tests/test_sketch.py`` additionally pins the
    superset/upper-bound properties over the real corpus).

    Scale shape: partial aggregation reduces every partition to sketch
    size before a <=4096-group shuffle; the candidate list is broadcast
    back so the exact pass aggregates a phi-filtered stream.
    """
    from ..operators.sketch import cms_heavy_hitters

    toks = load_table_parallel(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    return cms_heavy_hitters(toks, "term", phi=_CMS_PHI)


@query(
    "similarity_pq_adc",
    oracle="""
    WITH normed AS MATERIALIZED (
        SELECT vec_id,
               CASE WHEN nrm > 0
                    THEN list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm)
                    ELSE list_transform(embedding, x -> 0.0) END AS v
        FROM (SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
              FROM embeddings)
    ),
    ss AS MATERIALIZED (SELECT unnest(range(16)) AS s),
    seeds AS MATERIALIZED (
        SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
        FROM (SELECT vec_id, v FROM normed ORDER BY vec_id LIMIT 16)
    ),
    cbh AS MATERIALIZED (
        SELECT ss.s, seeds.j,
               list_slice(v, ss.s * 4 + 1, ss.s * 4 + 4) AS cvec,
               list_sum(list_transform(
                   list_slice(v, ss.s * 4 + 1, ss.s * 4 + 4), c -> c * c
               )) / 2.0 AS halfsq
        FROM seeds, ss
    ),
    subs AS MATERIALIZED (
        SELECT vec_id, ss.s, list_slice(v, ss.s * 4 + 1, ss.s * 4 + 4) AS sub
        FROM normed, ss
    ),
    enc AS MATERIALIZED (
        SELECT vec_id, s, j AS code FROM (
            SELECT su.vec_id, su.s, c.j,
                   ROW_NUMBER() OVER (
                       PARTITION BY su.vec_id, su.s
                       ORDER BY c.halfsq - list_sum(list_transform(range(1, 5),
                           i -> su.sub[CAST(i AS INT)]
                                * c.cvec[CAST(i AS INT)])) ASC,
                                c.j ASC) AS rn
            FROM subs su JOIN cbh c ON su.s = c.s)
        WHERE rn = 1
    ),
    qsubs AS MATERIALIZED (
        SELECT ss.s,
               list_slice(q.embedding, ss.s * 4 + 1, ss.s * 4 + 4) AS qsub
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q, ss
    ),
    lutv AS MATERIALIZED (
        SELECT c.s, c.j,
               list_sum(list_transform(range(1, 5),
                   i -> CAST(q.qsub[CAST(i AS INT)] AS DOUBLE)
                        * c.cvec[CAST(i AS INT)])) AS val
        FROM cbh c JOIN qsubs q ON q.s = c.s
    ),
    scores AS (
        SELECT e.vec_id, list_sum(list(l.val ORDER BY l.s)) AS adc_score
        FROM enc e JOIN lutv l ON l.s = e.s AND l.j = e.code
        GROUP BY e.vec_id
    )
    SELECT vec_id, floor(adc_score * 1e6 + 0.5) / 1e6 AS adc_score
    FROM (SELECT vec_id, adc_score FROM scores
          ORDER BY adc_score DESC, vec_id ASC LIMIT 10)
    """,
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC) top-10 for the vec_id=0 query:
    the corpus compresses to 16 one-byte codes per vector, search is a
    LUT-sum projection + TakeOrderedAndProject. Recall vs the exact
    brute-force path is pinned in ``tests/test_pq.py`` (0.7 @ k=10 on
    this corpus with m=16, 16 codes, seeded codebooks — measured at
    sf0.001 AND sf0.01; a Lloyd iteration does not improve recall on
    these unstructured embeddings and costs a full extra pipeline, so
    the registered query uses iterations=0; the training path stays
    available for clustered corpora).

    ORACLE-CHECKED since r6 (was rows-only): with ``iterations=0`` the
    codebooks are SEEDED (16 lowest-id vectors, the ``dedup_semantic``
    trick) and the whole pipeline is deterministic algebra — the oracle
    replays normalize → seed codebook → per-subspace L2 argmin encode
    (halfsq − dot rewrite, (d, j) tie-break) → query LUT → s-ordered
    ADC sum with the engine's exact FP association (list_sum ↔ the
    left fold of ``aggregate``/``_dot_flat``). Selection uses the RAW
    score; the emitted score is rounded at 1e-6 on both sides."""
    from ..operators.pq import pq_topk

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    top = pq_topk(emb, qdf, dim=64, m=16, num_codes=16, k=10, iterations=0)
    return top.select(
        "vec_id", round_portable(F.col("adc_score"), 6).alias("adc_score")
    )


def _rank_small(df: DataFrame, score: str, id_col: str, rank_col: str) -> DataFrame:
    """Dense 1..n rank by (score DESC, id ASC) over an ALREADY
    top-k-limited DataFrame — triangular broadcast self-join instead of
    an unpartitioned window, so no single-partition WindowExec exists
    anywhere in the plan (k<=20 rows -> <=400 broadcast pairs).

    The input is cut once (r13 opt): both self-join sides consume it,
    and uncut the ENTIRE retrieval leg (BM25 / cosine pipeline)
    executed twice per ranking."""
    from ..operators.materialize import cut_once

    df = cut_once(df)
    other = df.select(
        F.col(score).alias("__s2"), F.col(id_col).alias("__id2")
    )
    before = (F.col("__s2") > F.col(score)) | (
        (F.col("__s2") == F.col(score)) & (F.col("__id2") < F.col(id_col))
    )
    return (
        df.join(F.broadcast(other), before, "left")
        .groupBy(score, id_col)
        .agg((F.count("__id2") + 1).cast("long").alias(rank_col))
    )


def _bm25_top(spark: SparkSession, sf_dir: str, terms, k1=1.2, b=0.75) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    docs = docs.select("doc_id", "words", F.size("words").alias("dl"))
    stats = docs.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # cut once: tf feeds the document-frequency agg AND the score join —
    # uncut, the corpus explode+filter ran twice (r13 opt)
    tf = (
        docs.select("doc_id", "dl", F.explode("words").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.any_value("dl").alias("dl"))
    )
    from ..operators.materialize import cut_once as _cut

    tf = _cut(tf)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", round_portable(F.col("score"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_TOPN)
    )


def _cosine_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    scored = emb.join(F.broadcast(qvec)).select(
        "vec_id",
        round_portable(cosine(F.col("embedding"), F.col("q")), 4).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(_TOPN)


def _rrf_oracle() -> str:
    terms_list = "[" + ", ".join(f"'{t}'" for t in ("spark", "table", "merge")) + "]"
    return f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(words)) AS avgdl FROM docs),
    tf AS (
        SELECT doc_id, word AS term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
        FROM (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM docs)
        WHERE word IN (SELECT unnest({terms_list}::VARCHAR[]))
        GROUP BY doc_id, word
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    bm AS (
        SELECT tf.doc_id,
               floor(SUM(
                   ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))
               ) * 1e4 + 0.5) / 1e4 AS score
        FROM tf, stats JOIN dfreq ON tf.term = dfreq.term
        GROUP BY tf.doc_id
        ORDER BY score DESC, doc_id LIMIT {_TOPN}
    ),
    bmr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_txt
        FROM bm
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cs AS (
        SELECT e.vec_id,
               floor(
                 list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
                 * 1e4 + 0.5) / 1e4 AS sim
        FROM embeddings e, q
        ORDER BY sim DESC, vec_id LIMIT {_TOPN}
    ),
    csr AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS r_vec
        FROM cs
    )
    SELECT COALESCE(bmr.doc_id, csr.vec_id) AS id,
           floor((COALESCE(1.0 / ({_RRF_K} + bmr.r_txt), 0)
                + COALESCE(1.0 / ({_RRF_K} + csr.r_vec), 0)) * 1e6 + 0.5) / 1e6
             AS rrf_score
    FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.vec_id
    ORDER BY rrf_score DESC, id LIMIT 10
    """


@query("retrieval_hybrid_rrf", oracle=_rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (terms {spark, table, merge}) and
    exact-cosine top-20 (query = vec_id 0), fused with Reciprocal Rank
    Fusion (k=60) and cut to a final top-10.

    Scale shape: both retrieval legs end in TakeOrderedAndProject top-k;
    ranks are assigned over the <=20-row heads with a broadcast
    triangular join (never an unpartitioned window); the fusion is a
    full outer join of two 20-row sets. Nothing after the two corpus
    scans scales with the corpus. Cross-engine determinism: leg scores
    are rounded BEFORE ranking and ids break all ties, so the rank
    lists — and therefore the fused scores — are bit-stable.
    """
    bm = _rank_small(
        _bm25_top(spark, sf_dir, ("spark", "table", "merge")),
        "score", "doc_id", "r_txt",
    ).select("doc_id", "r_txt")
    cs = _rank_small(_cosine_top(spark, sf_dir), "sim", "vec_id", "r_vec").select(
        "vec_id", "r_vec"
    )
    fused = bm.join(cs, bm.doc_id == cs.vec_id, "full_outer").select(
        F.coalesce("doc_id", "vec_id").alias("id"),
        round_portable(
            F.coalesce(1.0 / (F.col("r_txt") + _RRF_K), F.lit(0.0))
            + F.coalesce(1.0 / (F.col("r_vec") + _RRF_K), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(10)
