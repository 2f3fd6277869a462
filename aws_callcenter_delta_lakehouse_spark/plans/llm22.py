"""Twenty-second LLM-pipeline batch (round 10): URL canonicalization
dedup, perceptual-hash image near-dup, seeded bootstrap CIs, MMR
diversified retrieval, RAKE keyphrase extraction.

Web corpora key their first dedup pass on the URL, not the text — the
same page is crawled under ``HTTP://Www.Site.com/a/?utm_source=x`` and
``http://www.site.com/a``, and canonical-form equality collapses the
recrawls before any content hashing runs (CommonCrawl-style). The
documents table carries no URL (or image) column, so those queries
synthesize one per doc by exact integer arithmetic (the
synthetic-coordinate precedent, ``spatial_radius_join``),
deliberately injecting the variance the operator must collapse:
mixed-case hosts / tracking params for the canonicalizer, perturbed
base images for the aHash near-dup.

Capability extensions over the reference's analytics surface; no
counterpart to port — cited for scope, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from .registry import query


@query(
    "dedup_url_canonical",
    oracle="""
    WITH urls AS (
      SELECT doc_id, source,
        'https://'
        || CASE doc_id % 3 WHEN 0 THEN 'WWW.Example.COM'
                           WHEN 1 THEN 'www.example.com'
                           ELSE 'Docs.Example.org' END
        || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
        || '/d/' || CAST(doc_id // 4 AS VARCHAR)
        || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
                ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) END
        || CASE WHEN doc_id % 13 = 0 THEN '#sec2' ELSE '' END AS url
      FROM documents),
    parts AS (
      SELECT doc_id, source, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)) AS host0,
        regexp_replace(
          regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1),
          '/+$', '') AS path,
        regexp_extract(url, '\\?([^#]*)', 1) AS q
      FROM urls),
    canon AS (
      SELECT doc_id, source,
        scheme || '://'
        || CASE WHEN scheme = 'http'
                THEN regexp_replace(host0, ':80$', '')
                WHEN scheme = 'https'
                THEN regexp_replace(host0, ':443$', '')
                ELSE host0 END
        || CASE WHEN path = '' THEN '/' ELSE path END
        || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical
      FROM (
        SELECT *, array_to_string(
          list_sort(list_filter(string_split(q, '&'),
            x -> x <> '' AND NOT regexp_matches(
                   x, '^(utm_[^=&]*|fbclid|gclid)(=|$)'))), '&') AS qs
        FROM parts))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
           min(canonical) AS sample_canonical
    FROM canon GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup report (operators/urls.py ``canonicalize_url``):
    synthesize a crawl URL per document with injected recrawl variance,
    canonicalize (lowercase scheme/host, strip default ports, drop
    fragments and tracking params, sort surviving params, normalize
    trailing slashes), and count per source how many raw URLs collapse
    to how many canonical keys. ``sample_canonical`` pins the actual
    canonical string content, not just the counts. Per-row string map
    + one hash aggregate — no shuffle beyond the groupBy, no UDFs; at
    100 TB this is the cheap first pass before content dedup."""
    from ..operators.urls import canonicalize_url

    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(d % 3 == 0, F.lit("WWW.Example.COM"))
        .when(d % 3 == 1, F.lit("www.example.com"))
        .otherwise(F.lit("Docs.Example.org")),
        F.when(d % 11 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/d/"),
        F.expr("CAST(doc_id DIV 4 AS STRING)"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="),
                     (d % 7).cast("string")),
        ).otherwise(F.concat(F.lit("?id="), (d % 7).cast("string"))),
        F.when(d % 13 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", url.alias("url")
    )
    canon = docs.select(
        "source", canonicalize_url(F.col("url")).alias("canonical")
    )
    return canon.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("canonical").cast("bigint").alias("n_canonical"),
        F.min("canonical").alias("sample_canonical"),
    )


def _ahash_sql(px: str = "px", s: str = "s", n: int = 64) -> str:
    """The 64-term average-hash packing as SQL (mirror of
    operators/multimodal.average_hash, bit 63 = sign bit)."""
    terms = []
    for i in range(n):
        w = -(2**63) if i == 63 else (1 << i)
        terms.append(
            f"CASE WHEN {px}[{i + 1}] * {n} > {s} "
            f"THEN CAST({w} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m
      FROM documents),
    px AS (
      SELECT doc_id,
             list_transform(range(0, 64),
               i -> (g * 37 + i * i * 13) % 251
                    + CASE WHEN i < m THEN 300 ELSE 0 END) AS px
      FROM base),
    h AS (
      SELECT doc_id, {_ahash_sql()} AS ah
      FROM (SELECT doc_id, px, list_sum(px) AS s FROM px)),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             bit_count(xor(a.ah, b.ah)) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id)
    SELECT d1, d2, CAST(hamming AS INTEGER) AS hamming
    FROM pairs WHERE hamming <= 3
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual average-hash
    (aHash — Krawetz 2011): each document gets a synthetic decoded
    8x8 luma thumbnail (exact integer arithmetic; docs sharing
    doc_id//4 are the same base image with 0-3 perturbed pixels —
    recompressions/crops of one another), hashed to 64 bits by
    mean-thresholding (operators/multimodal.average_hash, integer
    ``pixel*64 > sum`` so the threshold never floats), then paired by
    the banded Hamming join (operators/dedup.hamming_near_pairs —
    pigeonhole-exact for hamming <= 3). The oracle brute-forces
    all-pairs, so the diff also proves the banding loses nothing. At
    100 TB: per-row hash, 4 bucket-keyed shuffle rows per image of 16
    bytes each — payload bytes never shuffle; the decode tier is the
    Arrow-batched extract_features path."""
    from ..operators.dedup import hamming_near_pairs
    from ..operators.multimodal import average_hash

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("doc_id DIV 4").alias("g"),
        (F.col("doc_id") % 4).alias("m"),
    )
    px = base.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.col("g") * 37 + i * i * 13) % 251
            + F.when(i < F.col("m"), 300).otherwise(0),
        ).alias("px"),
    )
    hashed = px.select("doc_id", average_hash(F.col("px")).alias("ah"))
    pairs = hamming_near_pairs(
        hashed, "doc_id", "ah", max_hamming=3, chunks=4
    )
    return pairs.select(
        "d1", "d2", F.col("hamming").cast("int").alias("hamming")
    )


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    rng = f"range(1, {dim + 1})"
    return (
        f"list_sum(list_transform({rng}, i -> CAST({a}[i] AS DOUBLE)"
        f" * CAST({b}[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({rng}, i -> CAST({a}[i] AS"
        f" DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({rng}, i -> CAST({b}[i] AS"
        f" DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
    )


def _mmr_oracle(k: int = 3, pool: int = 16) -> str:
    """Unrolled MMR greedy selection: one (rank, candidate-update) CTE
    pair per pick. ``pool``/``sims`` are referenced more than once ->
    MATERIALIZED (r5 chained-CTE rule)."""
    steps = []
    uni = []
    for t in range(1, k + 1):
        score = (
            "0.75 * rel" if t == 1 else "0.75 * rel - 0.25 * ms"
        )
        steps.append(
            f"r{t} AS (SELECT *, {score} AS score, ROW_NUMBER() OVER ("
            f"PARTITION BY q_id ORDER BY {score} DESC, vec_id) AS rn "
            f"FROM c{t})"
        )
        steps.append(
            f"s{t} AS (SELECT q_id, vec_id AS sel, rel AS sel_rel, "
            f"score AS sel_score FROM r{t} WHERE rn = 1)"
        )
        if t < k:
            ms = "sim.s" if t == 1 else "GREATEST(c.ms, sim.s)"
            steps.append(
                f"c{t + 1} AS (SELECT c.q_id, c.vec_id, c.rel, {ms} AS ms "
                f"FROM c{t} c "
                f"JOIN s{t} ON c.q_id = s{t}.q_id AND c.vec_id <> s{t}.sel "
                f"JOIN sims sim ON sim.q_id = c.q_id "
                f"AND sim.ia = c.vec_id AND sim.ib = s{t}.sel)"
            )
        uni.append(
            f"SELECT q_id, {t} AS rank, sel AS vec_id, "
            f"floor(sel_rel * 1e6 + 0.5) / 1e6 AS rel, "
            f"floor(sel_score * 1e6 + 0.5) / 1e6 AS score FROM s{t}"
        )
    chain = ",\n    ".join(steps)
    final = "\n    UNION ALL ".join(uni)
    return f"""
    WITH qs AS (
      SELECT vec_id AS q_id, embedding AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)),
    rel0 AS (
      SELECT q.q_id, e.vec_id, e.embedding,
             {_cos_sql('e.embedding', 'q.qv')} AS rel
      FROM embeddings e JOIN qs q ON e.vec_id <> q.q_id),
    pool AS MATERIALIZED (
      SELECT q_id, vec_id, embedding, rel FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
        FROM rel0)
      WHERE rn <= {pool}),
    sims AS MATERIALIZED (
      SELECT a.q_id, a.vec_id AS ia, b.vec_id AS ib,
             {_cos_sql('a.embedding', 'b.embedding')} AS s
      FROM pool a JOIN pool b
        ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
    c1 AS (SELECT q_id, vec_id, rel, CAST(NULL AS DOUBLE) AS ms
           FROM pool),
    {chain}
    {final}
    """


@query("similarity_mmr_rerank", oracle=_mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-3 for three query
    vectors over the embedding corpus (operators/similarity.py
    ``mmr_select`` — Carbonell & Goldstein 1998), lam = 0.75, pool =
    16: the RAG re-ranking pass that trades pure relevance for novelty
    against the already-picked set. Batched across queries — broadcast
    scoring, per-query pooling window, pool-local pairwise cosines,
    then k constant plan-level argmax+update iterations (no driver
    data loop). The oracle unrolls the greedy selection CTE-per-pick
    and diffs exactly: identical fold arithmetic, RAW-score ranking
    with id tie-breaks, 1e-6 rounding only at the output."""
    from ..catalog import load_table_parallel
    from ..operators.similarity import mmr_select

    emb = load_table_parallel(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    out = mmr_select(
        qs, emb.select("vec_id", "embedding"),
        k=3, lam=0.75, pool=16, exclude_query_ids=True,
    )
    from ..functions.scalars import round_portable as rp

    return out.select(
        "q_id",
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        rp(F.col("rel"), 6).alias("rel"),
        rp(F.col("score"), 6).alias("score"),
    )


@query(
    "stats_bootstrap_ci",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    grp AS (
      SELECT event_type, list_sort(list(y)) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY 1),
    ms AS (
      SELECT event_type, xs, n,
        list_sort(list_transform(range(1, 201), b ->
          list_sum(list_transform(range(1, CAST(n AS INTEGER) + 1), i ->
            xs[CAST(CAST('0x' || substr(md5(event_type || chr(31) || '0'
                 || chr(31) || CAST(b AS VARCHAR) || chr(31)
                 || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
               % n + 1 AS INTEGER)]
          )) / n
        )) AS mlist
      FROM grp)
    SELECT event_type, n,
           floor(list_sum(xs) / n * 1e6 + 0.5) / 1e6 AS mean,
           floor(mlist[6] * 1e6 + 0.5) / 1e6 AS ci_lo,
           floor(mlist[195] * 1e6 + 0.5) / 1e6 AS ci_hi
    FROM ms
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% percentile-bootstrap CI (Efron 1979) of the mean daily event
    count per type: B = 200 hash-seeded resamples
    (operators/bootstrap.py — deterministic portable-md5 draws, the
    seeded-randomness pattern shared with the DP Laplace mechanism),
    CI = resample means of rank 6 and 195 by explicit selection, no
    interpolation. The whole B x n resample runs as one nested
    higher-order expression per group row — JVM-side, zero shuffles
    beyond the daily aggregate, and the oracle replays every draw."""
    from ..operators.bootstrap import bootstrap_mean_ci

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    out = bootstrap_mean_ci(
        daily, "event_type", "y", B=200, alpha=0.05, seed=0, portable=True
    )
    from ..functions.scalars import round_portable as rp

    return out.select(
        "event_type",
        "n",
        rp(F.col("mean"), 6).alias("mean"),
        rp(F.col("ci_lo"), 6).alias("ci_lo"),
        rp(F.col("ci_hi"), 6).alias("ci_hi"),
    )


@query(
    "text_rake_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             string_split_regex(lower(text), '[^a-z0-9]+') AS tk
      FROM documents),
    words AS (
      SELECT id, CAST(generate_subscripts(tk, 1) - 1 AS BIGINT) AS pos,
             unnest(tk) AS w
      FROM toks),
    nonstop AS (
      SELECT * FROM words
      WHERE w <> '' AND w NOT IN
        ('a','the','and','of','to','in','is','on','for','with')),
    runs AS (
      SELECT *, pos - ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY pos) AS grp
      FROM nonstop),
    plen AS (
      SELECT id, grp, CAST(COUNT(*) AS BIGINT) AS plen,
             string_agg(w, ' ' ORDER BY pos) AS phrase
      FROM runs GROUP BY 1, 2),
    members AS (
      SELECT r.id, r.grp, r.w, p.plen
      FROM runs r JOIN plen p ON r.id = p.id AND r.grp = p.grp),
    wstats AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM members GROUP BY 1),
    wscore AS (
      SELECT w, CAST(deg * 1000000 // freq AS BIGINT) AS ws FROM wstats),
    pscore AS (
      SELECT m.id, m.grp, CAST(SUM(s.ws) AS BIGINT) AS ps
      FROM members m JOIN wscore s ON m.w = s.w GROUP BY 1, 2),
    scored AS (
      SELECT p.phrase, p.plen, ps.ps, p.id
      FROM plen p JOIN pscore ps ON p.id = ps.id AND p.grp = ps.grp)
    SELECT phrase, CAST(MAX(plen) AS BIGINT) AS n_words,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs,
           CAST(MAX(ps) AS BIGINT) AS score_micro
    FROM scored GROUP BY 1
    ORDER BY score_micro DESC, phrase LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 RAKE keyphrases (Rose et al. 2010) over the
    documents table (operators/text.py ``rake_keywords``): phrases are
    maximal non-stopword runs found by the gaps-and-islands index
    trick (no regex-boundary subtleties), word score =
    degree * 1e6 DIV freq in exact BIGINT micro-units, phrase score =
    the integer sum — zero float summation, so the oracle replays the
    ranking bit-for-bit. Complements tfidf_top_terms (unigram
    importance) with multi-word phrase extraction."""
    from ..operators.text import rake_keywords

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return rake_keywords(
        docs,
        "doc_id",
        "text",
        ["a", "the", "and", "of", "to", "in", "is", "on", "for", "with"],
        top_k=20,
    )


@query(
    "dedup_fuzzy_edit1",
    oracle="""
    SELECT CAST(a.c_custkey AS BIGINT) AS d1,
           CAST(b.c_custkey AS BIGINT) AS d2,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_edit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match join at Levenshtein distance <= 1 over customer
    names via FastSS DELETION NEIGHBORHOODS (operators/dedup.py
    ``edit1_pairs``): each name explodes into length+1 deletion
    variants, candidates equi-join on the variant key (bucket work =
    the deletion neighborhood, never corpus^2), the built-in
    ``levenshtein`` verifies — typo-level entity resolution, the
    string sibling of the aHash/banding family. The oracle is the
    brute-force all-pairs diff (fine on sf0.01 in DuckDB), which
    doubles as the blocking-LOSSLESSNESS proof: any distance-<=1 pair
    the neighborhood join missed would hash-mismatch."""
    from ..operators.dedup import edit1_pairs

    cust = load_table_parallel(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    out = edit1_pairs(cust, "c_custkey", "c_name")
    return out.select(
        F.col("d1").cast("bigint").alias("d1"),
        F.col("d2").cast("bigint").alias("d2"),
        F.col("dist").cast("int").alias("dist"),
    )
