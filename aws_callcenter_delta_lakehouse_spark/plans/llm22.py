"""Twenty-second LLM-pipeline batch (round 10): URL canonicalization
dedup.

Web corpora key their first dedup pass on the URL, not the text — the
same page is crawled under ``HTTP://Www.Site.com/a/?utm_source=x`` and
``http://www.site.com/a``, and canonical-form equality collapses the
recrawls before any content hashing runs (CommonCrawl-style). The
documents table carries no URL column, so the query synthesizes one
per doc by exact integer arithmetic (the synthetic-coordinate
precedent, ``spatial_radius_join``), deliberately injecting every
variance the canonicalizer must collapse: mixed-case hosts, default
ports, trailing slashes, tracking params, fragments.

Capability extension over the reference's analytics surface; no
counterpart to port — cited for scope, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
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
                   x, '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qs
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
