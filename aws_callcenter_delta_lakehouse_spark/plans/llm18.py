"""Round-5 batch: training-data logistics + scale-join patterns.

- training_epoch_shuffle — deterministic per-epoch global permutation
  into shards (the data-loader contract for large-scale training:
  reproducible order, resumable shards, no RNG state),
- dedup_containment — directional n-gram containment (quote/subset
  detection; the asymmetric complement to Jaccard),
- join_bloom_prefilter — bloom-runtime-filter join: fact rows that
  cannot match the dim are dropped BEFORE the join shuffle,
- dedup_normalized_keep_best — canonicalization dedup (case/punct-
  normalized key) keeping the best representative per cluster,
- layout_zone_depth — zone-map clustering-depth metric (the OPTIMIZE
  advisor number: how many files a point query must touch).

All oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from .registry import query


@query(
    "training_epoch_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS k,
               CAST(CAST('0x' || substr(md5('epoch7|' || CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 8 AS INT) AS shard
        FROM documents
    )
    SELECT shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS INT) AS pos,
           doc_id
    FROM keyed
    """,
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document gets a pseudo-random
    but REPRODUCIBLE position for epoch 7 — md5 of (epoch, doc_id) is
    both the shard router and the intra-shard sort key. No RNG state,
    no seed plumbing: any worker can recompute any shard's order
    independently, which is what makes resumable data loading and
    exact replay possible at 100 TB.

    Scale shape: the md5 keys are computed in the scan projection, the
    only shuffle is the hash exchange on ``shard`` (8-way here; set to
    the shard count), and each shard sorts locally for its
    ``row_number`` — there is NO global sort and no skew (md5 is
    uniform by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string"))).alias(
            "k"
        ),
    ).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("k", 1, 8), 16, 10).cast("bigint"), F.lit(8)
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "shard", F.row_number().over(w).alias("pos"), "doc_id"
    )


@query(
    "dedup_containment",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM words),
    shingles AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM idx),
    sizes AS (SELECT doc_id, count(*) n FROM shingles GROUP BY doc_id),
    hot AS (SELECT sh FROM shingles GROUP BY sh HAVING count(*) > 10),
    kept AS (SELECT * FROM shingles s WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.sh = s.sh)),
    inter AS (SELECT a.doc_id src, b.doc_id dst, count(*) k
              FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT src, dst,
           floor(k * 1.0 / s.n * 10000 + 0.5) / 10000 AS containment
    FROM inter JOIN sizes s ON src = s.doc_id
    WHERE k * 1.0 / s.n >= 0.6
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs (>= 0.6): |grams(src) ∩ grams(dst)|
    / |grams(src)| — catches a short doc quoted wholesale inside a long
    one, which Jaccard misses (the union denominator drowns it). Same
    df-capped blocking as ``dedup_ngram_jaccard``; both directions of a
    pair score independently."""
    from ..operators.dedup import containment_pairs, shingle

    sh = shingle(
        load_table_parallel(spark, sf_dir, "documents"), "doc_id", "text"
    )
    pairs = containment_pairs(sh, "doc_id", threshold=0.6, max_shingle_df=10)
    return pairs.select(
        "src", "dst", round_portable(F.col("containment"), 4).alias("containment")
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount)) * 1e2 + 0.5) / 1e2
             AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier of one nation, with the fact side pruned by
    a BLOOM RUNTIME FILTER before any join: the selective dim's keys
    are folded into a sharded bitmap (``bloom_build`` — fully
    distributed, one bit_or aggregate), collapsed to a ~16 KB map,
    broadcast, and probed INLINE per fact row (k=4 JVM hash lookups, no
    explode, no shuffle, no Python). Rows that cannot match never
    enter the join; the join itself removes bloom false positives, so
    the result is exactly the plain join — which is what the oracle
    checks.

    This is the explicit form of Spark's DPP / runtime bloom filter:
    at 100 TB the bloom costs one scan of the 40-row-per-nation dim
    plus 4 hashes per fact row, and saves shuffling the ~96% of
    lineitem that can never match a 1-of-25-nations supplier set."""
    from ..operators.bloom import _bit_positions, bloom_build

    m_bits, k = 1 << 17, 4
    sup = load_table(spark, sf_dir, "supplier")
    dim = sup.filter(F.col("s_nationkey") == 3).select("s_suppkey", "s_name")
    bloom_map = bloom_build(dim, "s_suppkey", m_bits=m_bits, k=k).agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("bits")
        ).alias("__bm")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    # positions materialized in their own projection (perf trap 1),
    # then an inline forall over k=4 probe positions per row. The probe
    # column is cast to the BUILD column's exact type first: xxhash64 is
    # type-sensitive (trap 14) and the testdata physical types have
    # drifted between rounds (trap 11) — an int32/int64 mismatch would
    # silently false-negative and drop matching fact rows.
    probe_col = F.col("l_suppkey").cast(sup.schema["s_suppkey"].dataType)
    probed = (
        li.join(F.broadcast(bloom_map))
        .withColumn("__pos", _bit_positions(probe_col, m_bits, k))
        .filter(
            F.expr(
                "forall(__pos, p -> "
                "(coalesce(try_element_at(__bm, CAST(p / 64 AS BIGINT)), 0L)"
                " & shiftleft(1L, CAST(p % 64 AS INT))) != 0)"
            )
        )
    )
    return (
        probed.join(F.broadcast(dim), probed["l_suppkey"] == dim["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(
            round_portable(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "dedup_normalized_keep_best",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               md5(regexp_replace(lower(substr(text, 1, 100)),
                                  '[^a-z0-9 ]', '', 'g')) AS ck
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars, ck,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY ck) AS n_members
        FROM keyed
    )
    SELECT doc_id AS kept_doc_id, CAST(n_members AS INT) AS n_members,
           n_chars
    FROM ranked WHERE rn = 1 AND n_members > 1
    """,
)
def dedup_normalized_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization dedup with BEST-representative selection: docs
    whose first 100 chars are identical after lowercasing +
    punctuation-stripping cluster on the md5 of that normalized prefix
    (the truncation-tolerant canonical key — re-crawled/re-chunked
    copies share an opening but differ in tail), and each cluster keeps
    its LONGEST member (tie: lowest doc_id) — the curation policy when
    "first seen" would keep the worst copy. Only the 32-char canonical
    hash shuffles, never text; one window per cluster key does rank +
    size in a single exchange. Returns clusters with >= 2 members."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.regexp_replace(
                F.lower(F.substring(F.col("text"), 1, 100)), "[^a-z0-9 ]", ""
            )
        ).alias("ck"),
    )
    w = Window.partitionBy("ck")
    ranked = keyed.select(
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(w).alias("n_members"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_members") > 1)).select(
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_members").cast("int").alias("n_members"),
        "n_chars",
    )


@query(
    "layout_zone_depth",
    oracle="""
    WITH d AS (
        SELECT l_orderkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) AS day
        FROM lineitem
    ),
    mm AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM d),
    zoned AS (
        SELECT 'hashed' AS layout,
               CAST(l_orderkey % 32 AS INT) AS zone, day
        FROM d
        UNION ALL
        SELECT 'clustered' AS layout,
               CAST(floor((day - mind) * 32.0 / (maxd - mind + 1)) AS INT)
                 AS zone, day
        FROM d, mm
    ),
    zones AS (
        SELECT layout, zone, MIN(day) AS lo, MAX(day) AS hi
        FROM zoned GROUP BY layout, zone
    ),
    depth AS (
        SELECT a.layout, a.zone, COUNT(*) AS n_overlapping
        FROM zones a JOIN zones b
          ON a.layout = b.layout AND a.lo <= b.hi AND b.lo <= a.hi
        GROUP BY a.layout, a.zone
    )
    SELECT layout,
           CAST(COUNT(*) AS INT) AS n_zones,
           floor(AVG(n_overlapping) * 1e4 + 0.5) / 1e4 AS avg_depth
    FROM depth GROUP BY layout
    """,
)
def layout_zone_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map CLUSTERING DEPTH — the observability metric behind
    every OPTIMIZE/re-cluster decision: bucket lineitem into 32
    synthetic files two ways (hash of the write key = ingest order;
    range of l_shipdate = clustered layout), take each zone's min/max
    ship-day, and count how many zones a point query on the zone key
    must touch (zones whose [lo, hi] overlap). Clustered layouts score
    ~1 (each file owns a disjoint slice — min/max pruning works);
    hashed layouts score ~32 (every file spans the whole range —
    pruning is useless). Delta/Iceberg expose the same number as
    OPTIMIZE's clustering metrics; `maintenance.optimize_hilbert` is
    the fix when it degrades.

    The zone rollup is one aggregate per layout; the overlap join runs
    on 32-row metadata, never on rows — exactly how a real advisor
    reads the stats manifest, not the table."""
    # cut once (r13 opt): li feeds the min/max probe AND both synthetic
    # layouts — uncut, the lineitem scan ran 3x
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).localCheckpoint(eager=False)
    mm = li.agg(
        F.min("day").alias("mind"), F.max("day").alias("maxd")
    )
    hashed = li.select(
        F.lit("hashed").alias("layout"),
        F.pmod("l_orderkey", F.lit(32)).cast("int").alias("zone"),
        "day",
    )
    clustered = li.join(F.broadcast(mm)).select(
        F.lit("clustered").alias("layout"),
        F.floor(
            (F.col("day") - F.col("mind"))
            * 32.0
            / (F.col("maxd") - F.col("mind") + 1)
        )
        .cast("int")
        .alias("zone"),
        "day",
    )
    zones = (
        hashed.unionByName(clustered)
        .groupBy("layout", "zone")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    )
    a = zones.select("layout", "zone", "lo", "hi")
    b = zones.select(
        F.col("layout").alias("layout_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    depth = (
        a.join(
            b,
            (F.col("layout") == F.col("layout_b"))
            & (F.col("lo") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi")),
        )
        .groupBy("layout", "zone")
        .agg(F.count("*").alias("n_overlapping"))
    )
    return depth.groupBy("layout").agg(
        F.count("*").cast("int").alias("n_zones"),
        round_portable(F.avg("n_overlapping"), 4).alias("avg_depth"),
    )
