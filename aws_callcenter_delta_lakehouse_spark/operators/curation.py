"""Corpus-curation operators: benchmark decontamination, deterministic
sharding, and the filter->dedup->shard pipeline a training-data export
runs end-to-end.

Scale notes (100 TB):
- Decontamination joins TRAIN grams against the BENCHMARK gram set. The
  benchmark side (eval suites) is small by construction — distinct its
  grams and broadcast them, so the only shuffle is the per-doc overlap
  count. With ``broadcast_benchmark=False`` the gram join becomes a
  shuffle hash join for pathologically large benchmark sets.
- Shard assignment is a pure projection (md5 prefix mod N) — no shuffle;
  the WRITE repartitions by shard so each output file is one shard.
- ``curate`` dedups on md5(text), never shuffling full document text:
  the aggregate carries (hash, min id, chars) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_col(toks_col: str, n: int, distinct: bool = True):
    """Whitespace n-gram strings from a MATERIALIZED token-array column.

    ``toks_col`` must name a column that already holds the split token
    array (produced in its own ``select``), never an inline ``split()``
    expression: a non-trivial expression referenced inside the
    ``transform`` lambda re-evaluates PER ELEMENT (no CSE across lambda
    invocations — the winnow trap), turning gram extraction O(len^2)
    per document. A bare column reference is a BoundReference and free.

    Guarded: ``sequence(1, k)`` is DESCENDING for k < 1 in Spark, so
    short documents must short-circuit to an empty array."""
    toks = F.col(toks_col)
    starts = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), starts),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(starts >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag training documents sharing any whitespace ``n``-gram with a
    benchmark/eval set — the standard pre-training decontamination pass
    (n-gram collision against eval suites). Returns
    ``(id_col, n_overlap_grams)`` for contaminated documents only.

    Gram comparison is on distinct grams per side, so the count is
    "distinct benchmark grams this document contains", insensitive to
    repetition on either side.
    """
    bench_grams = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__toks"))
        .select(F.explode(_gram_col("__toks", n)).alias("gram"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    train_grams = train.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    ).select(F.col(id_col), F.explode(_gram_col("__toks", n)).alias("gram"))
    return (
        train_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_overlap_grams"))
    )


def shard_expr(text_col: str, num_shards: int):
    """Deterministic content shard: first 8 hex chars of md5 -> int mod
    ``num_shards``. Portable (DuckDB: ``CAST('0x'||substr(md5(t),1,8) AS
    BIGINT) % N``) and uniform; 8 hex chars < 2^32 so never negative."""
    return (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long")
        % num_shards
    ).cast("int")


def curate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str = "lang",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 30,
    min_chars: int = 100,
    max_chars: int = 20000,
    num_shards: int = 16,
) -> DataFrame:
    """Filter -> exact-dedup -> shard: the training-export pipeline.

    1. Keep ``keep_langs`` documents within token/char bounds (pure
       scan-side filters — pushed to parquet).
    2. Exact dedup on md5(text), keeping the lowest id. The aggregate
       key is the 32-char hash, so full text never shuffles.
    3. Assign a deterministic shard from the same hash prefix.

    Returns one row per surviving document:
    ``(id_col, shard, n_chars)``.
    """
    toks = F.split(F.col(text_col), " ")
    filtered = df.filter(
        F.col(lang_col).isin(*keep_langs)
        & (F.size(toks) >= min_tokens)
        & (F.length(text_col).between(min_chars, max_chars))
    )
    hashed = filtered.select(
        F.md5(F.col(text_col)).alias("__h"),
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
    )
    deduped = hashed.groupBy("__h").agg(
        F.min(id_col).alias(id_col), F.min("n_chars").alias("n_chars")
    )
    return deduped.select(
        id_col,
        (F.conv(F.substring("__h", 1, 8), 16, 10).cast("long") % num_shards)
        .cast("int")
        .alias("shard"),
        "n_chars",
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    token_budget: int = 512,
) -> DataFrame:
    """Sequential packing: assign documents to fixed-token-budget
    training batches. Within each ``group_col`` partition (shard,
    source file — the parallelism unit), documents are laid out in
    ``id_col`` order and cut every ``token_budget`` tokens:
    ``batch_id = floor(exclusive_cumsum_tokens / budget)`` — exactly how
    concat-and-split pretraining packing behaves, and deterministic.

    Scale: one window per group partition — the shuffle is
    hash(group_col); no global ordering is ever required (a global
    window would single-partition the corpus)."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_n = df.select(
        F.col(group_col), F.col(id_col), n_tokens.alias("n_tokens")
    )
    return with_n.withColumn(
        "batch_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / token_budget
        ).cast("int"),
    )


def length_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Length-decile bucketing: group documents of similar token length
    so fixed-shape training batches waste minimal padding. ntile over
    (n_tokens, id) within each ``group_col`` partition — deterministic
    (full tie-break), one window shuffle on the group key, never a
    global sort."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = Window.partitionBy(group_col).orderBy("n_tokens", id_col)
    return (
        df.select(F.col(group_col), F.col(id_col), n_tokens.alias("n_tokens"))
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )


def write_training_shards(
    curated: DataFrame,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the curated export: join the curated (id, shard)
    manifest back to the document payloads and write parquet
    PARTITIONED BY shard — each shard is an independently consumable
    training input split. The join is keyed on the id (the only time
    payloads move); the write repartitions by shard so each partition
    directory is written by the tasks owning that shard (no tiny-file
    spray: one shuffle, shard-count output groups).

    Returns the per-shard manifest of what was written."""
    joined = docs.join(curated.select(id_col, "shard"), on=id_col)
    (
        joined.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = curated.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").cast("int").alias("n_docs"))
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """zlib compression ratio per document — the RefinedWeb-style
    quality signal (highly repetitive or templated text compresses far
    below natural prose). No built-in Column compressor exists, so this
    is a documented PYTHON-TIER operator: Arrow-batched ``mapInPandas``
    with stdlib zlib, self-contained closure (workers never import this
    package). Output is (id, n_bytes, n_compressed, ratio) — metadata
    only."""
    schema = (
        f"{id_col} long, n_bytes int, n_compressed int, ratio double"
    )

    def _compress(batches):
        import zlib

        import pandas as _pd

        for pdf in batches:
            raw = pdf[text_col].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            n = raw.map(len)
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "n_compressed": comp.astype("int32"),
                    "ratio": (comp / n.where(n > 0, 1)).astype("float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(_compress, schema=schema)


def curation_summary(curated: DataFrame) -> DataFrame:
    """Per-shard doc/byte counts — the export manifest. One narrow
    aggregate over the curated id/shard/chars rows."""
    return curated.groupBy("shard").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


def top_ngrams(df: DataFrame, text_col: str, n: int = 2, k: int = 50) -> DataFrame:
    """Corpus-wide most-frequent word n-grams, exact.

    Scale (100 TB): the explode emits one row per gram but partial
    (map-side) aggregation collapses each partition to its distinct
    grams before the shuffle, so the exchange carries (gram, count)
    pairs — hot grams are exactly the ones partial agg compresses
    best. Top-k is TakeOrderedAndProject (no global sort)."""
    toks_df = df.select(F.split(F.col(text_col), " ").alias("__toks"))
    grams = toks_df.select(
        F.explode(_gram_col("__toks", n, distinct=False)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def vocab_coverage(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Token-frequency head with cumulative corpus coverage — the
    Zipf curve a tokenizer-training pass reads ("how many types cover
    X% of tokens"). Returns (word, cnt, cum_frac) for the top ``k``
    words by frequency.

    Scale (100 TB): the cumulative sum runs over the ALREADY
    top-k-limited head (<= k rows), never over the full vocabulary — and
    it is a broadcast triangular self-join rather than an unpartitioned
    window, so the plan contains no single-partition WindowExec at all
    (that node warns, and at scale serializes). The corpus token total
    joins in as a broadcast scalar; counts are exact integers so the
    coverage fractions are cross-engine deterministic."""
    words = df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    head = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(k)
    # rank predicate for "b precedes-or-equals a" in (cnt DESC, word ASC)
    prev = head.select(F.col("word").alias("__w"), F.col("cnt").alias("__c"))
    cum = (
        head.join(
            F.broadcast(prev),
            (F.col("__c") > F.col("cnt"))
            | ((F.col("__c") == F.col("cnt")) & (F.col("__w") <= F.col("word"))),
        )
        .groupBy("word", "cnt")
        .agg(F.sum("__c").alias("__cum"))
    )
    from ..functions.scalars import round_portable

    return (
        cum.join(F.broadcast(total), F.lit(True))
        .select(
            "word",
            "cnt",
            round_portable(F.col("__cum") / F.col("__total"), 6).alias("cum_frac"),
        )
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


def per_source_cap(
    df: DataFrame, id_col: str, group_col: str, order_col: str, k: int
) -> DataFrame:
    """C4/RefinedWeb-style per-domain document cap: keep at most ``k``
    documents per ``group_col`` (source/domain), preferring the highest
    ``order_col`` with ``id_col`` as the deterministic tie-break.

    Scale (100 TB): one shuffle on the group key; rank-k selection is
    a running row_number, so each group streams — no per-group
    materialization. Skewed hot domains are exactly the ones the cap
    truncates, bounding their output to k rows."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def assign_split(
    df: DataFrame,
    text_col: str,
    train_pct: int = 96,
    val_pct: int = 2,
) -> DataFrame:
    """Deterministic content-hash train/val/test split: md5-prefix
    bucket 0-99 -> split label. Content-keyed (not id-keyed) so exact
    duplicates always land in the same split — re-runs and re-shards
    can never leak a train document into eval.

    Scale (100 TB): a pure projection — no shuffle, no sampling state;
    the split is reproducible from the text alone on any cluster
    layout."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long")
        % 100
    ).cast("int")
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def mixture_sample(
    df: DataFrame,
    text_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic source-mixture downsampling: keep fraction
    ``weights[source]`` of each source's documents by content-hash
    bucket — the data-mixing step that rebalances domains toward target
    proportions before training.

    Scale (100 TB): a pure projection (hash + literal-map lookup +
    filter), no shuffle and no sampling state; the kept set is
    reproducible from content alone, so re-runs, retries, and different
    cluster layouts all keep exactly the same documents. Weights are a
    literal map (a handful of sources); a large weights TABLE would
    broadcast-join instead."""
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    bucket = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long")
        % buckets
    )
    frac = F.coalesce(wmap[F.col(source_col)], F.lit(default_weight))
    return df.filter(bucket < frac * buckets)


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its tokens are under a TARGET-domain
    unigram LM than under the full-corpus LM — the per-document log
    importance weight sum_w log(p_target(w) / p_corpus(w)). Documents
    with high weight "look like" the target domain and get upsampled.
    (The paper hashes n-grams into buckets; over this corpus the plain
    unigram vocabulary is the same construction with a perfect hash.)

    ``is_target``: boolean Column marking the target-domain rows.

    Both LMs use add-one smoothing over the JOINT vocabulary, so every
    corpus token has nonzero target probability. Scale shape: the
    vocabulary is arbitrarily large, so the per-word log-ratio model is
    a word-keyed aggregate JOINED back (never a broadcast dict —
    mirrors unigram_logprob); the scalar totals broadcast. One shuffle
    on word, one on the doc id.

    Output: ``(id, n_tokens, logweight)`` — logweight unrounded;
    oracle-facing callers round.
    """
    words = df.select(
        F.col(id_col),
        is_target.alias("__tgt"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    counts = words.groupBy("word").agg(
        F.count("*").alias("__cc"),
        F.sum(F.col("__tgt").cast("long")).alias("__tc"),
    )
    totals = counts.agg(
        F.sum("__cc").alias("__ct"),
        F.sum("__tc").alias("__tt"),
        F.count("*").alias("__v"),
    )
    lr = counts.join(F.broadcast(totals), F.lit(True)).select(
        "word",
        (
            F.log((F.col("__tc") + F.lit(1.0)) / (F.col("__tt") + F.col("__v")))
            - F.log((F.col("__cc") + F.lit(1.0)) / (F.col("__ct") + F.col("__v")))
        ).alias("__lr"),
    )
    return (
        words.join(lr, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("__lr").alias("logweight"),
        )
    )


def stratified_sample(
    df: DataFrame, id_col: str, group_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Deterministic UNIFORM k-per-stratum sample: rank each group's
    rows by the md5 of (id, salt) and keep the first ``k`` — the
    reservoir-sampling result without reservoir state. Unlike
    :func:`per_source_cap` (which keeps the TOP-k by a quality order),
    this draws a representative random-looking subset per stratum,
    reproducible from ids alone (re-runs, retries, and any cluster
    layout keep exactly the same rows); ``salt`` yields independent
    draws. The hash is the repo PORTABLE pattern, so a SQL oracle
    replays the exact sample.

    Scale (100 TB): one shuffle on the stratum key; rank-k is a
    running row_number — groups stream, nothing materializes."""
    key = F.md5(
        F.concat_ws("\x1f", F.col(id_col).cast("string"),
                    F.lit(str(int(salt))))
    )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic WEIGHTED k-per-stratum sample without replacement
    — Efraimidis & Spirakis (2006) A-ES: each row draws a uniform
    ``u`` from the portable md5 of (id, salt) and ranks by
    ``u^(1/w)``, equivalently ``ln(u)/w`` descending; the top k per
    stratum is a weighted sample (inclusion probability proportional
    to weight, exactly the reservoir-A-ES result) reproducible from
    ids alone. Rows with weight <= 0 never qualify (A-ES requires
    positive weights). The ``ln`` + division are cross-engine-stable,
    so a SQL oracle replays the exact row set.

    Scale (100 TB): one shuffle on the stratum key, running
    row_number — no reservoir state, no second pass."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.col(id_col).cast("string"),
                        F.lit(str(int(salt))),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc(key), F.asc(F.col(id_col))
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
