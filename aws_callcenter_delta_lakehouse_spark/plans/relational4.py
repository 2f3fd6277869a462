"""Fourth relational batch: array explosion (posexplode / LATERAL VIEW),
from_json struct parsing, bag-semantics set ops, and a cogroup-free
grouped-map normalization (the Pandas tier, tolerance-tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, register_all
from .registry import query


@query(
    "posexplode_words",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(w, 1) - 1 AS INTEGER) AS pos,
           unnest(w) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 10)
    """,
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per array element with its position."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@query(
    "lateral_view_sql",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 10
    """,
)
def lateral_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode through the SQL surface."""
    register_all(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT doc_id, word
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
        WHERE doc_id < 10
        """
    )


@query(
    "from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
    FROM events
    """,
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit struct schema (typed JSON parsing, vs
    the stringly get_json_object in json_props_extract)."""
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("props_struct", F.from_json("props", schema))
        .select("event_id", F.col("props_struct.k").alias("k_typed"))
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the sides)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(
            load_table(spark, sf_dir, "supplier").select(
                F.col("s_nationkey").alias("nationkey")
            )
        )
    )


@query(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity = left minus right)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(
            load_table(spark, sf_dir, "supplier").select(
                F.col("s_nationkey").alias("nationkey")
            )
        )
    )


@query(
    "grouped_map_zscore",
    # exact differential check of the Pandas tier: integer means are
    # exact, and z is rounded to 4 digits on BOTH sides (pandas'
    # pairwise float sums vs DuckDB's streaming variance agree well
    # inside 1e-4)
    oracle="""
    SELECT doc_id, lang, n_chars,
           CASE WHEN count(*) OVER (PARTITION BY lang) <= 1
                  OR stddev_samp(n_chars) OVER (PARTITION BY lang) = 0
                THEN 0.0
                ELSE floor((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                           / stddev_samp(n_chars) OVER (PARTITION BY lang)
                           * 1e4 + 0.5) / 1e4
           END AS z
    FROM documents
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score of document
    length. The Pandas tier exists for semantics built-ins can't express;
    this one CAN be cross-checked against the window-function
    formulation — both in tests and differentially against DuckDB.
    Worker fn self-contained."""
    from ..functions.scalars import round_portable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf):
        import pandas as _pd

        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        out = pdf.copy()
        out["z"] = (
            0.0
            if (_pd.isna(sd) or sd == 0)
            else (pdf["n_chars"] - mu) / sd
        )
        return out

    raw = docs.groupBy("lang").applyInPandas(
        zscore, schema="doc_id long, lang string, n_chars long, z double"
    )
    return raw.withColumn("z", round_portable(F.col("z"), 4))


@query(
    "map_functions",
    oracle="""
    SELECT event_id,
           'k' AS map_key,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS map_value,
           1 AS map_size
    FROM events
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: from_json to map<string,int>, explode to
    (key, value) rows, map cardinality. The testdata props carry exactly
    one key, which keeps the oracle enumerable."""
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("props_map", m)
        .select(
            "event_id",
            F.explode("props_map").alias("map_key", "map_value"),
            F.size(m).alias("map_size"),
        )
    )


@query(
    "struct_functions",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_field,
           o_totalprice AS price_field,
           regexp_replace(o_orderpriority, '[0-9]-', '') AS priority_name
    FROM orders
    """,
)
def struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access + regexp_replace. The struct
    is built and accessed in the plan, but only scalar fields are
    output — nested values render engine-specifically (Row vs dict) and
    would make the differential hash fragile."""
    o = load_table(spark, sf_dir, "orders")
    info = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return o.select(
        "o_orderkey",
        info.getField("status").alias("status_field"),
        info.getField("price").alias("price_field"),
        F.regexp_replace("o_orderpriority", "[0-9]-", "").alias("priority_name"),
    )
