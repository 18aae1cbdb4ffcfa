"""Scalar function families (SURVEY.md §2.B), one driver-checked query each.

Cross-engine notes (learned the hard way, encoded here):
- `round()` tie semantics differ between Spark (HALF_UP) and DuckDB — never
  round a value whose digit-after could be a float-noise 5; acctbal-like
  inputs are 2-decimal so rounding at 2 is identity-safe.
- libm functions (log/exp) are not bit-identical across engines; sqrt IS
  (IEEE correctly-rounded), so sqrt is in the oracle set and log is not.
- Spark `instr` == DuckDB `strpos`; Spark `dayofweek` (1=Sun) differs from
  DuckDB's (0=Sun) — excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.registry import register
from kgforge.tables import load


@register(
    "fn_string",
    sql="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type5,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           replace(p_brand, 'Brand#', 'B') AS short_brand,
           strpos(p_name, 'a') AS first_a,
           levenshtein(p_brand, 'Brand#13') AS lev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           reverse(p_brand) AS rbrand
    FROM part
    """,
    doc="String function family over part names/types/brands.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("short_brand"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).alias("lev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.reverse("p_brand").alias("rbrand"),
    )


@register(
    "fn_time",
    sql="""
    SELECT event_id,
           date_trunc('hour', ts) AS ts_hour,
           year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h, minute(ts) AS mi,
           date_trunc('day', ts) AS ts_day,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
           epoch_us(ts) AS micros,
           ts + INTERVAL 90 MINUTE AS ts_plus
    FROM events
    """,
    doc="Date/time family over events.ts (UTC session tz matches DuckDB naive ts).",
)
def fn_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", "ts").alias("ts_day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("micros"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
    )


@register(
    "fn_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS adisc,
           greatest(l_quantity, l_tax * 100) AS g,
           least(l_quantity, l_extendedprice / 1000) AS l,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           sqrt(l_quantity) AS sq,
           power(2.0, l_linenumber) AS p2,
           CAST(sign(l_discount - 0.05) AS INT) AS sg,
           l_orderkey % 7 AS m7
    FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="Math family (only IEEE-deterministic ops: abs/floor/ceil/sqrt/pow2/sign/mod).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("adisc"),
        F.greatest(F.col("l_quantity"), F.col("l_tax") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000).alias("l"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.sqrt("l_quantity").alias("sq"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("p2"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
        (F.col("l_orderkey") % 7).alias("m7"),
    )


@register(
    "fn_cond",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS urgent
    FROM orders
    """,
    doc="Conditional/null family: CASE, coalesce, nullif.",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias("urgent"),
    )


@register(
    "fn_array",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_min(embedding) AS DOUBLE) AS vmin,
           CAST(list_max(embedding) AS DOUBLE) AS vmax,
           ROUND(CAST(list_sum(embedding) AS DOUBLE), 4) AS vsum,
           len(list_distinct(list_transform(embedding, x -> CAST(floor(x * 10) AS INT))))
             AS n_buckets
    FROM embeddings
    """,
    doc="Array family over embeddings: size/index/min/max/sum/transform/distinct.",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.array_min("embedding").cast("double").alias("vmin"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vsum"),
        F.size(
            F.array_distinct(
                F.transform("embedding", lambda x: F.floor(x * 10).cast("int"))
            )
        ).alias("n_buckets"),
    )


@register(
    "fn_map",
    sql="""
    WITH m AS (
      SELECT event_id,
             map(['type','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS pm
      FROM events
    )
    SELECT event_id,
           pm['type'][1] AS m_type,
           array_to_string(list_sort(map_keys(pm)), ',') AS keys
    FROM m
    """,
    doc="Map family: build map from entries, element_at, keys — scalar outputs keep the oracle value-exact despite engine map-type differences.",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.create_map(F.lit("type"), F.col("event_type"), F.lit("uid"),
                     F.col("user_id").cast("string")).alias("props_map"),
    ).select(
        "event_id",
        F.element_at("props_map", "type").alias("m_type"),
        F.concat_ws(",", F.sort_array(F.map_keys("props_map"))).alias("keys"),
    )


@register(
    "fn_json",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    """,
    doc="JSON family over events.props (stringly JSON → typed columns).",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "fn_hash",
    sql="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha,
           md5(concat_ws('|', p_brand, p_type)) AS stable_id
    FROM part
    """,
    doc="Stable id minting via md5/sha256 (deterministic mention/node ids, SURVEY A5).",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha"),
        F.md5(F.concat_ws("|", "p_brand", "p_type")).alias("stable_id"),
    )


@register(
    "udtf_tokens",
    sql="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
    doc=(
        "Python UDTF (Spark 4 table function): text → token rows via LATERAL "
        "join. Completeness row for the UDTF surface; the hot path uses "
        "explode/mapInPandas instead (per-row Python is the slow path)."
    ),
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" ")):
                yield i, tok

    load(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "_udtf_docs"
    )
    spark.udtf.register("tokenize", Tokenize)
    return spark.sql(
        "SELECT doc_id, t.pos, t.token FROM _udtf_docs, LATERAL tokenize(text) t"
    )
