"""Scalar function packs (SURVEY.md §2.2 "scalar functions" — absent in the
reference, which only manipulates column *names*).

All built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen; no Python in the data path. Cross-engine notes are inline where
Spark and the DuckDB oracle disagree on defaults (regexp global flag,
dayofweek origin, transcendental last-ulp drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.sources.tables import load_table


@register(
    "func_string_pack",
    oracle="""
        SELECT p_partkey,
               lower(p_name)                                   AS name_lower,
               upper(p_brand)                                  AS brand_upper,
               trim(concat('  ', p_type, ' '))                 AS type_trimmed,
               length(p_name)                                  AS name_len,
               substring(p_name, 1, 5)                         AS name_head,
               concat_ws('::', p_brand, p_type)                AS brand_type,
               replace(p_type, ' ', '_')                       AS type_snake,
               regexp_replace(p_name, '[aeiou]', '*', 'g')     AS name_devoweled,
               regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
               lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
               reverse(p_brand)                                AS brand_rev
        FROM part
    """,
    description="string pack: case/trim/substr/concat/replace/regexp/pad/reverse",
    tags=("functions", "string"),
)
def func_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        # Spark regexp_replace is global; DuckDB needs the explicit 'g' flag.
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "func_date_pack",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                                   AS order_year,
               month(o_orderdate)                                  AS order_month,
               day(o_orderdate)                                    AS order_day,
               quarter(o_orderdate)                                AS order_quarter,
               dayofweek(o_orderdate) + 1                          AS order_dow,
               date_trunc('month', o_orderdate)                    AS month_start,
               CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
               strftime(o_orderdate, '%Y-%m')                      AS year_month
        FROM orders
    """,
    description="date pack: extract/trunc/add/diff/last_day/format (dow normalized: DuckDB is 0-based)",
    tags=("functions", "date"),
)
def func_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("order_dow"),  # 1=Sunday; oracle adds 1 to DuckDB's 0=Sunday
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("string").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
    )


@register(
    "func_math_pack",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 50000)            AS abs_delta,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_ceil_k,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
               round(sqrt(l_extendedprice), 6)         AS price_sqrt,
               round(ln(l_extendedprice + 1), 6)       AS price_ln,
               round(log10(l_extendedprice + 1), 6)    AS price_log10,
               CAST(l_quantity AS BIGINT) % 7          AS qty_mod7,
               CAST(sign(l_extendedprice - 30000) AS BIGINT) AS above_30k,
               round(power(l_discount, 2), 10)         AS disc_sq
        FROM lineitem
    """,
    description="math pack: abs/ceil/floor/sqrt/ln/log10/mod/sign/power "
    "(transcendentals rounded: libm last-ulp drift across engines)",
    tags=("functions", "math"),
)
def func_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 50000).alias("abs_delta"),
        F.ceil(price / 1000).alias("price_ceil_k"),
        F.floor(price / 1000).alias("price_floor_k"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1), 6).alias("price_ln"),
        F.round(F.log10(price + 1), 6).alias("price_log10"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(price - 30000).cast("bigint").alias("above_30k"),
        F.round(F.pow("l_discount", F.lit(2)), 10).alias("disc_sq"),
    )


@register(
    "func_array_pack",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               len(words)                                  AS n_words,
               words[1]                                    AS first_word,
               list_contains(words, 'spark')               AS mentions_spark,
               array_to_string(words[1:4], '|')            AS head_words,
               array_to_string(list_sort(words[1:4]), '|') AS head_sorted
        FROM w
    """,
    description="array pack: split/size/element_at/contains/slice/sort (arrays emitted as joined strings)",
    tags=("functions", "array"),
)
def func_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    head = F.slice(words, 1, 4)
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("mentions_spark"),
        F.array_join(head, "|").alias("head_words"),
        F.array_join(F.sort_array(head), "|").alias("head_sorted"),
    )


@register(
    "func_json_map_pack",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')            AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key,
               'k'                                          AS map_keys_joined,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS map_values_joined
        FROM events
    """,
    description="JSON + map pack: get_json_object/from_json to map, keys/values",
    tags=("functions", "json", "map"),
)
def func_json_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    as_map = F.from_json(F.col("props"), T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
        F.array_join(F.map_keys(as_map), ",").alias("map_keys_joined"),
        F.array_join(F.map_values(as_map), ",").alias("map_values_joined"),
    )


@register(
    "func_conditional_pack",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'pending' END         AS status_label,
               coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unknown') AS priority_or_unknown,
               least(o_totalprice, 100000.0)                 AS price_capped,
               greatest(o_totalprice, 1000.0)                AS price_floored,
               CASE WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 1 ELSE 0 END AS mid_range
        FROM orders
    """,
    description="conditional pack: CASE/coalesce/nullif/least/greatest/BETWEEN",
    tags=("functions", "conditional"),
)
def func_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unknown"))
        .alias("priority_or_unknown"),
        F.least(price, F.lit(100000.0)).alias("price_capped"),
        F.greatest(price, F.lit(1000.0)).alias("price_floored"),
        F.when(price.between(50000, 150000), 1).otherwise(0).alias("mid_range"),
    )


@register(
    "func_permissive_cast",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_ok,
               TRY_CAST(event_type AS INTEGER) AS bad_int,
               TRY_CAST(event_type AS TIMESTAMP) AS bad_ts,
               coalesce(TRY_CAST(event_type AS INTEGER), -1) AS bad_with_default,
               nullif(event_type, 'error') AS type_or_null
        FROM events
    """,
    description=(
        "permissive-cast semantics via try_cast: malformed casts yield NULL regardless of "
        "spark.sql.ansi.enabled, mirroring DuckDB TRY_CAST — a 100 TB pipeline must degrade "
        "per-row, not abort"
    ),
    tags=("functions", "cast", "etl"),
)
def func_permissive_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_ok"),
        F.col("event_type").try_cast("int").alias("bad_int"),
        F.col("event_type").try_cast("timestamp").alias("bad_ts"),
        F.coalesce(F.col("event_type").try_cast("int"), F.lit(-1)).alias("bad_with_default"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
    )


@register(
    "func_bitwise_pack",
    oracle="""
        SELECT n_nationkey,
               CAST(n_nationkey & 12 AS BIGINT) AS band,
               CAST(n_nationkey | 1 AS BIGINT) AS bor,
               CAST(xor(n_nationkey, 21) AS BIGINT) AS bxor,
               CAST(n_nationkey << 3 AS BIGINT) AS shl,
               CAST(n_nationkey >> 1 AS BIGINT) AS shr,
               CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS INT) AS popcount
        FROM nation ORDER BY n_nationkey
    """,
    description=(
        "bitwise scalar pack: and/or/xor, shifts, popcount — the flag-mask and "
        "bitmap-bucket arithmetic the Bloom/bitmap operators build on, surfaced "
        "as a checked function family. Pure codegen'd projection"
    ),
    tags=("functions", "projection"),
)
def func_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("bigint")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("band"),
        k.bitwiseOR(F.lit(1)).alias("bor"),
        k.bitwiseXOR(F.lit(21)).alias("bxor"),
        F.call_function("shiftleft", k, F.lit(3)).cast("bigint").alias("shl"),
        F.call_function("shiftright", k, F.lit(1)).cast("bigint").alias("shr"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("n_nationkey")


@register(
    "func_decimal_pack",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_exact,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(5,2)) AS VARCHAR) AS discount_amt,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(5,2)) AS VARCHAR) AS net_price
        FROM lineitem WHERE l_orderkey <= 200
        ORDER BY l_orderkey, l_linenumber
    """,
    description=(
        "exact money math: DECIMAL casts, scale-tracked multiply (18,2 x 5,2), "
        "subtraction at the full product scale (re-scaling first would invoke "
        "rounding, where engines legitimately differ half-up vs half-even) — the "
        "arithmetic a "
        "billing pipeline must NOT do in binary floats (0.1+0.2 != 0.3). Values "
        "surface as canonical strings so the check is exact digits, not a float "
        "hash; both engines follow ANSI DECIMAL scale rules"
    ),
    tags=("functions", "projection", "etl"),
)
def func_decimal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    amt = (price * disc)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price.cast("string").alias("price_exact"),
        amt.cast("string").alias("discount_amt"),
        (price - amt).cast("string").alias("net_price"),
    ).orderBy("l_orderkey", "l_linenumber")


_URL_SQL = (
    "'https://' || source || CAST(doc_id % 7 AS VARCHAR) || '.example.' || "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END || "
    "'/p/' || CAST(doc_id AS VARCHAR) || '?ref=' || lang"
)


@register(
    "func_url_pack",
    oracle=f"""
        WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
        SELECT doc_id, url,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(url, '\\.([a-z]+)/', 1) AS tld,
               regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'ref=([a-z]+)', 1) AS ref_param
        FROM u ORDER BY doc_id
    """,
    description=(
        "URL parsing pack for web-corpus curation: host / TLD / path / query "
        "param via regexp_extract with patterns identical in both engines "
        "(parse_url exists in Spark but has no DuckDB twin — the portable "
        "spelling is the checkable one). Per-domain grouping on the extracted "
        "host is how crawl pipelines rate-limit, blocklist and attribute "
        "provenance; pure codegen'd projection"
    ),
    tags=("functions", "text", "projection"),
)
def func_url_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 3 == 0, "com").when(F.col("doc_id") % 3 == 1, "org").otherwise("net"),
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"\.([a-z]+)/", 1).alias("tld"),
        F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"ref=([a-z]+)", 1).alias("ref_param"),
    ).orderBy("doc_id")


@register(
    "func_variant_pack",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_str,
               'OBJECT<k: BIGINT>' AS variant_schema
        FROM events
    """,
    description=(
        "Spark 4 VARIANT surface: parse_json -> binary variant, typed "
        "variant_get extraction (no re-parse per field, unlike "
        "get_json_object), try_variant_get null-on-missing, and "
        "schema_of_variant introspection — the semi-structured column type "
        "the lakehouse stores instead of JSON strings. The oracle reads the "
        "same fields with DuckDB's JSON extractors; the uniform fixture "
        "schema makes schema_of_variant a checkable constant"
    ),
    tags=("functions", "json", "variant"),
)
def func_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        (F.variant_get(v, "$.k", "int") * 2).alias("k_doubled"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
        F.schema_of_variant(v).alias("variant_schema"),
    )
