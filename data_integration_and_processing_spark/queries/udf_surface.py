"""User-defined-function surface: pandas UDF (scalar + grouped agg),
grouped-map applyInPandas, Python UDTF, and the skew-salting operators.

The reference has no UDF surface at all (SURVEY.md §2.2); these queries
demonstrate every extension point a pipeline author gets, each in its
scalable form — Arrow-batched vectorized Python, never row-at-a-time — and
each checked against a DuckDB oracle.

Numeric determinism notes per query: inputs are chosen so Python-side
arithmetic is either exact (integer-valued doubles) or identical IEEE ops
in both engines, so no tolerance is needed at the value-hash gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from data_integration_and_processing_spark.operators.skew import salted_agg, salted_join
from data_integration_and_processing_spark.queries.catalog import register
from data_integration_and_processing_spark.sources.tables import load_table, load_tables


# ---------------------------------------------------------------------------
# scalar pandas UDF
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def _net_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; plain IEEE multiply, identical to SQL
    return extended * (1.0 - discount)


@register(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS net_price
        FROM lineitem WHERE l_linenumber = 1
    """,
    description="scalar pandas UDF (Arrow-vectorized): net price per line item",
    tags=("udf", "pandas-udf"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDF (UDAF)
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def _median_udaf(v: pd.Series) -> float:
    # quantities are whole numbers: the two-middle average is exact
    return float(np.median(v))


@register(
    "udf_pandas_grouped_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus, median(l_quantity) AS median_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    description="grouped-aggregate pandas UDF (UDAF): median quantity per flag/status",
    tags=("udf", "pandas-udf", "aggregation"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _median_udaf("l_quantity").alias("median_qty")
    )


# ---------------------------------------------------------------------------
# grouped-map applyInPandas
# ---------------------------------------------------------------------------

def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # group stats arrive as mu/sigma columns (computed JVM-side from exact
    # integer sums); the UDF itself is a pure vectorized normalization, so
    # any salt-subdivision of the group produces identical output
    q = pdf["l_quantity"].to_numpy(dtype=np.float64)
    sigma = pdf["sigma"].to_numpy(dtype=np.float64)
    z = np.where(sigma > 0, np.round((q - pdf["mu"].to_numpy(dtype=np.float64)) / sigma, 6), 0.0)
    return pd.DataFrame(
        {
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "l_returnflag": pdf["l_returnflag"],
            "l_linestatus": pdf["l_linestatus"],
            "z_quantity": z,
        }
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
               round((l_quantity - avg(l_quantity) OVER w) / stddev_pop(l_quantity) OVER w, 6)
                   AS z_quantity
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag, l_linestatus)
    """,
    description=(
        "grouped-map applyInPandas, salted: naive grouped-map parallelism = number of "
        "groups (6 here), so group stats are pre-aggregated JVM-side from exact integer "
        "sums, broadcast-joined in, and the grouped map runs on (key, salt) — full-core "
        "fan-out with identical results. The scalable pattern for low-cardinality keys."
    ),
    tags=("udf", "pandas-udf", "window"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # project before the grouped map: applyInPandas ships every input column
    # through Arrow, so pruning 11 -> 5 columns halves the Python-boundary
    # transfer (column pruning does NOT reach through a Python UDF)
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )
    keys = ["l_returnflag", "l_linestatus"]
    # sum / count / sum-of-squares of integer-valued doubles are exact in any
    # accumulation order, so mu/sigma are deterministic across cluster layouts
    stats = (
        l.groupBy(*keys)
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_quantity").alias("n"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("ss"),
        )
        .select(
            *keys,
            (F.col("s") / F.col("n")).alias("mu"),
            F.sqrt(F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))).alias(
                "sigma"
            ),
        )
    )
    salted = l.join(F.broadcast(stats), keys).withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(32)))
    return salted.groupBy(*keys, "salt").applyInPandas(
        _zscore_group,
        schema="l_orderkey long, l_linenumber int, l_returnflag string, l_linestatus string, z_quantity double",
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function)
# ---------------------------------------------------------------------------

@register(
    "udf_python_udtf",
    oracle="""
        SELECT d.doc_id, CAST(i - 1 AS INTEGER) AS word_idx,
               string_split(d.text, ' ')[i] AS word
        FROM documents d,
             LATERAL unnest(generate_series(1, least(5, len(string_split(d.text, ' '))))) t(i)
    """,
    description="Python UDTF: lateral expansion of the first 5 words per document",
    tags=("udf", "udtf"),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="word_idx int, word string")
    class FirstWords:
        def eval(self, text: str):  # noqa: ANN001
            for i, w in enumerate(text.split(" ")[:5]):
                yield i, w

    spark.udtf.register("first_words", FirstWords)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.word_idx, t.word FROM _udtf_docs d, LATERAL first_words(d.text) t"
    )


# ---------------------------------------------------------------------------
# skew-salting operators
# ---------------------------------------------------------------------------

@register(
    "skew_salted_agg",
    oracle="""
        SELECT event_type, count(*) AS n_events, CAST(max(value) AS DOUBLE) AS max_value
        FROM events GROUP BY event_type
    """,
    description="two-stage salted aggregation: partial on (key, salt), final on key — same result, skew-proof shuffle",
    tags=("skew", "aggregation"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # event_type has only ~5 distinct values — exactly the hot-key shape
    # where a plain groupBy funnels everything through 5 reducers.
    return salted_agg(
        e,
        keys=["event_type"],
        aggs={"n_events": F.count("*"), "max_value": F.max("value")},
        unique_col="event_id",
        n_salts=16,
    ).select("event_type", "n_events", F.col("max_value").cast("double"))


@register(
    "skew_salted_join",
    oracle="""
        SELECT n.n_name, count(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    description="salted equi-join: big side salted deterministically, small side replicated per salt",
    tags=("skew", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n = load_tables(spark, sf_dir, "customer", "nation")
    joined = salted_join(
        c.withColumnRenamed("c_nationkey", "nk"),
        n.withColumnRenamed("n_nationkey", "nk"),
        on="nk",
        unique_col="c_custkey",
        n_salts=8,
    )
    return joined.groupBy("n_name").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# cogrouped applyInPandas
# ---------------------------------------------------------------------------

def _asof_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-user pandas merge_asof: for each click, the most recent prior
    (ts <=, inclusive) non-click event. Right side pre-deduped per ts."""
    left = left.sort_values("ts")
    right = right.sort_values("ts")
    if len(right) == 0:
        out = left[["user_id", "event_id"]].copy()
        out["prior_event_id"] = pd.array([None] * len(out), dtype="Int64")
        return out
    merged = pd.merge_asof(left, right, on="ts", direction="backward", suffixes=("", "_r"))
    return pd.DataFrame(
        {
            "user_id": merged["user_id"],
            "event_id": merged["event_id"],
            "prior_event_id": merged["prior_event_id"].astype("Int64"),
        }
    )


@register(
    "udf_cogrouped_asof",
    oracle="""
        WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, max(event_id) AS prior_event_id
                   FROM events WHERE event_type <> 'click' GROUP BY user_id, ts)
        SELECT l.user_id, l.event_id, r.prior_event_id
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    description="cogrouped applyInPandas: per-user merge_asof of clicks against prior non-click events",
    tags=("udf", "pandas-udf", "asof", "join"),
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    others = (
        e.filter(F.col("event_type") != "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("prior_event_id"))
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(others.groupBy("user_id"))
        .applyInPandas(_asof_cogroup, schema="user_id long, event_id long, prior_event_id long")
    )


# ---------------------------------------------------------------------------
# Arrow-native surface (Spark 4): applyInArrow / mapInArrow
# ---------------------------------------------------------------------------
# One tier faster than the pandas forms: the user function receives pyarrow
# containers directly, skipping the Arrow<->pandas conversion entirely.
# The pandas twins above stay the ergonomic default; these are the hot-path
# form when the per-batch logic is itself expressible in pyarrow.compute.


def _arrow_group_stats(key, tbl):
    import pyarrow as pa  # noqa: PLC0415 — imported on the executor
    import pyarrow.compute as pc  # noqa: PLC0415

    # sums/maxima over whole-number-valued doubles: exact in IEEE, so the
    # result is bit-identical to any engine's aggregate
    return pa.table(
        {
            "l_returnflag": [key[0].as_py() if hasattr(key[0], "as_py") else key[0]],
            "l_linestatus": [key[1].as_py() if hasattr(key[1], "as_py") else key[1]],
            "n_rows": [tbl.num_rows],
            "sum_qty": [pc.sum(tbl.column("l_quantity")).as_py()],
            "max_price": [pc.max(tbl.column("l_extendedprice")).as_py()],
        }
    )


@register(
    "udf_arrow_grouped_map",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               sum(l_quantity) AS sum_qty,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    description=(
        "grouped-map applyInArrow (Spark 4 arrow-native UDF): per-group stats "
        "computed in pyarrow.compute with zero pandas conversion — the fastest "
        "Python extension tier; one shuffle keyed by the group columns, "
        "Arrow batches both directions"
    ),
    tags=("udf", "arrow", "aggregation"),
)
def udf_arrow_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").applyInArrow(
        _arrow_group_stats,
        schema="l_returnflag string, l_linestatus string, n_rows long, sum_qty double, max_price double",
    )


def _arrow_charge_batches(batches):
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    one = pa.scalar(1.0)
    for b in batches:
        # (price * (1 - disc)) * (1 + tax): same association order as the
        # oracle SQL, so every double is the identical IEEE result
        net = pc.multiply(b.column("l_extendedprice"), pc.subtract(one, b.column("l_discount")))
        charge = pc.multiply(net, pc.add(one, b.column("l_tax")))
        yield pa.RecordBatch.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), charge],
            names=["l_orderkey", "l_linenumber", "charge"],
        )


@register(
    "udf_arrow_map_batches",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge
        FROM lineitem WHERE l_linenumber = 2
    """,
    description=(
        "mapInArrow batch transform: per-batch pyarrow.compute arithmetic with "
        "no pandas materialization; the JVM-side filter runs before the Python "
        "stage so only matching rows cross the Arrow boundary"
    ),
    tags=("udf", "arrow"),
)
def udf_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_linenumber") == 2).mapInArrow(
        _arrow_charge_batches,
        schema="l_orderkey long, l_linenumber int, charge double",
    )


# ---------------------------------------------------------------------------
# iterator-form scalar pandas UDF (per-worker state amortization)
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def _scored_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER pandas UDF: the expensive setup (model load, tokenizer
    init, connection pool) runs ONCE per worker before the batch loop —
    the form every model-inference UDF should take. The 'model' here is a
    deterministic affine score so the DuckDB oracle can mirror it."""
    weight, bias = 0.07, 3.0  # stand-in for a loaded model's parameters
    for v in batches:
        yield (v * weight + bias).astype("float64")


@register(
    "udf_pandas_scalar_iter",
    oracle="""
        SELECT event_id,
               round(value * 0.07 + 3.0, 6) AS model_score
        FROM events
    """,
    description=(
        "iterator-form scalar pandas UDF (SCALAR_ITER): per-worker setup "
        "(model load / tokenizer / connection pool) runs once before the "
        "Arrow batch loop instead of per batch — the shape every "
        "model-inference UDF should take at 100 TB, where setup per batch "
        "would dominate. The stand-in model is affine so the oracle mirrors "
        "it exactly"
    ),
    tags=("udf", "pandas-udf"),
)
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(_scored_iter(F.col("value")), 6).alias("model_score"),
    )
