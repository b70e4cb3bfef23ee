#!/usr/bin/env python
"""One-off probe: does the incremental near-dedup accepted corpus equal the
one-shot minhash_lsh_dedup survivors on the seeded fixtures? Measures the
set difference at sf0.001 and sf0.01 to calibrate the audit-form booleans
for dedup_incremental_neardup / stream_neardup_incremental (VERDICT r8
item 5)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_integration_and_processing_spark.operators.dedup import (
    minhash_lsh_dedup,
    neardup_against_snapshot,
)
from data_integration_and_processing_spark.queries.relational import load_table

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

for sf in ("sf0.001", "sf0.01"):
    sf_dir = f"/root/testdata/{sf}"
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    truncated = F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 5, F.lit(1))), " ")
    snapshot = d.filter(F.col("doc_id") % 3 != 0).select(F.col("doc_id").alias("id"), "text")
    novel = d.filter(F.col("doc_id") % 3 == 0).select(F.col("doc_id").alias("id"), "text")
    injected = (
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 1))
        .select((F.col("doc_id") + 500_000).alias("id"), truncated.alias("text"))
    )
    batch = novel.unionByName(injected)

    inc_batch_survivors = neardup_against_snapshot(
        batch, snapshot, id_col="id", text_col="text"
    ).select("id")
    inc_accepted = snapshot.select("id").unionByName(inc_batch_survivors)

    oneshot = minhash_lsh_dedup(
        snapshot.unionByName(batch), text_col="text", id_col="id"
    ).select("id")

    inc_set = {r.id for r in inc_accepted.collect()}
    one_set = {r.id for r in oneshot.collect()}
    n_snap = snapshot.count()
    n_batch = batch.count()
    n_inj = injected.count()
    inj_ids = {r.id for r in injected.select("id").collect()}
    inj_survived_inc = len(inj_ids & inc_set)
    print(
        f"{sf}: n_snap={n_snap} n_batch={n_batch} n_inj={n_inj} "
        f"inc_accepted={len(inc_set)} oneshot={len(one_set)} "
        f"inc_only={len(inc_set - one_set)} one_only={len(one_set - inc_set)} "
        f"injected_survived_incremental={inj_survived_inc}"
    )
    print(f"  inc_only sample: {sorted(inc_set - one_set)[:10]}")
    print(f"  one_only sample: {sorted(one_set - inc_set)[:10]}")

spark.stop()
