"""Equivalence pins for round-16 optimizations.

Every rewrite this round must keep the declared results bit-identical; these
tests pin the operator-level arguments (salted vs plain superstep counts,
dedup-folded edge builds) on fixtures small enough to enumerate.
"""

from __future__ import annotations


def _sym(spark, und_pairs):
    rows = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src long, dst long")


class TestLpaSaltedSuperstep:
    def _hot_graph(self):
        """Star: hub 1 touches 40 spokes (max degree 40 of 96 half-edges
        >> |E|/n_part), plus a detached triangle so labels are not all 1."""
        pairs = [(1, i) for i in range(2, 42)]
        pairs += [(100, 101), (101, 102), (100, 102)]
        return pairs

    def test_salted_equals_plain_on_hot_graph(self, spark):
        from data_integration_and_processing_spark.operators.graph import (
            label_propagation,
        )

        e = _sym(spark, self._hot_graph())
        plain = sorted(
            map(tuple, label_propagation(e, n_iter=3, salt_hot_dst=False).collect())
        )
        salted = sorted(
            map(tuple, label_propagation(e, n_iter=3, salt_hot_dst=True).collect())
        )
        assert plain == salted

    def test_auto_gate_fires_on_hot_graph_only(self, spark):
        """The degree gate (max_deg * n_part >= |E|) must engage the salted
        form on a star and stay off on a near-regular ring; both paths must
        agree with the forced variants either way."""
        from data_integration_and_processing_spark.operators.graph import (
            label_propagation,
        )

        star = _sym(spark, self._hot_graph())
        ring = _sym(spark, [(i, (i + 1) % 60) for i in range(60)])
        for edges in (star, ring):
            auto = sorted(map(tuple, label_propagation(edges, n_iter=2).collect()))
            forced = sorted(
                map(
                    tuple,
                    label_propagation(edges, n_iter=2, salt_hot_dst=True).collect(),
                )
            )
            assert auto == forced

    def test_salted_equals_plain_on_fixture_shape(self, spark):
        from data_integration_and_processing_spark.operators.graph import (
            label_propagation,
        )

        pairs = [(i, (i * 7) % 20 + 20) for i in range(20)] + [(3, 5), (5, 9)]
        e = _sym(spark, pairs)
        plain = sorted(
            map(tuple, label_propagation(e, n_iter=4, salt_hot_dst=False).collect())
        )
        salted = sorted(
            map(tuple, label_propagation(e, n_iter=4, salt_hot_dst=True).collect())
        )
        assert plain == salted


class TestDedupEdgesFold:
    def test_lpa_dedup_fold_equals_pre_distinct(self, spark):
        from data_integration_and_processing_spark.operators.graph import (
            label_propagation,
        )

        pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
        dup = _sym(spark, pairs + pairs + pairs[:2])  # multiplicity > 1
        clean = _sym(spark, pairs)
        a = sorted(
            map(tuple, label_propagation(dup, n_iter=4, dedup_edges=True).collect())
        )
        b = sorted(map(tuple, label_propagation(clean, n_iter=4).collect()))
        assert a == b

    def test_pagerank_dedup_fold_equals_pre_distinct(self, spark):
        from data_integration_and_processing_spark.operators.graph import pagerank

        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        dup = _sym(spark, pairs + pairs)
        clean = _sym(spark, pairs)
        a = sorted(
            map(tuple, pagerank(dup, n_iter=3, dedup_edges=True).collect())
        )
        b = sorted(map(tuple, pagerank(clean, n_iter=3).collect()))
        assert a == b

    def test_kcore_dedup_fold_equals_pre_distinct(self, spark):
        from data_integration_and_processing_spark.operators.graph import kcore_peel

        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (1, 4)]
        dup = _sym(spark, pairs + pairs)
        clean = _sym(spark, pairs)
        a = sorted(map(tuple, kcore_peel(dup, k=2, n_iter=3, dedup_edges=True).collect()))
        b = sorted(map(tuple, kcore_peel(clean, k=2, n_iter=3).collect()))
        assert a == b

    def test_lpa_edge_build_single_exchange(self, spark):
        """Plan pin for the fold: repartition(src) -> dropDuplicates plans
        exactly ONE exchange (hashpartitioning(src) satisfies the (src, dst)
        dedup clustering)."""
        from pyspark.sql import functions as F

        e = _sym(spark, [(1, 2), (2, 3), (1, 3)])
        built = (
            e.repartition(8, F.col("src"))
            .dropDuplicates(["src", "dst"])
            .sortWithinPartitions("src")
        )
        plan = built._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
