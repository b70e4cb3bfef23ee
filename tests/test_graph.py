"""Behavioral checks for the iterative graph operators (no SQL oracle:
recursive CTEs cannot aggregate per level, so the contract is conservation
laws + determinism + structural sanity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_processing_spark.operators.graph import pagerank
from data_integration_and_processing_spark.queries.catalog import all_specs


def _star_edges(spark, n_leaves=6):
    # hub 0 <-> leaves 1..n (symmetric star)
    rows = [(0, i) for i in range(1, n_leaves + 1)] + [(i, 0) for i in range(1, n_leaves + 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_conserves_mass(spark):
    ranks = pagerank(_star_edges(spark), n_iter=8)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n_v = ranks.count()
    assert abs(total - n_v) < 1e-6


def test_pagerank_hub_dominates_star(spark):
    ranks = {r["id"]: r["rank"] for r in pagerank(_star_edges(spark), n_iter=8).collect()}
    hub, leaves = ranks[0], [v for k, v in ranks.items() if k != 0]
    assert hub > max(leaves) * 2
    # leaves are symmetric => identical ranks
    assert max(leaves) - min(leaves) < 1e-12


def test_pagerank_dangling_mass_redistributes(spark):
    # 0 -> 1 -> 2, vertex 2 dangles; mass must still sum to |V|
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ranks = pagerank(e, n_iter=12)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 3.0) < 1e-6


def test_pagerank_fixed_iterations_deterministic(spark, sf_dir):
    q = all_specs()["graph_pagerank"].spark
    a = [(r["id"], r["rank"]) for r in q(spark, sf_dir).collect()]
    b = [(r["id"], r["rank"]) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 25


class TestTriangleStats:
    def _stats(self, spark, edge_list):
        from data_integration_and_processing_spark.operators.graph import triangle_stats

        df = spark.createDataFrame(edge_list, "src long, dst long")
        return triangle_stats(df).collect()[0]

    def test_k4_complete_graph(self, spark):
        # K4: 4 vertices, 6 edges, 12 wedges, 4 triangles, coeff = 1.0
        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        r = self._stats(spark, edges)
        assert (r["n_vertices"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 6, 12, 4)
        assert r["clustering_coeff_micro"] == 1_000_000

    def test_path_graph_has_no_triangles(self, spark):
        r = self._stats(spark, [(0, 1), (1, 2), (2, 3)])
        assert r["n_triangles"] == 0
        assert r["n_wedges"] == 2

    def test_duplicate_reversed_and_self_edges_normalize(self, spark):
        # triangle given redundantly: both directions, dupes, a self-loop
        edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (1, 1)]
        r = self._stats(spark, edges)
        assert (r["n_edges"], r["n_triangles"]) == (3, 1)
        assert r["clustering_coeff_micro"] == 1_000_000

    def test_skewed_hub_counts_correctly(self, spark):
        # star hub 0 -- 1..10 plus one rim edge (1,2): exactly 1 triangle,
        # the shape where naive id-orientation piles the hub's whole
        # neighborhood on one join side
        edges = [(0, i) for i in range(1, 11)] + [(1, 2)]
        r = self._stats(spark, edges)
        assert r["n_triangles"] == 1


class TestBfsDistances:
    def _edges(self, spark, pairs):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(pairs, "src long, dst long")
        return df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def test_path_graph_distances(self, spark):
        from data_integration_and_processing_spark.operators.graph import bfs_distances

        edges = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        got = {r["id"]: r["dist"] for r in bfs_distances(edges, [1], max_depth=10).collect()}
        assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_depth_bound_and_disconnected(self, spark):
        from data_integration_and_processing_spark.operators.graph import bfs_distances

        edges = self._edges(spark, [(1, 2), (2, 3), (3, 4), (7, 8)])
        got = {r["id"]: r["dist"] for r in bfs_distances(edges, [1], max_depth=2).collect()}
        # depth-bounded: 4 unreached; disconnected component never appears
        assert got == {1: 0, 2: 1, 3: 2}

    def test_min_distance_on_diamond(self, spark):
        from data_integration_and_processing_spark.operators.graph import bfs_distances

        # two paths 1->4: length 2 via 2, length 3 via (5, 6) — min wins
        edges = self._edges(spark, [(1, 2), (2, 4), (1, 5), (5, 6), (6, 4)])
        got = {r["id"]: r["dist"] for r in bfs_distances(edges, [1], max_depth=5).collect()}
        assert got[4] == 2

    def test_multi_source(self, spark):
        from data_integration_and_processing_spark.operators.graph import bfs_distances

        edges = self._edges(spark, [(1, 2), (2, 3), (9, 3)])
        got = {r["id"]: r["dist"] for r in bfs_distances(edges, [1, 9], max_depth=5).collect()}
        assert got[3] == 1 and got[1] == 0 and got[9] == 0


class TestLabelPropagation:
    def _sym(self, spark, pairs):
        """Symmetrized edge frame from undirected pairs."""
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(rows, "src long, dst long")

    def test_two_cliques_converge_to_min_label(self, spark):
        from data_integration_and_processing_spark.operators.graph import label_propagation

        # two disjoint triangles: each converges to its component's min id
        edges = self._sym(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
        got = {r["id"]: r["label"] for r in label_propagation(edges, n_iter=4).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_tie_breaks_to_smallest_label(self, spark):
        from data_integration_and_processing_spark.operators.graph import label_propagation

        # path 1-2-3 after one superstep: 2 sees {1, 3} -> tie -> 1
        edges = self._sym(spark, [(1, 2), (2, 3)])
        got = {r["id"]: r["label"] for r in label_propagation(edges, n_iter=1).collect()}
        assert got[2] == 1

    def test_deterministic_across_partitioning(self, spark):
        from data_integration_and_processing_spark.operators.graph import label_propagation

        pairs = [(i, (i * 7) % 20 + 20) for i in range(20)] + [(3, 5), (5, 9)]
        e = self._sym(spark, pairs)
        a = sorted(map(tuple, label_propagation(e.repartition(1), n_iter=3).collect()))
        b = sorted(map(tuple, label_propagation(e.repartition(17, "dst"), n_iter=3).collect()))
        assert a == b

    def test_every_vertex_labeled_once(self, spark):
        from data_integration_and_processing_spark.operators.graph import label_propagation

        edges = self._sym(spark, [(1, 2), (2, 3), (4, 5)])
        out = label_propagation(edges, n_iter=2).collect()
        assert sorted(r["id"] for r in out) == [1, 2, 3, 4, 5]


class TestKCorePeel:
    def _sym(self, spark, und_pairs):
        rows = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
        return spark.createDataFrame(rows, "src long, dst long")

    def test_clique_plus_tail_peels_to_clique(self, spark):
        """K4 (0-3) with a pendant path 3-4-5: the 3-core is exactly the
        clique, every clique vertex keeps degree 3, and the tail peels off
        within two supersteps."""
        from data_integration_and_processing_spark.operators.graph import kcore_peel

        und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
        out = {r["id"]: r["core_deg"] for r in kcore_peel(self._sym(spark, und), k=3, n_iter=3).collect()}
        assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_cycle_survives_k2_vanishes_k3(self, spark):
        from data_integration_and_processing_spark.operators.graph import kcore_peel

        und = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 4-cycle: every degree 2
        k2 = kcore_peel(self._sym(spark, und), k=2, n_iter=3)
        assert {r["id"]: r["core_deg"] for r in k2.collect()} == {0: 2, 1: 2, 2: 2, 3: 2}
        k3 = kcore_peel(self._sym(spark, und), k=3, n_iter=2)
        assert k3.count() == 0

    def test_symmetrize_option_fixes_raw_directed_input(self, spark):
        """ADVICE r10: the operator assumes a symmetrized deduplicated edge
        list. symmetrize=True must make a raw directed list (one direction
        per undirected edge, duplicates, a self-loop) produce the SAME
        cores as the manual symmetrization path."""
        from data_integration_and_processing_spark.operators.graph import kcore_peel

        und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
        raw = spark.createDataFrame(
            und + [(0, 1), (2, 2)], "src long, dst long"  # dup edge + self-loop
        )
        fixed = {
            r["id"]: r["core_deg"]
            for r in kcore_peel(raw, k=3, n_iter=3, symmetrize=True).collect()
        }
        manual = {
            r["id"]: r["core_deg"]
            for r in kcore_peel(self._sym(spark, und), k=3, n_iter=3).collect()
        }
        assert fixed == manual == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_monotone_in_supersteps(self, spark):
        """The survivor set only shrinks as supersteps increase (each round
        filters the previous round's edges)."""
        from data_integration_and_processing_spark.operators.graph import kcore_peel

        # chain of triangles sharing vertices: peels gradually under k=2
        und = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (4, 5)]
        e = self._sym(spark, und)
        prev = None
        for t in (1, 2, 3):
            ids = {r["id"] for r in kcore_peel(e, k=2, n_iter=t).collect()}
            if prev is not None:
                assert ids <= prev
            prev = ids
