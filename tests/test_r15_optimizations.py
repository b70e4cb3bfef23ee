"""Round-15 optimization equivalence pins: every rewrite in this round
claims RESULT-IDENTITY to the shape it replaced — these tests keep those
claims executable.

- Lloyd trainer: the per-center distance loop is bit-identical to the
  (n, k, dim) broadcast-temp form it replaced.
- ivfpq_probe_batch_arms: each arm equals the separate ivfpq_probe_batch
  call at the same refine (shared-shortlist prefix argument).
- _exact_ranked_both: each metric's slice equals _exact_ranked on that
  metric (one-window dual ranking).
- label_propagation single-exchange superstep: labels still match the
  two-exchange formulation (pinned indirectly by the oracle-parity suite;
  here a small synthetic graph is checked against a driver-side reference).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF_DIR_TINY = "/root/testdata/sf0.001"


def _old_train_centroids(sample, k, seed, n_iter=25, restarts=3):
    """The pre-r15 trainer (3-d broadcast temporaries), kept as the
    reference implementation for the bit-identity pin."""
    n = len(sample)

    def one(run_seed):
        rs = np.random.RandomState(run_seed)
        centers = [sample[rs.randint(n)]]
        d2 = ((sample - centers[0]) ** 2).sum(axis=1)
        for _ in range(min(k, n) - 1):
            total = float(d2.sum())
            centers.append(
                sample[rs.randint(n)] if total <= 0 else sample[rs.choice(n, p=d2 / total)]
            )
            d2 = np.minimum(d2, ((sample - centers[-1]) ** 2).sum(axis=1))
        cb = np.array(centers, dtype=np.float64)
        for _ in range(n_iter):
            d2m = ((sample[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2m, axis=1)
            for c in range(len(cb)):
                members = sample[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        inertia = float(
            (
                (
                    sample
                    - cb[
                        np.argmin(
                            ((sample[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2), axis=1
                        )
                    ]
                )
                ** 2
            ).sum()
        )
        if len(cb) < k:
            cb = np.vstack([cb, np.repeat(cb[-1:], k - len(cb), axis=0)])
        return inertia, cb

    return min((one(seed + 1000 * r) for r in range(restarts)), key=lambda t: t[0])[1]


def test_lloyd_per_center_loop_bit_identical():
    from data_integration_and_processing_spark.operators.similarity import (
        _train_centroids,
    )

    for trial, (n, d) in enumerate([(1980, 64), (257, 65), (37, 8), (5, 8)]):
        rs = np.random.RandomState(trial)
        s = rs.randn(n, d) * (10.0 ** rs.randint(-3, 3))
        a = _old_train_centroids(s, 8, seed=42)
        b = _train_centroids(s, 8, seed=42)
        assert (a.view(np.uint64) == b.view(np.uint64)).all(), (n, d)


def test_probe_batch_arms_match_separate_probes(spark):
    from data_integration_and_processing_spark.operators.similarity import (
        ivfpq_probe_batch,
        ivfpq_probe_batch_arms,
    )
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _eval_index_path,
    )
    from data_integration_and_processing_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR_TINY, "embeddings")
    path = _eval_index_path(spark, SF_DIR_TINY)
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") % 100 == 0)
        .select("vec_id", "embedding")
        .collect()
    ]
    arms = ivfpq_probe_batch_arms(spark, path, qs, k=10, nprobe=4, refines=(1, 5))
    for refine in (1, 5):
        want = sorted(
            ivfpq_probe_batch(spark, path, qs, k=10, nprobe=4, refine=refine)
            .select("query_id", "vec_id", "cos_sim", "rank")
            .collect()
        )
        got = sorted(arms[refine].select("query_id", "vec_id", "cos_sim", "rank").collect())
        assert got == want, f"refine={refine}"


def test_exact_ranked_both_matches_per_metric(spark):
    from data_integration_and_processing_spark.queries.similarity_queries import (
        _eval_scored,
        _exact_ranked,
        _exact_ranked_both,
    )

    scored = _eval_scored(spark, SF_DIR_TINY).localCheckpoint(eager=True)
    both = _exact_ranked_both(scored)
    for metric, col in (("cos", "cos_exact"), ("dot", "dot_exact")):
        want = sorted(
            _exact_ranked(scored.withColumnRenamed(col, "s"), "s")
            .select("query_id", "neighbor_id", "g", "rank")
            .collect()
        )
        got = sorted(
            both.filter(F.col("_m") == metric)
            .select("query_id", "neighbor_id", "g", "rank")
            .collect()
        )
        assert got == want, metric


def test_lpa_single_exchange_superstep_labels(spark):
    """Synthetic 2-community graph: the one-exchange superstep must still
    produce the deterministic (count desc, label asc) argmax labels."""
    from data_integration_and_processing_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge, symmetrized
    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r["id"]: r["label"] for r in label_propagation(edges, n_iter=4).collect()}

    # driver-side reference: synchronous min-label-majority supersteps
    import collections

    adj = collections.defaultdict(list)
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v in adj:
            cnt = collections.Counter(labels[u] for u in adj[v])
            best = min(((-c, lab) for lab, c in cnt.items()))
            nxt[v] = best[1]
        labels = nxt
    assert got == labels
