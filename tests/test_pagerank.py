"""PageRank centrality: known-answer validation against a NumPy power
iteration on hand-built graphs, plus the corpus-level representative query
invariants."""

from __future__ import annotations

import numpy as np
import pytest

from etl_mri_scripts_spark.queries.dedup import PR_DAMPING, pagerank_ranks


def _numpy_pagerank(edges, n, iters, d=PR_DAMPING):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t in edges:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    return r


@pytest.mark.parametrize(
    "edges,n",
    [
        # undirected star: hub 0 <-> leaves 1..4 (hub must dominate)
        ([(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)], 5),
        # chain 0-1-2-3 symmetrized (middle nodes above endpoints)
        ([(i, i + 1) for i in range(3)] + [(i + 1, i) for i in range(3)], 4),
    ],
)
def test_pagerank_matches_numpy_reference(spark, edges, n):
    edf = spark.createDataFrame(edges, "s long, d long")
    got = {
        r["doc_id"]: r["rank"] for r in pagerank_ranks(spark, edf, iters=10).collect()
    }
    expect = _numpy_pagerank(edges, n, iters=10)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(expect[i], rel=1e-9), i
    # mass conservation on dangling-free graphs
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_asymmetric_graph_contract(spark):
    # r14 (r13 verdict finding #1): pagerank_ranks requires every node to
    # have in-degree >= 1 (symmetrized edges guarantee it). This test PINS
    # the documented behavior on a graph that VIOLATES the contract — a
    # pure source (out-edges, no in-edges) vanishes from the output and
    # only destination nodes appear — so a future caller with asymmetric
    # edges hits a test that names the restriction, and any future
    # restoration of the per-pass node left-join flips this assertion
    # deliberately rather than silently.
    edges = [(0, 1), (1, 2), (2, 1)]  # 0 is a pure source; 1,2 form a cycle
    edf = spark.createDataFrame(edges, "s long, d long")
    got = {r["doc_id"]: r["rank"] for r in pagerank_ranks(spark, edf, iters=4).collect()}
    assert set(got) == {1, 2}, (
        "documented contract: nodes without in-edges drop out; symmetrize "
        "the edge list (as dedup_pagerank_representatives does) for full "
        "node coverage"
    )
    # on the CONTRACT-SATISFYING symmetrization of the same graph, every
    # node survives and mass is conserved
    sym = edges + [(d, s) for s, d in edges]
    sdf = spark.createDataFrame(sorted(set(sym)), "s long, d long")
    got_sym = {
        r["doc_id"]: r["rank"] for r in pagerank_ranks(spark, sdf, iters=4).collect()
    }
    assert set(got_sym) == {0, 1, 2}
    assert sum(got_sym.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_star_hub_dominates(spark):
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    edf = spark.createDataFrame(edges, "s long, d long")
    got = {r["doc_id"]: r["rank"] for r in pagerank_ranks(spark, edf).collect()}
    assert got[0] > 3 * max(got[i] for i in range(1, 6))


def test_pagerank_representatives_invariants(spark, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    reps = QUERIES["dedup_pagerank_representatives"](spark, sf_dir).collect()
    assert reps
    comp = {
        r["doc_id"]: r["component_id"]
        for r in QUERIES["dedup_connected_components"](spark, sf_dir).collect()
    }
    # one representative per component, and it belongs to its component
    assert len({r["component_id"] for r in reps}) == len(reps)
    assert {r["component_id"] for r in reps} == set(comp.values())
    for r in reps:
        assert comp[r["representative_id"]] == r["component_id"]
        assert r["pagerank"] > 0


def test_connected_components_converges_on_deep_chain(spark):
    # Adversarial diameter: a 30-node path graph needs ~29 propagation
    # passes — LSH near-dup cliques never exercise this. The loop must
    # converge (cap is 40) and label every node with the chain min.
    from etl_mri_scripts_spark.queries.dedup import connected_component_labels

    n = 30
    chain = [(i, i + 1) for i in range(n - 1)] + [(i + 1, i) for i in range(n - 1)]
    # two extra singleton-pair components to prove separation
    chain += [(100, 101), (101, 100), (200, 201), (201, 200)]
    edges = spark.createDataFrame(chain, "s long, d long")
    labs = {r["node"]: r["lab"] for r in connected_component_labels(edges).collect()}
    assert all(labs[i] == 0 for i in range(n))
    assert labs[100] == labs[101] == 100
    assert labs[200] == labs[201] == 200


def test_connected_components_raises_beyond_diameter_cap(spark):
    from etl_mri_scripts_spark.queries.dedup import (
        CC_MAX_PASSES,
        connected_component_labels,
    )

    n = CC_MAX_PASSES + 5  # path deeper than the cap
    chain = [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)]
    edges = spark.createDataFrame(chain, "s long, d long")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_component_labels(edges)


def test_pointer_jumping_converges_on_chain_beyond_propagation_cap(spark):
    # The graph that makes plain propagation raise (diameter > CC_MAX_PASSES)
    # must converge under pointer jumping in ~2*log2(d) passes — this is
    # the 100-TB deep-graph path (cross-shard URL chains).
    from etl_mri_scripts_spark.queries.dedup import (
        CC_MAX_PASSES,
        connected_component_labels_jump,
    )

    n = 3 * CC_MAX_PASSES  # diameter 120 > the 40-pass propagation cap
    chain = [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)]
    chain += [(500, 501), (501, 500)]  # separate component
    edges = spark.createDataFrame(chain, "s long, d long")
    labs = {r["node"]: r["lab"] for r in connected_component_labels_jump(edges).collect()}
    assert all(labs[i] == 0 for i in range(n + 1))
    assert labs[500] == labs[501] == 500


def test_pointer_jumping_equivalent_to_propagation_on_random_graphs(spark):
    # Property: both engines produce identical component labels on random
    # sparse graphs (the regime the LSH near-dup graph lives in).
    from etl_mri_scripts_spark.queries.dedup import (
        connected_component_labels,
        connected_component_labels_jump,
    )

    x = 12345
    for trial in range(3):
        pairs = set()
        for _ in range(60):
            x = (x * 1103515245 + 12345) % (2**31)
            a = x % 40
            x = (x * 1103515245 + 12345) % (2**31)
            b = x % 40
            if a != b:
                pairs.add((a, b))
        sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        edges = spark.createDataFrame(sym, "s long, d long")
        prop = {r["node"]: r["lab"] for r in connected_component_labels(edges).collect()}
        jump = {
            r["node"]: r["lab"] for r in connected_component_labels_jump(edges).collect()
        }
        assert prop == jump, f"trial {trial}: label divergence"


def test_staged_auto_cc_matches_on_shallow_and_deep(spark):
    # The registered query's engine: propagation-stage result on shallow
    # graphs, pointer-jumping escalation on deep ones — identical labels
    # either way.
    from etl_mri_scripts_spark.queries.dedup import (
        CC_MAX_PASSES,
        connected_component_labels_auto,
    )

    # shallow: two triangles sharing a vertex
    tri = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (10, 11)]
    sym = tri + [(b, a) for a, b in tri]
    labs = {
        r["node"]: r["lab"]
        for r in connected_component_labels_auto(
            spark.createDataFrame(sym, "s long, d long")
        ).collect()
    }
    assert all(labs[i] == 0 for i in range(5))
    assert labs[10] == labs[11] == 10

    # deep: chain beyond the propagation cap
    n = 2 * CC_MAX_PASSES
    chain = [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)]
    labs = {
        r["node"]: r["lab"]
        for r in connected_component_labels_auto(
            spark.createDataFrame(chain, "s long, d long")
        ).collect()
    }
    assert all(labs[i] == 0 for i in range(n + 1))


def test_large_star_small_star_matches_propagation(spark):
    # The canonical Kiveris et al. edge-rewriting engine must agree with
    # min-label propagation on random sparse graphs, a deep chain, and
    # the two-node component.
    from etl_mri_scripts_spark.queries.dedup import (
        connected_component_labels,
        connected_component_labels_star,
    )

    x = 99991
    for trial in range(3):
        pairs = set()
        for _ in range(50):
            x = (x * 1103515245 + 12345) % (2**31)
            a = x % 30
            x = (x * 1103515245 + 12345) % (2**31)
            b = x % 30
            if a != b:
                pairs.add((a, b))
        sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        edges = spark.createDataFrame(sym, "s long, d long")
        prop = {r["node"]: r["lab"] for r in connected_component_labels(edges).collect()}
        star = {
            r["node"]: r["lab"]
            for r in connected_component_labels_star(edges).collect()
        }
        assert prop == star, f"trial {trial}: label divergence"


def test_large_star_small_star_deep_chain(spark):
    from etl_mri_scripts_spark.queries.dedup import (
        CC_MAX_PASSES,
        connected_component_labels_star,
    )

    n = 3 * CC_MAX_PASSES  # diameter 120, converges in O(log n) rounds
    chain = [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)]
    chain += [(7000, 7001), (7001, 7000)]
    edges = spark.createDataFrame(chain, "s long, d long")
    labs = {
        r["node"]: r["lab"] for r in connected_component_labels_star(edges).collect()
    }
    assert all(labs[i] == 0 for i in range(n + 1))
    assert labs[7000] == labs[7001] == 7000
