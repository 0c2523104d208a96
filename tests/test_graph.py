"""Connected-components goldens: known graphs -> known clusters."""

from __future__ import annotations

from fhir_to_lakehouse_spark.functions.graph import (
    connected_components,
    dedup_keep_canonical,
)


def comps(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_two_disjoint_components(spark):
    got = comps(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_to_min(spark):
    # a 6-node path: propagation needs multiple iterations
    got = comps(spark, [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)])
    assert got == {i: 0 for i in range(6)}


def test_cycle_and_bridge(spark):
    got = comps(spark, [(1, 2), (2, 3), (3, 1), (3, 7), (8, 9)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 8: 8, 9: 8}


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5), (1, 2)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    # components {0,3,5}->0 and {1,2}->1; 4 unpaired
    assert kept == [0, 1, 4]


def test_unconverged_chain_raises_not_silently_wrong(spark):
    """A chain longer than the iteration budget must not return split
    components as if they were the truth (ADVICE: silent unconvergence)."""
    import pytest

    from fhir_to_lakehouse_spark.functions.graph import (
        UnconvergedComponentsError,
        connected_components,
    )

    # path graph 0-1-2-3-4: min-label travels one hop per round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a int, id_b int"
    )
    with pytest.raises(UnconvergedComponentsError):
        connected_components(edges, max_iterations=2)
    with pytest.warns(RuntimeWarning):
        connected_components(
            edges, max_iterations=2, on_unconverged="warn"
        ).collect()
    # with budget, the same chain converges to one component
    comps = connected_components(edges, max_iterations=6).collect()
    assert {r["component"] for r in comps} == {0}


def test_connected_components_validates_arguments(spark):
    import pytest as _pytest

    from fhir_to_lakehouse_spark.functions.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="on_unconverged"):
        connected_components(edges, on_unconverged="error")
    with _pytest.raises(ValueError, match="max_iterations"):
        connected_components(edges, max_iterations=0)


def test_pagerank_dangling_node_hand_computed(spark):
    """A -> B with B dangling: after one iteration with d=0.85,
    r(A) = 0.15/2 + 0.85*(0 + dm/2) and r(B) = 0.15/2 + 0.85*(0.5 + dm/2)
    with dangling mass dm = r0(B) = 0.5."""
    from fhir_to_lakehouse_spark.functions.graph import pagerank

    edges = spark.createDataFrame([("A", "B", 1)], "src string, dst string, w long")
    got = {r.node: r.r for r in pagerank(edges, iterations=1).collect()}
    assert abs(got["A"] - (0.075 + 0.85 * 0.25)) < 1e-9
    assert abs(got["B"] - (0.075 + 0.85 * 0.75)) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_rejects_zero_iterations(spark):
    from fhir_to_lakehouse_spark.functions.graph import pagerank

    edges = spark.createDataFrame([("A", "B", 1)], "src string, dst string, w long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(edges, iterations=0)


def test_bfs_hops_chain_cycle_and_cap(spark):
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    # chain with a back-edge (cycle): A->B->C->D, D->A
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")], "src string, dst string"
    )
    got = {r.node: r.hops for r in bfs_hops(edges, seed="A", max_hops=2).collect()}
    assert got == {"A": 0, "B": 1, "C": 2}  # D beyond cap; cycle no infinite loop
    full = {r.node: r.hops for r in bfs_hops(edges, seed="A", max_hops=10).collect()}
    assert full == {"A": 0, "B": 1, "C": 2, "D": 3}  # early exit at frontier drain


def test_bfs_hops_min_hop_wins_on_diamond(spark):
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    # two paths to D: A->D (1 hop) and A->B->C->D (3 hops) -> min is 1
    edges = spark.createDataFrame(
        [("A", "D"), ("A", "B"), ("B", "C"), ("C", "D")], "src string, dst string"
    )
    got = {r.node: r.hops for r in bfs_hops(edges, seed="A", max_hops=3).collect()}
    assert got["D"] == 1


# --- iterative-join strategy switch (VERDICT r4 item 1) ---------------

_TRADE_EDGES = [
    (a, b, 1 + (a * 7 + b * 3) % 5)
    for a in range(12)
    for b in range(12)
    if a != b and (a + b) % 3 == 0
]


def _pagerank_ranks(spark, **kw):
    from fhir_to_lakehouse_spark.functions.graph import pagerank

    edges = spark.createDataFrame(_TRADE_EDGES, "src long, dst long, w long")
    return {
        r.node: round(r.r, 9) for r in pagerank(edges, iterations=3, **kw).collect()
    }


def test_pagerank_broadcast_and_shuffle_strategies_agree(spark):
    bcast = _pagerank_ranks(spark, broadcast_threshold=True)
    shuffle = _pagerank_ranks(spark, broadcast_threshold=False)
    auto_small = _pagerank_ranks(spark, broadcast_threshold=1_000_000)
    auto_forced = _pagerank_ranks(spark, broadcast_threshold=3)  # |V|=12 > 3
    assert bcast == shuffle == auto_small == auto_forced
    assert abs(sum(bcast.values()) - 1.0) < 1e-9


def test_bfs_broadcast_and_shuffle_strategies_agree(spark):
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame(
        [(a, b) for a, b, _ in _TRADE_EDGES], "src long, dst long"
    )
    runs = [
        {r.node: r.hops for r in bfs_hops(edges, seed=0, max_hops=4, **kw).collect()}
        for kw in (
            {"broadcast_threshold": True},
            {"broadcast_threshold": False},
            # per-round adaptivity: hop 1 frontier exceeds 2 rows, so the
            # run mixes a broadcast round with shuffle rounds
            {"broadcast_threshold": 2},
        )
    ]
    assert runs[0] == runs[1] == runs[2]


def test_pagerank_threshold_bool_is_not_treated_as_int(spark):
    """True must mean 'always broadcast', never 'threshold of 1 row'."""
    from fhir_to_lakehouse_spark.functions.graph import _small_enough_to_broadcast

    assert _small_enough_to_broadcast(10**12, True) is True
    assert _small_enough_to_broadcast(0, False) is False
    assert _small_enough_to_broadcast(5, 5) is True
    assert _small_enough_to_broadcast(6, 5) is False


# --- large-star/small-star CC (round 5: adversarial diameters) --------


def _cc_star(spark, pairs, **kw):
    from fhir_to_lakehouse_spark.functions.graph import connected_components_star

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r.node: r.component
        for r in connected_components_star(edges, **kw).collect()
    }


def test_star_cc_matches_label_propagation_on_random_graphs(spark):
    import random

    from fhir_to_lakehouse_spark.functions.graph import connected_components

    rng = random.Random(7)
    for trial in range(3):
        pairs = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(45)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        want = {
            r.node: r.component
            for r in connected_components(edges, max_iterations=40).collect()
        }
        got = _cc_star(spark, pairs)
        assert got == want, f"trial {trial}: star CC diverges"


def test_star_cc_converges_on_long_chain_in_log_rounds(spark):
    """A 60-hop chain needs 60 label-propagation rounds but only
    O(log 60) star rounds — the documented adversarial-diameter case
    (functions/graph.py module docstring) is now executable."""
    chain = [(i, i + 1) for i in range(60)]
    got = _cc_star(spark, chain, max_rounds=8)
    assert got == {i: 0 for i in range(61)}


def test_star_cc_handles_singleton_free_duplicates_and_self_loops(spark):
    pairs = [(5, 5), (1, 2), (2, 1), (8, 9)]  # self-loop + dup edges
    got = _cc_star(spark, pairs)
    assert got == {5: 5, 1: 1, 2: 1, 8: 8, 9: 8}


def test_star_cc_rejects_bad_args(spark):
    import pytest as _pytest

    from fhir_to_lakehouse_spark.functions.graph import connected_components_star

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="max_rounds"):
        connected_components_star(edges, max_rounds=0)
    with _pytest.raises(ValueError, match="on_unconverged"):
        connected_components_star(edges, on_unconverged="ignore")


def test_connected_components_recomputes_after_cache_eviction(spark):
    """ADVICE r5 (graph.py): a checkpointed round's blocks must stay
    live until a NEWER round's checkpoint truncates downstream lineage.
    Simulate total cache eviction by unpersisting the returned labels
    and force a recompute — lineage must end at a LIVE checkpoint
    LogicalRDD, not one whose blocks were released mid-loop (which
    made this collect raise block-not-found instead of recomputing)."""
    from fhir_to_lakehouse_spark.functions.graph import connected_components

    # a 10-node path graph: min-label propagation needs ~9 rounds, so
    # the loop crosses two checkpoint rounds (i=3 and i=7) with
    # persisted-only rounds in between
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a int, id_b int"
    )
    labels = connected_components(edges, max_iterations=15)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(10)}
    # evict every cached round, keeping only checkpoint blocks
    labels.unpersist(blocking=True)
    regot = {r["node"]: r["component"] for r in labels.collect()}
    assert regot == got


# --- chunked expansion (r7 verdict item 4: sync_every) -----------------


def test_bfs_hops_sync_every_matches_level_synchronous(spark):
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    # chain + back-edge cycle + diamond shortcut in one graph: the
    # chunked lazy expansion (no per-level anti-join) must produce the
    # SAME min-hop map as classic level-synchronous BFS
    edges = spark.createDataFrame(
        [
            ("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"),
            ("E", "A"),            # cycle back to the seed
            ("B", "E"),            # shortcut: E at 2, not 4
            ("C", "B"),            # in-chunk revisit bait
        ],
        "src string, dst string",
    )
    base = {
        r.node: r.hops
        for r in bfs_hops(edges, seed="A", max_hops=6).collect()
    }
    for k in (2, 3, 4, 7):
        got = {
            r.node: r.hops
            for r in bfs_hops(
                edges, seed="A", max_hops=6, sync_every=k
            ).collect()
        }
        assert got == base, f"sync_every={k} diverged: {got} != {base}"


def test_bfs_hops_sync_every_respects_max_hops(spark):
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    # cap mid-chunk: max_hops=3 with sync_every=2 -> chunks of 2+1
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E")],
        "src string, dst string",
    )
    got = {
        r.node: r.hops
        for r in bfs_hops(edges, seed="A", max_hops=3, sync_every=2).collect()
    }
    assert got == {"A": 0, "B": 1, "C": 2, "D": 3}
