"""Graph analytics (operators/graphalg.py): fixed-iteration PageRank and
degree stats, pinned against an independent dict-based reference."""

import pytest

from neosemantics_spark.operators.graphalg import (
    degree_stats,
    k_hop,
    label_propagation,
    pagerank,
)


def _pagerank_ref(edges, damping=0.85, iters=5):
    """Dict-based replay of the same synchronous formulation."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if v not in outdeg)
        in_c = {v: 0.0 for v in nodes}
        for u, v in e:
            in_c[v] += rank[u] / outdeg[u]
        rank = {
            v: (1.0 - damping) / n + damping * (in_c[v] + dang / n)
            for v in nodes
        }
    import math

    return {v: math.floor(r * 1000 * 10000 + 0.5) / 10000 for v, r in rank.items()}


@pytest.fixture(scope="module")
def edges(spark):
    # a→b→c→a cycle, d→a chain, e dangling (in-edges only), parallel
    # a→b duplicate (must count once), self-loop f→f
    rows = [
        ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("a", "e"), ("f", "f"),
    ]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_pagerank_matches_reference(spark, edges):
    got = {r["uri"]: r["rank_x1000"] for r in pagerank(edges).collect()}
    want = _pagerank_ref(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("a", "e"), ("f", "f")]
    )
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-4), v
    # structure sanity: the cycle members outrank the dangling sink's
    # feeder d (which only ever holds the teleport floor)
    assert got["a"] > got["d"] and got["b"] > got["d"]
    # conservation: scaled ranks sum to ~1000
    assert sum(got.values()) == pytest.approx(1000.0, abs=0.5)


def test_pagerank_guards(spark, edges):
    with pytest.raises(ValueError, match="iters"):
        pagerank(edges, iters=0)
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_k_hop_out(spark, edges):
    seeds = spark.createDataFrame([("d",), ("e",)], ["uri"])
    got = {r["uri"]: r["hop"] for r in k_hop(edges, seeds, k=3).collect()}
    # d→a (1), a→{b,e} (2), b→c (3); e has no out-edges but is a seed
    assert got == {"d": 0, "e": 0, "a": 1, "b": 2, "c": 3}
    # min-distance: e is reachable at hop 2 via a but stays a hop-0 seed
    shallow = {r["uri"]: r["hop"] for r in k_hop(edges, seeds, k=1).collect()}
    assert shallow == {"d": 0, "e": 0, "a": 1}


def test_k_hop_directions_and_guards(spark, edges):
    seeds = spark.createDataFrame([("e",)], ["uri"])
    got_in = {r["uri"]: r["hop"] for r in k_hop(edges, seeds, k=2, direction="in").collect()}
    # e←a (1), a←{c,d} (2)
    assert got_in == {"e": 0, "a": 1, "c": 2, "d": 2}
    got_both = {r["uri"]: r["hop"] for r in k_hop(edges, seeds, k=1, direction="both").collect()}
    assert got_both == {"e": 0, "a": 1}
    # early termination: frontier dries up before k
    assert k_hop(edges, seeds, k=99, direction="out").count() == 1
    with pytest.raises(ValueError, match="k must"):
        k_hop(edges, seeds, k=-1)
    with pytest.raises(ValueError, match="direction"):
        k_hop(edges, seeds, k=1, direction="sideways")


def test_label_propagation(spark):
    # two triangles bridged by one edge: LPA pulls each triangle to its
    # min member; the bridge is outvoted 1:2 on both sides
    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
        ("lone", "lone"),  # self-loop-only node: dropped (no real nbrs)
    ]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {r["uri"]: r["community"] for r in label_propagation(e, iters=4).collect()}
    assert "lone" not in got
    # each triangle is internally uniform and the two stay distinct
    # (the bridge leaks the LABEL "c" into the x side — membership holds)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "c"
    with pytest.raises(ValueError, match="iters"):
        label_propagation(e, iters=0)


def test_label_propagation_tie_break(spark):
    # p's neighbors split 1:1 between labels "a" and "b" every round —
    # the lexicographic tie-break must pick "a" deterministically
    e = spark.createDataFrame([("a", "p"), ("b", "p")], ["src", "dst"])
    got = {r["uri"]: r["community"] for r in label_propagation(e, iters=1).collect()}
    assert got["p"] == "a"
    # a and b each have the single neighbor p, so they adopt "p"
    assert got["a"] == got["b"] == "p"


def test_degree_stats(spark, edges):
    got = {
        r["uri"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(edges).collect()
    }
    # parallel a→b counted once
    assert got["a"] == (2, 2)   # a→b, a→e; c→a, d→a
    assert got["b"] == (1, 1)
    assert got["d"] == (1, 0)
    assert got["e"] == (0, 1)   # dangling
    assert got["f"] == (1, 1)   # self-loop


def test_triangle_stats_basic(spark):
    from neosemantics_spark.operators.graphalg import triangle_stats

    # K4 on a,b,c,d (4 triangles, every node in 3) plus a pendant p off a
    # and a self-loop (dropped); edge directions scrambled on purpose
    rows = [
        ("a", "b"), ("c", "a"), ("a", "d"),
        ("b", "c"), ("d", "b"), ("c", "d"),
        ("d", "c"),            # parallel reverse edge: same undirected edge
        ("p", "a"),
        ("b", "b"),            # self-loop: dropped
    ]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {r["uri"]: r for r in triangle_stats(e).collect()}
    for v in "abcd":
        assert got[v]["triangles"] == 3
    assert got["a"]["degree"] == 4 and got["b"]["degree"] == 3
    # a: 3 triangles over C(4,2)=6 nbr pairs -> 0.5; b,c,d: 3/3 = 1.0
    assert got["a"]["lcc"] == 0.5
    assert got["b"]["lcc"] == 1.0 and got["c"]["lcc"] == 1.0
    assert got["p"]["triangles"] == 0 and got["p"]["lcc"] == 0.0
    assert got["p"]["degree"] == 1


def test_triangle_stats_path_no_triangles(spark):
    from neosemantics_spark.operators.graphalg import triangle_stats

    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    got = {r["uri"]: r for r in triangle_stats(e).collect()}
    assert all(r["triangles"] == 0 for r in got.values())
    assert got["b"]["lcc"] == 0.0 and got["b"]["degree"] == 2
    assert got["a"]["lcc"] == 0.0  # degree 1 -> defined as 0


def test_neighborhood_similarity(spark):
    from neosemantics_spark.operators.graphalg import neighborhood_similarity

    # a and b share neighbors {x, y}; a also has z, b also has w
    # N(a)={x,y,z}, N(b)={x,y,w} -> J(a,b) = 2/4 = 0.5
    rows = [("a", "x"), ("a", "y"), ("a", "z"), ("x", "b"), ("b", "y"), ("b", "w")]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {(r["a"], r["b"]): r for r in neighborhood_similarity(e).collect()}
    r = got[("a", "b")]
    assert r["intersection"] == 2 and r["jaccard"] == 0.5
    # x and y share neighbors {a, b}: J = 2/2 = 1.0
    assert got[("x", "y")]["jaccard"] == 1.0
    # threshold drops sub-threshold pairs, keeps the rest
    kept = neighborhood_similarity(e, min_jaccard=0.6).collect()
    assert {(r["a"], r["b"]) for r in kept} == {("x", "y")} | {
        (a, b) for (a, b), r in got.items() if r["jaccard"] >= 0.6
    }


def test_k_core_peels_cascade(spark):
    from neosemantics_spark.operators.graphalg import k_core

    # K4 on a,b,c,d + pendant chain q-p hanging off a: k=2 must peel p
    # (deg 1), THEN q (deg 1 after p goes) — a two-round cascade
    rows = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("a", "q"), ("q", "p"),
    ]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {r["uri"]: r["core_degree"] for r in k_core(e, k=2, rounds=8).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # k=3: same core; k=4: nothing survives (K4 degrees are 3)
    assert {r["uri"] for r in k_core(e, k=3, rounds=8).collect()} == {"a", "b", "c", "d"}
    assert k_core(e, k=4, rounds=8).count() == 0
    # bounded rounds: one round only peels p, so q survives with deg 1
    # recomputed over the surviving edge set -> filtered by the final
    # deg >= k cut; a second round's peel is what removes q's edge
    one = {r["uri"] for r in k_core(e, k=2, rounds=1).collect()}
    assert "p" not in one and "q" not in one


def test_k_core_chain_to_empty(spark):
    from neosemantics_spark.operators.graphalg import k_core

    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    e = spark.createDataFrame(chain, ["src", "dst"])
    assert k_core(e, k=2, rounds=8).count() == 0
    # triangle at the end of a tail: the 2-core is exactly the triangle
    rows = chain + [("e", "f"), ("f", "d")]
    e2 = spark.createDataFrame(rows, ["src", "dst"])
    got = {r["uri"]: r["core_degree"] for r in k_core(e2, k=2, rounds=8).collect()}
    assert got == {"d": 2, "e": 2, "f": 2}


def test_personalized_pagerank_mass_and_locality(spark):
    from pyspark.sql import functions as F

    from neosemantics_spark.operators.graphalg import personalized_pagerank

    # two disjoint 3-cycles; seed in cycle 1 only -> cycle 2 gets zero
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")]
    e = spark.createDataFrame(rows, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["uri"])
    out = personalized_pagerank(e, seeds, iters=8)
    got = {r["uri"]: r["ppr_x1000"] for r in out.collect()}
    assert got["x"] == got["y"] == got["z"] == 0.0
    assert got["a"] > got["b"] > 0 and got["c"] > 0
    # total mass conserved (no dangling here): sum = 1000 within round4 grid
    total = sum(got.values())
    assert abs(total - 1000.0) < 0.01
    # seed outside the graph -> error when no seed remains
    import pytest

    lonely = spark.createDataFrame([("nope",)], ["uri"])
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(e, lonely)
