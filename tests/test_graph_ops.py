"""Iterative graph operators: subclass closure + connected components."""

from pyspark.sql import functions as F

from tabbyld_spark.fixtures.kg import CLASS_TREE, DBO
from tabbyld_spark.operators.closure import subclass_closure
from tabbyld_spark.operators.components import connected_components, same_as_edges


def test_subclass_closure_matches_fixture(spark, kg):
    """Recomputing the closure from direct edges must reproduce the fixture's
    precomputed dbo-class closure (child, parent, depth)."""
    direct = spark.createDataFrame(
        [(DBO + c, DBO + p) for c, p in CLASS_TREE.items() if p is not None],
        "child string, parent string",
    )
    got = {
        (r["child"], r["parent"]): r["depth"]
        for r in subclass_closure(direct).collect()
    }
    # fixture closure minus its owl:Thing rows (Thing is not a direct edge)
    want = {
        (r.child, r.parent): r.depth
        for r in kg.subclass.itertuples()
        if not r.parent.endswith("owl#Thing") and not r.child.endswith("owl#Thing")
    }
    assert got == want


def test_closure_chain_depths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "child string, parent string"
    )
    got = {(r["child"], r["parent"]): r["depth"] for r in subclass_closure(edges).collect()}
    assert got[("a", "e")] == 4
    assert got[("a", "c")] == 2
    assert got[("a", "a")] == 0
    assert len(got) == 5 + 4 + 3 + 2 + 1  # all self + all ancestor pairs


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "a")],
        "src string, dst string",
    )
    labels = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert labels["a"] == labels["b"] == labels["c"] == labels["p"] == labels["r"] == "a"
    assert labels["x"] == labels["y"] == "x"


def test_connected_components_star_skew(spark):
    """One hot hub with 500 spokes (the skew shape) converges in few rounds."""
    edges = spark.createDataFrame(
        [("hub", f"n{i:03d}") for i in range(500)], "src string, dst string"
    )
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1


def test_connected_components_salted_identical(spark):
    """Salting is a physical rebalancing only — labels must be identical to
    the unsalted run on a skewed star + chain graph."""
    rows = [("hub", f"n{i:03d}") for i in range(300)] + [
        ("n000", "m1"), ("m1", "m2"), ("x", "y")
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    plain = sorted(map(tuple, connected_components(edges, salt=1).collect()))
    salted = sorted(map(tuple, connected_components(edges, salt=4).collect()))
    assert plain == salted


def test_same_as_edges_star_topology(spark):
    cea = spark.createDataFrame(
        [
            ("t1", "DATA", "Paris", "Paris", "e:P"),
            ("t2", "DATA", "Pariss", "Pariss", "e:P"),
            ("t3", "ROW", "Paris", "Paris", "e:P"),
            ("t1", "DATA", "Rome", "Rome", "e:R"),
        ],
        "table_id string, col_role string, mention string, mention_norm string, entity string",
    )
    edges = same_as_edges(cea)
    # 3 cells for e:P → hub + 2 spokes; single cell for e:R → no edge
    assert edges.count() == 2
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1


# --------------------------------------------------------------------------
# PageRank (operators/graphrank.py)
# --------------------------------------------------------------------------

def _np_pagerank(edges, d=0.85, iters=10):
    """Independent dense power-iteration oracle (same dangling handling)."""
    import numpy as np

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, []).append(v)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dang = sum(r[idx[u]] for u in nodes if u not in out)
        nxt += d * dang / n
        for u, vs in out.items():
            w = d * r[idx[u]] / len(vs)
            for v in vs:
                nxt[idx[v]] += w
        r = nxt
    return {v: r[idx[v]] for v in nodes}


_PR_EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "d"), ("e", "c"), ("f", "e"),
    # g is a dangling sink (in-edges only); h isolated-with-out-edge
    ("a", "g"), ("d", "g"), ("h", "a"),
]


def test_pagerank_matches_numpy_oracle(spark):
    from tabbyld_spark.operators.graphrank import pagerank

    edges = spark.createDataFrame(_PR_EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    want = _np_pagerank(_PR_EDGES, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # probability mass preserved by the dangling redistribution
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_zero_iterations_is_uniform_and_resharding_invariant(spark):
    from tabbyld_spark.operators.graphrank import pagerank

    edges = spark.createDataFrame(_PR_EDGES, "src string, dst string")
    n = len({u for u, _ in _PR_EDGES} | {v for _, v in _PR_EDGES})
    uni = {r["node"]: r["rank"] for r in pagerank(edges, iterations=0).collect()}
    assert all(abs(v - 1.0 / n) < 1e-15 for v in uni.values())
    a = pagerank(edges, iterations=6, round_to=9).collect()
    b = pagerank(edges.repartition(7), iterations=6, round_to=9).collect()
    assert sorted((r["node"], r["rank"]) for r in a) == sorted(
        (r["node"], r["rank"]) for r in b
    )


def test_triangle_counts_hand_graph(spark):
    """K4 on {a,b,c,d} + a pendant e: every K4 node closes 3 triangles
    (clustering 1.0), the pendant closes none; direction/duplicate edges
    collapse first."""
    import pytest

    from tabbyld_spark.operators.graphrank import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
         ("b", "d"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = {r.node: (r.triangles, r.degree, r.clustering) for r in triangle_counts(edges).collect()}
    for n in "abc":
        assert out[n] == (3, 3, 1.0), n
    assert out["d"][:2] == (3, 4) and out["d"][2] == pytest.approx(0.5)
    assert out["e"] == (0, 1, 0.0)


def test_triangle_counts_matches_bruteforce_and_hub_guard(spark):
    import itertools
    import random as _r

    from tabbyld_spark.operators.graphrank import triangle_counts

    rng = _r.Random(7)
    nodes = [f"n{i}" for i in range(14)]
    und = {tuple(sorted(p)) for p in itertools.combinations(nodes, 2) if rng.random() < 0.3}
    edges = spark.createDataFrame(sorted(und), "src string, dst string")
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v); adj[v].add(u)
    for n in nodes:
        want = sum(1 for x, y in itertools.combinations(sorted(adj[n]), 2) if y in adj[x])
        assert got.get(n, 0) == want, n
    # hub guard: max_deg below the hub's degree removes it AND its triangles
    hubbed = edges.unionByName(
        spark.createDataFrame([("hub", n) for n in nodes], "src string, dst string")
    )
    capped = triangle_counts(hubbed, max_deg=13)
    assert capped.filter(F.col("node") == "hub").count() == 0
    got2 = {r.node: r.triangles for r in capped.collect()}
    for n in nodes:  # original triangles unchanged once the hub is dropped
        assert got2.get(n, 0) == got.get(n, 0), n


# ---------------------------------------------------------------------------
# label propagation (community detection)
# ---------------------------------------------------------------------------


def _ref_lpa(edge_list, iterations):
    # independent pure-Python reference: synchronous rounds, self-vote,
    # (count desc, label asc) tiebreak — the operator's documented contract
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v in adj:
            votes = {}
            votes[labels[v]] = votes.get(labels[v], 0) + 1
            for u in adj[v]:
                votes[labels[u]] = votes.get(labels[u], 0) + 1
            new[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


def test_label_propagation_matches_reference(spark):
    import random

    from tabbyld_spark.operators.graphrank import label_propagation

    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(40)]
    edge_list = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    for iters in (1, 3, 6):
        got = {
            r.node: r.community
            for r in label_propagation(edges, iterations=iters).collect()
        }
        assert got == _ref_lpa(edge_list, iters), iters


def test_label_propagation_two_cliques_bridge(spark):
    from tabbyld_spark.operators.graphrank import label_propagation

    # two 4-cliques joined by one bridge edge: each clique converges to
    # its own min-id label
    def clique(prefix):
        ids = [f"{prefix}{i}" for i in range(4)]
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]

    edges = spark.createDataFrame(
        clique("a") + clique("b") + [("a0", "b0")], "src string, dst string"
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, iterations=6).collect()
    }
    assert {got[f"a{i}"] for i in range(4)} == {"a0"}
    assert {got[f"b{i}"] for i in range(1, 4)} == {"b0"}


def test_label_propagation_deterministic_under_resharding(spark):
    import random

    from tabbyld_spark.operators.graphrank import label_propagation

    rng = random.Random(5)
    edge_list = sorted(
        {
            (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")
            for _ in range(80)
        }
    )
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    a = sorted(
        (r.node, r.community)
        for r in label_propagation(edges, iterations=4).collect()
    )
    b = sorted(
        (r.node, r.community)
        for r in label_propagation(edges.repartition(11), iterations=4).collect()
    )
    assert a == b
