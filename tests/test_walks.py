"""Deterministic random walks (operators/walks.py) pinned against an
independent pure-Python reference (iterative-op contract): exact corpus
equality, sink termination, hub truncation, and reshard determinism."""

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.walks import adjacency, random_walks, walk_paths

EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "a"),
    ("c", "a"),
    ("d", "e"),          # e is a sink: walks entering e stop
    ("f", "f"),          # self-loop
]


def _u(seed, walk_id, t, node):
    h = hashlib.md5(f"{seed}:{walk_id}:{t}:{node}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def _ref_walks(edges, walk_len, walks_per_node, seed="walk", max_deg=10_000):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    adj = {n: sorted(v)[:max_deg] for n, v in adj.items()}
    rows = []
    for n in adj:
        for k in range(walks_per_node):
            wid = f"{n}#{k}"
            cur = n
            rows.append((wid, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[int(_u(seed, wid, t, cur) * len(nbrs))]
                rows.append((wid, t, cur))
    return sorted(rows)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_adjacency_sorted_and_truncated(edges_df):
    adj = {r.node: r.nbrs for r in adjacency(edges_df).collect()}
    assert adj["a"] == ["b", "c", "d"]
    assert "e" not in adj  # sink: no out-edges
    adj2 = {r.node: r.nbrs for r in adjacency(edges_df, max_deg=2).collect()}
    assert adj2["a"] == ["b", "c"]  # lexicographic prefix


def test_walk_corpus_matches_reference_exactly(edges_df):
    got = sorted(
        (r.walk_id, r.step, r.node)
        for r in random_walks(edges_df, walk_len=5, walks_per_node=2).collect()
    )
    assert got == _ref_walks(EDGES, walk_len=5, walks_per_node=2)
    assert len(got) > 20


def test_sink_terminates_walk(edges_df):
    rows = random_walks(edges_df, walk_len=6, walks_per_node=1).collect()
    d_walk = sorted((r.step, r.node) for r in rows if r.walk_id == "d#0")
    # d → e, then e has no out-edges: exactly two rows
    assert d_walk == [(0, "d"), (1, "e")]


def test_self_loop_walks_forever(edges_df):
    rows = [r for r in random_walks(edges_df, walk_len=4).collect() if r.walk_id == "f#0"]
    assert sorted((r.step, r.node) for r in rows) == [(t, "f") for t in range(5)]


def test_deterministic_under_resharding_and_seed(edges_df):
    a = sorted(map(tuple, random_walks(edges_df, walk_len=4).collect()))
    b = sorted(map(tuple, random_walks(edges_df.repartition(5), walk_len=4).collect()))
    assert a == b
    c = sorted(map(tuple, random_walks(edges_df, walk_len=4, seed="other").collect()))
    assert a != c  # different seed ⇒ different corpus (same row universe roots)


def test_skipgram_pairs_match_reference(edges_df):
    from tabbyld_spark.operators.walks import skipgram_pairs

    walks = random_walks(edges_df, walk_len=4, walks_per_node=2)
    got = {(r.center, r.context): r.n for r in skipgram_pairs(walks, window=2).collect()}
    want = defaultdict(int)
    by_walk = defaultdict(list)
    for wid, t, n in _ref_walks(EDGES, walk_len=4, walks_per_node=2):
        by_walk[wid].append((t, n))
    for seq in by_walk.values():
        seq.sort()
        for i, (ti, ni) in enumerate(seq):
            for tj, nj in seq:
                if ti != tj and abs(ti - tj) <= 2:
                    want[(ni, nj)] += 1
    assert got == dict(want)


def _ref_node2vec(edges, walk_len, walks_per_node, p, q, seed="n2v", max_deg=10_000):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    adj = {n: sorted(v)[:max_deg] for n, v in adj.items()}
    rows = []
    for n in adj:
        for k in range(walks_per_node):
            wid = f"{n}#{k}"
            prev, cur = None, n
            rows.append((wid, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    w = [1.0] * len(nbrs)
                else:
                    pn = set(adj.get(prev, []))
                    w = [
                        1.0 / p if x == prev else (1.0 if x in pn else 1.0 / q)
                        for x in nbrs
                    ]
                cum, acc = [], 0.0
                for x in w:
                    acc += x
                    cum.append(acc)
                target = _u(seed, wid, t, cur) * cum[-1]
                idx = sum(1 for c in cum if c < target)
                prev, cur = cur, nbrs[idx]
                rows.append((wid, t, cur))
    return sorted(rows)


def test_node2vec_matches_reference_and_biases_walks(edges_df):
    from tabbyld_spark.operators.walks import node2vec_walks

    for p, q in ((1.0, 1.0), (0.25, 4.0), (4.0, 0.25)):
        got = sorted(
            map(
                tuple,
                node2vec_walks(
                    edges_df, walk_len=5, walks_per_node=2, p=p, q=q
                ).collect(),
            )
        )
        assert got == _ref_node2vec(EDGES, 5, 2, p, q), (p, q)
    # the bias must actually change the corpus
    a = sorted(map(tuple, node2vec_walks(edges_df, walk_len=5, p=0.1, q=10.0).collect()))
    b = sorted(map(tuple, node2vec_walks(edges_df, walk_len=5, p=10.0, q=0.1).collect()))
    assert a != b


def test_walk_paths_ordered(edges_df):
    paths = {
        r.walk_id: r.path
        for r in walk_paths(random_walks(edges_df, walk_len=5, walks_per_node=2)).collect()
    }
    want = defaultdict(list)
    for wid, t, n in _ref_walks(EDGES, walk_len=5, walks_per_node=2):
        want[wid].append((t, n))
    for wid, seq in want.items():
        assert paths[wid] == [n for _, n in sorted(seq)], wid
