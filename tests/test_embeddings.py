"""PPMI + spectral embeddings (operators/embeddings.py): PPMI closed form
against DuckDB, orthogonal iteration against the identical numpy algorithm
(same md5 init), and subspace alignment against a direct eigendecomposition."""

import hashlib
import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.embeddings import ppmi_matrix, spectral_embedding

PAIRS = [
    ("a", "b", 10), ("b", "a", 10),
    ("a", "c", 6), ("c", "a", 6),
    ("b", "c", 2), ("c", "b", 2),
    ("c", "d", 8), ("d", "c", 8),
    ("d", "e", 5), ("e", "d", 5),
    ("a", "e", 1), ("e", "a", 1),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "center string, context string, n long")


def test_ppmi_matches_duckdb_closed_form(spark, pairs_df):
    got = {
        (r.center, r.context): r.ppmi for r in ppmi_matrix(pairs_df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (center VARCHAR, context VARCHAR, n BIGINT)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", PAIRS)
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute("""
            WITH rm AS (SELECT center, sum(n) AS nc FROM p GROUP BY center),
                 cm AS (SELECT context, sum(n) AS nx FROM p GROUP BY context),
                 t AS (SELECT sum(n) AS nt FROM p)
            SELECT center, context,
                   ln(n * nt / (nc * nx)) AS ppmi
            FROM p JOIN rm USING (center) JOIN cm USING (context) CROSS JOIN t
            WHERE ln(n * nt / (nc * nx)) > 0
        """).fetchall()
    }
    assert set(got) == set(want)
    for key in got:
        assert got[key] == pytest.approx(want[key], abs=1e-12)


def test_ppmi_shift_and_min_count(spark, pairs_df):
    base = ppmi_matrix(pairs_df).count()
    shifted = ppmi_matrix(pairs_df, shift=2.0).count()
    assert shifted <= base  # log-shift only removes/reduces entries
    pruned = ppmi_matrix(pairs_df, min_count=3)
    assert pruned.filter(F.col("center") == "a").filter(F.col("context") == "e").count() == 0


# ---------------------------------------------------------------- reference


def _u(seed, value):
    h = hashlib.md5(f"{seed}:{value}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def _ref_spectral(ppmi_rows, dim, n_iters, seed="spectral"):
    sym = {}
    for c, x, w in ppmi_rows:
        sym[(c, x)] = max(sym.get((c, x), -1e18), w)
        sym[(x, c)] = max(sym.get((x, c), -1e18), w)
    nodes = sorted({i for i, _ in sym})
    idx = {n: i for i, n in enumerate(nodes)}
    m = np.zeros((len(nodes), len(nodes)))
    for (i, j), w in sym.items():
        m[idx[i], idx[j]] = w
    v = np.array(
        [[_u(f"{seed}:{j}", n) - 0.5 for j in range(dim)] for n in nodes]
    )
    for _ in range(n_iters):
        y = m @ v
        g = y.T @ y
        r = np.linalg.cholesky(g + 1e-12 * np.eye(dim)).T
        v = y @ np.linalg.inv(r)
    return nodes, v, m


def test_spectral_matches_numpy_reference(spark, pairs_df):
    dim, iters = 3, 12
    ppmi = ppmi_matrix(pairs_df)
    rows = [(r.center, r.context, r.ppmi) for r in ppmi.collect()]
    nodes, v_ref, m = _ref_spectral(rows, dim, iters)
    got = {r.node: np.array(r.vec) for r in spectral_embedding(ppmi, dim=dim, n_iters=iters).collect()}
    assert set(got) == set(nodes)
    v_got = np.array([got[n] for n in nodes])
    assert np.allclose(v_got, v_ref, atol=1e-8)
    # columns orthonormal
    assert np.allclose(v_got.T @ v_got, np.eye(dim), atol=1e-8)
    # subspace alignment needs a clean eigen-magnitude gap: this graph's
    # spectrum is ±-paired with |λ3| == |λ4| (degenerate), so the check
    # runs at dim=2 where the gap is clear (1.694 vs 1.166)
    got2 = {
        r.node: np.array(r.vec)
        for r in spectral_embedding(ppmi, dim=2, n_iters=30).collect()
    }
    v2 = np.array([got2[n] for n in nodes])
    w, q = np.linalg.eigh(m)
    top = q[:, np.argsort(-np.abs(w))[:2]]
    sv = np.linalg.svd(v2.T @ top, compute_uv=False)
    assert np.all(sv > 0.99), sv


def test_spectral_deterministic_under_resharding(spark, pairs_df):
    ppmi = ppmi_matrix(pairs_df)
    a = {r.node: np.array(r.vec) for r in spectral_embedding(ppmi, dim=2, n_iters=8).collect()}
    b = {
        r.node: np.array(r.vec)
        for r in spectral_embedding(ppmi.repartition(7), dim=2, n_iters=8).collect()
    }
    assert set(a) == set(b)
    for n in a:
        assert np.allclose(a[n], b[n], atol=1e-9)


def test_semantic_er_composition(spark):
    """Embedding-based entity resolution: triples whose (subj→obj) edges
    embed two structurally-identical entities close together → the existing
    embedding near-dup operator surfaces them as a same_as candidate pair.
    This is the semantic complement to entityres.blocked_same_as (which
    needs literal attribute agreement)."""
    from tabbyld_spark.operators.dedup import embedding_dedup_pairs

    rows = []
    # e1 and e2 are perfect structural twins (same neighbors); e3 differs
    for e in ("e1", "e2"):
        rows += [(e, "p", "rome"), (e, "p", "tools"), ("hub", "q", e)]
    rows += [("e3", "p", "lima"), ("e3", "p", "food"), ("hub2", "q", "e3")]
    tri = spark.createDataFrame(rows, "subj string, pred string, obj string")
    edges = tri.select(
        F.col("subj").alias("center"), F.col("obj").alias("context"),
        F.lit(1).alias("n"),
    )
    emb = spectral_embedding(ppmi_matrix(edges), dim=2, n_iters=10).select(
        F.col("node").alias("vec_id"), F.col("vec").alias("embedding")
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(emb, threshold=0.999).collect()
    }
    assert ("e1", "e2") in pairs
    assert not any("e3" in pair for pair in pairs)


def test_walks_to_embedding_chain(spark):
    """The full chain: edges → walks → skip-gram pairs → PPMI → embedding."""
    from tabbyld_spark.operators.walks import random_walks, skipgram_pairs

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c"),
         ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    pairs = skipgram_pairs(random_walks(edges, walk_len=6, walks_per_node=4), window=2)
    emb = spectral_embedding(ppmi_matrix(pairs), dim=2, n_iters=10)
    got = {r.node: np.array(r.vec) for r in emb.collect()}
    assert set(got) >= {"a", "b", "c"}
    # nodes in the same component are mutually closer than cross-component
    if "x" in got:
        d_in = np.linalg.norm(got["a"] - got["b"])
        d_cross = np.linalg.norm(got["a"] - got["x"])
        assert d_in < d_cross
