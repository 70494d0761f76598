"""PageRank (operators/graph.py) vs a literal Python model of the same
integer-unit recurrence — the Spark plan must be bit-identical, including
truncation behavior and dangling nodes."""

from __future__ import annotations

import pytest

from ihop_reddit_spark.caching import release_scoped_persists
from ihop_reddit_spark.operators.graph import DEFAULT_UNIT, pagerank


def _model(edges, iters, unit=DEFAULT_UNIT):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: unit for n in nodes}
    base = (15 * unit) // 100
    for _ in range(iters):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += r[s] // deg[s]
        r = {n: base + (85 * recv[n]) // 100 for n in nodes}
    return r


@pytest.mark.slow
def test_pagerank_matches_python_model(spark):
    # cycle + hub + dangling sink (7 has no out-edges) + truncating degrees
    edges = [
        (1, 2), (2, 3), (3, 1),
        (1, 4), (4, 1), (4, 5), (5, 4),
        (2, 7), (5, 7),
        (6, 1), (6, 2), (6, 3),
    ]
    for iters in (1, 3, 5):
        df = spark.createDataFrame(edges, ["src", "dst"])
        out = pagerank(df, iterations=iters)
        got = {r["node"]: r["rank_units"] for r in out.collect()}
        release_scoped_persists(out)
        assert got == _model(edges, iters)


@pytest.mark.slow
def test_pagerank_symmetric_pair_is_stationary(spark):
    # A<->B with unit divisible by 100: rank stays exactly at unit
    df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    out = pagerank(df, iterations=4)
    got = {r["node"]: r["rank_units"] for r in out.collect()}
    release_scoped_persists(out)
    assert got == {1: DEFAULT_UNIT, 2: DEFAULT_UNIT}


@pytest.mark.slow
def test_triangle_count_exact_vs_bruteforce(spark):
    """Random graph vs itertools enumeration — global and per-node, plus
    the degenerate shapes (no triangles, directed-duplicate input)."""
    import random
    from itertools import combinations

    from ihop_reddit_spark.operators.graph import triangle_count

    random.seed(11)
    edges = set()
    while len(edges) < 90:
        u, v = random.sample(range(25), 2)
        edges.add((u, v))
    adj = {(min(u, v), max(u, v)) for u, v in edges}
    nodes = sorted({n for e in adj for n in e})
    tris = [
        t
        for t in combinations(nodes, 3)
        if (t[0], t[1]) in adj and (t[1], t[2]) in adj and (t[0], t[2]) in adj
    ]
    per: dict[int, int] = {}
    for t in tris:
        for n in t:
            per[n] = per.get(n, 0) + 1

    # directed + duplicated input must not change counts (symmetrize)
    rows = list(edges) + [(v, u) for u, v in list(edges)[:30]]
    df = spark.createDataFrame(rows, ["src", "dst"])
    assert (
        triangle_count(df, per_node=False).collect()[0]["triangles"]
        == len(tris)
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == per

    # a path graph has zero triangles → empty per-node frame
    path = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    assert triangle_count(path, per_node=False).collect()[0]["triangles"] == 0
    assert triangle_count(path).count() == 0


@pytest.mark.slow
def test_label_propagation_matches_python_model(spark):
    from collections import Counter, defaultdict

    from ihop_reddit_spark.operators.graph import label_propagation

    def ref_lpa(edge_list, rounds):
        adj = defaultdict(set)
        for u, v in edge_list:
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
        labels = {n: n for n in adj}
        for _ in range(rounds):
            nxt = {}
            for n, nbrs in adj.items():
                votes = Counter(labels[m] for m in nbrs)
                # most frequent, ties to the smallest label
                nxt[n] = sorted(
                    votes.items(), key=lambda kv: (-kv[1], kv[0])
                )[0][0]
            labels = nxt
        return labels

    # two 4-cliques joined by one bridge edge — communities must
    # converge inside each clique and not leak across the bridge
    clique = lambda base: [  # noqa: E731
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    edges = clique(0) + clique(10) + [(3, 10)]
    for rounds in (1, 2, 4):
        want = ref_lpa(edges, rounds)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == want, f"rounds={rounds}"
    # after convergence both cliques share one in-clique label each
    final = ref_lpa(edges, 4)
    assert len({final[n] for n in range(4)}) == 1
    assert len({final[n] for n in range(10, 14)}) == 1
    assert final[0] != final[10]

    # real graph slice: co-purchase pairs at sf0.001, directed +
    # duplicated input must not change the result
    import itertools

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pairs = {
        (a, b)
        for _, grp in itertools.groupby(
            sorted(
                (r["l_orderkey"], r["l_partkey"])
                for r in li.select("l_orderkey", "l_partkey")
                .distinct()
                .collect()
            ),
            key=lambda t: t[0],
        )
        for a, b in itertools.combinations(
            sorted({p for _, p in grp}), 2
        )
    }
    want = ref_lpa(sorted(pairs), 3)
    df = spark.createDataFrame(sorted(pairs), ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=3).collect()
    }
    assert got == want


@pytest.mark.slow
def test_modularity_closed_form(spark):
    from ihop_reddit_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    # two disjoint triangles: m=6, each community e_c=3, d_c=6 →
    # q_num = 2·(4·6·3 − 36) = 72, Q = 72 / (4·36) = 0.5
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    labels = label_propagation(df, rounds=3)
    r = modularity(df, labels).collect()[0]
    assert r["m_edges"] == 6 and r["n_communities"] == 2
    assert int(r["q_num"]) == 72 and r["q"] == 0.5

    # the all-one-community partition has Q = 0 exactly:
    # e_c = m, d_c = 2m → 4m·m − 4m² = 0
    one = labels.selectExpr("node", "0L as label")
    r1 = modularity(df, one).collect()[0]
    assert int(r1["q_num"]) == 0 and r1["q"] == 0.0


@pytest.mark.slow
def test_label_propagation_string_ids_and_stability(spark):
    """The tie-break must work for ANY orderable node-id type (min_by on
    (−count, label) — a −label negation would fail on strings), and
    with_stability must expose the bipartite two-coloring oscillation
    while staying all-false on a converged clique."""
    from ihop_reddit_spark.operators.graph import label_propagation

    # string-labeled triangle + pendant: ties resolve to lexicographically
    # smallest label, same semantics as the numeric path
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        ["src", "dst"],
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=4).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    assert all(isinstance(v, str) for v in got.values())
    # triangle converges to its smallest member's label
    assert got["a"] == got["b"] == got["c"] == "a"

    # K_{3,3}: synchronous LPA two-colors and NEVER converges — every
    # node's label moves in the final round, for any round count parity
    bip = spark.createDataFrame(
        [(i, j + 10) for i in range(3) for j in range(3)], ["src", "dst"]
    )
    for rounds in (2, 3):
        out = label_propagation(
            bip, rounds=rounds, with_stability=True
        ).collect()
        assert all(r["changed"] for r in out), rounds
        assert len({r["label"] for r in out}) == 2
    # converged clique: nothing moves in the final round
    k4 = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)], ["src", "dst"]
    )
    out = label_propagation(k4, rounds=3, with_stability=True).collect()
    assert not any(r["changed"] for r in out)
    assert {r["label"] for r in out} == {0}


@pytest.mark.slow
def test_kcore_peels_to_fixpoint_and_matches_bruteforce(spark):
    """k-core on a hand-built graph: a 4-clique (3-core) with a pendant
    path — the path peels over MULTIPLE cascading rounds (each removal
    exposes the next), which is exactly what a single-round degree
    filter gets wrong."""
    import itertools

    from pyspark.sql import functions as F

    from ihop_reddit_spark.operators.graph import kcore

    clique = list(itertools.combinations([1, 2, 3, 4], 2))
    path = [(4, 10), (10, 11), (11, 12)]  # peels 12, then 11, then 10
    ed = spark.createDataFrame(clique + path, "src long, dst long")

    core3 = kcore(ed, 3)
    got = {(r.node, r.core_degree) for r in core3.collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}

    # degree-1 filter alone keeps 10 and 11; only the fixpoint drops them
    core2 = kcore(ed, 2)
    assert {r.node for r in core2.collect()} == {1, 2, 3, 4}

    # no 4-core exists — empty frame, not an error
    assert kcore(ed, 4).count() == 0

    # max_rounds is a loud guard: a long path at k=2 needs one round
    # per vertex, so an absurdly low bound must raise, never truncate
    long_path = [(i, i + 1) for i in range(12)]
    lp = spark.createDataFrame(long_path, "src long, dst long")
    import pytest

    with pytest.raises(ValueError, match="did not converge"):
        kcore(lp, 2, max_rounds=2)

    # brute-force differential on a seeded random graph
    import random

    rng = random.Random(7)
    nodes = list(range(30))
    edges = {
        (a, b)
        for a in nodes
        for b in nodes
        if a < b and rng.random() < 0.25
    }
    model_adj = {n: set() for n in nodes}
    for a, b in edges:
        model_adj[a].add(b)
        model_adj[b].add(a)
    k = 5
    live = {n for n in nodes if model_adj[n]}
    while True:
        bad = {n for n in live if len(model_adj[n] & live) < k}
        if not bad:
            break
        live -= bad
    expect = {(n, len(model_adj[n] & live)) for n in live}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {(r.node, r.core_degree) for r in kcore(df, k).collect()}
    assert got == expect


@pytest.mark.slow
def test_bfs_distances_path_graph_and_unreachable(spark):
    from ihop_reddit_spark.operators.graph import bfs_distances

    # path 1-2-3-4-5, isolated island 8-9, seed at 1 and 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "node long")
    got = {
        (r.node, r.dist)
        for r in bfs_distances(edges, seeds, 3).collect()
    }
    # node 5 is 4 hops from seed 1 — absent under the max_hops=3 bound;
    # the undirected default reaches 8 from 9
    assert got == {(1, 0), (9, 0), (2, 1), (8, 1), (3, 2), (4, 3)}

    # directed: edges only flow forward, so 9 reaches nothing
    got_dir = {
        (r.node, r.dist)
        for r in bfs_distances(edges, seeds, 4, directed=True).collect()
    }
    assert got_dir == {(1, 0), (9, 0), (2, 1), (3, 2), (4, 3), (5, 4)}

    # frontier empties before max_hops — loop exits early, result stable
    got_long = {
        (r.node, r.dist)
        for r in bfs_distances(edges, seeds, 10, directed=True).collect()
    }
    assert got_long == got_dir

    # min-distance wins when two seeds reach the same node: seed both
    # ends of the path, middle node takes the smaller hop count
    both_ends = spark.createDataFrame([(1,), (5,)], "node long")
    got_min = {
        (r.node, r.dist)
        for r in bfs_distances(edges, both_ends, 4).collect()
    }
    assert got_min == {
        (1, 0), (5, 0), (2, 1), (4, 1), (3, 2),
    }
