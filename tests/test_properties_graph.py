"""Property-based tests (hypothesis) for the iterative/graph operators
against independent Python references on RANDOM graphs — structure a
fixed fixture can't enumerate: degree ties in the triangle orientation,
long chains vs the CC two-hop loop, peel cascades where removing one
node drags a whole chain under k.

Each example runs several (tiny) Spark jobs, so example counts are
deliberately small; the point is randomized structure, not volume.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings, strategies as st

_SETTINGS = dict(max_examples=8, deadline=None)

# random undirected graphs: up to 10 nodes, edges as a subset of pairs.
# node ids are drawn sparse (0..30) so components can't rely on density.
_edge = st.tuples(
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
).filter(lambda t: t[0] != t[1])
_edges = st.lists(_edge, min_size=1, max_size=25).map(
    lambda es: sorted({(min(u, v), max(u, v)) for u, v in es})
)


def _edge_df(spark, edges, cols=("u", "v")):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], f"{cols[0]} long, {cols[1]} long"
    )


def _adj(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


# ------------------------------------------------------- triangle counts


@settings(**_SETTINGS)
@given(_edges)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered wedge closure vs per-node brute force over all
    (a,b,c) combinations — orientation-independent reference, so ties in
    (degree, key) ordering are exercised rather than assumed."""
    from featurestore_for_joycastle_java_spark.operators.graphs import (
        triangle_counts,
    )

    adj = _adj(edges)
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1

    got = {
        r["x"]: r["n_triangles"]
        for r in triangle_counts(_edge_df(spark, edges)).collect()
    }
    assert got == want, f"edges={edges}: {got} != {want}"


# ----------------------------------------------------------------- k-core


@settings(**_SETTINGS)
@given(_edges, st.integers(min_value=1, max_value=4))
def test_kcore_edges_match_python_peel(spark, edges, k):
    """Distributed peel loop vs the sequential Python peeling reference
    (repeatedly delete any node with degree < k); the k-core is unique,
    so any peel order converges to the same edge set."""
    from featurestore_for_joycastle_java_spark.operators.graphs import (
        kcore_edges,
    )

    surviving = set(edges)
    while True:
        adj = _adj(surviving)
        doomed = {x for x, nb in adj.items() if len(nb) < k}
        if not doomed:
            break
        surviving = {
            (u, v) for u, v in surviving if u not in doomed and v not in doomed
        }

    got = {
        (r["u"], r["v"])
        for r in kcore_edges(_edge_df(spark, edges), k).collect()
    }
    assert got == surviving, f"edges={edges} k={k}: {got} != {surviving}"


# --------------------------------------------------- connected components


@settings(**_SETTINGS)
@given(_edges, st.lists(st.integers(min_value=31, max_value=40), max_size=3))
def test_connected_components_match_union_find(spark, edges, isolated):
    """Two-hop min-label propagation vs a Python union-find, with extra
    isolated nodes (no incident edge) that must come back labeled with
    their own id. Components are canonicalized to min-member id, which is
    exactly the operator's fixpoint label."""
    from featurestore_for_joycastle_java_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    node_ids = sorted({x for e in edges for x in e} | set(isolated))
    for u, v in edges:
        parent[find(u)] = find(v)
    roots: dict[int, int] = {}
    for x in node_ids:
        r = find(x)
        roots[r] = min(roots.get(r, x), x)
    want = {x: roots[find(x)] for x in node_ids}

    nodes = spark.createDataFrame([(int(x),) for x in node_ids], "doc_id long")
    e_df = _edge_df(spark, edges, cols=("id_a", "id_b"))
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, e_df).collect()
    }
    assert got == want, f"edges={edges} iso={isolated}: {got} != {want}"


# --------------------------------------------------------- integer pagerank


@settings(**_SETTINGS)
@given(_edges, st.integers(min_value=1, max_value=4))
def test_pagerank_int_matches_python_replay(spark, edges, iters):
    """The whole point of integer PageRank is bit-exact replayability:
    a 15-line Python loop with the same floor-division arithmetic must
    reproduce every rank_micro on a random DIRECTED graph (random edge
    direction, dangling nodes, no-in-edge nodes, varying iteration
    counts)."""
    from featurestore_for_joycastle_java_spark.operators.graph import (
        SCALE,
        pagerank_int,
    )

    # orient each undirected pair by parity for direction diversity
    directed = [
        ((u, v) if (u + v) % 2 == 0 else (v, u)) for u, v in edges
    ]
    nodes = sorted({x for e in directed for x in e})
    deg = {u: 0 for u in nodes}
    for u, _ in directed:
        deg[u] += 1
    r = {x: SCALE for x in nodes}
    for _ in range(iters):
        insum = {x: 0 for x in nodes}
        for u, v in directed:
            insum[v] += r[u] // deg[u]
        r = {x: (SCALE * 15) // 100 + (85 * insum[x]) // 100 for x in nodes}

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in directed], "src long, dst long"
    )
    got = {
        row["node"]: row["rank_micro"]
        for row in pagerank_int(df, iterations=iters).collect()
    }
    assert got == r, f"edges={directed} iters={iters}: {got} != {r}"
