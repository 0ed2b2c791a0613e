"""Round-10b additions: ten analytics / LLM-pipeline queries.
Oracle parity is covered by the registry-wide parametrization in
test_oracle_parity.py; these tests pin the semantic invariants the
value-hash compare can't articulate — plus, for the three iterative /
pairwise statistics, an INDEPENDENT pure-Python replay (dict/loop
arithmetic, no SQL on either side) so a bug mirrored into both the
Spark query and its DuckDB oracle still fails."""

from __future__ import annotations

import duckdb
import numpy as np

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def test_pc1_matches_pure_python_bigint_replay(spark, sf_dir):
    """Max-abs component pinned at ±1e6, and the 3-step iterate must
    equal an INDEPENDENT pure-Python bigint replay of the kernel (the
    fixture's Gram spectrum is near-isotropic — λ₂/λ₁ ≈ 0.93 — so no
    small k approximates the eigenvector; the query's contract is the
    exact iterate, see its docstring)."""
    rows = QUERIES["sim_power_iteration_pc1"](spark, sf_dir).collect()
    got = {r["dim"]: r["pc1_micro"] for r in rows}
    assert max(abs(x) for x in got.values()) == 1_000_000
    emb = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    x = np.floor(np.array([e[0] for e in emb], dtype=np.float64) * 1e6)
    gram = (x.T @ x).astype(np.int64).tolist()  # exact: |G| <= n*1e12
    d = len(gram)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    v = [10**6] * d  # python bigints from here on
    for _ in range(3):
        raw = [sum(gram[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(r) for r in raw)
        v = [tdiv(r * 10**6, m) for r in raw]
    assert got == {i + 1: v[i] for i in range(d)}


def test_label_propagation_compresses_and_is_stable(spark, sf_dir):
    rows = QUERIES["graph_label_propagation"](spark, sf_dir).collect()
    assert rows
    nodes = {(r["kind"], r["key"]) for r in rows}
    comms = {r["community"] for r in rows}
    # labels ARE encoded node ids, so every community id decodes to a
    # participating node
    for c in comms:
        kind = "customer" if c % 2 == 0 else "supplier"
        assert (kind, c // 2) in nodes
    # propagation compressed: strictly fewer communities than nodes
    assert 1 <= len(comms) < len(nodes)
    # deterministic: a second run returns the identical partition
    again = QUERIES["graph_label_propagation"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _py_pagerank_int(edges, iterations=3, damping=85):
    """Independent dict-based replay of operators/graph.py arithmetic."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, d in edges:
        deg[s] += 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    r = {n: 1_000_000 for n in nodes}
    floor_term = (1_000_000 * (100 - damping)) // 100
    for _ in range(iterations):
        insum = defaultdict(int)
        for s, d in edges:
            insum[d] += r[s] // deg[s]
        r = {n: floor_term + (damping * insum.get(n, 0)) // 100 for n in nodes}
    return r


def test_textrank_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["text_textrank_keywords"](spark, sf_dir).collect()
    got = {r["word"]: r["rank_micro"] for r in rows}
    toks = duckdb.sql(
        "SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    und = set()
    for (tl,) in toks:
        for a, b in zip(tl, tl[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    ref = _py_pagerank_int(edges)
    assert got == ref
    assert all(v >= 150_000 for v in got.values())  # teleport floor


def test_kendall_matches_pure_python_replay(spark, sf_dir):
    row = QUERIES["eval_kendall_tau"](spark, sf_dir).collect()[0]
    per_user = duckdb.sql(
        "SELECT COUNT(*), SUM(CAST(FLOOR(value * 100) AS BIGINT)) // 10000"
        f" FROM '{sf_dir}/events.parquet' GROUP BY user_id"
    ).fetchall()
    from collections import Counter

    cells = Counter(per_user)
    items = list(cells.items())
    c = d = 0
    for i, ((xa, ya), na) in enumerate(items):
        for (xb, yb), nb in items[i + 1 :]:
            lo, hi = ((xa, ya), (xb, yb)) if xa < xb else ((xb, yb), (xa, ya))
            if lo[0] == hi[0]:
                continue
            if lo[1] < hi[1]:
                c += na * nb
            elif lo[1] > hi[1]:
                d += na * nb
    n = sum(cells.values())
    n0 = n * (n - 1) // 2
    gx = Counter()
    gy = Counter()
    for (x, y), cnt in cells.items():
        gx[x] += cnt
        gy[y] += cnt
    n1 = sum(g * (g - 1) // 2 for g in gx.values())
    n2 = sum(g * (g - 1) // 2 for g in gy.values())
    assert (row["n_users"], row["n_pairs"]) == (n, n0)
    assert (row["c_pairs"], row["d_pairs"]) == (c, d)
    assert (row["ties_x_pairs"], row["ties_y_pairs"]) == (n1, n2)
    import math

    tau = math.floor((c - d) * 1e6 / math.sqrt((n0 - n1) * (n0 - n2)))
    assert row["tau_b_micro"] == tau
    assert -1_000_000 <= row["tau_b_micro"] <= 1_000_000


def test_mcnemar_cells_partition_users(spark, sf_dir):
    row = QUERIES["eval_mcnemar"](spark, sf_dir).collect()[0]
    assert (
        row["both_yes"] + row["both_no"] + row["only_a"] + row["only_b"]
        == row["n_users"]
    )
    b, c = row["only_a"], row["only_b"]
    if b + c > 0:
        assert row["chi2_cc_micro"] == (
            max(abs(b - c) - 1, 0) ** 2 * 1_000_000
        ) // (b + c)
    else:
        assert row["chi2_cc_micro"] == 0


def test_survival_risk_table_invariants(spark, sf_dir):
    rows = sorted(
        QUERIES["feature_survival_hazard"](spark, sf_dir).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    # at the smallest duration everyone is still at risk
    assert rows[0]["n_risk"] == n_users
    # n_risk strictly decreases (each emitted duration has >= 1 exit)
    risks = [r["n_risk"] for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    # exits account for every user, and the hazard replays exactly
    assert sum(r["n_churned"] + r["n_censored"] for r in rows) == n_users
    for r in rows:
        assert r["hazard_ppm"] == r["n_churned"] * 1_000_000 // r["n_risk"]
    assert rows[-1]["cum_churned"] == sum(r["n_churned"] for r in rows)


def test_quantile_normalize_aligns_equal_size_sources(spark, sf_dir):
    rows = QUERIES["feature_quantile_normalize"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # monotone within each source: value order is preserved by mapping
    for rs in by_src.values():
        rs.sort(key=lambda r: (r["n_chars"], r["doc_id"]))
        mapped = [r["mapped_chars"] for r in rs]
        assert mapped == sorted(mapped)
    # equal-size sources end up with IDENTICAL mapped distributions —
    # the definition of quantile normalization
    dists = {
        src: tuple(sorted(r["mapped_chars"] for r in rs))
        for src, rs in by_src.items()
        if len(rs) > 1
    }
    sizes = {src: len(rs) for src, rs in by_src.items()}
    seen = {}
    for src, dist in dists.items():
        key = sizes[src]
        if key in seen:
            assert dist == seen[key], f"{src} differs at size {key}"
        else:
            seen[key] = dist


def test_record_highs_are_strictly_increasing(spark, sf_dir):
    rows = QUERIES["ts_record_highs"](spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    first_days = dict(
        duckdb.sql(
            "SELECT event_type, MIN(DATE_TRUNC('day', ts))"
            f" FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["record_seq"])
        assert [r["record_seq"] for r in rs] == list(range(1, len(rs) + 1))
        cnts = [r["cnt"] for r in rs]
        assert all(a < b for a, b in zip(cnts, cnts[1:]))
        # the type's first active day is always its first record
        # (duckdb hands back date; Spark a midnight datetime)
        got_day = rs[0]["day"]
        ref_day = first_days[et]
        if hasattr(got_day, "date"):
            got_day = got_day.date()
        if hasattr(ref_day, "date") and not hasattr(ref_day, "hour"):
            pass
        elif hasattr(ref_day, "date"):
            ref_day = ref_day.date()
        assert got_day == ref_day


def test_iqr_fences_match_exact_recompute(spark, sf_dir):
    rows = QUERIES["quality_outlier_iqr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        vals = [
            v
            for (v,) in duckdb.sql(
                "SELECT CAST(FLOOR(value * 1000000) AS BIGINT)"
                f" FROM '{sf_dir}/events.parquet'"
                f" WHERE event_type = '{r['event_type']}'"
            ).fetchall()
        ]
        vals.sort()
        n = len(vals)
        assert r["n"] == n
        k = n - 1
        q1 = vals[k // 4] * (4 - k % 4) + (
            vals[k // 4 + 1] * (k % 4) if k % 4 else 0
        )
        k3 = 3 * k
        q3 = vals[k3 // 4] * (4 - k3 % 4) + (
            vals[k3 // 4 + 1] * (k3 % 4) if k3 % 4 else 0
        )
        assert (r["q1_x4"], r["q3_x4"]) == (q1, q3)
        assert r["q1_x4"] <= r["q3_x4"]
        lo = 2 * q1 - 3 * (q3 - q1)
        hi = 2 * q3 + 3 * (q3 - q1)
        assert r["n_low"] == sum(1 for v in vals if 8 * v < lo)
        assert r["n_high"] == sum(1 for v in vals if 8 * v > hi)


def test_centroid_drift_matches_exact_recompute(spark, sf_dir):
    rows = QUERIES["sim_centroid_drift"](spark, sf_dir).collect()
    assert rows
    data = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0])  # (label, split, dim) -> [sum, n]
    for vec_id, label, emb in data:
        split = vec_id % 2
        for i, val in enumerate(emb):
            cell = sums[(label, split, i)]
            cell[0] += int(np.floor(np.float64(val) * 1e6))
            cell[1] += 1
    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q
    for r in rows:
        shifts = []
        for i in range(64):
            s0, n0 = sums[(r["label"], 0, i)]
            s1, n1 = sums[(r["label"], 1, i)]
            assert (n0, n1) == (r["n_even"], r["n_odd"])
            shifts.append(abs(tdiv(s0, n0) - tdiv(s1, n1)))
        assert r["l1_shift_micro"] == sum(shifts)
        assert r["linf_shift_micro"] == max(shifts)
        assert r["linf_shift_micro"] <= r["l1_shift_micro"]
