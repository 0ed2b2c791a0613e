"""Round-10f additions: overlap depth, triplet accuracy, FD profiling.
Oracle parity is covered by test_oracle_parity.py; these pin semantics
with independent pure-Python replays."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def test_overlap_depth_matches_sweep_replay(spark, sf_dir):
    row = QUERIES["layout_overlap_depth"](spark, sf_dir).collect()[0]
    files = duckdb.sql(
        "SELECT l_orderkey // 400, MIN(l_partkey), MAX(l_partkey)"
        f" FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    events = sorted(
        [(lo, 0, 1) for _, lo, _ in files] + [(hi, 1, -1) for _, _, hi in files]
    )
    depth = best = 0
    for _, _, d in events:
        depth += d
        best = max(best, depth)
    assert row["n_files"] == len(files)
    assert row["max_overlap_depth"] == best
    assert 1 <= best <= len(files)
    assert row["depth_ratio_ppm"] == best * 10**6 // len(files)
    # the ingest-ordered layout on an uncorrelated column should prune
    # almost nothing — that's the query's reason to exist
    assert row["depth_ratio_ppm"] > 500_000


def test_triplet_accuracy_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["sim_triplet_margin_accuracy"](spark, sf_dir).collect()
    data = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    import math

    vecs = {}
    by_label = defaultdict(list)
    for vid, lbl, emb in data:
        vecs[vid] = [int(math.floor(float(v) * 10000.0)) for v in emb]
        by_label[lbl].append(vid)
    n_labels = len(by_label)
    ids_sorted = {l: sorted(ids) for l, ids in by_label.items()}
    stats = defaultdict(lambda: [0, 0])
    for l, ids in ids_sorted.items():
        succ = ids_sorted[(l + 1) % n_labels]
        import bisect

        for k, a in enumerate(ids[:-1]):
            p = ids[k + 1]
            j = bisect.bisect_right(succ, a)
            if j >= len(succ):
                continue
            n = succ[j]
            va, vp, vn = vecs[a], vecs[p], vecs[n]
            dot_ap = sum(x * y for x, y in zip(va, vp))
            dot_an = sum(x * y for x, y in zip(va, vn))
            np2 = sum(x * x for x in vp)
            nn2 = sum(x * x for x in vn)
            if dot_ap >= 0 and dot_an < 0:
                ok = 1
            elif dot_ap < 0 and dot_an >= 0:
                ok = 0
            elif dot_ap >= 0:
                ok = 1 if dot_ap * dot_ap * nn2 > dot_an * dot_an * np2 else 0
            else:
                ok = 1 if dot_ap * dot_ap * nn2 < dot_an * dot_an * np2 else 0
            stats[l][0] += 1
            stats[l][1] += ok
    got = {r["label"]: r for r in rows}
    assert set(got) == set(stats)
    for l, (n_t, n_c) in stats.items():
        r = got[l]
        assert (r["n_triplets"], r["n_correct"]) == (n_t, n_c)
        assert r["accuracy_ppm"] == n_c * 10**6 // n_t


def test_fd_profile_matches_replay_and_orders(spark, sf_dir):
    rows = QUERIES["quality_functional_dependency"](spark, sf_dir).collect()
    got = {r["fd"]: r for r in rows}
    specs = {
        "l_orderkey->l_suppkey": ("l_orderkey", "l_suppkey"),
        "l_partkey->l_suppkey": ("l_partkey", "l_suppkey"),
        "l_orderkey->l_returnflag": ("l_orderkey", "l_returnflag"),
    }
    assert set(got) == set(specs)
    for fd, (lhs, rhs) in specs.items():
        pairs = duckdb.sql(
            f"SELECT CAST({lhs} AS VARCHAR), CAST({rhs} AS VARCHAR)"
            f" FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
        groups = defaultdict(lambda: defaultdict(int))
        for l, r_ in pairs:
            groups[l][r_] += 1
        n_rows = len(pairs)
        n_viol_groups = sum(1 for g in groups.values() if len(g) > 1)
        n_major = sum(max(g.values()) for g in groups.values())
        r = got[fd]
        assert r["n_lhs_groups"] == len(groups)
        assert r["n_violating_groups"] == n_viol_groups
        assert r["n_rows"] == n_rows
        assert r["n_violating_rows"] == n_rows - n_major
        assert r["confidence_ppm"] == n_major * 10**6 // n_rows
    # orderkey->returnflag is the strongest FD on this fixture, and
    # partkey->suppkey the weakest — the discriminating order
    assert (
        got["l_orderkey->l_returnflag"]["confidence_ppm"]
        >= got["l_orderkey->l_suppkey"]["confidence_ppm"]
        >= got["l_partkey->l_suppkey"]["confidence_ppm"]
    )
