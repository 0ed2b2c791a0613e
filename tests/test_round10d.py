"""Round-10d additions: trimmed mean, autoperiod, multi-source
closeness. Oracle parity is covered by test_oracle_parity.py; these pin
semantics with independent pure-Python replays."""

from __future__ import annotations

from collections import defaultdict, deque

import duckdb

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def _tdiv(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_trimmed_mean_matches_exact_recompute(spark, sf_dir):
    rows = QUERIES["agg_exact_trimmed_mean"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        vals = sorted(
            v
            for (v,) in duckdb.sql(
                "SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT)"
                f" FROM '{sf_dir}/events.parquet'"
                f" WHERE event_type = '{r['event_type']}'"
            ).fetchall()
        )
        n = len(vals)
        k = n // 10
        mid = vals[k : n - k]
        assert (r["n"], r["n_trimmed_each_side"]) == (n, k)
        assert r["mean_micro"] == _tdiv(sum(vals), n)
        assert r["trimmed_mean_micro"] == _tdiv(sum(mid), len(mid))
        # trimming keeps the estimate inside the untrimmed range
        assert min(vals) <= r["trimmed_mean_micro"] <= max(vals)


def test_autoperiod_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["ts_autoperiod"](spark, sf_dir).collect()
    days = duckdb.sql(
        "SELECT event_type, DATE_TRUNC('day', ts), COUNT(*)"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for et, _, cnt in days:
        series[et].append(cnt)
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(series)
    for et, xs in series.items():
        n = len(xs)
        s = sum(xs)
        c = [x * n - s for x in xs]
        den = sum(v * v for v in c)
        best = None
        for lag in range(2, 15):
            num = sum(c[t] * c[t + lag] for t in range(n - lag))
            ppm = _tdiv(num * 10**6, den)
            if best is None or ppm > best[1]:
                best = (lag, ppm)
        r = got[et]
        assert (r["n_days"], r["best_lag"], r["best_acf_ppm"]) == (
            n,
            best[0],
            best[1],
        )
        assert -1_000_000 <= r["best_acf_ppm"] <= 1_000_000


def test_closeness_matches_pure_python_bfs(spark, sf_dir):
    rows = QUERIES["graph_closeness_multi_bfs"](spark, sf_dir).collect()
    edges = duckdb.sql(
        """
        WITH bip AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM read_parquet($f) WHERE l_quantity >= 49.0)
        SELECT a.s, b.s FROM bip a JOIN bip b
        ON a.p = b.p AND a.s < b.s GROUP BY 1, 2
        """,
        params={"f": f"{sf_dir}/lineitem.parquet"},
    ).fetchall()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = sorted(adj)
    n = len(nodes)
    roots = nodes[:8]
    got = {r["root"]: r for r in rows}
    assert sorted(got) == roots
    for root in roots:
        dist = {root: 0}
        dq = deque([root])
        while dq:
            cur = dq.popleft()
            for nb in adj[cur]:
                if nb not in dist:
                    dist[nb] = dist[cur] + 1
                    dq.append(nb)
        reached = len(dist) - 1
        sum_d = sum(dist.values())
        r = got[root]
        assert (r["n_reached"], r["sum_dist"]) == (reached, sum_d)
        expect = (
            (reached * reached * 10**6) // ((n - 1) * sum_d)
            if sum_d > 0 and n > 1
            else 0
        )
        assert r["closeness_micro"] == expect
        assert 0 <= r["closeness_micro"] <= 1_000_000
