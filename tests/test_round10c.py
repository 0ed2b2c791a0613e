"""Round-10c additions: seven inference / keyword / drift queries.
Oracle parity is covered by test_oracle_parity.py's registry-wide
parametrization; these tests pin semantics with INDEPENDENT pure-Python
replays (no SQL on either side) and closed-form identities."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES

_STOPS = {"the", "a", "and", "of", "to", "in", "is", "for", "on", "with"}


def test_delong_matches_pure_python_replay(spark, sf_dir):
    row = QUERIES["eval_auc_delong_se"](spark, sf_dir).collect()[0]
    data = duckdb.sql(
        "SELECT value, event_type = 'purchase'"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    pos = sorted(v for v, y in data if y)
    neg = sorted(v for v, y in data if not y)
    n1, n0 = len(pos), len(neg)
    assert (row["n_pos"], row["n_neg"]) == (n1, n0)
    import bisect

    # exact x(2n0) / x(2n1) placements
    V = [
        2 * bisect.bisect_left(neg, p)
        + (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
        for p in pos
    ]
    W = [
        2 * (n1 - bisect.bisect_right(pos, q))
        + (bisect.bisect_right(pos, q) - bisect.bisect_left(pos, q))
        for q in neg
    ]
    s10, ss10 = sum(V), sum(v * v for v in V)
    s01, ss01 = sum(W), sum(w * w for w in W)
    assert row["auc_micro"] == (s10 * 10**6) // (n1 * 2 * n0)
    var = (n1 * ss10 - s10 * s10) / (n1 * n1 * (n1 - 1) * 4 * n0 * n0) + (
        n0 * ss01 - s01 * s01
    ) / (n0 * n0 * (n0 - 1) * 4 * n1 * n1)
    assert row["se_micro"] == math.floor(10**6 * math.sqrt(var))
    # both placement sums count the same concordant pairs (2U each):
    # E[v10] = E[v01] = AUC, the DeLong construction's core identity
    assert s10 == s01


def test_log_loss_matches_per_cell_recompute(spark, sf_dir):
    row = QUERIES["eval_log_loss"](spark, sf_dir).collect()[0]
    data = duckdb.sql(
        "SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    mx = max(v for v, _ in data)
    cells = Counter(
        (min(999999, max(1, (v * 10**6) // mx)), y) for v, y in data
    )
    total = 0
    for (p, y), cnt in cells.items():
        term = round(
            -(10**6)
            * (y * math.log(p / 1e6) + (1 - y) * math.log(1 - p / 1e6))
        )
        total += cnt * term
    assert row["n_rows"] == len(data)
    assert row["logloss_sum_micro"] == total
    assert row["logloss_mean_micro"] == total // len(data)
    # log loss >= 2*Brier bound sanity: strictly positive here
    assert row["logloss_mean_micro"] > 0


def test_covariance_matches_numpy_int_recompute(spark, sf_dir):
    rows = QUERIES["sim_covariance_matrix"](spark, sf_dir).collect()
    emb = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    x = np.floor(np.array([e[0] for e in emb], dtype=np.float64) * 1e6)
    n = len(x)
    gram = (x.T @ x).astype(object)  # python ints via object dtype
    s = x.sum(axis=0).astype(object)

    def tdiv(a, b):
        q = abs(int(a)) // b
        return q if a >= 0 else -q

    got = {(r["i"], r["j"]): r for r in rows}
    assert len(got) == 64 * 65 // 2
    for (i, j), r in got.items():
        assert r["n_vectors"] == n
        expect = tdiv(n * int(gram[i - 1][j - 1]) - int(s[i - 1]) * int(s[j - 1]), n * n)
        assert r["cov_micro2"] == expect
    # diagonal of a covariance is non-negative
    for i in range(1, 65):
        assert got[(i, i)]["cov_micro2"] >= 0


def test_markov_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["feature_markov_stationary"](spark, sf_dir).collect()
    got = {r["state"]: r["stationary_micro"] for r in rows}
    seq = duckdb.sql(
        "SELECT user_id, event_type FROM"
        f" '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    c = defaultdict(int)
    prev_u = prev_t = None
    states = set()
    for u, t in seq:
        states.add(t)
        if u == prev_u:
            c[(prev_t, t)] += 1
        prev_u, prev_t = u, t
    r = defaultdict(int)
    for (a, _), cnt in c.items():
        r[a] += cnt
    p = {s: 10**6 for s in states}
    for _ in range(3):
        raw = defaultdict(int)
        for (a, b), cnt in c.items():
            raw[b] += (p[a] * cnt) // r[a]
        mx = max(raw.values())
        p = {s: (raw.get(s, 0) * 10**6) // mx for s in states}
    assert got == p
    assert max(got.values()) == 10**6


def test_rake_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["text_keyword_rake"](spark, sf_dir).collect()
    got = {r["word"]: (r["freq"], r["degree"], r["rake_micro"]) for r in rows}
    toks = duckdb.sql(
        "SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freq = Counter()
    degree = Counter()
    for (tl,) in toks:
        phrase = []
        phrases = []
        for w in tl:
            if w in _STOPS:
                if phrase:
                    phrases.append(phrase)
                phrase = []
            else:
                phrase.append(w)
        if phrase:
            phrases.append(phrase)
        for ph in phrases:
            for w in ph:
                freq[w] += 1
                degree[w] += len(ph)
    ref = {
        w: (freq[w], degree[w], (degree[w] * 10**6) // freq[w]) for w in freq
    }
    assert got == ref
    # degree >= freq always (each phrase has length >= 1)
    for f, d, rm in got.values():
        assert d >= f and rm >= 10**6


def test_wilson_brackets_phat_and_replays(spark, sf_dir):
    rows = QUERIES["eval_wilson_interval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        k, n = r["k"], r["n"]
        assert 0 <= k <= n
        ph = k / n
        z2 = 3.8416
        center = ph + z2 / (2 * n)
        half = 1.96 * math.sqrt(ph * (1 - ph) / n + z2 / (4 * n * n))
        denom = 1 + z2 / n
        lo = math.floor(1e6 * max(0.0, (center - half) / denom))
        hi = math.floor(1e6 * min(1.0, (center + half) / denom))
        assert (r["wilson_lo_micro"], r["wilson_hi_micro"]) == (lo, hi)
        assert r["wilson_lo_micro"] <= r["phat_ppm"] <= r["wilson_hi_micro"]


def test_runs_test_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["ts_runs_test"](spark, sf_dir).collect()
    days = duckdb.sql(
        "SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*)"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    by_type = defaultdict(list)
    for et, _, cnt in days:
        by_type[et].append(cnt)
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(by_type)
    for et, cnts in by_type.items():
        n = len(cnts)
        sc = sum(cnts)
        above = [c * n > sc for c in cnts]
        n1 = sum(above)
        n0 = n - n1
        runs = 1 + sum(1 for a, b in zip(above, above[1:]) if a != b)
        r = got[et]
        assert (r["n_days"], r["n_above"], r["n_below"], r["n_runs"]) == (
            n,
            n1,
            n0,
            runs,
        )
        if n1 > 0 and n0 > 0 and n > 1:
            mu = 1 + 2 * n1 * n0 / n
            var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
            z = math.floor(1e6 * (runs - mu) / math.sqrt(var))
            assert r["z_micro"] == z
        else:
            assert r["z_micro"] == 0
