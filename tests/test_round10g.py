"""Round-10g addition: streaming quota enforcement. Oracle parity is
covered by test_oracle_parity.py; this pins the admission semantics
with an independent pure-Python replay over the raw events."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def test_quota_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["stream_quota_enforcement"](spark, sf_dir).collect()
    events = duckdb.sql(
        "SELECT user_id, ts, event_id"
        f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user = defaultdict(list)
    for u, ts, eid in events:
        per_user[u].append(ts)
    got = {r["user_id"]: r for r in rows}
    assert set(got) == set(per_user)
    exhausted = not_exhausted = 0
    for u, tss in per_user.items():
        r = got[u]
        n = len(tss)
        assert r["n_allowed"] == min(n, 67)
        assert r["n_denied"] == max(0, n - 67)
        assert r["n_allowed"] + r["n_denied"] == n
        if n >= 67:
            assert r["quota_reached_ts"] == tss[66]
            exhausted += 1
        else:
            assert r["quota_reached_ts"] is None
            not_exhausted += 1
    # the fixture discriminates: both outcomes occur
    assert exhausted > 0 and not_exhausted > 0
