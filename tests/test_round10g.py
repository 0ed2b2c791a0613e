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


def test_quota_limiter_string_key_and_epoch_zero_sentinel(spark, tmp_path):
    """ADVICE r10 regressions: (1) the output key column inherits the
    input type (was hardcoded long — a string user id silently broke the
    operator); (2) a quota reached exactly at epoch micros == 0 is
    reported as 1970-01-01, not conflated with 'never reached' (the old
    r=0 sentinel)."""
    import datetime as dt

    from featurestore_for_joycastle_java_spark import streaming as ST
    from featurestore_for_joycastle_java_spark.catalog.streaming import _run

    epoch = dt.datetime(1970, 1, 1)
    rows = [
        ("alice", epoch, 1),
        ("alice", epoch, 2),
        ("alice", dt.datetime(1970, 1, 1, 0, 0, 5), 3),
        ("bob", dt.datetime(2024, 1, 1), 4),
    ]
    src = str(tmp_path / "quota_str")
    spark.createDataFrame(
        rows, "user string, ts timestamp, event_id long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user string, ts timestamp, event_id long"
    ).parquet(src)
    out = _run(
        spark,
        ST.quota_rate_limiter(stream, key_col="user", quota=2),
        "append",
    )
    got = {r["user"]: r for r in out.collect()}
    assert set(got) == {"alice", "bob"}
    assert dict(got["alice"].asDict()) == {
        "user": "alice",
        "n_allowed": 2,
        "n_denied": 1,
        "quota_reached_ts": epoch,
    }
    assert got["bob"]["n_allowed"] == 1
    assert got["bob"]["quota_reached_ts"] is None
