from __future__ import annotations

import datetime as dt

from etl_pipeline_stock_market_data_postgresql_spark.operators.asof import asof_join_union


def _ts(m):
    return dt.datetime(2025, 1, 1, 10, m)


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(20)), (3, "B", _ts(5))],
        "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _ts(10), 100.0), ("A", _ts(15), 150.0), ("B", _ts(9), 900.0)],
        "k string, ts timestamp, v double")

    strict = asof_join_union(left, right, ["k"], "ts", "ts", ["v"], strict=True)
    got = {r["event_id"]: r["asof_v"] for r in strict.collect()}
    # left@10:10 must NOT see right@10:10 (strict <); left@10:20 sees 150
    assert got == {1: None, 2: 150.0, 3: None}

    inclusive = asof_join_union(left, right, ["k"], "ts", "ts", ["v"], strict=False)
    got2 = {r["event_id"]: r["asof_v"] for r in inclusive.collect()}
    assert got2 == {1: 100.0, 2: 150.0, 3: None}


def test_asof_tiebreak_among_equal_right_ts(spark):
    left = spark.createDataFrame([(1, "A", _ts(20))],
                                 "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _ts(10), 1.0, 7), ("A", _ts(10), 2.0, 9), ("A", _ts(10), 3.0, 8)],
        "k string, ts timestamp, v double, seq long")
    out = asof_join_union(left, right, ["k"], "ts", "ts", ["v"],
                          strict=True, right_tiebreak="seq")
    # largest tiebreak wins deterministically
    assert out.first()["asof_v"] == 2.0


def test_asof_matches_bruteforce_on_random_data(spark):
    """Property: union+window as-of join == brute-force 'max right ts
    strictly before left ts per key' on adversarial data (duplicate
    timestamps within and across sides, keys missing on either side)."""
    import random

    rng = random.Random(42)
    keys = ["A", "B", "C", "D"]
    lefts, rights = [], []
    for i in range(200):
        # coarse minute grid -> many exact ts collisions
        lefts.append((i, rng.choice(keys), _ts(rng.randrange(0, 30))))
    for j in range(150):
        rights.append((rng.choice(keys + ["E"]), _ts(rng.randrange(0, 30)),
                       float(j)))
    left = spark.createDataFrame(lefts, "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(rights, "k string, ts timestamp, v double")

    out = asof_join_union(left, right, ["k"], "ts", "ts", ["v"], strict=True)
    got = {r["event_id"]: r["asof_v"] for r in out.collect()}
    assert len(got) == len(lefts)  # every left row exactly once

    # brute force reference: among right rows with same key and ts < left
    # ts, take max ts; among those, max v would be ambiguous — the
    # operator guarantees SOME row at that max ts, so compare the ts of
    # the chosen value's candidates
    by_key = {}
    for k, t, v in rights:
        by_key.setdefault(k, []).append((t, v))
    for i, k, t in lefts:
        cands = [(rt, rv) for rt, rv in by_key.get(k, []) if rt < t]
        if not cands:
            assert got[i] is None, (i, k, t, got[i])
        else:
            best_ts = max(rt for rt, _ in cands)
            vals_at_best = {rv for rt, rv in cands if rt == best_ts}
            assert got[i] in vals_at_best, (i, k, t, got[i], vals_at_best)
