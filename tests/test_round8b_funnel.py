"""Round-8 continuation, batch 4: event co-occurrence lift and
conversion-latency percentiles vs brute-force Python models."""

import math
import random

import pytest

from index_spark.operators.funnel import conversion_latency, event_cooccurrence_lift


def py_lift(pairs):
    us = {(u, t) for u, t in pairs if u is not None and t is not None}
    users = {u for u, _ in us}
    from collections import Counter

    marg = Counter(t for _, t in us)
    by_user = {}
    for u, t in us:
        by_user.setdefault(u, set()).add(t)
    co = Counter()
    for ts in by_user.values():
        ts = sorted(ts)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                co[(a, b)] += 1
    out = {}
    for (a, b), nab in co.items():
        out[(a, b)] = (
            marg[a],
            marg[b],
            nab,
            round(nab * len(users) / (marg[a] * marg[b]), 6),
        )
    return out


def test_event_lift_vs_python(spark):
    rng = random.Random(92)
    rows = []
    for u in range(300):
        ts = {"view"}
        if rng.random() < 0.5:
            ts.add("click")
            if rng.random() < 0.6:
                ts.add("purchase")  # purchase leans on click
        if rng.random() < 0.1:
            ts.add("error")
        for t in ts:
            rows += [(u, t)] * rng.randrange(1, 4)  # duplicate events collapse
    rows.append((None, "view"))
    rows.append((7, None))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_ab"], r["lift"])
        for r in event_cooccurrence_lift(df).collect()
    }
    exp = py_lift(rows)
    assert got == exp
    # purchase|click over-indexes vs purchase|view baseline
    assert got[("click", "purchase")][3] > got[("purchase", "view")][3]


def test_event_lift_empty_raises(spark):
    df = spark.createDataFrame([(None, "x")], "user_id long, event_type string")
    with pytest.raises(ValueError, match="no \\(user, type\\)"):
        event_cooccurrence_lift(df)


def py_latency(rows, a, b, ps):
    firsts = {}
    for u, t, ts in rows:
        if u is None or t not in (a, b):
            continue
        f, g = firsts.get(u, (None, None))
        if t == a:
            f = ts if f is None else min(f, ts)
        else:
            g = ts if g is None else min(g, ts)
        firsts[u] = (f, g)
    lats = sorted(g - f for f, g in firsts.values() if f is not None and g is not None and f <= g)
    n = len(lats)
    return (n, *[lats[math.ceil(p * n) - 1] for p in ps])


def test_conversion_latency_vs_python(spark):
    rng = random.Random(93)
    rows = []
    for u in range(200):
        t0 = rng.randrange(0, 10**9)
        rows.append((u, "view", t0))
        if rng.random() < 0.5:
            rows.append((u, "purchase", t0 + rng.randrange(0, 10**8)))
        if rng.random() < 0.2:
            rows.append((u, "purchase", t0 - rng.randrange(1, 10**6)))  # converts first? excluded if before view
        rows.append((u, "view", t0 + rng.randrange(0, 10**7)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    [r] = conversion_latency(df, "view", "purchase", ps=(0.5, 0.9)).collect()
    n, p50, p90 = py_latency(rows, "view", "purchase", (0.5, 0.9))
    assert (r["n_converted"], r["p50"], r["p90"]) == (n, p50, p90)


def test_conversion_latency_no_converters_raises(spark):
    df = spark.createDataFrame(
        [(1, "purchase", 5), (1, "view", 10)], "user_id long, event_type string, ts_us long"
    )
    with pytest.raises(ValueError, match="no user"):
        conversion_latency(df, "view", "purchase")
