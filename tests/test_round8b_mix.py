"""Largest-remainder training-mixture allocation vs a Python model."""

import random

import pytest

from index_spark.operators.sampling import mix_allocate


def py_mix(counts, weights, n):
    wsum = sum(weights.values())
    srcs = sorted(set(weights) | set(counts))
    rows = []
    for s in srcs:
        w = weights.get(s, 0)
        rows.append([s, counts.get(s, 0), (n * w) // wsum, (n * w) % wsum])
    left = n - sum(r[2] for r in rows)
    bump = {r[0] for r in sorted(rows, key=lambda r: (-r[3], r[0]))[:left]}
    return {
        s: (avail, b + (s in bump), min(b + (s in bump), avail))
        for s, avail, b, _ in rows
    }


def test_mix_allocate_vs_python(spark):
    rng = random.Random(94)
    counts = {f"s{i}": rng.randrange(0, 500) for i in range(8)}
    counts.pop("s3")  # weighted but absent from the data
    weights = {f"s{i}": rng.randrange(0, 9) for i in range(7)}  # s7 unweighted
    if sum(weights.values()) == 0:
        weights["s0"] = 1
    rows = [(s,) for s, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "source string")
    for n in (0, 1, 37, 500, 1234):
        got = {
            r["source"]: (r["n_avail"], r["n_alloc"], r["n_take"])
            for r in mix_allocate(df, "source", weights, n).collect()
        }
        assert got == py_mix(counts, weights, n), n
        assert sum(v[1] for v in got.values()) == n  # exact total, always


def test_mix_allocate_guards(spark):
    df = spark.createDataFrame([("a",)], "source string")
    with pytest.raises(ValueError, match="n_target"):
        mix_allocate(df, "source", {"a": 1}, -1)
    with pytest.raises(ValueError, match="weights"):
        mix_allocate(df, "source", {}, 10)
    with pytest.raises(ValueError, match="weights"):
        mix_allocate(df, "source", {"a": -2}, 10)
    with pytest.raises(ValueError, match="sum to 0"):
        mix_allocate(df, "source", {"a": 0}, 10)
