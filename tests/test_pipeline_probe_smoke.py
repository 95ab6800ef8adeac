"""Composition smoke: the end-to-end pipeline probe at 200k docs.

Per-operator fixtures structurally cannot see cross-stage interactions —
the 10M-doc probe (tools/probe_pipeline_scale.py) caught the correlated
MinHash coefficient family and the 28-bit identity-key birthday
collisions in r9, bugs invisible to every unit fixture. This wires the
same closed-form-exact chain into the suite at 200k base docs (the r9
smoke scale at which the 28-bit collisions were FIRST observable) so any
future dedup/hash/quality/decontam change re-proves the composition.

run_probe asserts the exact expected row count at every stage boundary
(dedup survivors, quality survivors, decontam flags, mixture allocation)
and raises AssertionError on any mismatch.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from probe_pipeline_scale import run_probe  # noqa: E402


def test_pipeline_probe_200k_boundaries_exact(spark):
    timings = run_probe(spark, 200_000, 20_000)
    labels = [t[0] for t in timings]
    assert labels == [
        "generate", "exact_dedup", "minhash_dedup",
        "quality", "decontam", "mix_take",
    ]
    # row counts were asserted closed-form inside run_probe; re-assert
    # the headline survivor count here so the test is self-describing:
    # 200k base + 20k exact clones + 10k near clones = 230k generated
    assert timings[0][2] == 230_000
