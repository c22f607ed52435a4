"""BPE training-harness scaling pin: per-round cost must stay FLAT as
merges accumulate (the localCheckpoint lineage truncation doing its
job). Without it, each round's plan contains every prior round's
crossJoin and Catalyst analysis cost compounds -- by round 20 the
harness is analysis-bound, which is how a '4-round demo' fails to
become a real tokenizer. The pin compares late-round wall times to
early-round wall times over one 24-round run, which detects superlinear
growth directly and is robust to absolute machine speed."""

from __future__ import annotations

import pytest

from cassandra_sstable_to_protocolbuf_spark.plans.textops import bpe_train

SF_DIR = "/root/testdata/sf0.001"


def test_per_round_cost_stays_flat(spark):
    rounds = 24
    times: list[float] = []
    merges = bpe_train(spark, SF_DIR, rounds=rounds,
                       round_seconds=times).collect()

    assert len(merges) == rounds
    assert len(times) == rounds
    # training must actually merge: later winners contain earlier ones
    steps = {r["step"]: (r["a"], r["b"], r["pair_count"]) for r in merges}
    assert len(steps) == rounds
    assert all(c > 0 for _, _, c in steps.values())
    assert any(len(a.replace("|", "")) + len(b.replace("|", "")) > 2
               for a, b, _ in steps.values()), \
        "no multi-char symbol ever won: merges are not compounding"

    # the pin: mean of the last 8 rounds < 3x mean of rounds 2-9
    # (round 1 excluded: it pays JIT/codegen warmup). A lineage-growing
    # harness fails this by a wide margin (analysis cost compounds per
    # round); 3x absorbs shared-JVM GC noise.
    early = sum(times[1:9]) / 8
    late = sum(times[-8:]) / 8
    assert late < 3 * early, (
        f"per-round cost grew {late / early:.1f}x from early to late "
        f"rounds (early={early:.2f}s late={late:.2f}s): lineage or state "
        f"is accumulating across merges")


def test_round_count_is_a_parameter(spark):
    """4 rounds through the SAME harness must reproduce the prefix of a
    longer run: merge choice is deterministic and independent of the
    requested round count."""
    four = bpe_train(spark, SF_DIR, rounds=4).collect()
    eight = bpe_train(spark, SF_DIR, rounds=8).collect()
    key = lambda rows: [(r["step"], r["a"], r["b"], r["pair_count"])
                        for r in sorted(rows, key=lambda r: r["step"])]
    assert key(four) == key(eight)[:4]
