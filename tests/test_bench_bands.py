"""The bench regression tripwire (bench.py check_bands): pure logic, no
Spark -- the full-bench integration run is documented in PARITY.md."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import check_bands  # noqa: E402

PREV = {
    "sf": 0.1,
    "query_spread": {
        "q_steady": {"min": 1.0, "max": 1.2},
        "q_fast": {"min": 0.1, "max": 0.2},
        "q_drift": {"min": 2.0, "max": 2.2},
    },
}


def test_flags_only_real_drift():
    out = check_bands(PREV, {
        "q_steady": 1.3,        # inside 1.5x band
        "q_fast": 0.45,         # >1.5x but under the absolute floor
        "q_drift": 4.0,         # genuine drift: 1.8x band max
        "q_new": 9.9,           # no committed band -> never flagged
    }, sf=0.1)
    assert out == {"q_drift": {"new": 4.0, "band_max": 2.2}}


def test_different_sf_never_compares():
    assert check_bands(PREV, {"q_drift": 99.0}, sf=0.01) == {}


def test_improvements_never_flagged():
    assert check_bands(PREV, {"q_drift": 0.9, "q_steady": 0.5}, sf=0.1) == {}
