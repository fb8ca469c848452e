"""Pin bench.py's prior-record delta walk.

The r12 postmortem: BENCH_r12_sf1.json sorts lexicographically AFTER
BENCH_r12.json ("_" > "."), so the newest-first walk picked the sf1
record as the comparison baseline for an sf0.1 run and every
delta_vs_prev entry was cross-scale nonsense.  compute_deltas must skip
prior records whose recorded sf differs from the current run's.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compute_deltas


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_skips_prior_record_at_different_sf(tmp_path):
    _write(tmp_path, "BENCH_r11.json", {
        "queries": {"q1": 1.0}, "tier2": {"t1": 2.0}, "sf": 0.1,
    })
    # The r12 trap: the sf1 file sorts after the sf0.1 file.
    _write(tmp_path, "BENCH_r12.json", {
        "queries": {"q1": 1.5}, "tier2": {"t1": 2.5}, "sf": 0.1,
    })
    _write(tmp_path, "BENCH_r12_sf1.json", {
        "queries": {"q1": 9.0}, "tier2": {"t1": 20.0}, "sf": 1.0,
    })
    fname, delta, t2_delta = compute_deltas(
        str(tmp_path), 0.1, {"q1": 1.6}, {"t1": 2.4}
    )
    assert fname == "BENCH_r12.json"
    assert delta == {"q1": 0.1}
    assert t2_delta == {"t1": -0.1}


def test_sf1_run_compares_against_sf1_record(tmp_path):
    _write(tmp_path, "BENCH_r12.json", {"queries": {"q1": 1.5}, "sf": 0.1})
    _write(tmp_path, "BENCH_r12_sf1.json", {"queries": {"q1": 9.0}, "sf": 1.0})
    fname, delta, _ = compute_deltas(str(tmp_path), 1.0, {"q1": 10.0}, {})
    assert fname == "BENCH_r12_sf1.json"
    assert delta == {"q1": 1.0}


def test_driver_wrapped_parsed_record_unwraps(tmp_path):
    _write(tmp_path, "BENCH_r10.json", {
        "n": 10, "parsed": {"queries": {"q1": 2.0}, "sf": 0.1},
    })
    fname, delta, t2 = compute_deltas(str(tmp_path), 0.1, {"q1": 2.2}, {})
    assert fname == "BENCH_r10.json"
    assert delta == {"q1": 0.2}
    assert t2 == {}


def test_record_without_sf_is_accepted(tmp_path):
    # Records predating the sf marker keep working (old behavior).
    _write(tmp_path, "BENCH_r01.json", {"queries": {"q1": 3.0}})
    fname, delta, _ = compute_deltas(str(tmp_path), 0.1, {"q1": 2.0}, {})
    assert fname == "BENCH_r01.json"
    assert delta == {"q1": -1.0}


def test_malformed_file_costs_one_rung_not_the_feature(tmp_path):
    _write(tmp_path, "BENCH_r11.json", {"queries": {"q1": 1.0}, "sf": 0.1})
    (tmp_path / "BENCH_r12.json").write_text("{truncated")
    fname, delta, _ = compute_deltas(str(tmp_path), 0.1, {"q1": 1.3}, {})
    assert fname == "BENCH_r11.json"
    assert delta == {"q1": 0.3}


def test_non_object_json_costs_one_rung(tmp_path):
    # a file whose top level is a JSON array/string parses but has no
    # .get — it must cost one rung of recency, never the whole run
    _write(tmp_path, "BENCH_r11.json", {"queries": {"q1": 1.0}, "sf": 0.1})
    (tmp_path / "BENCH_r12.json").write_text('["not", "an", "object"]')
    fname, delta, _ = compute_deltas(str(tmp_path), 0.1, {"q1": 1.2}, {})
    assert fname == "BENCH_r11.json"
    assert delta == {"q1": 0.2}


def test_no_comparable_record_returns_none(tmp_path):
    _write(tmp_path, "BENCH_r12_sf1.json", {"queries": {"q1": 9.0}, "sf": 1.0})
    assert compute_deltas(str(tmp_path), 0.1, {"q1": 1.0}, {}) == (
        None, None, None,
    )
