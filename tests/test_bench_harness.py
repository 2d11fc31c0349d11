"""Regression tests for bench.py's rerun policy plumbing (ADVICE r9):
the previous-round snapshot must be read from the MATCHED filename
(not a :02d reconstruction), and a recorded 0.0 timing must still arm
the regression-rerun comparison."""

from __future__ import annotations

import importlib.util
import json
import os


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_latest_prev_timings_reads_unpadded_filename(tmp_path):
    b = _bench()
    # an UNPADDED r9 snapshot newer than a padded r08 one: the regex
    # matches both; the pre-fix :02d rebuild would look for
    # BENCH_DETAIL_r09.json and crash
    (tmp_path / "BENCH_DETAIL_r08.json").write_text(
        json.dumps({"queries": {"q_x": 1.0}})
    )
    (tmp_path / "BENCH_DETAIL_r9.json").write_text(
        json.dumps({"queries": {"q_x": 2.0}})
    )
    assert b.latest_prev_timings(str(tmp_path)) == {"q_x": 2.0}
    # highest round wins regardless of padding order
    (tmp_path / "BENCH_DETAIL_r10.json").write_text(
        json.dumps({"queries": {"q_x": 3.0}})
    )
    assert b.latest_prev_timings(str(tmp_path)) == {"q_x": 3.0}


def test_latest_prev_timings_empty_when_no_snapshot(tmp_path):
    assert _bench().latest_prev_timings(str(tmp_path)) == {}


def test_should_rerun_zero_prev_still_arms_regression_check():
    b = _bench()
    # 0.0 prev is falsy: the pre-fix `prev and ...` skipped the
    # comparison and a 3s run over a 0.0 baseline never re-ran
    assert b.should_rerun(3.0, 0.0, cutoff=2.0, ratio=1.3)
    assert b.should_rerun(1.0, None, cutoff=2.0, ratio=1.3)  # under cutoff
    assert not b.should_rerun(3.0, None, cutoff=2.0, ratio=1.3)
    assert not b.should_rerun(3.0, 2.9, cutoff=2.0, ratio=1.3)
    assert b.should_rerun(3.0, 2.0, cutoff=2.0, ratio=1.3)
