"""Pin bench.py's emitted JSON line under the driver's tail capture.

r3 lost its scored number to a timeout; r4 lost it to LINE LENGTH: the
driver captures only the tail of stdout (observed: last ~2000 chars) and
r4's single JSON line was 2,287 chars, so `BENCH_r04.json` recorded
``parsed: null`` despite a perfect run.  These tests construct a payload
with EVERY field a full run populates (the r4 superset plus the r5
roofline columns) and assert the rendered line stays well inside the
capture window — on the success path, the partial path, and the
error-with-last-good path — plus the hard-trim guard for any future
growth.
"""

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("bench")
    importlib.reload(mod)  # fresh RESULTS/_EMITTED between tests
    monkeypatch.setattr(mod, "LAST_GOOD_PATH", str(tmp_path / "lg.json"))
    return mod


# Every detail field a complete run can populate, with realistic widths
# (r4's BENCH_LAST_GOOD values), plus the r5 roofline-ratio columns and
# the r5 scheduler-SLA latency columns.
FULL_RESULTS = {
    "device": "TPU v5 lite0",
    "dtype": "bfloat16",
    "tokens_per_window": 132,
    "rtf_wall": 0.005717,
    "p50_partial_latency_ms": 204.9,
    "t_window_single_ms": 171.5,
    "t_window_single_device_ms": 63.6,
    "rtf_device": 0.002122,
    "rr_single": 1.48,
    "t_window_w8_decoder_ms": 185.4,
    "rtf_w8_decoder": 0.006181,
    "t_window_w8_decoder_device_ms": 49.1,
    "rtf_w8_decoder_device": 0.001638,
    "rr_w8": 1.52,
    "t_window_batched8_ms": 383.3,
    "rtf_per_stream_batched8": 0.001597,
    "realtime_streams_per_chip_batched": 626,
    "t_window_batched8_device_ms": 349.1,
    "rtf_per_stream_batched8_device": 0.001454,
    "rr_b8": 2.21,
    "t_window_batched8_serving_ms": 250.3,
    "rtf_per_stream_batched8_serving": 0.001043,
    "t_window_batched8_serving_device_ms": 211.3,
    "rtf_per_stream_batched8_serving_device": 0.000881,
    "realtime_streams_per_chip_serving_device": 1135,
    "rr_serving": 2.35,
    "lat_ready_to_applied_p50_ms": 719.0,
    "lat_ready_to_applied_p99_ms": 1065.8,
    "lat_samples": 146,
    "lat_admit_to_first_partial_p50_ms": 2123.9,
    "lat_admit_to_first_partial_p99_ms": 2126.3,
    "lat_sla_target_p99_ms": 800.0,
    "lat_sla_round_cap": 8,
    "lat_round_cost_ema_ms": 255.3,
}

# Margin under the observed ~2000-char capture: the whole line must fit
# in the tail even with a few hundred chars of trailing progress noise.
SUCCESS_BUDGET = 1500


def _render(bench):
    line = bench.render_line(bench.build_payload())
    json.loads(line)  # must be one parseable JSON document
    return line


def test_success_payload_fits(bench):
    bench.RESULTS.update(FULL_RESULTS)
    bench._HEADLINE["rtf"] = 0.005717
    line = _render(bench)
    assert len(line) < SUCCESS_BUDGET, (len(line), line)
    parsed = json.loads(line)
    assert parsed["value"] == 0.005717
    # Every detail field must survive rendering (nothing trimmed).
    for k in FULL_RESULTS:
        assert k in parsed["detail"], k


def test_partial_payload_fits(bench):
    bench.RESULTS.update(FULL_RESULTS)
    bench._HEADLINE["rtf"] = 0.005717
    line = bench.render_line(bench.build_payload(partial=True))
    assert len(line) < SUCCESS_BUDGET + 100


def test_error_with_last_good_fits(bench, tmp_path):
    # Error path carries a COMPACT last-good view, not the full artifact.
    lg = {
        "metric": "rtf_distil_large_v3_stream",
        "value": 0.005717,
        "vs_baseline": 8.75,
        "measured_at_utc": "2026-08-20T12:42:00Z",
        "detail": dict(FULL_RESULTS, methodology="x" * 1200),
    }
    (tmp_path / "lg.json").write_text(json.dumps(lg))
    bench.RESULTS["device"] = "cpu"
    line = bench.render_line(
        bench.build_payload(error="tunnel down " * 50)  # long error capped
    )
    assert len(line) <= bench.LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["value"] is None
    assert parsed["detail"]["last_good"]["value"] == 0.005717
    assert len(parsed["detail"]["error"]) <= 300


def test_hard_trim_guard(bench):
    # Future growth cannot push the line past the budget: render_line
    # drops the longest detail entries first and stays parseable.
    bench.RESULTS.update(FULL_RESULTS)
    bench.RESULTS["huge_debug_blob"] = "y" * 5000
    bench._HEADLINE["rtf"] = 0.005
    line = _render(bench)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert "huge_debug_blob" not in parsed["detail"]
    assert parsed["detail"]["trimmed_fields"] >= 1
    assert parsed["value"] == 0.005  # headline fields are never trimmed
