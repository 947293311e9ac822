"""Benchmark: distil-large-v3 streaming real-time factor on one TPU chip.

Times the PRODUCTION path wall-clock: ``LongFormDecoder.transcribe`` over a
30s window — log-mel, encoder forward, cross-KV, prefill, no-speech probe,
and the on-device token loop, plus all host orchestration — on the flagship
model dims (distil-large-v3, bf16; random weights, since checkpoints are
not downloadable in this environment and RTF is weight-independent).

To make the decoded-token count deterministic with random weights, the EOT
id is set to an unreachable value and max_target_positions to 136, so every
window decodes exactly 132 tokens (a realistic-to-pessimistic count for 30s
of speech; Whisper emits ~60-100 text+timestamp tokens per window).

SCORED CORE ONLY.  Round 3's bench grew to ~12 arms (large-v3 plain /
speculative / serving, turbo, w8a8-alone, flash-alone ...) and timed out
the driver's budget — the scored artifact recorded rc=124 and NOTHING
else.  This script now measures exactly four arms (single-stream bf16,
single-stream w8-decoder, batched-8 plain, batched-8 full serving stack),
collects results INCREMENTALLY, and runs under a hard wall-clock budget
(``NORMA_BENCH_BUDGET_S``, default 900 s): a watchdog emits whatever has
been measured and exits 0 rather than letting a slow tunnel/compile erase
the round.  The exploratory arms live in ``tools/perf_full_sweep.py``.

Baseline (BASELINE.md): target RTF <= 0.05 (>= 20x real-time) per stream.
``vs_baseline`` = target/actual, so > 1.0 beats the target.

Prints ONE JSON line.
"""

import json
import os
import statistics
import threading
import time

import numpy as np

TOKENS_PER_WINDOW = 132  # max_target_positions=136 minus prefix+final slot
TARGET_RTF = 0.05
BUDGET_S = float(os.environ.get("NORMA_BENCH_BUDGET_S", "900"))
_T0 = time.monotonic()

# A successful run caches its full result here so a tunnel outage at
# measurement time (observed for hours at a stretch) degrades the scored
# artifact to "null THIS run + last good measurement, clearly stamped"
# instead of erasing the round's evidence.
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LAST_GOOD.json")

# Incrementally-filled detail dict: every completed arm lands here the
# moment it is measured, so the watchdog can emit a partial-but-real
# result if a later arm stalls.
RESULTS = {}
_HEADLINE = {"rtf": None}
_EMIT_LOCK = threading.Lock()
_EMITTED = False

# The driver captures only the TAIL of stdout (observed: last ~2000 chars)
# and parses the last JSON line out of it.  r4's perfect run scored
# ``parsed: null`` because the line was 2,287 chars and its head was
# truncated — so the emitted line is now BUDGETED: long prose lives in
# PERF.md, the line carries numbers only, and emit() hard-trims as a last
# resort.  tests/test_bench_emit.py pins a fully-populated payload under
# this budget.
LINE_BUDGET = 1900


def time_left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _last_good_compact() -> dict:
    """Headline-only view of the cached last-good result (the full artifact
    stays in BENCH_LAST_GOOD.json): carried on the error path so an outage
    at scoring time doesn't erase the round's evidence without blowing the
    emitted line's budget."""
    try:
        with open(LAST_GOOD_PATH) as f:
            lg = json.load(f)
    except Exception:
        return None
    d = lg.get("detail", {})
    return {
        "value": lg.get("value"),
        "vs_baseline": lg.get("vs_baseline"),
        "measured_at_utc": lg.get("measured_at_utc"),
        "device": d.get("device"),
        "streams_per_chip_serving": d.get(
            "realtime_streams_per_chip_serving_device"
        ),
        "note": "STALE: most recent successful run; full detail in "
                "BENCH_LAST_GOOD.json",
    }


def build_payload(error: str = None, partial: bool = False) -> dict:
    """The scored result dict.  Kept separate from emit() so the length
    test can pin a fully-populated payload without printing."""
    detail = dict(RESULTS)
    detail["methodology"] = "PERF.md 'Scored bench methodology'"
    if partial:
        detail["partial"] = "budget hit; fields above are measured arms"
    if error:
        detail["error"] = str(error)[:300]
        lg = _last_good_compact()
        if lg:
            detail["last_good"] = lg
    rtf = _HEADLINE["rtf"]
    return {
        "metric": "rtf_distil_large_v3_stream",
        "value": None if rtf is None else round(rtf, 6),
        "unit": "rtf (wall-clock per 30s window / 30s; lower is better)",
        "vs_baseline": None if rtf is None else round(TARGET_RTF / rtf, 2),
        "detail": detail,
    }


def render_line(result: dict) -> str:
    """Serialize compactly; if over budget, drop the longest detail
    entries until it fits (never the headline fields)."""
    line = json.dumps(result, separators=(",", ":"))
    if len(line) <= LINE_BUDGET:
        return line
    detail = dict(result["detail"])
    trimmed = 0
    for k in sorted(
        detail, key=lambda k: len(json.dumps(detail[k], default=str)),
        reverse=True,
    ):
        detail.pop(k)
        trimmed += 1
        detail["trimmed_fields"] = trimmed
        line = json.dumps(
            {**result, "detail": detail}, separators=(",", ":")
        )
        if len(line) <= LINE_BUDGET:
            return line
    return json.dumps({**result, "detail": {}}, separators=(",", ":"))


def emit(error: str = None, partial: bool = False) -> None:
    """Print the ONE scored JSON line (idempotent: first call wins)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    result = build_payload(error=error, partial=partial)
    rtf = _HEADLINE["rtf"]
    print(render_line(result))
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    # Cache for the tunnel-down fallback.  Only real, complete chip
    # measurements qualify: a CPU-backend run (tunnel down but probe
    # answered with the host platform) must not overwrite a genuine chip
    # result, and a partial run must not overwrite a complete one.
    if (
        rtf is not None
        and not partial
        and not error
        and not RESULTS.get("tiny")  # CI dry-run numbers are meaningless
        and "TPU" in RESULTS.get("device", "")
    ):
        try:
            cached = dict(result)
            cached["measured_at_utc"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            tmp = LAST_GOOD_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cached, f, indent=1)
                f.write("\n")
            os.replace(tmp, LAST_GOOD_PATH)
        except Exception as e:  # pragma: no cover - disk issues
            print(f"# could not write {LAST_GOOD_PATH}: {e!r}")


def _watchdog() -> None:
    """Emit whatever has been measured when the budget runs out.

    os._exit because the stalled arm may be wedged inside native tunnel
    code that ignores interpreters' shutdown.
    """
    delay = max(5.0, time_left())
    time.sleep(delay)
    emit(partial=True)
    os._exit(0)


def device_ms_per_window(fn, n: int, tag: str):
    """DEVICE milliseconds per window call, from a jax.profiler xplane.

    Wall-clock through the remotely-attached TPU carries ~70-200 ms/call
    of tunnel dispatch+fetch overhead, so the device-side time from the
    profiler is the trustworthy per-window number (PERF.md methodology).
    Returns None when profiling is unavailable (e.g. no tensorflow proto
    parser on the host) — the bench then reports wall only.
    """
    try:
        from norma_tpu.tracing import profiled_device_ms

        avg, _ = profiled_device_ms(fn, n, f"/tmp/norma_bench_prof/{tag}")
        return avg
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"# device profiling unavailable ({tag}): {e!r}")
        return None


class _NullTokenizer:
    def decode(self, ids, skip_special_tokens=True):
        return ""

    def token_to_id(self, s):
        return None


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """Bounded backend-liveness probe.

    The tunneled TPU backend can hang jax.devices() INDEFINITELY when the
    tunnel is down (observed for hours); without this bound the bench (and
    the driver waiting on it) would hang instead of recording a result.
    The probe runs in a daemon thread so a hung backend can't block exit.
    """
    ok = []

    def probe():
        import jax

        ok.append(str(jax.devices()[0]))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _rtf_of(ms):
    return None if ms is None else round(ms / 1e3 / 30.0, 6)


def _r(ms):
    return None if ms is None else round(ms, 1)


HBM_GBPS = 819.0  # v5e datasheet streaming bandwidth


def roofline_ratio(device_ms, engine, B, skv_rows, rungs) -> float:
    """``device_ms`` / the window's HBM streaming-roofline ms.

    The roofline counts the minimum bytes one window MUST read from HBM
    (encoder weights once; then per decode step: decoder weights + the
    per-stream cross-K/V + the average-fill self-KV rows), over the v5e
    streaming bandwidth.  It deliberately ignores compute (the B<=8 decode
    regime is bandwidth-bound — PERF.md loop tables) and write traffic, so
    the ratio is a DRIFT SIGNAL across rounds per arm, not an absolute MFU:
    a regression shows as the ratio creeping up even when arms are
    redefined.  Methodology mirrors tools/perf_step_attr.py.

    skv_rows: decode rows per stream reading their own self-KV cache
    (speculative ladder: len(TEMPERATURES); sequential: 1).
    rungs: sequential ladder passes actually decoded (this bench's random
    weights fail the logprob gate at every temperature, so the sequential
    arms decode all len(TEMPERATURES) rungs; speculative decodes its rows
    concurrently in 1 pass).
    """
    if device_ms is None:
        return None
    import jax

    tb = lambda t: sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(t)
    )
    cfg = engine.cfg
    enc_b = tb(engine.params["encoder"])
    dec_b = tb(engine.params["decoder"])
    L, D, Ta = cfg.decoder_layers, cfg.d_model, cfg.max_source_positions
    if engine.quantize_cross_kv:
        xkv_b = 2 * L * (Ta * D + D * 4)  # int8 codes + f32 scales
    else:
        xkv_b = 2 * L * Ta * D * 2  # bf16
    # Self-KV rows live at the average fill over the forced decode
    # (prefix 3 .. 3+TOKENS_PER_WINDOW), bf16.
    fill = 3 + TOKENS_PER_WINDOW / 2.0
    skv_b = 2 * L * fill * D * 2
    steps = TOKENS_PER_WINDOW * rungs
    total = enc_b + steps * (dec_b + B * (xkv_b + skv_rows * skv_b))
    roof_ms = total / (HBM_GBPS * 1e6)
    return round(device_ms / roof_ms, 2)


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()

    if not _probe_backend(min(180.0, max(10.0, time_left() - 30.0))):
        emit(error="jax backend initialization timed out (TPU tunnel "
                   "down); no measurement possible")
        import sys

        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)  # the probe thread may be wedged in native code

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES, TEMPERATURES
    from norma_tpu.decode import DecodeEngine, LanguageState, LongFormDecoder
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import (
        quantize_decoder,
        quantize_encoder,
    )

    dev = jax.devices()[0]
    RESULTS["device"] = str(dev)
    RESULTS["dtype"] = "bfloat16"
    RESULTS["tokens_per_window"] = TOKENS_PER_WINDOW

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    if os.environ.get("NORMA_BENCH_TINY") == "1":
        # CI structural dry-run (check.yml): every arm's engine
        # construction and program shape compiles and runs on CPU at toy
        # dims in seconds, so arm growth or a broken quant/serving
        # config surfaces in CI — not in the driver's scored run (the
        # r3 failure mode).  The numbers are meaningless; the artifact
        # marks itself tiny.
        cfg = cfg.with_(
            d_model=128, encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            max_source_positions=64, max_target_positions=16,
        )
        RESULTS["tiny"] = True
    n_window_samples = (
        N_SAMPLES
        if cfg.max_source_positions == 1500
        else (2 * cfg.max_source_positions - 1) * 160 + 400
    )
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    params = jax.device_put(params, dev)

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    engine = DecodeEngine(params, cfg, st)

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(n_window_samples)).astype(np.float32)

    def make_lf(e=engine):
        return LongFormDecoder(e, _NullTokenizer(), LanguageState(const=50259))

    # ---- Arm 1: single-stream bf16 (the headline metric) -------------
    make_lf().transcribe(audio, final_chunk=True)  # warmup/compile
    singles = []
    for _ in range(4):
        t0 = time.perf_counter()
        make_lf().transcribe(audio, final_chunk=True)
        singles.append(time.perf_counter() - t0)
    t_single = min(singles)
    rtf = t_single / 30.0
    _HEADLINE["rtf"] = rtf
    RESULTS.update(
        {
            "rtf_wall": round(rtf, 6),
            # Partial-transcript latency == time from a window's audio
            # being complete to its text being available, i.e. one
            # window's decode wall-clock.  A true median of the runs
            # (min would understate on the tunnel).
            "p50_partial_latency_ms": round(
                statistics.median(singles) * 1e3, 1
            ),
            "t_window_single_ms": round(t_single * 1e3, 1),
        }
    )
    print(f"# arm single done at +{time.monotonic() - _T0:.0f}s")
    d_single = device_ms_per_window(
        lambda: make_lf().transcribe(audio, final_chunk=True), 2, "single"
    )
    RESULTS["t_window_single_device_ms"] = _r(d_single)
    RESULTS["rtf_device"] = _rtf_of(d_single)
    R = len(TEMPERATURES)  # single-stream arm: speculative, R rows, 1 pass
    RESULTS["rr_single"] = roofline_ratio(d_single, engine, 1, R, 1)

    # ---- Arm 2: single-stream int8 decoder weights -------------------
    # quantize_decoder is the recommended quant tier (-32% loop device
    # time, PERF.md); measured so the scored artifact carries the
    # single-stream operating point users are told to run.
    e_w8 = DecodeEngine(jax.device_put(quantize_decoder(params), dev), cfg, st)

    def run_w8():
        t0 = time.perf_counter()
        make_lf(e_w8).transcribe(audio, final_chunk=True)
        return time.perf_counter() - t0

    run_w8()  # warmup
    t_w8 = min(run_w8() for _ in range(4))
    RESULTS.update(
        {
            "t_window_w8_decoder_ms": round(t_w8 * 1e3, 1),
            "rtf_w8_decoder": round(t_w8 / 30.0, 6),
        }
    )
    print(f"# arm w8_decoder done at +{time.monotonic() - _T0:.0f}s")
    d_w8 = device_ms_per_window(run_w8, 2, "w8_decoder")
    RESULTS["t_window_w8_decoder_device_ms"] = _r(d_w8)
    RESULTS["rtf_w8_decoder_device"] = _rtf_of(d_w8)
    RESULTS["rr_w8"] = roofline_ratio(d_w8, e_w8, 1, R, 1)

    # ---- Arm 3: batched B=8 plain (the multi-stream scheduler shape) --
    # One fused dispatch covering mel -> encoder -> prefill -> the
    # sequential on-device rung ladder for 8 concurrent streams.
    B = 8
    windows = np.stack(
        [prepare_audio(
            (0.1 * rng.standard_normal(n_window_samples)).astype(np.float32),
            n_frames=2 * cfg.max_source_positions,
         )
         for _ in range(B)]
    )
    wj = jnp.asarray(windows)

    def run_batched():
        t0 = time.perf_counter()
        engine.transcribe_window(wj, [50259] * B, seed=0)
        return time.perf_counter() - t0

    run_batched()  # warmup/compile
    t_batched = min(run_batched() for _ in range(4))
    rtf8 = t_batched / 30.0 / B
    RESULTS.update(
        {
            "t_window_batched8_ms": round(t_batched * 1e3, 1),
            "rtf_per_stream_batched8": round(rtf8, 6),
            "realtime_streams_per_chip_batched": int(1.0 / rtf8),
        }
    )
    print(f"# arm batched8 done at +{time.monotonic() - _T0:.0f}s")
    d_batched = device_ms_per_window(run_batched, 2, "batched8")
    RESULTS["t_window_batched8_device_ms"] = _r(d_batched)
    RESULTS["rtf_per_stream_batched8_device"] = (
        None if d_batched is None else round(d_batched / 1e3 / 30.0 / B, 6)
    )
    # Batched arms: sequential ladder, every rung decoded (gate fails on
    # random weights) — see roofline_ratio's docstring.
    RESULTS["rr_b8"] = roofline_ratio(d_batched, engine, B, 1, R)

    # ---- Arm 4: batched B=8 FULL serving stack ------------------------
    # jax_flash encoder + w8a8 encoder projections + int8 decoder weights
    # + int8 cross-KV through the STACKED Pallas decode kernel: the best
    # measured B=8 distil config (225.0 ms einsum -> 211.3 ms kernel on
    # v5e after the r4 stacked-layer change — PERF.md "Levers").
    e_serving = DecodeEngine(
        jax.device_put(quantize_encoder(quantize_decoder(params)), dev),
        cfg.with_(encoder_attn_impl="jax_flash", cross_kv_impl="kernel"),
        st,
        quantize_cross_kv=True,
    )

    def run_serving():
        t0 = time.perf_counter()
        e_serving.transcribe_window(wj, [50259] * B, seed=0)
        return time.perf_counter() - t0

    run_serving()  # warmup/compile
    t_bs = min(run_serving() for _ in range(4))
    RESULTS.update(
        {
            "t_window_batched8_serving_ms": round(t_bs * 1e3, 1),
            "rtf_per_stream_batched8_serving": round(t_bs / 30.0 / B, 6),
        }
    )
    print(f"# arm batched8_serving done at +{time.monotonic() - _T0:.0f}s")
    d_bs = device_ms_per_window(run_serving, 2, "batched8_serving")
    RESULTS["t_window_batched8_serving_device_ms"] = _r(d_bs)
    RESULTS["rtf_per_stream_batched8_serving_device"] = (
        None if d_bs is None else round(d_bs / 1e3 / 30.0 / B, 6)
    )
    if d_bs is not None:
        RESULTS["realtime_streams_per_chip_serving_device"] = int(
            30.0 * B / (d_bs / 1e3)
        )
    RESULTS["rr_serving"] = roofline_ratio(d_bs, e_serving, B, 1, R)

    # ---- Arm 5: multi-stream latency under live churn ----------------
    # 8 realtime synthetic streams through the production batching
    # scheduler for ~25 s, reporting admission->first-partial and
    # ready->applied percentiles from BatchedTranscriber.metrics() —
    # the admission-latency floor the VERDICT asked to measure, on the
    # same already-compiled batched programs (arm 3).  Skipped when the
    # watchdog budget is nearly spent.
    if time_left() > 240:
        try:
            from norma_tpu.audio.sources import SyntheticSource
            from norma_tpu.decode.longform import LanguageState as _LS
            from norma_tpu.input import Settings
            from norma_tpu.models.whisper.model import WhisperModel
            from norma_tpu.runtime.batching import BatchedTranscriber

            class _IdsTok:
                # Non-empty text per drained segment so the admission->
                # first-partial series populates (host-side only; the
                # device programs are the already-compiled arm-3 ones).
                def decode(self, ids, skip_special_tokens=True):
                    return " ".join(str(int(i)) for i in ids) or "."

                def token_to_id(self, s):
                    return None

            model = WhisperModel(engine, _IdsTok(), _LS(const=50259))
            # r5 serving posture: SLA-sized rounds (auto round width from
            # the measured cost EMA) + the early first-partial flush —
            # the two latency levers VERDICT r4 #4/#7 asked to own.
            bt = BatchedTranscriber(
                model, max_streams=8,
                target_p99_ms=800.0, first_partial_seconds=0.4,
            )
            bt.warmup()
            handles = [
                bt.blocking_start(Settings(source=SyntheticSource(
                    sample_rate=16_000, channels=1, duration=22.0,
                    freq=220.0 + 20 * i, realtime=True,
                )))
                for i in range(8)
            ]
            drains = [
                threading.Thread(
                    target=lambda h=h: list(h.receiver), daemon=True
                )
                for h in handles
            ]
            for t in drains:
                t.start()
            for t in drains:
                t.join(timeout=min(90.0, max(5.0, time_left() - 20.0)))
            m = bt.metrics()
            lat = m["latency"]
            bt.close()
            ra, af = lat["ready_to_applied"], lat["admit_to_first_partial"]
            if ra:
                RESULTS["lat_ready_to_applied_p50_ms"] = ra["p50_ms"]
                RESULTS["lat_ready_to_applied_p99_ms"] = ra["p99_ms"]
                RESULTS["lat_samples"] = ra["n"]
            if af:
                RESULTS["lat_admit_to_first_partial_p50_ms"] = af["p50_ms"]
                RESULTS["lat_admit_to_first_partial_p99_ms"] = af["p99_ms"]
            if m.get("sla"):
                RESULTS["lat_sla_target_p99_ms"] = m["sla"]["target_p99_ms"]
                RESULTS["lat_sla_round_cap"] = m["sla"]["round_cap"]
            ema = m.get("round_cost_ema_ms") or {}
            if ema:
                RESULTS["lat_round_cost_ema_ms"] = ema[max(ema)]
            print(f"# arm latency done at +{time.monotonic() - _T0:.0f}s")
        except (TypeError, AttributeError, NameError, KeyError):
            raise  # programming error, not an environment failure
        except Exception as e:  # pragma: no cover - environment-dependent
            print(f"# latency arm unavailable: {e!r}")

    # Full methodology prose lives in PERF.md "Scored bench methodology"
    # (build_payload emits a pointer): r4's run scored parsed:null because
    # the inline ~1.1 kB string pushed the line past the driver's tail
    # capture.
    emit()


if __name__ == "__main__":
    main()
