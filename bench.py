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

Also reports the batched path: the same engine calls at B=8 (the
multi-stream scheduler's shape), giving per-stream RTF when 8 microphones
share the chip.

Baseline (BASELINE.md): target RTF <= 0.05 (>= 20x real-time) per stream.
``vs_baseline`` = target/actual, so > 1.0 beats the target.

Prints ONE JSON line.
"""

import json
import os
import statistics
import time

import numpy as np

TOKENS_PER_WINDOW = 132  # max_target_positions=136 minus prefix+final slot

# A successful run caches its full result here so a tunnel outage at
# measurement time (observed for hours at a stretch) degrades the scored
# artifact to "null THIS run + last good measurement, clearly stamped"
# instead of erasing the round's evidence.
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LAST_GOOD.json")


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
    import threading

    ok = []

    def probe():
        import jax

        ok.append(str(jax.devices()[0]))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main() -> None:
    if not _probe_backend():
        detail = {
            "error": "jax backend initialization timed out "
            "(TPU tunnel down); no measurement possible",
        }
        try:
            with open(LAST_GOOD_PATH) as f:
                # STALE result from the most recent successful run of this
                # same script (its own measured_at_utc stamps it) — carried
                # so an outage at scoring time doesn't erase the round's
                # measured evidence.  value stays null: nothing was
                # measured THIS run.
                detail["last_good"] = json.load(f)
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": "rtf_distil_large_v3_stream",
                    "value": None,
                    "unit": "rtf (wall-clock per 30s window / 30s; lower is better)",
                    "vs_baseline": None,
                    "detail": detail,
                }
            )
        )
        import sys

        # os._exit skips io flushing; with stdout piped (tee in the hw
        # runbook, the driver's capture) the buffered JSON line — the whole
        # point of this branch — would be lost.  NOTE: do not `import os`
        # here — a function-local import shadows the module-level one for
        # the WHOLE function, so the happy path's os.replace at the bottom
        # would raise UnboundLocalError whenever this branch didn't run.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)  # the probe thread may be wedged in native code

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine, LanguageState, LongFormDecoder
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.model import PRESETS, fuse_qkv, init_params

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    params = jax.device_put(params, jax.devices()[0])

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    engine = DecodeEngine(params, cfg, st)

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)

    def make_lf():
        return LongFormDecoder(
            engine, _NullTokenizer(), LanguageState(const=50259)
        )

    # Warmup (compiles everything the production path uses).
    make_lf().transcribe(audio, final_chunk=True)

    def run_single():
        t0 = time.perf_counter()
        make_lf().transcribe(audio, final_chunk=True)
        return time.perf_counter() - t0

    singles = [run_single() for _ in range(4)]
    t_single = min(singles)
    t_single_p50 = statistics.median(singles)
    rtf = t_single / 30.0
    d_single = device_ms_per_window(
        lambda: make_lf().transcribe(audio, final_chunk=True), 2, "single"
    )

    # Quantized variants: int8 logits head (quantize_logits — the
    # measured -10% device win, PERF.md) and full int8 decoder weights
    # (quantize_decoder — a memory lever).
    from norma_tpu.model.quant import quantize_decoder, quantize_logits_head

    def time_variant(qparams, tag):
        e = DecodeEngine(jax.device_put(qparams, jax.devices()[0]), cfg, st)

        def run():
            t0 = time.perf_counter()
            LongFormDecoder(
                e, _NullTokenizer(), LanguageState(const=50259)
            ).transcribe(audio, final_chunk=True)
            return time.perf_counter() - t0

        run()  # warmup
        wall = min(run() for _ in range(4))
        dev = device_ms_per_window(run, 2, tag)
        return wall, dev

    t_w8h, d_w8h = time_variant(quantize_logits_head(params), "w8_head")
    t_w8, d_w8 = time_variant(quantize_decoder(params), "w8_decoder")

    # Batched shape: B=8 windows through the PRODUCTION fused program
    # (the multi-stream scheduler's exact call: one dispatch covering
    # mel -> encoder -> prefill -> temperature ladder; at 8 streams the
    # engine picks the SEQUENTIAL on-device rung loop, since 8x6 = 48
    # concurrent rows would exceed the speculative-rows threshold).
    from norma_tpu.frontend.mel import prepare_audio

    B = 8
    windows = np.stack(
        [prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
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
    d_batched = device_ms_per_window(run_batched, 2, "batched8")

    # Opt-in serving config: tuned-tile flash attention in the encoder
    # (encoder_attn_impl="jax_flash") — the measured batched window win
    # (348 -> 267 ms device on v5e, tools/perf_encoder_ab.py).  Opt-in
    # because its bf16 tile math drifts transcripts on knife-edge
    # random-weight models (PERF.md accuracy ladder); reported here so
    # the scored artifact carries the throughput ceiling too.
    e_flash = DecodeEngine(
        params, cfg.with_(encoder_attn_impl="jax_flash"), st
    )

    def run_batched_flash():
        t0 = time.perf_counter()
        e_flash.transcribe_window(wj, [50259] * B, seed=0)
        return time.perf_counter() - t0

    run_batched_flash()  # warmup/compile
    t_bf = min(run_batched_flash() for _ in range(4))
    d_bf = device_ms_per_window(run_batched_flash, 2, "batched8_flash")

    # Full opt-in serving stack: flash encoder + int8 decoder weights +
    # int8 cross-KV (quantize_cross_kv) — the measured best B=8 config
    # (347.9 -> 242.6 ms device on v5e, -30%; see PERF.md).
    e_serving = DecodeEngine(
        jax.device_put(quantize_decoder(params), jax.devices()[0]),
        cfg.with_(encoder_attn_impl="jax_flash"), st,
        quantize_cross_kv=True,
    )

    def run_batched_serving():
        t0 = time.perf_counter()
        e_serving.transcribe_window(wj, [50259] * B, seed=0)
        return time.perf_counter() - t0

    run_batched_serving()  # warmup/compile
    t_bs = min(run_batched_serving() for _ in range(4))
    d_bs = device_ms_per_window(run_batched_serving, 2, "batched8_serving")

    # w8a8 encoder (quantize_encoder): int8-MXU projection matmuls — the
    # compute lever for the window-dominant encoder (PERF.md).  Measured
    # alone at B=8 (isolates the encoder effect) and stacked on the full
    # serving config.  Guarded: the axon TPU plugin has broken exotic
    # dtypes before (jnp int4), so a failure reports null rather than
    # sinking the bench.
    e8_fields = {}
    try:
        from norma_tpu.model.quant import quantize_encoder

        params_e8 = jax.device_put(quantize_encoder(params), jax.devices()[0])
        e_e8 = DecodeEngine(params_e8, cfg, st)

        def run_batched_e8():
            t0 = time.perf_counter()
            e_e8.transcribe_window(wj, [50259] * B, seed=0)
            return time.perf_counter() - t0

        run_batched_e8()  # warmup/compile
        t_e8 = min(run_batched_e8() for _ in range(4))
        d_e8 = device_ms_per_window(run_batched_e8, 2, "batched8_e8")

        e_serving8 = DecodeEngine(
            jax.device_put(
                quantize_encoder(quantize_decoder(params)), jax.devices()[0]
            ),
            cfg.with_(encoder_attn_impl="jax_flash"), st,
            quantize_cross_kv=True,
        )

        def run_batched_serving8():
            t0 = time.perf_counter()
            e_serving8.transcribe_window(wj, [50259] * B, seed=0)
            return time.perf_counter() - t0

        run_batched_serving8()  # warmup/compile
        t_s8 = min(run_batched_serving8() for _ in range(4))
        d_s8 = device_ms_per_window(run_batched_serving8, 2, "batched8_serving_e8")
        e8_fields = {
            "t_window_batched8_e8_ms": round(t_e8 * 1e3, 1),
            "t_window_batched8_e8_device_ms": (
                None if d_e8 is None else round(d_e8, 1)
            ),
            "t_window_batched8_serving_e8_ms": round(t_s8 * 1e3, 1),
            "t_window_batched8_serving_e8_device_ms": (
                None if d_s8 is None else round(d_s8, 1)
            ),
            "rtf_per_stream_batched8_serving_e8_device": (
                None if d_s8 is None
                else round(d_s8 / 1e3 / 30.0 / B, 6)
            ),
        }
        del e_e8, e_serving8, params_e8
    except (TypeError, AttributeError, NameError, KeyError):
        raise  # programming error, not an environment failure
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"# w8a8 encoder bench unavailable: {e!r}")

    # Speculative decoding on the DEEP target (large-v3): the distil-dims
    # draft proposes 4 tokens/round, the 32-layer target verifies them in
    # one chunked forward (decode/speculative.py).  The r3 serving lever
    # for quality-first deployments; guarded so a failure never sinks the
    # bench.
    lv3_spec = {}
    try:
        from norma_tpu.decode import SpeculativeEngine

        tcfg = PRESETS["large-v3"].with_(max_target_positions=136)
        # fuse_qkv on BOTH models: every other bench arm and the production
        # loader run fused-QKV params; unfused lv3 arms would bias the
        # baseline and the speculative speedup (~15%/step per
        # tools/perf_decoder_ab.py) and make the rows incomparable.
        tgt = jax.device_put(
            fuse_qkv(init_params(tcfg, seed=0, dtype=jnp.bfloat16)),
            jax.devices()[0],
        )
        # cfg here is distil-large-v3 dims == the official draft's dims.
        draft = jax.device_put(
            fuse_qkv(init_params(cfg, seed=7, dtype=jnp.bfloat16)),
            jax.devices()[0],
        )
        wj1 = wj[:1]

        e_lv3 = DecodeEngine(tgt, tcfg, st)
        e_spec = SpeculativeEngine(tgt, tcfg, draft, cfg, st, spec_k=4)

        def run_lv3():
            t0 = time.perf_counter()
            e_lv3.transcribe_window(wj1, [50259], seed=0)
            return time.perf_counter() - t0

        def run_spec():
            t0 = time.perf_counter()
            e_spec.transcribe_window(wj1, [50259], seed=0)
            return time.perf_counter() - t0

        run_lv3(); run_spec()  # warmup/compile
        t_lv3 = min(run_lv3() for _ in range(3))
        t_spec = min(run_spec() for _ in range(3))
        d_lv3 = device_ms_per_window(run_lv3, 2, "lv3_plain")
        d_spec = device_ms_per_window(run_spec, 2, "lv3_spec")
        lv3_spec = {
            "t_window_lv3_ms": round(t_lv3 * 1e3, 1),
            "t_window_lv3_device_ms": None if d_lv3 is None else round(d_lv3, 1),
            "t_window_lv3_spec_ms": round(t_spec * 1e3, 1),
            "t_window_lv3_spec_device_ms": (
                None if d_spec is None else round(d_spec, 1)
            ),
            "rtf_lv3_device": (
                None if d_lv3 is None else round(d_lv3 / 1e3 / 30.0, 6)
            ),
            "rtf_lv3_spec_device": (
                None if d_spec is None else round(d_spec / 1e3 / 30.0, 6)
            ),
            "lv3_spec_tokens_per_round": e_spec.last_tokens_per_round,
        }
        del e_lv3, e_spec

        # Batched lv3 SERVING stack — the deep-decoder operating point:
        # w8 decoder + jax_flash encoder + xkv AND self-attention via the
        # Pallas decode kernels (the only int8 cross-K/V form that wins
        # at lv3 B=8, and the full-head-tile self kernel that removes the
        # XLA slice/update tax; PERF.md "cross_kv_impl" / "self_kv_impl").
        # Measured best: 967.0 ms device / 248 streams/chip
        # (perf_spec_ab self_kernel, full-tile auto).
        e_lv3s = DecodeEngine(
            jax.device_put(quantize_decoder(tgt), jax.devices()[0]),
            tcfg.with_(
                encoder_attn_impl="jax_flash", cross_kv_impl="kernel",
                self_kv_impl="kernel",
            ),
            st, quantize_cross_kv=True,
        )

        def run_lv3_serving8():
            t0 = time.perf_counter()
            e_lv3s.transcribe_window(wj, [50259] * B, seed=0)
            return time.perf_counter() - t0

        run_lv3_serving8()  # warmup/compile
        t_l8 = min(run_lv3_serving8() for _ in range(3))
        d_l8 = device_ms_per_window(run_lv3_serving8, 2, "lv3_8_serving")
        lv3_spec.update(
            {
                "t_window_lv3_8_serving_ms": round(t_l8 * 1e3, 1),
                "t_window_lv3_8_serving_device_ms": (
                    None if d_l8 is None else round(d_l8, 1)
                ),
                "rtf_per_stream_lv3_8_serving_device": (
                    None if d_l8 is None else round(d_l8 / 1e3 / 30.0 / B, 6)
                ),
            }
        )
        del e_lv3s, tgt, draft
    except (TypeError, AttributeError, NameError, KeyError):
        raise  # programming error, not an environment failure
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"# lv3 speculative bench unavailable: {e!r}")

    # large-v3-turbo (beyond the reference's model list): the pruned
    # 4-layer-decoder serving checkpoint at the batched-8 shape with the
    # full opt-in serving stack.  Guarded like the lv3 block.
    turbo = {}
    try:
        tbcfg = PRESETS["large-v3-turbo"].with_(max_target_positions=136)
        tb = jax.device_put(
            quantize_decoder(
                fuse_qkv(init_params(tbcfg, seed=0, dtype=jnp.bfloat16))
            ),
            jax.devices()[0],
        )
        e_tb = DecodeEngine(
            tb, tbcfg.with_(encoder_attn_impl="jax_flash"), st,
            quantize_cross_kv=True,
        )

        def run_turbo():
            t0 = time.perf_counter()
            e_tb.transcribe_window(wj, [50259] * B, seed=0)
            return time.perf_counter() - t0

        run_turbo()  # warmup/compile
        t_tb = min(run_turbo() for _ in range(3))
        d_tb = device_ms_per_window(run_turbo, 2, "turbo8_serving")
        turbo = {
            "t_window_turbo8_serving_ms": round(t_tb * 1e3, 1),
            "t_window_turbo8_serving_device_ms": (
                None if d_tb is None else round(d_tb, 1)
            ),
            "rtf_per_stream_turbo8_serving_device": (
                None if d_tb is None else round(d_tb / 1e3 / 30.0 / B, 6)
            ),
        }
        del e_tb, tb
    except (TypeError, AttributeError, NameError, KeyError):
        raise
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"# turbo bench unavailable: {e!r}")

    def rtf_of(ms):
        return None if ms is None else round(ms / 1e3 / 30.0, 6)

    def r(ms):
        return None if ms is None else round(ms, 1)

    target = 0.05
    rtf_device = rtf_of(d_single)
    result = (
            {
                "metric": "rtf_distil_large_v3_stream",
                "value": round(rtf, 6),
                "unit": "rtf (wall-clock per 30s window / 30s; lower is better)",
                "vs_baseline": round(target / rtf, 2),
                "detail": {
                    "rtf_wall": round(rtf, 6),
                    "rtf_device": rtf_device,
                    # Partial-transcript latency == time from a window's
                    # audio being complete to its text being available,
                    # i.e. one window's decode wall-clock.  A true median
                    # of the runs (min would understate on the tunnel).
                    "p50_partial_latency_ms": round(t_single_p50 * 1e3, 1),
                    "t_window_single_ms": round(t_single * 1e3, 1),
                    "t_window_single_device_ms": r(d_single),
                    "t_window_w8_head_ms": round(t_w8h * 1e3, 1),
                    "t_window_w8_head_device_ms": r(d_w8h),
                    "rtf_w8_head": round(t_w8h / 30.0, 6),
                    "rtf_w8_head_device": rtf_of(d_w8h),
                    "t_window_w8_decoder_ms": round(t_w8 * 1e3, 1),
                    "t_window_w8_decoder_device_ms": r(d_w8),
                    "rtf_w8_decoder": round(t_w8 / 30.0, 6),
                    "rtf_w8_decoder_device": rtf_of(d_w8),
                    "t_window_batched8_ms": round(t_batched * 1e3, 1),
                    "t_window_batched8_device_ms": r(d_batched),
                    "t_window_batched8_flash_ms": round(t_bf * 1e3, 1),
                    "t_window_batched8_flash_device_ms": r(d_bf),
                    "rtf_per_stream_batched8_flash": round(t_bf / 30.0 / B, 6),
                    "t_window_batched8_serving_ms": round(t_bs * 1e3, 1),
                    "t_window_batched8_serving_device_ms": r(d_bs),
                    "rtf_per_stream_batched8_serving": round(t_bs / 30.0 / B, 6),
                    "rtf_per_stream_batched8_serving_device": (
                        None if d_bs is None
                        else round(d_bs / 1e3 / 30.0 / B, 6)
                    ),
                    "rtf_per_stream_batched8": round(rtf8, 6),
                    "rtf_per_stream_batched8_device": (
                        None if d_batched is None
                        else round(d_batched / 1e3 / 30.0 / B, 6)
                    ),
                    "realtime_streams_per_chip_batched": int(1.0 / rtf8),
                    "tokens_per_window": TOKENS_PER_WINDOW,
                    **e8_fields,
                    **turbo,
                    **lv3_spec,
                    "methodology": (
                        "production LongFormDecoder.transcribe, forced "
                        "132-token decode; single-stream = speculative "
                        "6-rung ladder (worst case: every rung decoded), "
                        "batched-8 = sequential on-device rung ladder. "
                        "value/rtf_wall is WALL-CLOCK and on this "
                        "remotely-attached (tunneled) TPU includes "
                        "~70-200 ms/call dispatch+fetch overhead that a "
                        "locally-attached chip does not pay; rtf_device "
                        "(jax.profiler xplane, total device ms per window) "
                        "is the chip-side number and the one to trust for "
                        "kernel/variant comparisons — see PERF.md. The "
                        "*_device_ms fields settle the r02 w8-decoder "
                        "wall-vs-device contradiction in one table. "
                        "batched8_serving = jax_flash encoder + int8 "
                        "decoder weights + int8 cross-KV, the full opt-in "
                        "serving stack. batched8_e8 = w8a8 encoder alone "
                        "(int8-MXU projections, quantize_encoder); "
                        "batched8_serving_e8 = the serving stack plus it. "
                        "lv3_* = large-v3 target B=1; "
                        "lv3_spec = speculative draft/verify with a "
                        "distil-dims draft at spec_k=4 (random weights, "
                        "so tokens_per_round understates real distil "
                        "pairs' acceptance — see PERF.md)."
                    ),
                    "device": str(jax.devices()[0]),
                    "dtype": "bfloat16",
                },
            }
    )
    print(json.dumps(result))
    # Cache for the tunnel-down fallback above.  Only real measurements
    # qualify: a CPU-backend run (tunnel down but probe answered with the
    # host platform) must not overwrite a genuine chip result.
    if jax.devices()[0].platform != "cpu":
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


if __name__ == "__main__":
    main()
