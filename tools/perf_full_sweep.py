"""Full exploratory perf sweep — every arm the scored bench no longer runs.

Round 3's bench grew to ~12 serially-compiled arms and timed out the
driver's budget (BENCH_r03: rc=124, parsed null).  bench.py now measures
only the scored core; THIS tool carries the exploratory arms:

  - single-lever ablations at B=8 (flash-alone, w8a8-encoder-alone,
    int8-logits-head single-stream)
  - large-v3: B=1 plain ladder, B=1 speculative (distil-dims draft),
    B=8 full deep-decoder serving stack (w8 + flash + xkv/self kernels)
  - large-v3-turbo B=8 serving stack

Run it manually on a hardware session (tools/run_hw_session.sh keeps the
compile cache warm first).  Prints one JSON object (indented, NOT the
driver's single-line format) and appends a stamped copy to
``/tmp/norma_full_sweep.json``.  Each arm is independently guarded: a
tunnel hiccup in one arm nulls that arm only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cache")


def _bench_module():
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("norma_bench", root / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    bench = _bench_module()
    device_ms = bench.device_ms_per_window

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import (
        DecodeEngine,
        LanguageState,
        LongFormDecoder,
        SpeculativeEngine,
    )
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import (
        quantize_decoder,
        quantize_encoder,
        quantize_logits_head,
    )

    dev = jax.devices()[0]
    out = {"device": str(dev), "dtype": "bfloat16"}

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    params = jax.device_put(fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16)), dev)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
    B = 8
    wj = jnp.asarray(
        np.stack(
            [prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
             for _ in range(B)]
        )
    )

    class _NullTok:
        def decode(self, ids, skip_special_tokens=True):
            return ""

        def token_to_id(self, s):
            return None

    def timed_window(engine, tag, b=B, reps=3):
        w = wj[:b]
        langs = [50259] * b

        def run():
            t0 = time.perf_counter()
            engine.transcribe_window(w, langs, seed=0)
            return time.perf_counter() - t0

        run()  # warmup/compile
        wall = min(run() for _ in range(reps))
        dms = device_ms(run, 2, tag)
        print(f"# {tag}: wall {wall*1e3:.1f} ms, device "
              f"{'n/a' if dms is None else f'{dms:.1f} ms'}")
        return {
            f"t_{tag}_ms": round(wall * 1e3, 1),
            f"t_{tag}_device_ms": None if dms is None else round(dms, 1),
        }

    def guarded(name, fn):
        try:
            out.update(fn())
        except (TypeError, AttributeError, NameError, KeyError):
            raise  # programming error, not an environment failure
        except Exception as e:  # pragma: no cover - environment-dependent
            print(f"# arm {name} unavailable: {e!r}")
            out[f"{name}_error"] = repr(e)

    # --- distil single-lever ablations --------------------------------
    def arm_w8_head():
        e = DecodeEngine(jax.device_put(quantize_logits_head(params), dev), cfg, st)

        def run():
            t0 = time.perf_counter()
            LongFormDecoder(e, _NullTok(), LanguageState(const=50259)).transcribe(
                audio, final_chunk=True
            )
            return time.perf_counter() - t0

        run()
        wall = min(run() for _ in range(3))
        dms = device_ms(run, 2, "w8_head")
        return {
            "t_window_w8_head_ms": round(wall * 1e3, 1),
            "t_window_w8_head_device_ms": None if dms is None else round(dms, 1),
        }

    guarded("w8_head", arm_w8_head)
    guarded(
        "batched8_flash",
        lambda: timed_window(
            DecodeEngine(params, cfg.with_(encoder_attn_impl="jax_flash"), st),
            "batched8_flash",
        ),
    )
    guarded(
        "batched8_e8",
        lambda: timed_window(
            DecodeEngine(jax.device_put(quantize_encoder(params), dev), cfg, st),
            "batched8_e8",
        ),
    )

    # --- large-v3 arms --------------------------------------------------
    tcfg = PRESETS["large-v3"].with_(max_target_positions=136)
    try:
        tgt = jax.device_put(
            fuse_qkv(init_params(tcfg, seed=0, dtype=jnp.bfloat16)), dev
        )
    except Exception as e:  # pragma: no cover
        print(f"# large-v3 params unavailable: {e!r}")
        tgt = None

    if tgt is not None:
        guarded(
            "lv3_plain",
            lambda: timed_window(DecodeEngine(tgt, tcfg, st), "lv3_plain", b=1),
        )

        def arm_lv3_spec():
            draft = jax.device_put(
                fuse_qkv(init_params(cfg, seed=7, dtype=jnp.bfloat16)), dev
            )
            e_spec = SpeculativeEngine(tgt, tcfg, draft, cfg, st, spec_k=4)
            r = timed_window(e_spec, "lv3_spec", b=1)
            r["lv3_spec_tokens_per_round"] = e_spec.last_tokens_per_round
            return r

        guarded("lv3_spec", arm_lv3_spec)

        def arm_lv3_b1_serving():
            # Single-stream deep-decoder operating point (r4: the
            # stacked cross kernel wins at B=1 too — 418.3 vs einsum
            # 432.8 ms).
            e = DecodeEngine(
                jax.device_put(quantize_decoder(tgt), dev),
                tcfg.with_(cross_kv_impl="kernel"), st,
                quantize_cross_kv=True,
            )
            return timed_window(e, "lv3_b1_w8_xkvk", b=1)

        guarded("lv3_b1_w8_xkvk", arm_lv3_b1_serving)

        def arm_lv3_serving8():
            # The deep-decoder serving stack: w8 decoder + flash encoder +
            # int8 cross-KV and self-attention via the Pallas decode
            # kernels (798.1 ms device / 300 streams/chip since the r4
            # stacked-layer kernel, PERF.md).
            e = DecodeEngine(
                jax.device_put(quantize_decoder(tgt), dev),
                tcfg.with_(
                    encoder_attn_impl="jax_flash",
                    cross_kv_impl="kernel",
                    self_kv_impl="kernel",
                ),
                st,
                quantize_cross_kv=True,
            )
            r = timed_window(e, "lv3_8_serving")
            d = r.get("t_lv3_8_serving_device_ms")
            if d:
                r["rtf_per_stream_lv3_8_serving_device"] = round(
                    d / 1e3 / 30.0 / B, 6
                )
                r["realtime_streams_per_chip_lv3_serving"] = int(
                    30.0 * B / (d / 1e3)
                )
            return r

        guarded("lv3_8_serving", arm_lv3_serving8)

    # --- large-v3-turbo -------------------------------------------------
    def arm_turbo():
        tbcfg = PRESETS["large-v3-turbo"].with_(max_target_positions=136)
        tb = jax.device_put(
            quantize_decoder(fuse_qkv(init_params(tbcfg, seed=0, dtype=jnp.bfloat16))),
            dev,
        )
        e = DecodeEngine(
            tb,
            tbcfg.with_(
                encoder_attn_impl="jax_flash", cross_kv_impl="kernel"
            ),
            st,
            quantize_cross_kv=True,
        )
        return timed_window(e, "turbo8_serving")

    guarded("turbo8_serving", arm_turbo)

    out["measured_at_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(out, indent=1))
    try:
        with open("/tmp/norma_full_sweep.json", "a") as f:
            json.dump(out, f)
            f.write("\n")
    except Exception:
        pass


if __name__ == "__main__":
    main()
