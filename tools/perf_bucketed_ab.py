"""Device A/B: bucketed decode (cfg.decode_buckets) at the production
deep-decoder point — VERDICT r4 #3.

PERF.md "Next lever": at lv3 B=8 mtp=448 the self-KV stream is ~2.5x
overread by static-cache design (average fill ~224 of 448).  The r4
KERNEL-chunked fix lost decisively (per-grid-step overheads); this is the
pure-XLA form (a): the token loop runs as a chain of per-bucket
while_loops over growing cache crops, so early tokens read
fill-proportional self-KV.  Bitwise-identical results
(tests/test_bucketed_decode.py).

Arms (all forced full-length decode, eot unreachable, mtp=448):
  - lv3 B=8 serving stack control (w8 + flash + xkv/self kernels):
    the 2220.8 ms PERF.md control
  - + decode_buckets=(128, 256) and a finer (64..384) ladder
  - the same pair with XLA self-KV (does bucketing revive the non-kernel
    form?)
  - B=1 w8+skv+xkv einsum path control vs buckets (the VERDICT's
    "also check the B=1 einsum path")

Run ON TPU:  python tools/perf_bucketed_ab.py
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
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
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder

    dev = jax.devices()[0]
    out = {"device": str(dev), "mtp": 448}

    cfg = PRESETS["large-v3"].with_(max_target_positions=448)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    params_w8 = jax.device_put(
        quantize_decoder(fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))),
        dev,
    )

    rng = np.random.default_rng(0)
    B = 8
    wj = jnp.asarray(
        np.stack(
            [prepare_audio(
                (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
             )
             for _ in range(B)]
        )
    )

    def timed_window(engine, tag, b=B, reps=2):
        w = wj[:b]
        langs = [50259] * b

        def run():
            t0 = time.perf_counter()
            engine.transcribe_window(w, langs, seed=0)
            return time.perf_counter() - t0

        run()  # warmup/compile
        wall = min(run() for _ in range(reps))
        dms = device_ms(run, 2, f"bucketed_ab/{tag}")
        print(f"# {tag}: wall {wall*1e3:.1f} ms, device "
              f"{'n/a' if dms is None else f'{dms:.1f} ms'}", flush=True)
        out[f"{tag}_device_ms"] = None if dms is None else round(dms, 1)
        out[f"{tag}_wall_ms"] = round(wall * 1e3, 1)

    def serving_engine(buckets=(), self_impl="kernel"):
        return DecodeEngine(
            params_w8,
            cfg.with_(
                encoder_attn_impl="jax_flash",
                cross_kv_impl="kernel",
                self_kv_impl=self_impl,
                decode_buckets=tuple(buckets),
            ),
            st,
            quantize_cross_kv=True,
        )

    # Interleave-ish: control first and re-measured last to bound drift.
    timed_window(serving_engine(), "ctl_selfk")
    timed_window(serving_engine((128, 256)), "buckets2_selfk")
    timed_window(
        serving_engine((64, 128, 192, 256, 320, 384)), "buckets6_selfk"
    )
    timed_window(serving_engine(self_impl="xla"), "ctl_selfxla")
    timed_window(serving_engine((128, 256), self_impl="xla"), "buckets2_selfxla")
    timed_window(serving_engine(), "ctl_selfk_rep")

    # B=1 einsum path: w8 decoder + int8 self-KV + int8 cross-KV einsum.
    def b1_engine(buckets=()):
        return DecodeEngine(
            params_w8,
            cfg.with_(decode_buckets=tuple(buckets)),
            st,
            quantize_cross_kv=True,
            quantize_self_kv=True,
        )

    timed_window(b1_engine(), "ctl_b1_w8_skv_xkv", b=1)
    timed_window(b1_engine((128, 256)), "buckets2_b1_w8_skv_xkv", b=1)
    # Finer ladder at B=1: per-bucket loop/copy overheads are amortized
    # over fewer rows there, so the sweet spot may sit deeper.
    timed_window(
        b1_engine((64, 128, 192, 256, 320, 384)), "buckets6_b1_w8_skv_xkv",
        b=1,
    )
    timed_window(b1_engine((96, 192, 288, 384)), "buckets4_b1_w8_skv_xkv", b=1)
    # The measured B=1 winner (r5 granularity bracket: 32-step 1732.4 /
    # 48-step 1680.2 / 64-step 1706.7 ms device): 48-sample rungs.
    timed_window(
        b1_engine(tuple(range(48, 448, 48))), "buckets9_b1_w8_skv_xkv", b=1
    )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
