"""Raw int8-vs-bf16 MXU throughput probe (run on a real TPU).

Settles, in seconds and independent of the model, whether XLA lowers
``dot_general(s8, s8) -> s32`` to the MXU's native int8 mode on this
chip (v5e doubles the bf16 multiply rate at int8).  Measures DEVICE time
(xplane) of bare matmuls at the encoder's production shapes:

  - attention/out projection: [B*1500, 1280] x [1280, 1280]
  - MLP fc1:                  [B*1500, 1280] x [1280, 5120]
  - fused QKV:                [B*1500, 1280] x [1280, 3*1280]

for B in {1, 8}, each as bf16, int8->int32, and the full w8a8 op
(quantize_activations + q8a8_dense, i.e. including the dynamic
activation-quantization overhead).  If int8/bf16 device-time ratio is
~0.5 the native path engages and quantize_encoder's ceiling is real; a
ratio ~1.0 means XLA emulated the dot (likely via conversion) and the
w8a8 lever needs a Pallas kernel or is dead on this backend.

Usage:  python tools/perf_int8_mxu.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend")
        return 0

    from norma_tpu.ops.quant_matmul import q8a8_dense, quantize_activations
    from norma_tpu.tracing import profiled_device_ms

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    SHAPES = {
        "proj_1280": (1280, 1280),
        "fc1_5120": (1280, 5120),
        "qkv_3840": (1280, 3840),
    }

    results = {}
    for B in (1, 8):
        rows = B * 1500
        for name, (k, n) in SHAPES.items():
            x = jax.device_put(
                jnp.asarray(rng.standard_normal((rows, k)), jnp.bfloat16), dev
            )
            w_bf = jax.device_put(
                jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16), dev
            )
            w_q = jax.device_put(
                jnp.asarray(
                    rng.integers(-127, 128, size=(k, n)), jnp.int8
                ),
                dev,
            )
            w_s = jax.device_put(jnp.ones((n,), jnp.float32), dev)
            xq8 = jax.device_put(
                jnp.asarray(rng.integers(-127, 128, size=(rows, k)), jnp.int8),
                dev,
            )
            xs8 = jax.device_put(jnp.ones((rows, 1), jnp.float32), dev)

            bf16 = jax.jit(
                lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
            )
            i8 = jax.jit(
                lambda a, b: jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
            w8a8 = jax.jit(
                lambda a, q, s: q8a8_dense(*quantize_activations(a), q, s)
            )
            from norma_tpu.ops.quant_matmul import q8a8_dense_pallas

            w8a8_pl = jax.jit(
                lambda a, q, s: q8a8_dense_pallas(
                    *quantize_activations(a), q, s
                )
            )

            def meas(fn, args, tag):
                fn(*args).block_until_ready()  # compile
                avg, _ = profiled_device_ms(
                    lambda: fn(*args).block_until_ready(),
                    4,
                    f"/tmp/int8_mxu/{tag}",
                )
                return round(avg, 3)

            tag = f"{name}_B{B}"
            t_bf = meas(bf16, (x, w_bf), f"bf16_{tag}")
            t_i8 = meas(i8, (xq8, w_q), f"i8_{tag}")
            t_w8a8 = meas(w8a8, (x, w_q, w_s), f"w8a8_{tag}")
            try:
                t_pl = meas(w8a8_pl, (x, w_q, w_s), f"w8a8pl_{tag}")
            except Exception as e:
                print(f"# pallas w8a8 unavailable ({tag}): {e!r}")
                t_pl = None
            flop = 2.0 * rows * k * n
            row = {
                "bf16_ms": t_bf,
                "int8_ms": t_i8,
                "w8a8_ms": t_w8a8,
                "w8a8_pallas_ms": t_pl,
                "int8_over_bf16": round(t_i8 / t_bf, 3) if t_bf else None,
                "bf16_tflops": round(flop / (t_bf * 1e9), 1) if t_bf else None,
                "int8_tops": round(flop / (t_i8 * 1e9), 1) if t_i8 else None,
            }
            results[tag] = row
            print(json.dumps({tag: row}), flush=True)

    ratios = [r["int8_over_bf16"] for r in results.values() if r["int8_over_bf16"]]
    med = sorted(ratios)[len(ratios) // 2]
    verdict = (
        "NATIVE int8 MXU path engaged (quantize_encoder ceiling is real)"
        if med < 0.75
        else "int8 NOT faster — XLA likely emulates the s8 dot on this "
        "backend; use encoder_q8_mode='w8a16' and consider a Pallas kernel"
    )
    print(f"median int8/bf16 device ratio: {med}  => {verdict}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
