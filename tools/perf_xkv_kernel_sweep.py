"""Op-level head-tile sweep of the cross-decode kernel (ops/paged_cross.py).

The kernel's grid cell reads one [dh, Ta] int8 block per tensor — 96 KB
at whisper dims.  ``heads_per_cell`` tiles heads into one cell (up to
the full ~1.9 MB per tensor), identical math, bigger DMAs.  The
flash-encoder A/B proved block size can swing a Pallas kernel from
losing to winning 23% (PERF.md "encoder, settled"), so sweep before
concluding anything about the kernel's efficiency.

Measures ONE layer's kernel call, looped on device with a data
dependence so XLA cannot hoist it; einsum/bf16 reference arms under the
same harness give the roofline context.  The per-window win must then
be confirmed engine-level (tools/perf_spec_ab.py xkv_paged) at the
chosen tile — a lone op is not the in-loop op (PERF.md methodology).

Run ON TPU:  python tools/perf_xkv_kernel_sweep.py [B ...]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.model.whisper import (
        attention_cross_q8,
        attention_grouped,
        quantize_cross_kv,
    )
    from norma_tpu.ops.paged_cross import (
        cross_attention_q8_kernel,
        prep_cross_kv_kernel,
    )
    from norma_tpu.tracing import profiled_device_ms

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    batches = [int(a) for a in sys.argv[1:]] or [8, 1]
    Ta, D, H = 1500, 1280, 20  # lv3/distil decoder dims
    rng = np.random.default_rng(0)

    for B in batches:
        q = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.bfloat16)
        xk = jnp.asarray(
            rng.standard_normal((1, B, Ta, D)) * 0.5, jnp.bfloat16
        )
        xv = jnp.asarray(
            rng.standard_normal((1, B, Ta, D)) * 0.5, jnp.bfloat16
        )
        kq, vq = quantize_cross_kv(xk, xv)
        kq1 = {"q": kq["q"][0], "s": kq["s"][0]}
        vq1 = {"q": vq["q"][0], "s": vq["s"][0]}
        kp, vp = prep_cross_kv_kernel(kq, vq, H)
        kp1 = {k: v[0] for k, v in kp.items()}
        vp1 = {k: v[0] for k, v in vp.items()}
        xk1, xv1 = xk[0], xv[0]

        def timed(fn, tag):
            # acc -> q dependence defeats loop-invariant hoisting; the
            # 1e-6 scale keeps bf16 q in range (numerics irrelevant).
            loop = jax.jit(
                lambda q0: jax.lax.fori_loop(
                    0,
                    ITERS,
                    lambda i, acc: fn(q0 + acc * 1e-6).astype(q0.dtype),
                    q0,
                )
            )
            loop(q).block_until_ready()  # compile
            ms, _ = profiled_device_ms(
                lambda: loop(q).block_until_ready(),
                2,
                f"/tmp/xkv_sweep/{tag}_b{B}",
            )
            return ms / ITERS * 1e3  # us per call

        arms = [
            ("bf16", lambda qq: attention_grouped(qq, xk1, xv1, H, 1)),
            ("einsum", lambda qq: attention_cross_q8(qq, kq1, vq1, H)),
        ]
        for hpc in (1, 2, 4, 5, 10, 20):
            arms.append(
                (
                    f"kernel_hpc{hpc}",
                    lambda qq, hpc=hpc: cross_attention_q8_kernel(
                        qq, kp1, vp1, H, heads_per_cell=hpc
                    ),
                )
            )
        # int8 stream: 2 tensors x B x D x Ta bytes; v5e ~819 GB/s.
        int8_roof_us = 2 * B * D * Ta / 819e3
        print(
            json.dumps(
                {
                    f"B={B}": {
                        "int8_roofline_us": round(int8_roof_us, 1),
                        **{
                            name: round(timed(fn, name), 1)
                            for name, fn in arms
                        },
                    }
                }
            ),
            flush=True,
        )

    print("done", flush=True)


if __name__ == "__main__":
    main()
