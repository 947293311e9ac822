"""Op-level head-tile sweep of the self-decode kernel (ops/self_decode.py).

The engine-level A/B measured `self_kv_impl="kernel"` as a LOSS at the
default auto tile (hpc=2 — a [448, 128] bf16 block, 114 KB per tensor
per cell).  The cross-decode kernel's sweep showed exactly this shape
flipping: hpc=1 83.2 us -> hpc=10 48.5 us per call at B=8, turning a
-4.7% engine win into -8.9% (PERF.md "cross_kv_impl=kernel").  Sweep the
self kernel's tile before accepting its +6.4% as structural.

Measures ONE layer's self-KV handling, looped on device with a data
dependence (attention output feeds the next query; caches ride the loop
carry so in-place aliasing matches the real token loop).  The XLA arm
reproduces the production form exactly: one-row dynamic_update_slice
into the stacked cache + dynamic_index_in_dim layer read + masked
attention (model/whisper.py decoder_step's self_attn).

Run ON TPU:  python tools/perf_self_kernel_sweep.py [B ...]
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50
POS = 224  # mid-fill of mtp=448, same point as the step attribution


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.model.whisper import attention
    from norma_tpu.ops.self_decode import self_attention_decode
    from norma_tpu.tracing import profiled_device_ms

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    batches = [int(a) for a in sys.argv[1:]] or [8, 1]
    L, Tmax, D, H = 32, 448, 1280, 20  # large-v3 decoder dims
    dh = D // H
    rng = np.random.default_rng(0)

    for B in batches:
        q0 = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.bfloat16)
        kn = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.bfloat16)
        vn = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.bfloat16)
        ck0 = jnp.asarray(
            rng.standard_normal((L, B, Tmax, D)) * 0.1, jnp.bfloat16
        )
        cv0 = jnp.asarray(
            rng.standard_normal((L, B, Tmax, D)) * 0.1, jnp.bfloat16
        )
        key_idx = jnp.arange(Tmax)
        key_mask = jnp.where(key_idx <= POS, 0.0, -jnp.inf).astype(
            jnp.float32
        )[None, None, None, :]

        def xla_step(q, ck_all, cv_all):
            li = jnp.int32(0)
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kn[None], (li, 0, POS, 0)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vn[None], (li, 0, POS, 0)
            )
            ck = jax.lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
            a = attention(q, ck, cv, H, key_mask)
            return a, ck_all, cv_all

        # Structural XLA variant: K and V merged into ONE [L,B,T,2D]
        # cache so each layer pays ONE dynamic_update_slice and ONE
        # layer-slice read instead of two of each.  The fused-QKV
        # projection already emits k|v adjacent, so the merged new row is
        # a static slice of its output (free) — this probe measures
        # whether the ~30/22 us costs are per-op floors that halve.
        kvn = jnp.concatenate([kn, vn], axis=-1)  # [B, 1, 2D]

        def xla_kvcat_step(q, ckv_all, unused):
            li = jnp.int32(0)
            ckv_all = jax.lax.dynamic_update_slice(
                ckv_all, kvn[None], (li, 0, POS, 0)
            )
            ckv = jax.lax.dynamic_index_in_dim(
                ckv_all, li, 0, keepdims=False
            )
            a = attention(q, ckv[..., :D], ckv[..., D:], H, key_mask)
            return a, ckv_all, unused

        def kern_step(q, ck_all, cv_all, hpc):
            a, ck_all, cv_all = self_attention_decode(
                q, kn, vn, ck_all, cv_all, jnp.int32(0), jnp.int32(POS), H,
                heads_per_cell=hpc,
            )
            return a, ck_all, cv_all

        def timed(fn, tag, carries):
            # attention-out -> next-q dependence defeats hoisting; caches
            # ride the carry so the loop updates them in place (entry
            # buffers are not donated — XLA pays ONE whole-cache copy at
            # program entry, identical across arms, ~14 us/call at B=8
            # amortized over ITERS).
            def body(i, c):
                a, c1, c2 = c
                a, c1, c2 = fn(
                    q0 + 1e-6 * a.astype(jnp.bfloat16), c1, c2
                )
                return a.astype(jnp.bfloat16), c1, c2

            loop = jax.jit(
                lambda q, c1, c2: jax.lax.fori_loop(
                    0, ITERS, body, (q, c1, c2)
                )
            )
            jax.block_until_ready(loop(q0, *carries))  # compile
            ms, _ = profiled_device_ms(
                lambda: jax.block_until_ready(loop(q0, *carries)),
                2,
                f"/tmp/self_sweep/{tag}_b{B}",
            )
            return ms / ITERS * 1e3  # us per call

        # Same idea with K/V on their own size-2 axis ([L,B,T,2,D]) so a
        # tp mesh can still shard the trailing head axis evenly (the
        # flat-2D concat would put the whole K half on half the devices).
        kvn2 = jnp.stack([kn, vn], axis=2)  # [B, 1, 2, D]

        def xla_kv2_step(q, c_all, unused):
            li = jnp.int32(0)
            c_all = jax.lax.dynamic_update_slice(
                c_all, kvn2[None], (li, 0, POS, 0, 0)
            )
            c = jax.lax.dynamic_index_in_dim(c_all, li, 0, keepdims=False)
            a = attention(q, c[..., 0, :], c[..., 1, :], H, key_mask)
            return a, c_all, unused

        ckv0 = jnp.concatenate([ck0, cv0], axis=-1)
        ckv20 = jnp.stack([ck0, cv0], axis=3)  # [L,B,T,2,D]
        dummy = jnp.zeros((1,), jnp.bfloat16)
        arms = [
            ("xla", xla_step, (ck0, cv0)),
            ("xla_kvcat", xla_kvcat_step, (ckv0, dummy)),
            ("xla_kv2", xla_kv2_step, (ckv20, dummy)),
        ]
        for hpc in (2, 4, 10, 20):
            arms.append(
                (
                    f"kernel_hpc{hpc}",
                    functools.partial(kern_step, hpc=hpc),
                    (ck0, cv0),
                )
            )
        # Kernel read stream: K+V full [Tmax, D] per stream; v5e ~819 GB/s.
        read_roof_us = 2 * B * Tmax * D * 2 / 819e3
        print(
            json.dumps(
                {
                    f"B={B}": {
                        "kernel_read_roofline_us": round(read_roof_us, 1),
                        **{
                            name: round(timed(fn, name, carries), 1)
                            for name, fn, carries in arms
                        },
                    }
                }
            ),
            flush=True,
        )

    print("done", flush=True)


if __name__ == "__main__":
    main()
