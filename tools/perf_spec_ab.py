"""Device-time A/B of speculative decoding (draft/verify) on large-v3.

The reference decodes one token per full target forward
(/root/reference/src/models/whisper/model.rs:317-371); the speculative
engine (norma_tpu/decode/speculative.py) drafts K tokens with a shallow
distil-dims decoder and verifies them in ONE chunked target forward.
The speedup depends on the draft's acceptance rate, so this tool
brackets it with constructed weight sets:

  bracket   plain baseline, an acceptance FLOOR (independent random
            draft: proposals ~never match except where the timestamp
            grammar forces agreement), an identity-tail control (target
            decoder layers 2..31 zeroed into residual passthrough — they
            still stream weights from HBM like real layers; measures the
            same as the real target, pinning that the control is fair),
            and the 100%-acceptance CEILING (identity-tail target + a
            draft copying its layers 0..1: draft greedy == target
            greedy, every round commits spec_k+1 tokens).
  knobs     adversarial draft (negated final LN => proposals are the
            draft's own argmin — the true worst-case draft), the
            quantize_decoder (int8) target stack, and a spec_k sweep.
  batch     B=8 windows: plain vs speculative vs speculative+w8 —
            the batched serving question (per-row cross-K/V traffic
            grows with B while the weight amortization does not).

Real distil pairs sit between floor and ceiling (~70-90% token
acceptance on speech per the distil-whisper literature).  Measured
results: PERF.md "speculative decoding" section (640.1 -> 245.5 ms B=1
floor, 172.8 ceiling, 190.7 floor+w8; B=8 in the batch scenario).

Run ON TPU:  python tools/perf_spec_ab.py [bracket|knobs|batch|batch_w8|
    batch_stack|batch_stack_skv|batch_stack_skv448|xkv_impl|xkv_impl_b1|
    xkv_impl_dstack|xkv_paged|spec_xkv|self_kernel|fused_block] [spec_k]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine, SpeculativeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.model.quant import quantize_decoder
    from norma_tpu.tracing import profiled_device_ms

    scenario = sys.argv[1] if len(sys.argv) > 1 else "bracket"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    tcfg = PRESETS["large-v3"].with_(max_target_positions=136)
    dcfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    dev = jax.devices()[0]

    # EVERY arm builds on fused-QKV params — the production form (the
    # loader always fuses, loader.py).  Leaving the baselines unfused
    # would fold the fusion effect into every "_w8" delta and misattribute
    # it to quantization.
    tgt = fuse_qkv(init_params(tcfg, seed=0, dtype=jnp.bfloat16))
    draft_rand = jax.device_put(
        fuse_qkv(init_params(dcfg, seed=7, dtype=jnp.bfloat16)), dev
    )

    def identity_tail_pair():
        """Target with layers 2+ as residual passthrough (weights still
        stream) and a draft copying layers 0..1 => 100% acceptance."""
        L = tcfg.decoder_layers
        keep = np.arange(L) < 2

        def zero_tail(a, name):
            if name in ("o_w", "xo_w", "fc2_w"):
                m = jnp.asarray(
                    keep.reshape((L,) + (1,) * (a.ndim - 1)), a.dtype
                )
                return a * m
            return a

        tgt_id = dict(tgt)
        tgt_id["decoder"] = dict(tgt["decoder"])
        tgt_id["decoder"]["layers"] = {
            k: zero_tail(v, k) for k, v in tgt["decoder"]["layers"].items()
        }
        draft_copy = dict(draft_rand)
        draft_copy["decoder"] = dict(tgt_id["decoder"])
        draft_copy["decoder"]["layers"] = {
            k: v[:2] for k, v in tgt_id["decoder"]["layers"].items()
        }
        return jax.device_put(tgt_id, dev), jax.device_put(draft_copy, dev)

    def adversarial_draft():
        """Negated final LN => logits exactly negated => greedy proposes
        the draft's LEAST likely (grammar-legal) token."""
        adv = dict(draft_rand)
        adv["decoder"] = dict(draft_rand["decoder"])
        adv["decoder"]["ln_g"] = -draft_rand["decoder"]["ln_g"]
        adv["decoder"]["ln_b"] = -draft_rand["decoder"]["ln_b"]
        return jax.device_put(adv, dev)

    rng = np.random.default_rng(0)

    def windows(B):
        return jnp.asarray(
            np.stack(
                [
                    prepare_audio(
                        (0.1 * rng.standard_normal(N_SAMPLES)).astype(
                            np.float32
                        )
                    )
                    for _ in range(B)
                ]
            )
        )

    if scenario == "bracket":
        tgt_id, draft_copy = identity_tail_pair()
        tgt_d = jax.device_put(tgt, dev)
        runs = [
            ("lv3_plain", DecodeEngine(tgt_d, tcfg, st), 1),
            (f"lv3_spec_floor_k{K}",
             SpeculativeEngine(tgt_d, tcfg, draft_rand, dcfg, st, spec_k=K),
             1),
            ("lv3_plain_idtail", DecodeEngine(tgt_id, tcfg, st), 1),
            (f"lv3_spec_ceiling_k{K}",
             SpeculativeEngine(tgt_id, tcfg, draft_copy, dcfg, st, spec_k=K),
             1),
        ]
    elif scenario == "knobs":
        tgt_w8 = jax.device_put(quantize_decoder(tgt), dev)
        # The draft pays the SAME-size logits head as the target (d_model
        # and vocab match) on every one of its K+1 sequential steps per
        # round — int8-quantizing the draft halves that stream too.
        draft_w8 = jax.device_put(quantize_decoder(draft_rand), dev)
        tgt_d = jax.device_put(tgt, dev)
        runs = [
            (f"lv3_spec_rand_k{K}",
             SpeculativeEngine(tgt_d, tcfg, draft_rand, dcfg, st, spec_k=K),
             1),
            (f"lv3_spec_adversarial_k{K}",
             SpeculativeEngine(
                 tgt_d, tcfg, adversarial_draft(), dcfg, st, spec_k=K
             ),
             1),
            (f"lv3_spec_rand_k{K}_w8",
             SpeculativeEngine(tgt_w8, tcfg, draft_rand, dcfg, st, spec_k=K),
             1),
            (f"lv3_spec_rand_k{K}_draftw8",
             SpeculativeEngine(tgt_d, tcfg, draft_w8, dcfg, st, spec_k=K),
             1),
            (f"lv3_spec_rand_k{K}_bothw8",
             SpeculativeEngine(tgt_w8, tcfg, draft_w8, dcfg, st, spec_k=K),
             1),
            (f"lv3_spec_rand_k{2 * K}",
             SpeculativeEngine(
                 tgt_d, tcfg, draft_rand, dcfg, st, spec_k=2 * K
             ),
             1),
        ]
    elif scenario == "batch":
        tgt_w8 = jax.device_put(quantize_decoder(tgt), dev)
        tgt_d = jax.device_put(tgt, dev)
        B = 8
        runs = [
            ("lv3_b8_plain", DecodeEngine(tgt_d, tcfg, st), B),
            (f"lv3_b8_spec_k{K}",
             SpeculativeEngine(tgt_d, tcfg, draft_rand, dcfg, st, spec_k=K),
             B),
            (f"lv3_b8_spec_k{K}_w8",
             SpeculativeEngine(tgt_w8, tcfg, draft_rand, dcfg, st, spec_k=K),
             B),
        ]
    elif scenario == "batch_w8":
        # The follow-up the first batch run raised: at B=8 acceptance
        # collapses to the min across rows (~1.75 tok/round), so most of
        # spec+w8's win may be the w8 target alone.  Measure plain w8.
        tgt_w8 = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [("lv3_b8_w8", DecodeEngine(tgt_w8, tcfg, st), B)]
    elif scenario == "batch_stack":
        # Best plausible NON-speculative lv3 serving config: w8 decoder +
        # jax_flash encoder (flash alone measured 1341 vs plain 1405;
        # quantize_cross_kv is deliberately absent — it regresses +45% at
        # lv3 B=8, PERF.md).  Run after batch/batch_w8 settle the decoder
        # side so the flash delta is attributable.
        fcfg = tcfg.with_(encoder_attn_impl="jax_flash")
        tgt_w8f = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [("lv3_b8_w8_flash", DecodeEngine(tgt_w8f, fcfg, st), B)]
    elif scenario == "batch_stack_skv":
        # Self-KV bytes scale with batch (lv3 B=8 @ mtp=448: ~0.6 GB full
        # cache, ~300 MB/step read at avg fill) while xkv regresses at
        # batch — so skv is the one KV quant whose batched win should
        # EXCEED its B=1 −3.7%.  Interleaved control in-process.
        fcfg = tcfg.with_(encoder_attn_impl="jax_flash")
        tgt_w8f = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            ("lv3_b8_w8_flash", DecodeEngine(tgt_w8f, fcfg, st), B),
            ("lv3_b8_w8_flash_skv",
             DecodeEngine(tgt_w8f, fcfg, st, quantize_self_kv=True), B),
        ]
    elif scenario == "batch_stack_skv448":
        # Same A/B at the PRODUCTION max_target_positions=448 (444-token
        # decodes), where self-KV is ~3.3x the benched window's bytes —
        # the regime skv targets; B=8 multiplies it by the batch.
        cfg448 = tcfg.with_(
            max_target_positions=448, encoder_attn_impl="jax_flash"
        )
        # Params are mtp-independent (the cache is runtime state) — reuse
        # the already-initialized 1.55B-param target.
        tgt448 = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            ("lv3_b8_448_w8_flash", DecodeEngine(tgt448, cfg448, st), B),
            ("lv3_b8_448_w8_flash_skv",
             DecodeEngine(tgt448, cfg448, st, quantize_self_kv=True), B),
            # The full production stack at serving length: skv + the
            # xkv kernel (the B=8 winner) on top.
            ("lv3_b8_448_w8_flash_skv_xkvk",
             DecodeEngine(
                 tgt448, cfg448.with_(cross_kv_impl="kernel"), st,
                 quantize_self_kv=True, quantize_cross_kv=True,
             ), B),
        ]
    elif scenario == "xkv_impl":
        # The cross-K/V stream is lv3 B=8's LARGEST per-step read (~2 GB
        # bf16 vs ~0.85 GB w8 weights) and the einsum xkv form regresses
        # +45% there (the int8->bf16 dequant materializes outside the
        # attention fusion).  A/B the two fixes (model/whisper.py):
        # "chunked" bounds the dequant to fusable tiles, "a8" keeps the
        # stream int8 all the way into the MXU.
        fcfg = tcfg.with_(encoder_attn_impl="jax_flash")
        tgt_w8f = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            ("lv3_b8_w8_flash", DecodeEngine(tgt_w8f, fcfg, st), B),
            ("lv3_b8_w8_flash_xkv_einsum",
             DecodeEngine(tgt_w8f, fcfg, st, quantize_cross_kv=True), B),
            ("lv3_b8_w8_flash_xkv_chunked",
             DecodeEngine(
                 tgt_w8f, fcfg.with_(cross_kv_impl="chunked"), st,
                 quantize_cross_kv=True,
             ), B),
            ("lv3_b8_w8_flash_xkv_a8",
             DecodeEngine(
                 tgt_w8f, fcfg.with_(cross_kv_impl="a8"), st,
                 quantize_cross_kv=True,
             ), B),
        ]
    elif scenario == "xkv_impl_b1":
        # Single-stream control: einsum xkv WINS at B=1 (−2.9% on lv3+w8,
        # PERF.md) — the new impls must not regress the case that works.
        tgt_w8 = jax.device_put(quantize_decoder(tgt), dev)
        runs = [
            ("lv3_b1_w8", DecodeEngine(tgt_w8, tcfg, st), 1),
            ("lv3_b1_w8_xkv_einsum",
             DecodeEngine(tgt_w8, tcfg, st, quantize_cross_kv=True), 1),
            ("lv3_b1_w8_xkv_chunked",
             DecodeEngine(
                 tgt_w8, tcfg.with_(cross_kv_impl="chunked"), st,
                 quantize_cross_kv=True,
             ), 1),
            ("lv3_b1_w8_xkv_a8",
             DecodeEngine(
                 tgt_w8, tcfg.with_(cross_kv_impl="a8"), st,
                 quantize_cross_kv=True,
             ), 1),
        ]
    elif scenario == "xkv_paged":
        # The kernel answer to the structural XLA loss (PERF.md
        # "cross_kv_impl"): int8 codes DMA compactly in a transposed
        # layout and dequantize in VMEM (ops/paged_cross.py).
        # Interleaved control: the bf16 baseline.
        fcfg = tcfg.with_(encoder_attn_impl="jax_flash")
        pcfg = fcfg.with_(cross_kv_impl="kernel")
        tgt_w8f = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            ("lv3_b8_w8_flash", DecodeEngine(tgt_w8f, fcfg, st), B),
            ("lv3_b8_w8_flash_xkv_kernel",
             DecodeEngine(tgt_w8f, pcfg, st, quantize_cross_kv=True), B),
            ("lv3_b1_w8_xkv_kernel",
             DecodeEngine(tgt_w8f, tcfg.with_(cross_kv_impl="kernel"), st,
                          quantize_cross_kv=True), 1),
            ("d_b8_stack_kernel",
             DecodeEngine(
                 jax.device_put(quantize_decoder(draft_rand), dev),
                 dcfg.with_(encoder_attn_impl="jax_flash",
                            cross_kv_impl="kernel"),
                 st, quantize_cross_kv=True,
             ), B),
        ]
    elif scenario == "spec_xkv":
        # The two proven lv3 B=1 levers compose?  spec+w8 is the best
        # measured B=1 config (190.7 ms) and xkv einsum wins −3.5% on the
        # plain w8 loop; the verify pass scores K+1-wide chunks where the
        # int8 dequant may or may not fuse like the GEMV case does.
        # Interleaved control in-process.
        tgt_w8 = jax.device_put(quantize_decoder(tgt), dev)
        runs = [
            (f"lv3_spec_k{K}_w8",
             SpeculativeEngine(tgt_w8, tcfg, draft_rand, dcfg, st, spec_k=K),
             1),
            (f"lv3_spec_k{K}_w8_xkv",
             SpeculativeEngine(
                 tgt_w8, tcfg, draft_rand, dcfg, st, spec_k=K,
                 quantize_cross_kv=True,
             ),
             1),
        ]
    elif scenario == "xkv_impl_dstack":
        # The benched distil serving stack (flash + w8 + xkv): does a
        # fused xkv impl add anything at 2 decoder layers (~123 MB/step
        # cross-K/V at B=8)?  Uses the distil-dims params (draft_rand).
        fdcfg = dcfg.with_(encoder_attn_impl="jax_flash")
        d_w8 = jax.device_put(quantize_decoder(draft_rand), dev)
        B = 8
        runs = [
            ("d_b8_stack_einsum",
             DecodeEngine(d_w8, fdcfg, st, quantize_cross_kv=True), B),
            ("d_b8_stack_chunked",
             DecodeEngine(
                 d_w8, fdcfg.with_(cross_kv_impl="chunked"), st,
                 quantize_cross_kv=True,
             ), B),
            ("d_b8_stack_a8",
             DecodeEngine(
                 d_w8, fdcfg.with_(cross_kv_impl="a8"), st,
                 quantize_cross_kv=True,
             ), B),
        ]
    elif scenario == "self_kernel":
        # The batched step attribution (PERF.md "Per-op attribution of
        # the batched step") shows ~3.3 ms/step of self-KV cache handling
        # at lv3 B=8 against a ~0.36 ms read roofline: XLA materializes
        # the layer-slice read and overpays the one-row write.  The
        # Pallas self-decode kernel (ops/self_decode.py) reads the
        # stacked cache directly and writes the row in place via
        # aliasing.  A/B on top of the best batched stack (w8 + flash +
        # xkv kernel) and at B=1 (w8 + xkv einsum).
        fcfg = tcfg.with_(
            encoder_attn_impl="jax_flash", cross_kv_impl="kernel"
        )
        tgt_w8f = jax.device_put(quantize_decoder(tgt), dev)
        runs = [
            ("lv3_b8_w8_flash_xkvk",
             DecodeEngine(tgt_w8f, fcfg, st, quantize_cross_kv=True), 8),
            ("lv3_b8_w8_flash_xkvk_selfk",
             DecodeEngine(
                 tgt_w8f, fcfg.with_(self_kv_impl="kernel"), st,
                 quantize_cross_kv=True,
             ), 8),
            # Head-tile arms: the lone-op sweep (perf_self_kernel_sweep)
            # measured hpc=2 (auto) at 97.1 us/layer vs hpc=20 at 78.4
            # at lv3 B=8 — the same tile-size lever that flipped the
            # cross kernel.  In-context decides.
            ("lv3_b8_w8_flash_xkvk_selfk_hpc10",
             DecodeEngine(
                 tgt_w8f,
                 fcfg.with_(self_kv_impl="kernel", self_kv_kernel_hpc=10),
                 st, quantize_cross_kv=True,
             ), 8),
            ("lv3_b8_w8_flash_xkvk_selfk_hpc20",
             DecodeEngine(
                 tgt_w8f,
                 fcfg.with_(self_kv_impl="kernel", self_kv_kernel_hpc=20),
                 st, quantize_cross_kv=True,
             ), 8),
            ("lv3_b1_w8_xkv",
             DecodeEngine(tgt_w8f, tcfg, st, quantize_cross_kv=True), 1),
            ("lv3_b1_w8_xkv_selfk",
             DecodeEngine(
                 tgt_w8f, tcfg.with_(self_kv_impl="kernel"), st,
                 quantize_cross_kv=True,
             ), 1),
            ("lv3_b1_w8_xkv_selfk_hpc20",
             DecodeEngine(
                 tgt_w8f,
                 tcfg.with_(self_kv_impl="kernel", self_kv_kernel_hpc=20),
                 st, quantize_cross_kv=True,
             ), 1),
        ]
    # (A "fused_block" scenario A/B'd the whole-block self-attention
    # kernel in r3: decisive loss — +276% B=8 / +608% B=1 — and the
    # kernel was removed in r4.  PERF.md "self_kv_impl=fused" keeps the
    # measured table.)
    elif scenario in ("best_vs_skv", "best_vs_skv448"):
        # r4 VERDICT #8: on the batched deep-decoder serving stack
        # (w8 + flash + xkv kernel — 967 ms control with the self-decode
        # kernel), is the int8 self-KV cache (halves the OTHER per-step
        # KV stream; dict caches, so the self kernel gates off and the
        # XLA twin applies) the better default?  Third arm stacks
        # NEITHER self lever as the shared control.  448 variant = the
        # production serving length where self-KV bytes are ~3.3x.
        mtp = 448 if scenario.endswith("448") else 136
        scfg = tcfg.with_(
            max_target_positions=mtp,
            encoder_attn_impl="jax_flash",
            cross_kv_impl="kernel",
        )
        tgt_w8s = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            (f"lv3_b8_{mtp}_serving_plain",
             DecodeEngine(tgt_w8s, scfg, st, quantize_cross_kv=True), B),
            (f"lv3_b8_{mtp}_serving_selfk",
             DecodeEngine(
                 tgt_w8s, scfg.with_(self_kv_impl="kernel"), st,
                 quantize_cross_kv=True,
             ), B),
            (f"lv3_b8_{mtp}_serving_skv",
             DecodeEngine(
                 tgt_w8s, scfg, st,
                 quantize_cross_kv=True, quantize_self_kv=True,
             ), B),
        ]
    elif scenario in ("xkv4", "xkv4_448"):
        # r4: int4 nibble-packed cross-K/V (the dominant per-step stream
        # at this operating point, ~986 MB/step int8) vs the int8 tier,
        # both through the stacked-layer kernel, on the best serving
        # stack (w8 + flash + xkvk + self kernel).
        mtp = 448 if scenario.endswith("448") else 136
        scfg = tcfg.with_(
            max_target_positions=mtp,
            encoder_attn_impl="jax_flash",
            cross_kv_impl="kernel",
            self_kv_impl="kernel",
        )
        tgt_w8s = jax.device_put(quantize_decoder(tgt), dev)
        B = 8
        runs = [
            (f"lv3_b8_{mtp}_serving_selfk",
             DecodeEngine(tgt_w8s, scfg, st, quantize_cross_kv=True), B),
            (f"lv3_b8_{mtp}_serving_selfk_xkv4",
             DecodeEngine(tgt_w8s, scfg, st, quantize_cross_kv="int4"), B),
        ]
    else:
        raise SystemExit(f"unknown scenario {scenario!r}")

    for name, engine, B in runs:
        wj = windows(B)
        langs = [50259] * B
        engine.transcribe_window(wj, langs, seed=0)  # compile
        avg, _ = profiled_device_ms(
            lambda: engine.transcribe_window(wj, langs, seed=0),
            2, f"/tmp/norma_spec_ab/{name}",
        )
        rec = {
            "device_ms": round(avg, 1),
            "rtf_per_stream_device": round(avg / 1e3 / 30.0 / B, 5),
            "streams_per_chip_device": int(30.0 * B / (avg / 1e3)),
        }
        if isinstance(engine, SpeculativeEngine):
            rec["rounds"] = engine.last_spec_rounds
            rec["tokens_per_round"] = round(
                engine.last_tokens_per_round or 0, 2
            )
        print(json.dumps({name: rec}), flush=True)
        del engine

    print("done", flush=True)


if __name__ == "__main__":
    main()
