"""Whisper model configuration.

Re-creation of candle's ``whisper::Config`` (deserialized from HF
``config.json`` in the reference loaders, ``monolingual.rs:213,347``), plus
offline presets with the known dimensions of every checkpoint the reference
supports (``/root/reference/src/models/whisper/mod.rs:11-28``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Tuple


# The default suppress list shipped in OpenAI whisper configs (multilingual
# V1 vocab).  Real loads always take the list from the checkpoint's
# config.json; this is only the offline default for presets.
_DEFAULT_SUPPRESS_V1: Tuple[int, ...] = (
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254, 50258, 50358, 50359, 50360, 50361,
    50362,
)


@dataclass(frozen=True)
class WhisperConfig:
    num_mel_bins: int = 80
    vocab_size: int = 51865
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    max_source_positions: int = 1500
    max_target_positions: int = 448
    suppress_tokens: Tuple[int, ...] = field(default=_DEFAULT_SUPPRESS_V1)
    # Legacy boolean alias for encoder_attn_impl="jax_flash" (r1/r2 API;
    # prefer the string selector).
    flash_attention: bool = False
    # Encoder self-attention implementation (TPU-only selector; non-TPU
    # backends always use "xla"):
    #   "auto"      — B=1 -> "chunked" (same f32 math as "xla", measured
    #                 -14% device window on v5e), batched -> "xla"
    #                 (chunking regresses at B=8; the bigger batched win,
    #                 "jax_flash", changes numerics so it stays opt-in)
    #   "xla"       — plain einsum QK/softmax/PV
    #   "chunked"   — lax.scan over query chunks: bounds the materialized
    #                 score buffer to [H, chunk, Tk] so XLA can keep the
    #                 QK->softmax->PV chain VMEM-resident per chunk
    #   "flash"     — pallas flash kernel at default 128-tiles (loses in
    #                 context on v5e; kept for comparison)
    #   "jax_flash" — pallas flash kernel at tuned tiles (flash_block_*):
    #                 the measured B=8 window win (348 -> 279 ms device)
    # ``flash_attention=True`` is the legacy alias; it now selects
    # "jax_flash" (the tuned, winning tiles).
    # All in-context device numbers: tools/perf_encoder_ab.py on v5e.
    encoder_attn_impl: str = "auto"
    # Query-chunk length for "chunked" (scores buffer = H*chunk*Tk).
    # Must divide the encoder sequence length (1500) or the layer falls
    # back to full attention.
    encoder_attn_chunk: int = 250
    # Unroll factor for the encoder layer scan (1 = rolled).  Unrolling
    # lets XLA overlap one layer's tail with the next layer's weight DMAs
    # at the cost of compile time; relevant mainly for the pallas attention
    # impls whose kernel boundary blocks cross-iteration pipelining.
    encoder_unroll: int = 1
    # Tile sizes for "jax_flash".  This is THE lever that decides whether
    # flash attention wins in context on v5e: the kernel's default
    # 128x128 tiles measured 597 ms for the B=8 window vs 279 ms at
    # 512x512 and 267 ms at 1536x1536 (one tile per head; baseline 348)
    # — the r2 "pallas_call fusion barrier" regression was a tile-size
    # artifact, not a kernel-boundary tax.
    flash_block_q: int = 1536
    flash_block_k: int = 1536
    # Materialize encoder self-attention scores in bf16 (TPU only).  The
    # [heads, 1500, 1500] score buffer is the dominant HBM traffic of the
    # encoder; bf16 halves it (~11% device window time, PERF.md).  Default
    # OFF: the hardware accuracy gate (tools/verify_encoder_scores_tpu.py)
    # measures ~0.5-1% encoder-feature drift that FLIPS greedy tokens on
    # seeded checkpoints, and the reference computes f32 scores
    # (candle whisper DTYPE, model.rs:12) — opt in only where a WER check
    # against real audio has cleared it.
    encoder_scores_bf16: bool = False
    # Compute mode for quantize_encoder params (ignored unless the encoder
    # layer stack carries int8 ``_q`` weights):
    #   "w8a8"  — dynamic per-row int8 activations, int8×int8→int32 on the
    #             MXU (2× the bf16 multiplier rate on v5e+; the intended
    #             mode — model/quant.py quantize_encoder)
    #   "w8a16" — weights dequantize to the activation dtype in-graph and
    #             the matmuls run bf16 (same math as quantize_decoder's
    #             layers; no activation-grid noise).  The fallback if a
    #             backend's int8 dot lowering disappoints, and the
    #             accuracy-isolation arm for A/Bs: w8a16 vs w8a8 differ
    #             ONLY by activation quantization.
    #   "w8a8_pallas" — same math as "w8a8" but the int8 dots are issued
    #             as explicit Pallas tiles (TPU-only; elsewhere it falls
    #             back to "w8a8").  Plan B if tools/perf_int8_mxu.py shows
    #             XLA's s8 lowering is not native on a backend.
    encoder_q8_mode: str = "w8a8"
    # Implementation of the int8 cross-attention used when the engine's
    # ``quantize_cross_kv`` is on (ignored otherwise):
    #   "einsum"  — dequantize K/V to the activation dtype and run the
    #               plain batched einsum.  Fuses at B=1 (the measured −6%
    #               single-stream window win) but on deep decoders at
    #               batch XLA materializes the bf16 copy of the ~2 GB/step
    #               large-v3 B=8 stream — the measured +45% regression
    #               (PERF.md "quantize_cross_kv").
    #   "chunked" — key-chunked online softmax: the dequant is bounded to
    #               one [B, cross_kv_chunk, D] tile per unrolled step so
    #               the convert+dot chain fuses and the HBM stream stays
    #               int8.  Same numeric tier as "einsum" (reassociated
    #               softmax reduction only).
    #   "a8"      — fully-int8 QK/PV dots (q and softmax weights row-
    #               quantized in-graph): the stream is GUARANTEED int8-
    #               wide independent of fusion choices, at one numeric
    #               tier more drift (~0.4%-of-row-max on q and w).
    #               Measured: BOTH XLA fixes still regress at lv3 B=8
    #               (PERF.md "cross_kv_impl") — XLA materializes dot
    #               operands at MXU-shaped batches.
    #   "kernel"  — a purpose-built Pallas decode kernel (TPU-only;
    #               ops/paged_cross.py): int8 codes DMA compactly in a
    #               transposed [dh, Ta] layout and dequantize in VMEM;
    #               the per-channel scales fold onto q / the output
    #               outside the kernel.  The only form whose HBM stream
    #               is int8 by construction.  bf16-operand/f32-accum
    #               numerics (the flash-encoder tier); plain token loop
    #               only (not combinable with draft= speculation).  On
    #               non-TPU backends it falls back to "einsum".  (The
    #               stock paged-attention kernel is unusable here: it
    #               streams scales broadcast to head_dim width and
    #               rejects whisper's head_dim=64 — see the module doc.)
    cross_kv_impl: str = "einsum"
    # Key-chunk length for cross_kv_impl="chunked" (1500 = 3 chunks).
    cross_kv_chunk: int = 500
    # Head-tile size for cross_kv_impl="kernel": how many heads ride one
    # grid cell (must divide decoder_attention_heads).  Identical math;
    # a DMA-granularity knob (96 KB/head at whisper dims).  0 = auto:
    # the largest divisor of n_heads ≤ 10 at batch / ≤ 5 single-stream —
    # the hardware sweep's winners (tools/perf_xkv_kernel_sweep.py, v5e:
    # per-layer op 83.2 → 48.5 µs at B=8 hpc10; 11.7 → 8.5 at B=1 hpc5).
    cross_kv_kernel_hpc: int = 0
    # Self-attention implementation for the single-token decode step:
    #   "xla"    — write the new row into the stacked [L,B,Tmax,D] cache
    #              carry with dynamic_update_slice, slice the layer's
    #              cache out and run the plain einsum attention.  XLA
    #              materializes the layer slice and overpays the row
    #              write: measured ~3.3 ms/step of self-KV handling at
    #              lv3 B=8 against a ~0.36 ms read roofline
    #              (PERF.md "Per-op attribution of the batched step").
    #   "kernel" — a Pallas kernel (TPU-only; ops/self_decode.py) that
    #              reads the stacked cache directly (no slice copy),
    #              folds the step's new K/V row in explicitly, and
    #              writes that row back IN PLACE via input/output
    #              aliasing with a one-row output block.  bf16-operand/
    #              f32-accum numerics (the cross-decode kernel's tier).
    #              bf16 caches only (quantize_self_kv falls back to
    #              "xla"); non-TPU backends fall back to "xla".
    # (A third whole-block "fused" form existed in r3 and was REMOVED in
    # r4 after a decisive device A/B loss — +276% lv3 B=8 / +608% B=1:
    # the in-kernel weight stream serialized what XLA pipelines across
    # the layer scan.  PERF.md "self_kv_impl=fused" keeps the record.)
    self_kv_impl: str = "xla"
    # (An r4 fill-proportional chunked variant — Ta-chunk grid with
    # beyond-fill chunks index-clamped to elide their DMA, online
    # softmax — was built, device-verified correct, and REMOVED after
    # losing its device A/B decisively: lv3 B=8 mtp=448 serving
    # 2221.1 ms full-block vs 3239.7 chunk=64 / 2694.1 chunk=112 —
    # per-grid-step overheads swamp the ~43% DMA saving at these
    # shapes.  PERF.md "fill-proportional self-KV" keeps the record.)
    # Head-tile size for self_kv_impl="kernel" (even, divides
    # decoder_attention_heads; the cache block's lane width is
    # heads_per_cell*64 and must be a multiple of 128).  0 = auto.
    self_kv_kernel_hpc: int = 0
    # Unroll factor for the DECODER layer scan in the single-token
    # decode step ONLY (0 = auto: shallow decoders fully unroll at small
    # row counts, deep decoders stay rolled — whisper._unroll_gate; the
    # speculative verify chunk always keeps its own B*C-calibrated
    # gate).  A measurement knob: the lv3 sweep showed 4/8 REGRESS
    # (2868 -> 3946/5080 us/step, PERF.md), so scan boundaries are not
    # the deep decoder's non-roofline cost — leave at 0.
    decoder_scan_unroll: int = 0
    # Bucketed decode (r5, the PURE-XLA fill-proportional self-KV form):
    # ascending cache-length buckets strictly below max_target_positions,
    # e.g. (128, 256) at mtp=448.  The token loop runs as a CHAIN of
    # per-bucket while_loops: tokens at fill < 128 read/write a cache
    # cropped to 128 rows, then the cache grows to 256, then to mtp — so
    # early steps' self-KV stream scales with fill instead of paying the
    # full static mtp read every step (~2.5x overread at mtp=448,
    # PERF.md "Next lever").  Bucket boundaries cost one cache copy per
    # window each; decode results are BITWISE identical to the unbucketed
    # loop (masked rows contribute exact zeros).  () = off.  Composes
    # with self_kv_impl="kernel" and quantize_self_kv (each bucket
    # compiles its own step); the speculative engine's t>0 fallback
    # rungs inherit the buckets (its greedy draft/verify loop does not —
    # the chunked verify already amortizes the cache read over K+1
    # tokens).  The r4 KERNEL-chunked form of this idea lost its A/B and
    # was removed; this form moves the bound to loop structure instead
    # of kernel grids.
    decode_buckets: Tuple[int, ...] = ()

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @classmethod
    def from_hf_dict(cls, d: dict) -> "WhisperConfig":
        return cls(
            num_mel_bins=d["num_mel_bins"],
            vocab_size=d["vocab_size"],
            d_model=d["d_model"],
            encoder_layers=d["encoder_layers"],
            encoder_attention_heads=d["encoder_attention_heads"],
            decoder_layers=d["decoder_layers"],
            decoder_attention_heads=d["decoder_attention_heads"],
            max_source_positions=d.get("max_source_positions", 1500),
            max_target_positions=d.get("max_target_positions", 448),
            suppress_tokens=tuple(d.get("suppress_tokens") or ()),
        )

    @classmethod
    def from_json(cls, path: str) -> "WhisperConfig":
        with open(path, "r") as f:
            return cls.from_hf_dict(json.load(f))

    def with_(self, **kw) -> "WhisperConfig":
        return replace(self, **kw)


def _preset(d_model, heads, enc, dec, *, mels=80, vocab=51865) -> WhisperConfig:
    return WhisperConfig(
        num_mel_bins=mels,
        vocab_size=vocab,
        d_model=d_model,
        encoder_layers=enc,
        encoder_attention_heads=heads,
        decoder_layers=dec,
        decoder_attention_heads=heads,
    )


# Known checkpoint dimensions; the English ("EnV1") vocab has 51864 entries,
# multilingual V1 51865 and V2 (large-v3 era, 128 mels) 51866.
PRESETS = {
    "tiny": _preset(384, 6, 4, 4),
    "tiny.en": _preset(384, 6, 4, 4, vocab=51864),
    "base": _preset(512, 8, 6, 6),
    "base.en": _preset(512, 8, 6, 6, vocab=51864),
    "small": _preset(768, 12, 12, 12),
    "small.en": _preset(768, 12, 12, 12, vocab=51864),
    "medium": _preset(1024, 16, 24, 24),
    "medium.en": _preset(1024, 16, 24, 24, vocab=51864),
    "large": _preset(1280, 20, 32, 32),
    "large-v2": _preset(1280, 20, 32, 32),
    "large-v3": _preset(1280, 20, 32, 32, mels=128, vocab=51866),
    # Beyond the reference's v0.0.3 list: the pruned-decoder serving
    # checkpoint (large-v3's encoder, 4-layer decoder).
    "large-v3-turbo": _preset(1280, 20, 32, 4, mels=128, vocab=51866),
    "distil-medium.en": _preset(1024, 16, 24, 2),
    "distil-large-v2": _preset(1280, 20, 32, 2),
    "distil-large-v3": _preset(1280, 20, 32, 2, mels=128, vocab=51866),
}
