"""On-device Whisper decoding engine.

TPU-native re-creation of the reference's per-window decode
(``/root/reference/src/models/whisper/model.rs:164-389``).  The reference
pays a host<->device round-trip per decoded token (token upload model.rs:318,
full-vocab download :342/:350) and recomputes decoder self-attention over the
whole prefix every step.  Here the entire autoregressive loop — sampling,
stateful timestamp-grammar suppression, logprob accounting, stop conditions —
runs inside ONE compiled ``lax.while_loop`` with an incremental KV cache;
only the final token ids (a few KB) ever reach the host.

Semantics preserved from the reference, in prob space (post first softmax):
  - first sampled token forced into [<|0.00|> ..= <|1.00|>]  (model.rs:336-338)
  - stateful rule engine supress_tokens()                    (model.rs:245-277)
  - monotonic timestamps via past-timestamp masking          (model.rs:225-243)
  - greedy argmax (t=0) / WeightedIndex over softmax(masked/t) (t>0)
    == categorical with logits masked/t                      (model.rs:340-357)
  - all-NaN weights => push EOT and stop                     (model.rs:343-346)
  - max_target_positions-1 guard pushes an extra EOT         (model.rs:367-370)
  - sum_logprob over ln(masked prob of chosen token)         (model.rs:364-365)
  - no-speech probe at the SOT position of the prefix        (model.rs:293-305)
  - compression_ratio intentionally never computed (NaN) so the fallback is
    logprob-only, matching the reference quirk               (model.rs:313,387)
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LOGPROB_THRESHOLD, NO_SPEECH_THRESHOLD, TEMPERATURES
from ..model.config import WhisperConfig
from ..model.whisper import (
    cross_kv,
    decoder_prefill,
    decoder_step,
    encode,
    quantize_cross_kv,
    quantize_self_kv_cache,
)
from ..tracing import decode_telemetry, instrument as decode_instrument
from .masks import SpecialTokens, build_masks

logger = logging.getLogger(__name__)


@dataclass
class DecodingResult:
    """Mirror of the reference's DecodingResult (model.rs:493-499)."""

    tokens: List[int]
    avg_logprob: float
    no_speech_prob: float
    compression_ratio: float = float("nan")


class DecodeEngine:
    """Jitted encode / prefill / decode-loop bundle for one model.

    All functions are batched over a leading stream dimension B; the
    single-stream API uses B=1 and the multi-stream scheduler larger B.
    """

    # Ladder policy threshold: total decode rows (streams x rungs) up to
    # which the speculative ladder is chosen (measured on TPU v5e: token
    # loop at 6-8 rows costs within ~15% of 1 row; 48 rows costs ~5.5x).
    _SPECULATIVE_ROWS_MAX = 16

    def __init__(
        self,
        params,
        cfg: WhisperConfig,
        st: SpecialTokens,
        language_token_ids: Optional[Sequence[int]] = None,
        mel_center: bool = False,
        fused_sampler: bool = True,
        quantize_cross_kv: "bool | str" = False,
        quantize_self_kv: bool = False,
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.st = st
        # Where the compiled programs will actually run.  Derived from the
        # params' devices, NOT jax.default_backend(): in a mixed-backend
        # process (TPU backend initialized, then a CPU-mesh program traced,
        # as the multi-chip dryrun does) the global default would enable
        # the TPU-only Pallas sampler in a CPU lowering.
        from ..utils import params_device_count, params_platform

        self._platform = params_platform(params)
        # Kernel×mesh guard: every Pallas impl (fused sampler, flash
        # encoder, cross/self decode kernels, w8a8_pallas encoder dots)
        # is hardware-validated on ONE device only; under a >1-device
        # mesh GSPMD would have to partition the Pallas call, a trace
        # path nothing tests.  An engine whose params span a mesh
        # therefore falls back to the XLA twins of each impl (identical
        # semantics, the exact-math tier) with a logged warning, rather
        # than letting a serving config silently enter untested lowering.
        self._n_param_devices = params_device_count(params)
        # dp-mesh kernel carry (r5, VERDICT #2): when ``mesh`` is given,
        # every non-dp axis is trivial, and the params are fully REPLICATED
        # over exactly the mesh's devices (pure data parallelism), the
        # kernel operating point survives the mesh: the fused window
        # program runs under ``jax.shard_map`` over 'dp', so each device
        # executes the hardware-validated single-device Pallas kernels on
        # its local batch rows — no GSPMD partitioning of any Pallas call,
        # and no cross-device collectives exist in the window program at
        # all (dp is embarrassingly parallel).  tp-sharded params keep the
        # XLA-twin fallback below.
        self._dp_mesh = None
        self._kernel_cfg = None
        self._kernel_fused = False
        self._ladder_sm_cache = {}
        import threading

        self._trace_lock = threading.RLock()
        if self._n_param_devices > 1:
            dp_carry = False
            if mesh is not None:
                from ..utils import params_replicated_on_mesh

                dp_carry = all(
                    size == 1
                    for ax, size in mesh.shape.items()
                    if ax != "dp"
                ) and params_replicated_on_mesh(params, mesh)
            overrides = {}
            if cfg.flash_attention or cfg.encoder_attn_impl in (
                "flash",
                "jax_flash",
            ):
                overrides["flash_attention"] = False
                overrides["encoder_attn_impl"] = "auto"
            if cfg.cross_kv_impl == "kernel":
                overrides["cross_kv_impl"] = "einsum"
            if cfg.self_kv_impl == "kernel":
                overrides["self_kv_impl"] = "xla"
            if cfg.encoder_q8_mode == "w8a8_pallas":
                overrides["encoder_q8_mode"] = "w8a8"
            if dp_carry:
                self._dp_mesh = mesh
                self._kernel_cfg = cfg
                self._kernel_fused = bool(fused_sampler)
                if overrides or fused_sampler:
                    logger.info(
                        "params replicated over a dp=%d mesh: Pallas "
                        "kernel impls carried via shard_map for "
                        "dp-divisible window batches; XLA twins serve "
                        "the remaining programs",
                        mesh.shape.get("dp", 1),
                    )
            # The non-shard_mapped programs (B %% dp != 0 windows, the
            # compositional prefill/run_loop API, detection) still trace
            # under GSPMD, so they ALWAYS use the XLA twins.
            if overrides:
                if not dp_carry:
                    logger.warning(
                        "params span %d devices: Pallas kernel impls are "
                        "single-device only; falling back to XLA twins %s "
                        "(see docs/serving.md)",
                        self._n_param_devices,
                        sorted(overrides),
                    )
                cfg = cfg.with_(**overrides)
            if fused_sampler and self._platform == "tpu" and not dp_carry:
                logger.warning(
                    "params span %d devices: disabling the fused Pallas "
                    "sampler (single-device only); using the XLA "
                    "sampling pipeline",
                    self._n_param_devices,
                )
            fused_sampler = False
            self.cfg = cfg
        # Fused Pallas grammar+sampling step on TPU (ops/sample_step.py);
        # pass False to force the pure-XLA pipeline on any backend.  A
        # constructor argument (not a mutable attribute) because the value
        # is read at TRACE time inside the jitted loops: flipping it after
        # the first decode call would silently have no effect on the
        # already-compiled programs.
        self.fused_sampler = bool(fused_sampler)
        # int8 cross-attention K/V for the token loop: halves the decode
        # loop's dominant per-step HBM stream at batch (~123 MB/step of
        # cross-K/V at B=8 distil vs ~66 MB of weights).  Scales fold
        # exactly into the attention math (model/whisper.py
        # attention_cross_q8); prefill/detect stay bf16.  Trace-time, so a
        # constructor argument like fused_sampler.  Opt-in: int8 rounding
        # of K/V can perturb logits ~0.1-0.5%.
        # "int4" (r4): nibble-packed codes, kernel-only
        # (cross_kv_impl="kernel" on TPU; elsewhere falls back to int8
        # with a warning) — halves the dominant stream AGAIN at one more
        # accuracy rung (~7%-of-row-max rounding; gate on WER).
        if quantize_cross_kv not in (False, True, "int8", "int4"):
            raise ValueError(
                "quantize_cross_kv must be False, True/'int8' or 'int4', "
                f"got {quantize_cross_kv!r}"
            )
        # Tests exercise the kernel layouts off-TPU in Pallas interpret
        # mode via this env escape (mirrors NORMA_SELF_KERNEL_INTERPRET;
        # hardware gate: tools/verify_paged_cross_tpu.py).
        self._xkv_interp_escape = (
            os.environ.get("NORMA_XKV_KERNEL_INTERPRET") == "1"
        )
        if quantize_cross_kv == "int4" and not (
            cfg.cross_kv_impl == "kernel"
            and (self._platform == "tpu" or self._xkv_interp_escape)
        ):
            logger.warning(
                "quantize_cross_kv='int4' needs cross_kv_impl='kernel' "
                "on TPU; falling back to the int8 tier"
            )
            quantize_cross_kv = True
        self.quantize_cross_kv = (
            quantize_cross_kv
            if quantize_cross_kv in (False, "int4")
            else True
        )
        # int8 SELF-attention KV cache with per-written-row scales: halves
        # the other per-step KV stream (large-v3 @ 448 positions: ~73 MB
        # of self-K/V bf16 per step, scaling with batch).  Scale folding
        # is exact (model/whisper.py attention_self_q8); like the other
        # trace-time knobs it is a constructor argument.  Opt-in; device
        # A/B staged in tools/perf_decoder_ab.py.
        self.quantize_self_kv = bool(quantize_self_kv)
        # False = reference (whisper.cpp/candle) framing; True = OpenAI/HF
        # centered STFT (matches how the checkpoints were trained).
        self.mel_center = bool(mel_center)
        if self.cfg.decode_buckets:
            bad = [
                b for b in self.cfg.decode_buckets
                if not isinstance(b, int) or b <= 0
            ]
            if bad:
                raise ValueError(
                    f"decode_buckets must be positive ints, got {bad}"
                )
        masks = build_masks(cfg.vocab_size, cfg.suppress_tokens, st)
        self._m_suppress = jnp.asarray(masks.suppress)
        self._m_non_ts = jnp.asarray(masks.non_timestamps)
        self._m_ts = jnp.asarray(masks.timestamps)
        self._m_first = jnp.asarray(masks.first_token)
        self._lang_ids = (
            jnp.asarray(np.asarray(language_token_ids, np.int32))
            if language_token_ids is not None
            else None
        )

        self._encode = jax.jit(lambda p, mel: encode(p, cfg, mel))
        self._prefill = jax.jit(self._prefill_impl)
        self._prefill_full = jax.jit(self._prefill_full_impl)
        self._loop = jax.jit(self._loop_impl)
        self._detect = jax.jit(self._detect_impl)
        # Fused whole-window programs: ONE dispatch per window covering
        # mel -> encoder -> (optional language detection) -> prefill ->
        # no-speech gate -> the full temperature-fallback ladder.
        self._ladder = jax.jit(partial(self._ladder_impl, detect=False))
        self._ladder_detect = jax.jit(partial(self._ladder_impl, detect=True))

    def _get_ladder_sm(self, detect: bool):
        """The dp-mesh shard_mapped fused window program (kernel impls).

        Each device runs the single-device program — including every Pallas
        kernel the construction-time config named — on its local batch
        rows; 'dp' shards exactly the kernels' batch-major grid dimension,
        so no Pallas call is ever GSPMD-partitioned.  The arm choice
        (speculative vs sequential ladder) keys on the LOCAL batch — the
        per-chip row count is what the cost model measures — so a dp-mesh
        engine may pick a different arm than an unsharded one at the same
        global B (a different PRNG stream of the same sampling law;
        t=0 decodes are bitwise identical either way).
        """
        key = bool(detect)
        fn = self._ladder_sm_cache.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            def traced(params, audio, langs, seed, active):
                # Trace-time override: _ladder_impl and everything under it
                # read self.cfg/self.fused_sampler, so the kernel config is
                # swapped in only while THIS program traces (tracing happens
                # inside the jit call on the engine's dispatch thread; the
                # XLA-twin programs trace under the fallback config as
                # before).  The lock serializes against a second thread
                # tracing any OTHER program mid-override (retraces at new
                # shapes included).
                with self._trace_lock:
                    prev = (self.cfg, self.fused_sampler)
                    self.cfg, self.fused_sampler = (
                        self._kernel_cfg,
                        self._kernel_fused,
                    )
                    try:
                        return self._ladder_impl(
                            params, audio, langs, seed, active, detect=detect
                        )
                    finally:
                        self.cfg, self.fused_sampler = prev

            fn = jax.jit(
                jax.shard_map(
                    traced,
                    mesh=self._dp_mesh,
                    in_specs=(P(), P("dp"), P("dp"), P(), P("dp")),
                    out_specs=P("dp"),
                    # Pallas calls don't participate in varying-mesh-axes
                    # inference; the out_spec above is the contract.
                    check_vma=False,
                )
            )
            self._ladder_sm_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    # Device-side pieces
    # ------------------------------------------------------------------

    def encode(self, mel: jax.Array) -> jax.Array:
        """mel [B, n_mels, T] -> audio features [B, T//2, D]."""
        return self._encode(self.params, mel)

    def _quantize_xkv(self, xk, xv):
        """Window-time int8/int4 quantization of the loop's cross-K/V, in
        the form ``cfg.cross_kv_impl`` needs: the "kernel" impl wants its
        transposed layout built here (TPU only — elsewhere the plain
        dict is built and the einsum form applies, same quantization
        grid).  The int4 tier is kernel-only (validated in __init__)."""
        if self.quantize_cross_kv == "int4":
            from ..model.whisper import quantize_cross_kv4
            from ..ops.paged_cross import prep_cross_kv_kernel4

            kq, vq = quantize_cross_kv4(xk, xv)
            return prep_cross_kv_kernel4(
                kq, vq, self.cfg.decoder_attention_heads
            )
        kq, vq = quantize_cross_kv(xk, xv)
        if self.cfg.cross_kv_impl == "kernel" and (
            self._platform == "tpu" or self._xkv_interp_escape
        ):
            from ..ops.paged_cross import prep_cross_kv_kernel

            return prep_cross_kv_kernel(
                kq, vq, self.cfg.decoder_attention_heads
            )
        return kq, vq

    def _prefill_impl(self, params, feats, prefix_tokens):
        """feats [B, Ta, D]; prefix_tokens [B, P] -> prefill state.

        Returns (xk, xv, cache_k, cache_v, next_logits [B,V], no_speech_prob [B]).
        The probe reads logits at the SOT position (index 0), exactly like the
        reference's ``ys.i(..1).i(0).i(0)`` (model.rs:300).
        """
        xk, xv = cross_kv(params, self.cfg, feats)
        logits, cache_k, cache_v = decoder_prefill(
            params, self.cfg, prefix_tokens, xk, xv
        )
        if self.quantize_cross_kv:  # loop-side only; prefill above is bf16
            xk, xv = self._quantize_xkv(xk, xv)
        if self.quantize_self_kv:  # ditto: the prefill pass itself is bf16
            cache_k = quantize_self_kv_cache(cache_k)
            cache_v = quantize_self_kv_cache(cache_v)
        probe = jax.nn.softmax(logits[:, 0, :], axis=-1)
        no_speech_prob = probe[:, self.st.no_speech]
        return xk, xv, cache_k, cache_v, logits[:, -1, :], no_speech_prob

    def _prefill_full_impl(self, params, audio, prefix_tokens):
        """Fused window dispatch: raw padded PCM -> mel -> encoder -> prefill.

        One device call instead of three (mel/encode/prefill); used on the
        hot path when the language token is already known.
        """
        from ..frontend.mel import log_mel_spectrogram

        n_frames = 2 * self.cfg.max_source_positions
        mel = log_mel_spectrogram(
            audio,
            n_mels=self.cfg.num_mel_bins,
            n_frames=n_frames,
            center=self.mel_center,
        )
        feats = encode(params, self.cfg, mel)
        return self._prefill_impl(params, feats, prefix_tokens)

    def _detect_impl(self, params, feats):
        """Language-id probe: decode one step on [sot] and softmax over the
        language tokens (reference: detect_language, model.rs:194-210).

        Returns probs [B, n_languages] in Language-enum order.
        """
        B = feats.shape[0]
        sot = jnp.full((B, 1), self.st.sot, jnp.int32)
        xk, xv = cross_kv(params, self.cfg, feats)
        logits, _, _ = decoder_prefill(params, self.cfg, sot, xk, xv)
        lang_logits = logits[:, 0, self._lang_ids]
        return jax.nn.softmax(lang_logits, axis=-1)

    def _loop_impl(
        self,
        params,
        xk,
        xv,
        cache_k,
        cache_v,
        next_logits,  # [B, V] f32 — logits predicting the first sampled token
        tokens_init,  # [B, Tmax] int32 with the prefix written at [0, P)
        n0,  # scalar int32 == P
        prev1,  # [B] int32 (task token)
        prev2,  # [B] int32 (lang or sot token)
        temp,  # scalar f32
        seed,  # scalar uint32
    ):
        B = tokens_init.shape[0]
        tokens, n, slp = self._token_loop(
            params, xk, xv, cache_k, cache_v, next_logits, tokens_init,
            n0, prev1, prev2, jnp.broadcast_to(temp, (B,)),
            jax.random.PRNGKey(seed),
        )
        # One packed f32 array => one device->host fetch (see _pack_ladder).
        return jnp.concatenate(
            [
                tokens.astype(jnp.float32),
                n.astype(jnp.float32)[:, None],
                slp[:, None],
            ],
            axis=1,
        )

    def _token_loop(
        self,
        params,
        xk,
        xv,
        cache_k,
        cache_v,
        next_logits,
        tokens_init,
        n0,
        prev1,
        prev2,
        temp,  # [B] f32 per-row temperature
        key0,  # jax PRNG key
        n_rungs: int = 1,
        fin_init=None,  # [B] bool — rows born finished (no-speech / settled)
    ):
        cfg = self.cfg
        st = self.st
        B, Tmax = tokens_init.shape
        mtp = cfg.max_target_positions
        if fin_init is None:
            fin_init = jnp.zeros((B,), bool)

        def cond(c):
            (step, tokens, n, p1, p2, last_ts, slp, fin, ll, ck, cv, key) = c
            return jnp.logical_and(jnp.any(~fin), step < mtp)

        # The per-step post-logits pipeline (softmax -> grammar masks ->
        # greedy/categorical -> chosen-prob) runs as ONE fused Pallas
        # program on TPU (~20 separate XLA ops cost ~0.5 ms/step in fixed
        # overhead alone, measured on v5e); the jnp twin is the semantics
        # oracle and the CPU path.
        use_kernel = self.fused_sampler and self._platform == "tpu"
        seed2 = key0.reshape(-1)[:2].astype(jnp.uint32)

        def body(c):
            (step, tokens, n, p1, p2, last_ts, slp, fin, ll, ck, cv, key) = c
            key, sub = jax.random.split(key)
            if use_kernel:
                from ..ops.sample_step import sample_step_pallas

                nxt, prob_chosen, all_nan = sample_step_pallas(
                    ll, self._m_suppress, self._m_non_ts, self._m_ts,
                    self._m_first, p1, p2, last_ts, step, temp, seed2,
                    eot=st.eot, no_timestamps=st.no_timestamps,
                )
            else:
                from ..ops.sample_step import sample_step_jnp

                nxt, prob_chosen, all_nan = sample_step_jnp(
                    ll, self._m_suppress, self._m_non_ts, self._m_ts,
                    self._m_first, p1, p2, last_ts, step, temp, sub,
                    eot=st.eot, no_timestamps=st.no_timestamps,
                )
            use_sampling = temp > 0.0
            forced_nan_eot = jnp.logical_and(use_sampling, all_nan)

            # Push at per-stream position n (lockstep: n == n0 + step for all
            # unfinished streams, but keep it per-stream for clarity).
            slot = jnp.arange(Tmax)[None] == n[:, None]
            tokens = jnp.where(slot & (~fin)[:, None], nxt[:, None], tokens)

            add_lp = jnp.where(fin | forced_nan_eot, 0.0, jnp.log(prob_chosen))
            slp = slp + add_lp

            hit_eot = nxt == st.eot
            # len after push is n+1; reference pushes an extra EOT when
            # len >= max_target_positions - 1 (model.rs:367-370).
            len_limit = ((n + 1) >= (mtp - 1)) & ~hit_eot & ~forced_nan_eot
            slot2 = jnp.arange(Tmax)[None] == (n + 1)[:, None]
            tokens = jnp.where(
                slot2 & (len_limit & ~fin)[:, None], st.eot, tokens
            )

            new_fin = fin | hit_eot | forced_nan_eot | len_limit
            n = jnp.where(fin, n, n + 1 + len_limit.astype(jnp.int32))
            p2 = jnp.where(fin, p2, p1)
            p1 = jnp.where(fin, p1, nxt)
            last_ts = jnp.where(
                (~fin) & (nxt > st.no_timestamps), nxt, last_ts
            )

            # Forward the just-pushed token.  Unconditional on purpose: a
            # cond-guarded skip ("don't forward once every stream finished")
            # measured ~0.05 ms/step of branch overhead on v5e — more than
            # the single discarded forward it saves per window.  The final
            # forward's cache write lands at a position no later step reads.
            pos = n0 + step  # scalar position of the pushed token
            ll, ck, cv = decoder_step(
                params, cfg, nxt, pos, ck, cv, xk, xv, n_rungs=n_rungs
            )

            return (step + 1, tokens, n, p1, p2, last_ts, slp, new_fin, ll, ck, cv, key)

        init = (
            jnp.int32(0),
            tokens_init,
            jnp.full((B,), n0, jnp.int32),
            prev1,
            prev2,
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32),
            fin_init,
            next_logits,
            cache_k,
            cache_v,
            key0,
        )
        buckets = sorted(
            {int(b) for b in (cfg.decode_buckets or ()) if 0 < int(b) < mtp}
        )
        if not buckets:
            (step, tokens, n, _, _, _, slp, _, _, _, _, _) = (
                jax.lax.while_loop(cond, body, init)
            )
            return tokens, n, slp

        # Bucketed decode chain (cfg.decode_buckets): run the SAME loop
        # body as a sequence of while_loops over growing cache crops, so a
        # step at fill < S reads/writes an [L, B, S, D] cache instead of
        # the full [L, B, mtp, D] one (decoder_step's mask and the Pallas
        # self-decode kernel are cache-shape-driven).  Each boundary costs
        # one cache copy; masked rows contribute exact zeros, so results
        # are bitwise identical to the unbucketed loop (pinned by
        # tests/test_bucketed_decode.py).
        crop = lambda c, S: jax.tree.map(lambda a: a[:, :, :S], c)
        sizes = buckets + [mtp]
        carry = list(init)
        carry[9] = crop(carry[9], sizes[0])
        carry[10] = crop(carry[10], sizes[0])
        for i, S in enumerate(sizes):
            if i == len(sizes) - 1:
                cond_i = cond
            else:
                # The token forwarded at ``step`` writes cache row
                # n0 + step, which must stay inside this bucket.
                def cond_i(c, S=S):
                    return jnp.logical_and(cond(c), (n0 + c[0]) < S)

            carry = list(jax.lax.while_loop(cond_i, body, tuple(carry)))
            if i < len(sizes) - 1:
                pad = lambda a, S_next=sizes[i + 1]: jnp.concatenate(
                    [
                        a,
                        jnp.zeros(
                            a.shape[:2]
                            + (S_next - a.shape[2],)
                            + a.shape[3:],
                            a.dtype,
                        ),
                    ],
                    axis=2,
                )
                carry[9] = jax.tree.map(pad, carry[9])
                carry[10] = jax.tree.map(pad, carry[10])
        (step, tokens, n, _, _, _, slp, _, _, _, _, _) = carry
        return tokens, n, slp

    def _window_front(self, params, audio, langs, *, detect: bool):
        """Shared device-graph front of every fused window program (plain
        AND speculative): mel -> encoder -> cross-KV -> optional in-graph
        language detection -> [sot, lang, task] prefix.  Returns
        (feats, xk, xv, prefix, resolved langs, lang_probs)."""
        from ..frontend.mel import log_mel_spectrogram

        cfg, st = self.cfg, self.st
        B = audio.shape[0]
        n_frames = 2 * cfg.max_source_positions

        mel = log_mel_spectrogram(
            audio, n_mels=cfg.num_mel_bins, n_frames=n_frames,
            center=self.mel_center,
        )
        feats = encode(params, cfg, mel)
        xk, xv = cross_kv(params, cfg, feats)

        if detect:
            sot = jnp.full((B, 1), st.sot, jnp.int32)
            logits1, _, _ = decoder_prefill(params, cfg, sot, xk, xv)
            lang_probs = jax.nn.softmax(logits1[:, 0, self._lang_ids], axis=-1)
            detected = self._lang_ids[jnp.argmax(lang_probs, axis=-1)]
            langs = jnp.where(langs < 0, detected, langs).astype(jnp.int32)
        else:
            lang_probs = jnp.zeros((B, 1), jnp.float32)

        prefix = jnp.stack(
            [
                jnp.full((B,), st.sot, jnp.int32),
                langs.astype(jnp.int32),
                jnp.full((B,), st.task, jnp.int32),
            ],
            axis=1,
        )
        return feats, xk, xv, prefix, langs, lang_probs

    def _ladder_impl(self, params, audio, langs, seed, active, *, detect: bool):
        """Fused whole-window transcription: ONE device program.

        audio: [B, S] padded PCM; langs: [B] int32 language tokens (-1 =
        detect in-graph, only with ``detect=True``); seed: scalar uint32;
        active: [B] bool — False rows are batch padding (the scheduler pads
        partial rounds to a power-of-two bucket): they are born finished in
        every token loop, so a pad row costs zero decode steps instead of
        duplicating a real stream's full decode.

        Covers the reference's decode_with_fallback (model.rs:164-191)
        including the no-speech early exit (model.rs:308-315) and lazy
        language detection (model.rs:171-173), but with zero host<->device
        round-trips.  The temperature ladder is ADAPTIVE (B is static at
        trace time, so this is a compile-time choice):

          - ``B * n_rungs <= _SPECULATIVE_ROWS_MAX``: SPECULATIVE — all
            rungs decode concurrently as extra batch rows of ONE token
            loop (per-step weight streaming is shared; measured on v5e,
            rows are near-free up to ~8), then the first rung passing the
            reference's avg_logprob gate is selected per stream.  Worst
            case (every rung tried) costs ~1 loop instead of ~6.
          - larger batches: SEQUENTIAL — an on-device ``lax.while_loop``
            over rungs that stops as soon as every stream has settled
            (row counts beyond ~8 scale linearly in the per-step HBM
            traffic, so speculation would slow the common rung-0-accept
            case).

        Both are outcome-equivalent to the reference's
        try-t=0-then-escalate ladder (the accepted rung and its gate are
        identical; t>0 rungs draw from a different PRNG stream of the same
        law, pinned by the chi-square test).
        Returns (tokens [B,Tmax], n [B], avg_logprob [B], at_rung [B],
        no_speech_prob [B], langs [B], lang_probs [B, n_langs] or zeros).
        """
        cfg, st = self.cfg, self.st
        B = audio.shape[0]
        feats, xk, xv, prefix, langs, lang_probs = self._window_front(
            params, audio, langs, detect=detect
        )
        logits, cache_k, cache_v = decoder_prefill(params, cfg, prefix, xk, xv)
        if self.quantize_cross_kv:  # loop-side only; prefill/detect are bf16
            xk, xv = self._quantize_xkv(xk, xv)
        if self.quantize_self_kv:
            cache_k = quantize_self_kv_cache(cache_k)
            cache_v = quantize_self_kv_cache(cache_v)
        probe = jax.nn.softmax(logits[:, 0, :], axis=-1)
        nsp = probe[:, st.no_speech]
        next_logits = logits[:, -1, :]

        Tmax = cfg.max_target_positions
        tokens_init = jnp.zeros((B, Tmax), jnp.int32).at[:, :3].set(prefix)
        R = len(TEMPERATURES)
        key0 = jax.random.PRNGKey(seed)
        # No-speech-gated streams and pad rows decode nothing (reference
        # early exit model.rs:308-315; pads have no consumer at all).
        gated0 = (nsp > NO_SPEECH_THRESHOLD) | ~active

        if B * R <= self._SPECULATIVE_ROWS_MAX:
            # Speculative ladder: rung r of stream b is batch row r*B + b.
            # Self-attn caches and token state are per-row (each rung
            # decodes its own sequence); cross-K/V stays per-stream and is
            # shared by attention_grouped inside decoder_step (n_rungs) so
            # that per-step traffic does not scale with R.
            temps_row = jnp.repeat(jnp.asarray(TEMPERATURES, jnp.float32), B)
            # tree_map: an int8 self-KV cache is a dict of rank-4 leaves
            # ("q" [L,B,T,D], "s" [L,B,T,1]) — the same tile spec fits both.
            tile_r = lambda c: jax.tree.map(
                lambda x: jnp.tile(x, (1, R, 1, 1)), c
            )
            toks, n, slp = self._token_loop(
                params,
                xk,
                xv,
                tile_r(cache_k),
                tile_r(cache_v),
                jnp.tile(next_logits, (R, 1)),
                jnp.tile(tokens_init, (R, 1)),
                jnp.int32(3),
                jnp.tile(prefix[:, -1], R),
                jnp.tile(prefix[:, -2], R),
                temps_row,
                key0,
                n_rungs=R,
                # No-speech early exit (reference model.rs:308-315): gated
                # streams' and pad rows' rows are born finished, so a silent
                # window costs zero decode steps instead of a full
                # multi-rung loop (the host discards gated rows' ladder
                # output via the nsp check).
                fin_init=jnp.tile(gated0, R),
            )
            avg = slp / jnp.maximum(n, 1).astype(jnp.float32)
            # compression_ratio is intentionally never computed (NaN in the
            # reference, model.rs:313,387): fallback is logprob-only, and a
            # NaN avg (grammar deadlock) compares False => accepted — both
            # faithful to the reference's f64 comparisons.
            accept = ~(avg < LOGPROB_THRESHOLD)  # [R*B]
            acc = accept.reshape(R, B)
            any_acc = acc.any(axis=0)
            first_r = jnp.argmax(acc, axis=0).astype(jnp.int32)
            # No rung accepted -> brung -1 -> host returns None and the
            # long-form layer discards the slice, exactly the reference's
            # `Ok(None)` + drain (model.rs:90-93, 188-190).
            sel = first_r * B + jnp.arange(B)
            brung = jnp.where(any_acc, first_r, -1)
            btoks = jnp.where(any_acc[:, None], toks[sel], tokens_init)
            bn = jnp.where(any_acc, n[sel], 3)
            bavg = jnp.where(any_acc, avg[sel], 0.0)
            return self._pack_ladder(btoks, bn, bavg, brung, nsp, langs, lang_probs)

        # Sequential ladder: try rungs in order, on-device, stopping as
        # soon as every stream has settled.  Streams whose probe fired are
        # settled with the prefix-only result (n=3, avg=0, at_rung=-1),
        # exactly the host-side early exit.
        btoks, bn, bavg, brung = self._sequential_rungs(
            params, xk, xv, cache_k, cache_v, next_logits, tokens_init,
            prefix, key0, gated0,
        )
        return self._pack_ladder(btoks, bn, bavg, brung, nsp, langs, lang_probs)

    def _sequential_rungs(
        self, params, xk, xv, cache_k, cache_v, next_logits, tokens_init,
        prefix, key0, settled0, *, start_rung: int = 0,
    ):
        """On-device sequential temperature ladder: try rungs in order,
        stopping as soon as every stream has settled.  Rung r draws from
        fold_in(key0, r) and reports TEMPERATURES[r]; ``start_rung`` > 0
        skips rungs a caller already ran (the speculative engine's t=0
        pass).  Returns (btoks, bn, bavg, brung); unsettled-throughout
        rows carry brung = -1.
        """
        B = tokens_init.shape[0]
        R = len(TEMPERATURES)
        temps = jnp.asarray(TEMPERATURES, jnp.float32)

        def cond(c):
            r, settled, *_ = c
            return jnp.logical_and(r < R, jnp.any(~settled))

        def body(c):
            r, settled, btoks, bn, bavg, brung = c
            toks, n, slp = self._token_loop(
                params, xk, xv, cache_k, cache_v, next_logits, tokens_init,
                jnp.int32(3), prefix[:, -1], prefix[:, -2],
                jnp.broadcast_to(temps[r], (B,)), jax.random.fold_in(key0, r),
                # Settled rows (no-speech gate or an earlier accepted rung)
                # are born finished: their per-row state is frozen and the
                # step loop can end as soon as the UNSETTLED rows are done,
                # instead of re-decoding accepted streams to max length.
                # Outcome-identical — settled rows' results are masked out
                # by ``take`` below.
                fin_init=settled,
            )
            avg = slp / jnp.maximum(n, 1).astype(jnp.float32)
            # NaN avg accepted — see the compression_ratio note above.
            accept = ~(avg < LOGPROB_THRESHOLD)
            take = (~settled) & accept
            btoks = jnp.where(take[:, None], toks, btoks)
            bn = jnp.where(take, n, bn)
            bavg = jnp.where(take, avg, bavg)
            brung = jnp.where(take, r, brung)
            return (r + 1, settled | accept, btoks, bn, bavg, brung)

        init = (
            jnp.int32(start_rung),
            settled0,
            tokens_init,
            jnp.full((B,), 3, jnp.int32),
            jnp.zeros((B,), jnp.float32),
            jnp.full((B,), -1, jnp.int32),
        )
        _, _, btoks, bn, bavg, brung = jax.lax.while_loop(cond, body, init)
        return btoks, bn, bavg, brung

    @staticmethod
    def _pack_ladder(btoks, bn, bavg, brung, nsp, langs, lang_probs):
        """Pack every ladder output into ONE f32 array [B, Tmax+5+L].

        The driver behind this shape: each device->host fetch is a separate
        round trip (expensive through a remote-attached TPU), so the window
        program returns a single array instead of seven.  Token ids (< 2^24)
        and the small ints are exact in f32.
        """
        return jnp.concatenate(
            [
                btoks.astype(jnp.float32),
                bn.astype(jnp.float32)[:, None],
                bavg[:, None],
                brung.astype(jnp.float32)[:, None],
                nsp[:, None],
                langs.astype(jnp.float32)[:, None],
                lang_probs.astype(jnp.float32),
            ],
            axis=1,
        )

    # ------------------------------------------------------------------
    # Host-side orchestration
    # ------------------------------------------------------------------

    def _window_inputs(self, audio, langs, n_active):
        """Shared host preamble of every ``transcribe_window`` variant
        (base ladder AND speculative): broadcast per-stream language
        tokens, derive the detect flag (with the lang-ids guard), and mark
        batch-padding rows inactive.  One copy so the two engines cannot
        silently diverge."""
        langs_arr = np.broadcast_to(
            np.asarray(langs, np.int32).reshape(-1), (audio.shape[0],)
        )
        detect = bool((langs_arr < 0).any())
        if detect and self._lang_ids is None:
            raise ValueError("language detection requires language_token_ids")
        active = np.ones(audio.shape[0], bool)
        if n_active is not None:
            active[n_active:] = False
        return langs_arr, detect, active

    @decode_instrument(
        fields={
            "B": lambda a: int(a["audio"].shape[0]),
            "samples": lambda a: int(a["audio"].shape[1]),
            "seed": lambda a: a["seed"],
        }
    )
    def transcribe_window(
        self,
        audio: jax.Array,
        langs,
        seed: int,
        n_active: Optional[int] = None,
    ) -> Tuple[List[Optional[DecodingResult]], dict]:
        """Fused single-dispatch window transcription.

        audio: [B, S] padded PCM window(s); langs: per-stream language token
        ids, with -1 requesting in-graph detection; seed: ladder base seed.
        The SEQUENTIAL ladder arm derives rung i's stream as
        fold_in(seed, i) (replacing the host path's seed+i); the
        SPECULATIVE arm (small B*R) instead mixes per-row/per-step inside
        the sampling kernel from PRNGKey(seed) — a different PRNG stream of
        the same sampling law, NOT bit-identical draws across the two arms.
        n_active: rows [n_active, B) are batch padding and decode nothing
        (None = all rows are real streams).

        Returns (results, info): results[b] is the accepted DecodingResult —
        the prefix-only result when the no-speech probe fired (reference
        model.rs:308-315), or None when every temperature failed the
        logprob gate (model.rs:90-93).  info carries ``langs`` (resolved
        language token per stream) and ``lang_probs`` when detection ran.
        """
        return self.transcribe_window_fetch(
            self.transcribe_window_async(audio, langs, seed, n_active)
        )

    # The plain ladder is ONE device program with no host round-trips in
    # the middle, so its dispatch and fetch split cleanly — the batching
    # scheduler overlaps round N's fetch with round N+1's device compute
    # (runtime/batching.py round pipelining).  SpeculativeEngine's window
    # has a host gate between the speculative arm and the fallback
    # dispatch, so it opts out (supports_async_window = False there).
    supports_async_window = True

    def transcribe_window_async(
        self,
        audio: jax.Array,
        langs,
        seed: int,
        n_active: Optional[int] = None,
    ):
        """Dispatch the fused window program WITHOUT blocking on results.

        JAX async dispatch queues the program on the device and returns
        immediately; pass the returned handle to
        :meth:`transcribe_window_fetch` to block on the device->host copy
        and unpack.  Multiple dispatched windows may be in flight at once
        (they execute in dispatch order).
        """
        langs_arr, detect, active = self._window_inputs(audio, langs, n_active)
        fn = self._ladder_detect if detect else self._ladder
        if (
            self._dp_mesh is not None
            and audio.shape[0] % self._dp_mesh.shape["dp"] == 0
        ):
            # dp-mesh kernel carry: shard_map runs the kernel-impl program
            # per device on its local rows (the scheduler pads round
            # batches to a dp multiple, so serving always lands here).
            fn = self._get_ladder_sm(detect)
        dev = fn(
            self.params, audio, jnp.asarray(langs_arr), jnp.uint32(seed),
            jnp.asarray(active),
        )
        return dev, active, detect

    def transcribe_window_fetch(
        self, pending
    ) -> Tuple[List[Optional[DecodingResult]], dict]:
        """Block on a :meth:`transcribe_window_async` handle and unpack."""
        dev, active, detect = pending
        packed = np.asarray(dev)  # ONE device->host fetch for the window
        return self._unpack_ladder(packed, active, detect)

    def _unpack_ladder(
        self,
        packed: np.ndarray,
        active: np.ndarray,
        detect: bool,
        *,
        trailing_cols: int = 0,
        reject_rung0_below_gate: bool = False,
    ) -> Tuple[List[Optional[DecodingResult]], dict]:
        """Host-side unpack of ``_pack_ladder``'s layout — the ONE place
        that knows it (the speculative engine unpacks through here too).

        ``trailing_cols``: extra telemetry columns appended after the
        lang_probs block (the speculative engine rides its round counts on
        the same fetch).  ``reject_rung0_below_gate``: also reject rung-0
        rows failing the logprob gate — the speculative host applies the
        gate AFTER its fallback dispatch, whereas the plain ladder already
        gated in-graph (rung -1).
        """
        Tmax = self.cfg.max_target_positions
        btoks = packed[:, :Tmax].astype(np.int32)
        bn = packed[:, Tmax].astype(np.int32)
        bavg = packed[:, Tmax + 1]
        brung = packed[:, Tmax + 2].astype(np.int32)
        nsp = packed[:, Tmax + 3]
        langs_out = packed[:, Tmax + 4].astype(np.int32)
        lang_probs = (
            packed[:, Tmax + 5 : -trailing_cols]
            if trailing_cols
            else packed[:, Tmax + 5 :]
        )
        st = self.st
        out: List[Optional[DecodingResult]] = []
        for b in range(btoks.shape[0]):
            if not active[b]:
                # Batch-pad row: decoded nothing (born-finished); emit no
                # result and, importantly, no telemetry — a pad row's
                # rung-0/avg=0 carry would read as a perfect real decode.
                out.append(None)
                continue
            if nsp[b] > NO_SPEECH_THRESHOLD:
                out.append(
                    DecodingResult(
                        tokens=btoks[b, :3].tolist(),
                        avg_logprob=0.0,
                        no_speech_prob=float(nsp[b]),
                    )
                )
                continue
            if brung[b] < 0 or (
                reject_rung0_below_gate
                and brung[b] == 0
                and bavg[b] < LOGPROB_THRESHOLD
            ):
                out.append(None)  # failed at all temperatures
                continue
            toks = btoks[b, : bn[b]].tolist()
            # Trailing timestamp cleanup (reference: model.rs:375-381).
            while len(toks) >= 2 and toks[-2] > st.no_timestamps:
                del toks[-2]
            decode_telemetry(
                float(TEMPERATURES[brung[b]]), float(bavg[b]), float(nsp[b])
            )
            out.append(
                DecodingResult(
                    tokens=toks,
                    avg_logprob=float(bavg[b]),
                    no_speech_prob=float(nsp[b]),
                )
            )
        info = {
            "langs": langs_out,
            "lang_probs": lang_probs if detect else None,
        }
        return out, info

    def detect_language(self, feats: jax.Array) -> np.ndarray:
        """Return [B, n_languages] probabilities (Language-enum order)."""
        if self._lang_ids is None:
            raise ValueError("language detection requires language_token_ids")
        return np.asarray(self._detect(self.params, feats))

    def decode(
        self,
        feats: jax.Array,
        lang_token: Optional[int],
        temperature: float,
        seed: int,
        _prefill_state=None,
    ) -> DecodingResult:
        """Single decode at one temperature (reference: decode, model.rs:279-389)."""
        state = _prefill_state or self.prefill(feats, lang_token)
        return self.run_loop(state, temperature, seed)[0]

    def _prefix_array(self, B: int, lang_token) -> np.ndarray:
        """lang_token: None (no language slot), an int, or a per-stream
        sequence of ints (batched mode: heterogeneous languages)."""
        if lang_token is None:
            return np.tile(
                np.asarray([self.st.sot, self.st.task], np.int32)[None], (B, 1)
            )
        langs = np.broadcast_to(np.asarray(lang_token, np.int32).reshape(-1), (B,))
        return np.stack(
            [
                np.full(B, self.st.sot, np.int32),
                langs,
                np.full(B, self.st.task, np.int32),
            ],
            axis=1,
        )

    def prefill(self, feats: jax.Array, lang_token):
        B = feats.shape[0]
        prefix_arr = self._prefix_array(B, lang_token)
        xk, xv, ck, cv, nl, nsp = self._prefill(
            self.params, feats, jnp.asarray(prefix_arr)
        )
        return dict(
            prefix=prefix_arr,
            B=B,
            xk=xk,
            xv=xv,
            cache_k=ck,
            cache_v=cv,
            next_logits=nl,
            no_speech_prob=np.asarray(nsp),
        )

    def prefill_window(self, audio: jax.Array, lang_token):
        """Fused raw-PCM prefill (one dispatch); audio [B, samples] padded
        to (2*max_source_positions + 3) * hop samples or more."""
        B = audio.shape[0]
        prefix_arr = self._prefix_array(B, lang_token)
        xk, xv, ck, cv, nl, nsp = self._prefill_full(
            self.params, audio, jnp.asarray(prefix_arr)
        )
        return dict(
            prefix=prefix_arr,
            B=B,
            xk=xk,
            xv=xv,
            cache_k=ck,
            cache_v=cv,
            next_logits=nl,
            no_speech_prob=np.asarray(nsp),
        )

    def run_loop(self, state, temperature: float, seed: int) -> List[DecodingResult]:
        st = self.st
        prefix = np.asarray(state["prefix"])  # [B, P]
        B = state["B"]
        P = prefix.shape[1]
        Tmax = self.cfg.max_target_positions
        tokens_init = np.zeros((B, Tmax), np.int32)
        tokens_init[:, :P] = prefix
        packed = np.asarray(
            self._loop(
                self.params,
                state["xk"],
                state["xv"],
                state["cache_k"],
                state["cache_v"],
                state["next_logits"],
                jnp.asarray(tokens_init),
                jnp.int32(P),
                jnp.asarray(prefix[:, -1]),
                jnp.asarray(prefix[:, -2]),
                jnp.float32(temperature),
                jnp.uint32(seed),
            )
        )
        tokens = packed[:, :Tmax].astype(np.int32)
        n = packed[:, Tmax].astype(np.int32)
        slp = packed[:, Tmax + 1]
        out = []
        for b in range(B):
            toks = tokens[b, : n[b]].tolist()
            avg_logprob = float(slp[b]) / max(len(toks), 1)
            # Trailing timestamp cleanup (reference: model.rs:375-381).
            while len(toks) >= 2 and toks[-2] > st.no_timestamps:
                del toks[-2]
            out.append(
                DecodingResult(
                    tokens=toks,
                    avg_logprob=avg_logprob,
                    no_speech_prob=float(state["no_speech_prob"][b]),
                )
            )
        return out

    @decode_instrument  # reference #[instrument], model.rs:163
    def decode_with_fallback(
        self,
        feats: jax.Array,
        lang_token: Optional[int],
        seed: int,
    ) -> Optional[DecodingResult]:
        """Temperature-fallback ladder (reference: model.rs:164-191), B=1.

        Note the reference never computes compression_ratio (NaN), so
        fallback triggers on avg_logprob alone; replicated faithfully.

        Deviation (bug-fix) from the reference: when the no-speech probe
        exceeds the threshold the reference returns prefix-only tokens
        (model.rs:308-315) which its own segmenter cannot consume, leaving
        the audio buffer undrained forever.  We surface the same
        DecodingResult; the long-form layer treats it as "discard slice".
        """
        state = self.prefill(feats, lang_token)
        return self._fallback_from_state(state, seed)

    def decode_with_fallback_windowed(
        self, audio: jax.Array, lang_token, seed: int
    ) -> Optional[DecodingResult]:
        """Fused-dispatch variant: raw padded PCM window in, ladder out."""
        state = self.prefill_window(audio, lang_token)
        return self._fallback_from_state(state, seed)

    def _fallback_from_state(self, state, seed: int) -> Optional[DecodingResult]:
        nsp = float(state["no_speech_prob"][0])
        if nsp > NO_SPEECH_THRESHOLD:
            return DecodingResult(
                tokens=np.asarray(state["prefix"])[0].tolist(),
                avg_logprob=0.0,
                no_speech_prob=nsp,
            )
        for i, t in enumerate(TEMPERATURES):
            dr = self.run_loop(state, t, seed + i)[0]
            needs_fallback = (
                dr.compression_ratio > 2.4  # NaN > x is False: dead branch kept
                or dr.avg_logprob < LOGPROB_THRESHOLD
            )
            if not needs_fallback or dr.no_speech_prob > NO_SPEECH_THRESHOLD:
                decode_telemetry(t, dr.avg_logprob, dr.no_speech_prob)
                return dr
        logger.debug("failed to decode at all temperatures, returning None")
        return None
