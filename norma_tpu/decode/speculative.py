"""Speculative decoding: a distil draft decoder proposes, the target verifies.

TPU-native serving lever with no reference equivalent (the reference decodes
one token per full target forward, ``/root/reference/src/models/whisper/
model.rs:317-371``).  The distil-whisper checkpoints share the target's
encoder (distil-large-v3's encoder is a frozen copy of large-v3's), so one
encoder pass feeds BOTH decoders; the 2-layer draft decoder proposes K
greedy tokens sequentially, then the 32-layer target scores all K proposals
plus one bonus position in ONE chunked forward (:func:`~norma_tpu.model.
whisper.decoder_chunk`) — per-round target weight and cross-K/V HBM
streaming is paid once for up to K+1 committed tokens instead of per token.

EXACT greedy equivalence: every committed token is the TARGET's own
grammar-masked greedy choice, by induction — position j of a verify chunk
is accepted only if the target's choice (computed with the same stateful
timestamp-grammar state the target-only loop would carry, advanced along
the accepted prefix) equals the draft's proposal; the first mismatch
commits the target's choice instead (the "bonus"/correction token).  The
avg_logprob gate consumes the target's own masked probabilities, so the
temperature-fallback semantics (reference model.rs:164-191) are unchanged:
the t=0 rung is speculative, t>0 rungs fall back to the plain ladder.

Cache-staleness invariant (why rejected proposals never corrupt state):
each round writes chunk K/V at positions [n-1, n+K) and commits n' >= n+1,
so stale rows left by rejected tokens live at positions >= n'-1 and are
overwritten by the next round's chunk write (which starts exactly at
n'-1) before any attention read — queries mask keys beyond their own
position in between.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LOGPROB_THRESHOLD, NO_SPEECH_THRESHOLD
from ..tracing import instrument as decode_instrument
from ..model.config import WhisperConfig
from ..model.whisper import (
    cross_kv,
    decoder_chunk,
    decoder_prefill,
    quantize_cross_kv,
)
from .engine import DecodeEngine, DecodingResult
from .masks import SpecialTokens


class SpeculativeEngine(DecodeEngine):
    """DecodeEngine whose greedy (t=0) rung runs draft/verify speculation.

    ``draft_params``/``draft_cfg`` describe a shallow Whisper decoder with
    the SAME d_model, vocab and tokenizer as the target (the distil-*
    checkpoints); its encoder weights are unused — the target's encoder
    output feeds the draft's own cross-attention projections.

    ``spec_k`` proposals are drafted per round.  Worst case (every proposal
    rejected) still commits one target-chosen token per round, at the cost
    of K draft steps + one (K+1)-wide target chunk per committed token;
    best case commits K+1 tokens per target-weight-stream.  Temperatures
    above 0 (rare: only after the t=0 rung fails the reference's
    avg_logprob gate) fall back to the inherited non-speculative ladder
    over the remaining rungs.

    ``spec_k="auto"`` self-tunes K between windows from the engine's own
    acceptance telemetry (``last_tokens_per_round``): high acceptance
    steps K up the ``_K_CHOICES`` ladder (more tokens per target weight
    stream), low acceptance steps it down (less wasted drafting).  Each
    distinct K compiles its window program once (cached thereafter);
    committed tokens are identical at every K, so adaptation is purely a
    performance knob.
    """

    #: The K ladder ``spec_k="auto"`` walks.  Bounded above because the
    #: verify chunk width (K+1) and per-round draft cost grow linearly
    #: while acceptance saturates; bounded below because K=1 degenerates
    #: to one committed token per round even at full acceptance.
    _K_CHOICES = (2, 4, 8, 12)
    #: EMA-smoothed acceptance ratio (tokens/round over K+1) thresholds:
    #: above _K_UP, escalate; below _K_DOWN, de-escalate.
    _K_UP = 0.75
    _K_DOWN = 0.35
    _K_EMA = 0.5

    # The speculative window has a HOST gate between the speculative arm
    # and its fallback dispatch, so it cannot split into the plain
    # engine's async dispatch/fetch pair; the batching scheduler runs
    # speculative rounds synchronously (no round pipelining).
    supports_async_window = False

    def __init__(
        self,
        params,
        cfg: WhisperConfig,
        draft_params,
        draft_cfg: WhisperConfig,
        st: SpecialTokens,
        language_token_ids: Optional[Sequence[int]] = None,
        mel_center: bool = False,
        fused_sampler: bool = True,
        quantize_cross_kv: bool = False,
        spec_k=4,
    ):
        if draft_cfg.d_model != cfg.d_model:
            raise ValueError(
                "draft d_model must match the target's (the draft reuses "
                f"the target encoder output): {draft_cfg.d_model} != {cfg.d_model}"
            )
        if draft_cfg.vocab_size != cfg.vocab_size:
            raise ValueError("draft vocab must match the target's")
        if draft_cfg.max_target_positions != cfg.max_target_positions:
            raise ValueError(
                "draft max_target_positions must match the target's (both "
                "decoders share the round's position bookkeeping)"
            )
        if quantize_cross_kv and cfg.cross_kv_impl == "kernel":
            raise ValueError(
                'cross_kv_impl="kernel" is not supported with speculative '
                "decoding: the verify pass scores multi-token chunks and "
                "the cross-decode kernel is single-query — use the einsum "
                "or chunked impl (or drop quantize_cross_kv)"
            )
        super().__init__(
            params, cfg, st,
            language_token_ids=language_token_ids,
            mel_center=mel_center,
            fused_sampler=fused_sampler,
            quantize_cross_kv=quantize_cross_kv,
        )
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        if spec_k == "auto":
            self.auto_k = True
            self.spec_k = 4  # starting rung of _K_CHOICES
        else:
            self.auto_k = False
            if spec_k < 1:
                raise ValueError("spec_k must be >= 1")
            self.spec_k = int(spec_k)
        self._accept_ema: Optional[float] = None
        self.last_spec_k: Optional[int] = None
        # Telemetry from the last transcribe_window call (host-visible at
        # no extra fetch): rounds of draft/verify, and committed tokens
        # per round (1.0 = nothing accepted .. spec_k+1 = all accepted).
        self.last_spec_rounds: Optional[int] = None
        self.last_tokens_per_round: Optional[float] = None
        # Fused speculative window programs (t=0 rung only), one per
        # (K, detect) actually used — spec_k="auto" walks several.  The
        # t>0 fallback reuses the inherited ladder over feats.
        self._spec_programs = {}
        self._fallback_rungs = jax.jit(self._fallback_rungs_impl)
        # Placement hook remembered from warmup_fallback(put=...): the live
        # fallback dispatch re-applies it to feats so warmup and live use
        # the SAME input sharding by construction (jit caches key on input
        # sharding; GSPMD's choice for the window program's feats output is
        # not pinned, so matching it by assumption would be fragile).
        self._fallback_put = None

    def _spec_program(self, detect: bool):
        key = (self.spec_k, detect)
        fn = self._spec_programs.get(key)
        if fn is None:
            fn = jax.jit(
                partial(self._spec_window_impl, detect=detect, k=self.spec_k)
            )
            self._spec_programs[key] = fn
        return fn

    def _adapt_spec_k(self) -> None:
        """Walk ``spec_k`` along ``_K_CHOICES`` from the acceptance ratio.

        Called after each window when ``spec_k="auto"``.  The ratio
        tokens_per_round / (K+1) is 1.0 when every round commits the full
        chunk and 1/(K+1) when no proposal is ever accepted; an EMA
        smooths single-window noise (silence, short windows).
        """
        tpr = self.last_tokens_per_round
        if tpr is None:
            return
        ratio = tpr / (self.spec_k + 1)
        ema = self._accept_ema
        ema = ratio if ema is None else self._K_EMA * ema + (1 - self._K_EMA) * ratio
        self._accept_ema = ema
        idx = self._K_CHOICES.index(self.spec_k) if self.spec_k in self._K_CHOICES else None
        if idx is None:
            return
        if ema >= self._K_UP and idx + 1 < len(self._K_CHOICES):
            self.spec_k = self._K_CHOICES[idx + 1]
            self._accept_ema = None  # ratio scale changed with K
        elif ema <= self._K_DOWN and idx > 0:
            self.spec_k = self._K_CHOICES[idx - 1]
            self._accept_ema = None

    # ------------------------------------------------------------------
    # The speculative greedy loop
    # ------------------------------------------------------------------

    def _spec_loop(
        self,
        params,
        draft_params,
        xk,
        xv,
        dxk,
        dxv,
        cache_k,  # target caches: positions [0, P-1) filled (prefix MINUS
        cache_v,  # the pending token)
        dcache_k,
        dcache_v,
        tokens_init,  # [B, Tmax] with the FULL prefix written at [0, P)
        n0,  # scalar int32 == P (pending token at P-1 not yet fed)
        prev1,  # [B] int32 == tokens_init[:, P-1] (the pending token)
        prev2,  # [B] int32 == tokens_init[:, P-2]
        fin_init,  # [B] bool
        k: int,
    ):
        """Greedy draft/verify loop.  Token-for-token equal to
        ``_token_loop(..., temp=0)`` over the target alone (pinned by
        tests/test_speculative.py oracle tests).

        State invariant at the top of each round, per row: tokens
        [0, n) are committed; BOTH caches hold positions [0, n-1); the
        committed token at n-1 ("pending") has not been fed to either
        decoder yet.  Grammar state (p1, p2, last_ts, step) is the state
        for predicting position n: p1 = tokens[n-1], p2 = tokens[n-2],
        step = n - n0.
        """
        cfg, st = self.cfg, self.st
        K = k
        B, Tmax = tokens_init.shape
        mtp = cfg.max_target_positions
        ids_row = jnp.arange(Tmax)[None]  # [1, Tmax]
        jseq = jnp.arange(K + 1)

        use_kernel = self.fused_sampler and self._platform == "tpu"
        if use_kernel:
            from ..ops.sample_step import sample_step_pallas as _sample
        else:
            from ..ops.sample_step import sample_step_jnp as _sample
        zero_temp = jnp.zeros((B,), jnp.float32)
        zero_temp_v = jnp.zeros(((K + 1) * B,), jnp.float32)
        # t=0 everywhere: the PRNG argument is never consumed by the
        # greedy path (the kernel takes a seed pair, the jnp twin a key).
        seed2 = jnp.zeros((2,), jnp.uint32)
        key = jax.random.PRNGKey(0)
        rng_arg = seed2 if use_kernel else key

        def grammar(ll, p1, p2, lts, step, temp):
            # step may be per-row here (rows of a verify chunk sit at
            # different depths); the kernel/jnp twin accept both.
            # greedy_only: this loop is STATICALLY t=0 (zero_temp above),
            # so the sampler's PRNG/Gumbel pipeline is compiled out.
            return _sample(
                ll, self._m_suppress, self._m_non_ts, self._m_ts,
                self._m_first, p1, p2, lts, step, temp, rng_arg,
                eot=st.eot, no_timestamps=st.no_timestamps,
                greedy_only=True,
            )

        def cond(c):
            (it, lr, tokens, n, p1, p2, lts, slp, fin, ck, cv, dk, dv) = c
            return jnp.logical_and(jnp.any(~fin), it < mtp)

        def body(c):
            (it, lr, tokens, n, p1, p2, lts, slp, fin, ck, cv, dk, dv) = c
            # Per-row LIVE round count: rows finished before this round do
            # not pay (or get credited for) it — the denominator of the
            # acceptance telemetry must be per-row, or one slow stream in a
            # batch dilutes every other stream's tokens-per-round ratio.
            lr = lr + (~fin).astype(jnp.int32)
            step0 = n - n0  # [B] grammar step for position n

            # -- draft phase: K+1 sequential 1-token steps -------------
            # Feeds [pending, d_0 .. d_{K-1}] at positions n-1 .. n+K-1,
            # proposing d_j from the j-th step's logits; emits the grammar
            # state s_j used at each prediction so verify can reuse it.
            def draft_body(carry, j):
                x_in, dp1, dp2, dlts, dk, dv = carry
                logits, dk, dv = decoder_chunk(
                    draft_params, self.draft_cfg, x_in[:, None],
                    n - 1 + j, dk, dv, dxk, dxv,
                )
                state_out = (dp1, dp2, dlts, step0 + j)
                d_j, _, _ = grammar(
                    logits[:, 0, :], dp1, dp2, dlts, step0 + j, zero_temp
                )
                ndp2 = dp1
                ndp1 = d_j
                ndlts = jnp.where(d_j > st.no_timestamps, d_j, dlts)
                return (d_j, ndp1, ndp2, ndlts, dk, dv), (x_in, state_out)

            (_, _, _, _, dk, dv), (fed, states) = jax.lax.scan(
                draft_body, (p1, p1, p2, lts, dk, dv), jseq
            )
            # fed[j] is the token fed at step j: [pending, d_0..d_{K-1}];
            # proposals d_j = fed[j+1] for j < K.
            drafts = fed[1:]  # [K, B]
            s_p1, s_p2, s_lts, s_step = states  # each [K+1, B]

            # -- verify phase: one (K+1)-wide target chunk --------------
            chunk = fed.T  # [B, K+1]
            logits, ck, cv = decoder_chunk(
                params, cfg, chunk, n - 1, ck, cv, xk, xv
            )
            # logits[:, j] predicts position n+j; grammar state s_j.
            ll = logits.reshape(B * (K + 1), -1)
            g, prob, _ = grammar(
                ll,
                s_p1.T.reshape(-1),
                s_p2.T.reshape(-1),
                s_lts.T.reshape(-1),
                s_step.T.reshape(-1),
                zero_temp_v,
            )
            g = g.reshape(B, K + 1)  # target's choice at positions n..n+K
            prob = prob.reshape(B, K + 1)

            # -- acceptance: longest matching prefix --------------------
            match = g[:, :K] == drafts.T  # [B, K]
            a = jnp.where(
                match.all(axis=1), K, jnp.argmin(match, axis=1)
            ).astype(jnp.int32)  # [B] in [0, K]
            # Candidate committed tokens: c_j = d_j for j < a, c_a = g_a
            # (g_j == d_j on the accepted prefix, so just g everywhere).
            cand = g  # [B, K+1]

            # Sequential push semantics over j = 0..a (mirrors the
            # non-speculative body): stop after the first EOT; at
            # len >= mtp-1 push the token plus an extra EOT and stop.
            js = jseq[None, :]  # [1, K+1]
            in_range = js <= a[:, None]
            is_eot = cand == st.eot
            # first EOT among the committed window (K+1 = "none").
            first_eot = jnp.min(
                jnp.where(in_range & is_eot, js, K + 1), axis=1
            )
            # first length-limit hit: pushing c_j makes len n+j+1.
            limit_j = ((n[:, None] + js + 1) >= (mtp - 1)) & ~is_eot
            first_lim = jnp.min(
                jnp.where(in_range & limit_j, js, K + 1), axis=1
            )
            stop_j = jnp.minimum(first_eot, first_lim)  # K+1 = no stop
            cc = jnp.minimum(a + 1, stop_j + 1)  # committed count
            hit_lim = first_lim < jnp.minimum(first_eot, a + 1)

            # Write committed tokens at [n, n+cc); extra EOT at n+cc when
            # the length limit fired.
            committed = (js < cc[:, None]) & (~fin)[:, None]
            sel = ids_row - n[:, None]  # token-slot -> chunk index
            write = (sel >= 0) & (sel < K + 1)
            cand_at = jnp.take_along_axis(
                cand, jnp.clip(sel, 0, K), axis=1
            )
            take = write & (sel < cc[:, None]) & (~fin)[:, None]
            tokens = jnp.where(take, cand_at, tokens)
            lim_slot = ids_row == (n + cc)[:, None]
            tokens = jnp.where(
                lim_slot & (hit_lim & ~fin)[:, None], st.eot, tokens
            )

            slp = slp + jnp.sum(
                jnp.where(committed, jnp.log(prob), 0.0), axis=1
            )

            got_eot = first_eot <= a
            new_fin = fin | got_eot | hit_lim
            n_new = jnp.where(fin, n, n + cc + hit_lim.astype(jnp.int32))

            # Grammar state after the commit: advance s_{cc-1} by its
            # committed token (the states beyond the accepted prefix are
            # only reached when the row finishes, where they are unused).
            last_j = jnp.maximum(cc - 1, 0)
            gather = lambda s: jnp.take_along_axis(
                s.T, last_j[:, None], axis=1
            )[:, 0]
            c_last = jnp.take_along_axis(cand, last_j[:, None], axis=1)[:, 0]
            np1 = jnp.where(fin, p1, c_last)
            np2 = jnp.where(fin, p2, gather(s_p1))
            nlts = jnp.where(
                (~fin) & (c_last > st.no_timestamps), c_last, gather(s_lts)
            )
            nlts = jnp.where(fin, lts, nlts)

            return (it + 1, lr, tokens, n_new, np1, np2, nlts, slp, new_fin,
                    ck, cv, dk, dv)

        init = (
            jnp.int32(0),
            jnp.zeros((B,), jnp.int32),
            tokens_init,
            jnp.full((B,), n0, jnp.int32),
            prev1,
            prev2,
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32),
            fin_init,
            cache_k,
            cache_v,
            dcache_k,
            dcache_v,
        )
        # cfg.decode_buckets is deliberately IGNORED here (the t>0
        # fallback rungs inherit it through _token_loop, where it wins):
        # an r5 bucketed chain of this greedy loop — cropped caches with
        # the K+1 slack preserved, max(n)-bounded buckets — was built,
        # parity-verified, and LOST its device A/B decisively (lv3 B=1
        # mtp=448 spec_k=4: 1434.3 ms control, reproduced exactly, vs
        # 1570.8 with the 48-step ladder, +9.5%).  The verify chunk
        # already amortizes each cache read over ~K+1 positions, so the
        # overread saving is small while the per-bucket loop boundaries
        # break the round's single-fusion schedule.  PERF.md "Bucketed
        # decode" keeps the record; the removed chain is in git history.
        (it, lrounds, tokens, n, _, _, _, slp, _, _, _, _, _) = (
            jax.lax.while_loop(cond, body, init)
        )
        return tokens, n, slp, lrounds

    # ------------------------------------------------------------------
    # Fused window programs
    # ------------------------------------------------------------------

    def _spec_window_impl(self, params, draft_params, audio, langs, active,
                          *, detect: bool, k: int):
        """ONE device program: mel -> encoder -> (detect) -> both prefills
        -> no-speech gate -> speculative greedy loop.  Returns the packed
        ladder layout (at_rung 0 everywhere; the host applies the logprob
        gate and runs the t>0 fallback program on failures) plus the
        device-resident encoder features for that fallback.
        """
        cfg, st = self.cfg, self.st
        B = audio.shape[0]
        feats, xk, xv, prefix, langs, lang_probs = self._window_front(
            params, audio, langs, detect=detect
        )
        dxk, dxv = cross_kv(draft_params, self.draft_cfg, feats)
        # Prefill BOTH decoders on the prefix MINUS the pending task token
        # (the speculative loop's invariant: the last committed token is
        # re-fed as the head of the first verify chunk).  The no-speech
        # probe still reads the SOT position, as in the full prefill.
        logits, cache_k, cache_v = decoder_prefill(
            params, cfg, prefix[:, :2], xk, xv
        )
        _, dcache_k, dcache_v = decoder_prefill(
            draft_params, self.draft_cfg, prefix[:, :2], dxk, dxv
        )
        # Over-allocate the loop caches by the chunk width: rows pinned at
        # the length limit (and finished rows, which keep lockstep-feeding
        # their final pending token) issue chunk writes whose start+width
        # would otherwise exceed Tmax and CLAMP — silently shifting the
        # whole chunk's K/V onto earlier live rows (see decoder_chunk).
        slack = k + 1
        pad_t = lambda c: jnp.pad(c, ((0, 0), (0, 0), (0, slack), (0, 0)))
        cache_k, cache_v = pad_t(cache_k), pad_t(cache_v)
        dcache_k, dcache_v = pad_t(dcache_k), pad_t(dcache_v)
        if self.quantize_cross_kv:  # loop-side only
            xk, xv = quantize_cross_kv(xk, xv)
        probe = jax.nn.softmax(logits[:, 0, :], axis=-1)
        nsp = probe[:, st.no_speech]

        Tmax = cfg.max_target_positions
        tokens_init = jnp.zeros((B, Tmax), jnp.int32).at[:, :3].set(prefix)
        gated0 = (nsp > NO_SPEECH_THRESHOLD) | ~active

        toks, n, slp, lrounds = self._spec_loop(
            params, draft_params, xk, xv, dxk, dxv,
            cache_k, cache_v, dcache_k, dcache_v,
            tokens_init, jnp.int32(3), prefix[:, -1], prefix[:, -2],
            fin_init=gated0, k=k,
        )
        avg = slp / jnp.maximum(n, 1).astype(jnp.float32)
        rung0 = jnp.zeros((B,), jnp.int32)
        packed = self._pack_ladder(toks, n, avg, rung0, nsp, langs, lang_probs)
        # Speculation telemetry rides the same single fetch: each row's
        # LIVE round count as one extra trailing column (per-row, so one
        # slow stream cannot dilute the batch's acceptance ratio).
        packed = jnp.concatenate(
            [packed, lrounds[:, None].astype(jnp.float32)], axis=1
        )
        return packed, feats

    def _fallback_rungs_impl(self, params, feats, langs, seed, settled):
        """The t>0 rungs (TEMPERATURES[1:]) over device-resident features,
        for rows where the speculative t=0 rung failed the logprob gate.
        Mirrors the sequential arm of ``_ladder_impl``: the rung loop
        starts at r=1, so a row settling at rung r decoded (and reports)
        TEMPERATURES[r] — the same brung indexing ``_unpack_window``
        decodes.  Settled rows are born finished.
        """
        cfg, st = self.cfg, self.st
        B = feats.shape[0]
        xk, xv = cross_kv(params, cfg, feats)
        prefix = jnp.stack(
            [
                jnp.full((B,), st.sot, jnp.int32),
                langs.astype(jnp.int32),
                jnp.full((B,), st.task, jnp.int32),
            ],
            axis=1,
        )
        logits, cache_k, cache_v = decoder_prefill(params, cfg, prefix, xk, xv)
        if self.quantize_cross_kv:
            xk, xv = quantize_cross_kv(xk, xv)
        next_logits = logits[:, -1, :]
        Tmax = cfg.max_target_positions
        tokens_init = jnp.zeros((B, Tmax), jnp.int32).at[:, :3].set(prefix)
        key0 = jax.random.PRNGKey(seed)

        btoks, bn, bavg, brung = self._sequential_rungs(
            params, xk, xv, cache_k, cache_v, next_logits, tokens_init,
            prefix, key0, settled,
            start_rung=1,  # rung 0 already ran speculatively
        )
        return jnp.concatenate(
            [
                btoks.astype(jnp.float32),
                bn.astype(jnp.float32)[:, None],
                bavg[:, None],
                brung.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )

    def warmup_fallback(self, batch: int = 1, put=None) -> None:
        """Pre-compile the t>0 fallback-rungs program.

        ``transcribe_window`` on silence never reaches it (the no-speech
        gate keeps ``need_fb`` false), so a warmup that only runs zeros
        leaves this program untraced and the FIRST live window failing the
        avg_logprob gate would stall its stream on a mid-utterance XLA
        compile.  Called by WhisperModel.warmup.

        ``put``: placement hook for the warmup features.  jit caches key
        on input sharding too, so mesh serving must warm with the same
        placement its live fallback dispatches carry; the hook is
        REMEMBERED and re-applied to the live ``feats`` in
        ``transcribe_window``, making the two agree by construction (the
        window program's output sharding is GSPMD's choice, not pinned —
        re-placing feats is a no-op when they already match and a cheap
        reshard on the rare gate-failure window otherwise).
        """
        self._fallback_put = put
        feats = jnp.zeros(
            (batch, self.cfg.max_source_positions, self.cfg.d_model),
            self.params["decoder"]["tok_emb"].dtype,
        )
        if put is not None:
            feats = put(feats)
        langs = jnp.full((batch,), self.st.sot + 1, jnp.int32)
        self._fallback_rungs(
            self.params, feats, langs, jnp.uint32(0),
            jnp.zeros((batch,), bool),
        )

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

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
        """Speculative window transcription: one fused dispatch for the
        common case (t=0 accepted / no-speech), a second dispatch over
        device-resident features only for streams whose greedy decode
        failed the reference's avg_logprob gate.
        """
        langs_arr, detect, active = self._window_inputs(audio, langs, n_active)
        fn = self._spec_program(detect)
        self.last_spec_k = self.spec_k  # the K this window actually used
        packed_dev, feats = fn(
            self.params, self.draft_params, audio,
            jnp.asarray(langs_arr), jnp.asarray(active),
        )
        # ONE fetch; feats stays on device.  np.array (not asarray): the
        # zero-copy view of a device buffer is read-only, and the fallback
        # path below writes failed rows back into it.
        packed = np.array(packed_dev)
        Tmax = self.cfg.max_target_positions
        bn = packed[:, Tmax].astype(np.int32)
        bavg = packed[:, Tmax + 1]
        nsp = packed[:, Tmax + 3]
        langs_out = packed[:, Tmax + 4].astype(np.int32)

        # Speculation telemetry (rides the single fetch as the trailing
        # column): each row's LIVE draft/verify round count, and the mean
        # over live streams of per-row committed tokens / per-row rounds —
        # 1.0 means no proposal ever accepted, spec_k+1 means every round
        # fully accepted.  Per-row denominators matter at batch: with a
        # global round count, one long stream's rounds would dilute every
        # short stream's ratio and de-escalate auto-K despite perfect
        # acceptance.  The production knob-tuning signal for spec_k.
        lrounds = packed[:, -1].astype(np.int32)
        live = active & ~(nsp > NO_SPEECH_THRESHOLD)
        # Global rounds == max per-row live count (fin is monotone, so a
        # row live in the final round was live in every round).
        self.last_spec_rounds = int(lrounds.max()) if len(lrounds) else 0
        live_r = live & (lrounds > 0)
        self.last_tokens_per_round = (
            float(((bn[live_r] - 3) / lrounds[live_r]).mean())
            if live_r.any()
            else None
        )
        if self.auto_k:
            self._adapt_spec_k()

        # Reference gate (model.rs:175-186): the greedy rung is accepted
        # unless avg_logprob < threshold (NaN avg accepted; nsp-gated rows
        # exit early regardless).
        need_fb = (
            active
            & ~(nsp > NO_SPEECH_THRESHOLD)
            & (bavg < LOGPROB_THRESHOLD)
        )
        if need_fb.any():
            if self._fallback_put is not None:
                # Same placement the program was warmed with (see
                # warmup_fallback): hit the compiled cache instead of
                # recompiling mid-utterance on GSPMD's unpinned choice.
                feats = self._fallback_put(feats)
            fb = np.asarray(
                self._fallback_rungs(
                    self.params, feats, jnp.asarray(langs_out),
                    jnp.uint32(seed), jnp.asarray(~need_fb),
                )
            )
            packed[need_fb, : Tmax + 3] = fb[need_fb]

        return self._unpack_window(packed, active, detect)

    def _unpack_window(self, packed, active, detect):
        """Host-side unpack: the inherited ``_unpack_ladder`` with one
        trailing telemetry column (per-row rounds) and the post-fallback
        rung-0 logprob gate (see that method's docstring)."""
        return self._unpack_ladder(
            packed, active, detect,
            trailing_cols=1, reject_rung0_below_gate=True,
        )
