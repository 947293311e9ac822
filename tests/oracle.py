"""Independent numpy re-implementation of the reference decode semantics
(``/root/reference/src/models/whisper/model.rs:279-389``), written with
explicit branchy control flow (like the Rust) and full-forward logits, used
to cross-check the branchless on-device lax.while_loop engine."""

from __future__ import annotations

import numpy as np

from norma_tpu.decode.masks import Masks, SpecialTokens, build_masks
from norma_tpu.model.config import WhisperConfig
from norma_tpu.model.whisper import decoder_full


def softmax_np(x: np.ndarray) -> np.ndarray:
    x = x - np.max(x, axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class OracleDecoder:
    def __init__(self, params, cfg: WhisperConfig, st: SpecialTokens):
        self.params = params
        self.cfg = cfg
        self.st = st
        self.masks: Masks = build_masks(cfg.vocab_size, cfg.suppress_tokens, st)

    def _logits(self, tokens, feats):
        import jax.numpy as jnp

        t = jnp.asarray(np.asarray(tokens, np.int32)[None])
        out = decoder_full(self.params, self.cfg, t, feats)
        return np.asarray(out)[0]  # [T, V]

    def _suppress_past(self, logits, last_ts):
        st = self.st
        out = logits.copy()
        ids = np.arange(len(logits))
        out[(ids > st.no_timestamps) & (ids <= last_ts)] = -np.inf
        return out

    def _suppress_rules(self, logits, tokens, last_ts):
        """Literal port of supress_tokens (model.rs:245-277)."""
        st = self.st
        logits = logits + self.masks.suppress
        l_token = tokens[-1]
        sl_token = tokens[-2] if len(tokens) >= 2 else None

        if l_token > st.no_timestamps:
            if sl_token is not None and sl_token >= st.eot:
                return logits + self.masks.timestamps
            logits = self._suppress_past(logits, last_ts)
            return logits + self.masks.non_timestamps

        sum_ts = logits[st.no_timestamps + 1 :].sum()
        max_txt = logits[: st.no_timestamps].max()
        if sum_ts >= max_txt:
            logits = self._suppress_past(logits, last_ts)
            return logits + self.masks.non_timestamps
        return self._suppress_past(logits, last_ts)

    def decode(self, feats, lang_token, temperature=0.0, rng=None):
        """Returns (tokens, avg_logprob, no_speech_prob)."""
        st = self.st
        cfg = self.cfg
        tokens = [st.sot]
        if lang_token is not None:
            tokens.append(int(lang_token))
        tokens.append(st.task)

        sum_logprob = 0.0
        last_timestamp = None

        logits_all = self._logits(tokens, feats)
        no_speech_prob = float(softmax_np(logits_all[0])[st.no_speech])
        if no_speech_prob > 0.6:
            return tokens, 0.0, no_speech_prob

        while tokens[-1] != st.eot:
            logits_all = self._logits(tokens, feats)
            probs = softmax_np(logits_all[-1].astype(np.float64))

            if last_timestamp is not None:
                masked = self._suppress_rules(probs, tokens, last_timestamp)
            else:
                masked = probs + self.masks.first_token

            if temperature > 0:
                prs = softmax_np(masked / temperature)
                if np.isnan(prs).all():
                    tokens.append(st.eot)
                    break
                next_token = int(rng.choice(len(prs), p=prs / prs.sum()))
            else:
                next_token = int(np.argmax(masked))
                if not np.isfinite(np.max(masked)):
                    # Grammar deadlock (all -inf): Rust's max_by returns the
                    # LAST of equal maxima, i.e. the highest vocab id —
                    # np.argmax would return the first (model.rs greedy arm).
                    next_token = len(masked) - 1

            if next_token > st.no_timestamps:
                last_timestamp = next_token

            tokens.append(next_token)
            sum_logprob += float(np.log(masked[next_token]))

            if len(tokens) >= cfg.max_target_positions - 1:
                tokens.append(st.eot)
                break

        avg_logprob = sum_logprob / len(tokens)

        while len(tokens) >= 2 and tokens[-2] > st.no_timestamps:
            del tokens[-2]

        return tokens, avg_logprob, no_speech_prob
