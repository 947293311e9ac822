"""Evaluate WER of a checkpoint over a manifest of WAV files.

Usage:
  python examples/eval_wer.py manifest.tsv [checkpoint_dir]

``manifest.tsv``: one utterance per line, ``<wav_path>\t<reference text>``
(e.g. LibriSpeech test-clean converted to 16 kHz WAV).  Prints corpus WER.
"""

import sys
import wave

import numpy as np

from norma_tpu.decode import LanguageState, LongFormDecoder
from norma_tpu.eval import word_error_rate
from norma_tpu.models import SelectedDevice
from norma_tpu.models.whisper import monolingual


def read_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        assert w.getframerate() == 16_000 and w.getnchannels() == 1
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0


def main() -> None:
    manifest = sys.argv[1]
    local_dir = sys.argv[2] if len(sys.argv) > 2 else None

    model = monolingual.Definition(
        monolingual.ModelType.DISTIL_LARGE_EN_V3,
        SelectedDevice.auto(),
        local_dir=local_dir,
    ).blocking_try_to_model()

    pairs = []
    with open(manifest) as f:
        for line in f:
            path, ref = line.rstrip("\n").split("\t", 1)
            audio = read_wav(path)
            # Fresh long-form state per utterance.
            lf = LongFormDecoder(
                model.engine,
                model.tokenizer,
                LanguageState(const=model.longform.lang.const),
                language_tokens=model.longform.language_tokens,
            )
            hyp = lf.transcribe(audio, final_chunk=True)
            pairs.append((ref, hyp))
            print(f"{len(pairs):5d}  {hyp[:70]!r}", flush=True)

    res = word_error_rate(pairs)
    print(
        f"WER {res.wer:.4f}  (S={res.substitutions} D={res.deletions} "
        f"I={res.insertions} / {res.ref_words} words, {res.n_utterances} utts)"
    )


if __name__ == "__main__":
    main()
