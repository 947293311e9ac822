from norma_tpu.eval import edit_distance, normalize_text, word_error_rate


def test_normalize():
    assert normalize_text("Hello, World!  It's ME.") == "hello world its me"


def test_edit_distance_ops():
    s, d, i, total = edit_distance("a b c d".split(), "a x c".split())
    assert (s, d, i, total) == (1, 1, 0, 2)


def test_wer_perfect():
    assert word_error_rate([("hello world", "Hello, world!")]).wer == 0.0


def test_wer_corpus():
    res = word_error_rate(
        [
            ("the quick brown fox", "the quick brown fox"),
            ("jumps over the lazy dog", "jumps over a lazy"),  # 1 sub, 1 del
        ]
    )
    assert res.ref_words == 9
    assert res.substitutions == 1 and res.deletions == 1 and res.insertions == 0
    assert abs(res.wer - 2 / 9) < 1e-9


def test_eval_wer_manifest_runner(tmp_path):
    """The offline-testable prefix of tools/first_network_run.sh: the
    manifest loaders + evaluate() loop of tools/eval_wer.py, driven with
    synthetic WAVs and a fake transcribe function."""
    import json
    import sys
    import wave

    import numpy as np

    sys.path.insert(0, "tools")
    import importlib

    ew = importlib.import_module("eval_wer")

    def write_wav(path, seconds=0.3):
        n = int(16_000 * seconds)
        pcm = (np.sin(2 * np.pi * 220 * np.arange(n) / 16000) * 8000).astype(
            np.int16
        )
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16_000)
            w.writeframes(pcm.tobytes())

    # JSONL manifest form.
    wavs = []
    with open(tmp_path / "m.jsonl", "w") as f:
        for i, text in enumerate(["hello world", "the quick fox"]):
            p = tmp_path / f"u{i}.wav"
            write_wav(p)
            wavs.append(str(p))
            f.write(json.dumps({"wav": str(p), "text": text}) + "\n")
    items = ew.load_manifest(str(tmp_path / "m.jsonl"))
    assert [t for _, t in items] == ["hello world", "the quick fox"]

    # LibriSpeech layout form.
    ls = tmp_path / "ls" / "84" / "121123"
    ls.mkdir(parents=True)
    write_wav(ls / "84-121123-0000.wav")
    (ls / "84-121123.trans.txt").write_text(
        "84-121123-0000 GO DO YOU HEAR\n84-121123-9999 MISSING AUDIO\n"
    )
    ls_items = ew.load_librispeech(str(tmp_path / "ls"))
    assert len(ls_items) == 1  # the missing-wav line is skipped
    assert ls_items[0][1] == "GO DO YOU HEAR"

    # evaluate(): perfect hypothesis on one item, one substitution on the
    # other -> corpus WER = 1 edit / 5 ref words.
    hyps = {str(tmp_path / "u0.wav"): "hello world",
            str(tmp_path / "u1.wav"): "the quick dog"}
    it = iter(range(len(items)))

    def fake_transcribe(audio):
        assert audio.dtype == np.float32 and audio.size > 0
        return hyps[items[next(it)][0]]

    res = ew.evaluate(fake_transcribe, items)
    assert res["n_utterances"] == 2
    assert res["ref_words"] == 5
    assert abs(res["wer"] - 1 / 5) < 1e-9
    assert res["audio_seconds"] > 0
