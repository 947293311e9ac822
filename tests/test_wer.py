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
