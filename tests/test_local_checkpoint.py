"""Full offline pipeline: Definition -> local checkpoint -> Transcriber.

Exercises everything the reference's loader does (monolingual.rs:320-451):
config parse, real `tokenizers` tokenizer, safetensors/gguf weight load,
special-token resolution (incl. all 99 language tokens), suppression-mask
build — then runs live audio through the public Transcriber API.
"""

import time

import numpy as np
import pytest

pytest.importorskip("tokenizers")

from checkpoint_fixture import make_checkpoint_dir
from norma_tpu import Transcriber
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.input import Settings
from norma_tpu.models import SelectedDevice
from norma_tpu.models.whisper import monolingual, multilingual


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    make_checkpoint_dir(d)
    return str(d)


def _source(seconds=0.8):
    return SyntheticSource(
        sample_rate=16_000, channels=1, dtype=np.float32,
        freq=440.0, noise=0.02, duration=seconds, realtime=False,
    )


def test_monolingual_definition_end_to_end(ckpt):
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt
    )
    d.set_responsiveness(1.0)  # 16000-sample chunks

    jh, th = Transcriber.blocking_spawn(d)
    stream = th.blocking_start(Settings(source=_source()))
    texts = list(stream)  # EOF finalizes
    th.close()
    jh.join(timeout=30)

    assert all(isinstance(t, str) and t for t in texts)
    # WordLevel decode of sampled text ids: every piece must be wN words.
    for t in texts:
        for w in t.split():
            assert w.startswith("w"), t


def test_multilingual_detect_end_to_end(ckpt):
    d = multilingual.Definition(
        multilingual.ModelType.TINY,
        SelectedDevice.cpu(),
        multilingual.Task.TRANSCRIBE,
        local_dir=ckpt,
    )
    d.set_responsiveness(1.0)
    model = d.blocking_try_to_model()
    # Detect mode: no const language, detection list covers all 99.
    assert model.longform.lang.const is None
    assert len(model.longform.language_tokens) == 99
    out = model.transcribe(
        (0.2 * np.random.default_rng(0).standard_normal(12_000)).astype(np.float32),
        final_chunk=True,
    )
    assert isinstance(out, str)
    assert model.longform.lang.detected is None  # cleared after final


def test_translate_task(ckpt):
    d = multilingual.Definition(
        multilingual.ModelType.TINY,
        SelectedDevice.cpu(),
        multilingual.Task.TRANSLATE,
        local_dir=ckpt,
    )
    model = d.blocking_try_to_model()
    tok = model.tokenizer
    assert model.engine.st.task == tok.token_to_id("<|translate|>")
    out = model.transcribe(np.zeros(6000, np.float32), final_chunk=True)
    assert isinstance(out, str)


def test_multi_as_mono_end_to_end(ckpt):
    from norma_tpu.models.whisper import Language

    d = monolingual.Definition(
        monolingual.MultiAsMono(
            model=multilingual.ModelType.TINY, lang=Language.FRENCH
        ),
        SelectedDevice.cpu(),
        local_dir=ckpt,
    )
    model = d.blocking_try_to_model()
    # ConstLang pinned to French; no detection.
    assert model.longform.lang.const == model.tokenizer.token_to_id("<|fr|>")
    out = model.transcribe(np.zeros(6000, np.float32), final_chunk=True)
    assert isinstance(out, str)


def test_quantized_gguf_definition(tmp_path):
    make_checkpoint_dir(tmp_path, quantized_ext="tiny-en")
    d = monolingual.Definition(
        monolingual.ModelType.QUANTIZED_TINY_EN,
        SelectedDevice.cpu(),
        local_dir=str(tmp_path),
    )
    model = d.blocking_try_to_model()
    out = model.transcribe(
        (0.2 * np.random.default_rng(1).standard_normal(12_000)).astype(np.float32),
        final_chunk=True,
    )
    assert isinstance(out, str)


def test_quantize_logits_flag(ckpt):
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=ckpt,
        quantize_logits=True,
    )
    model = d.blocking_try_to_model()
    assert "tok_emb_q8" in model.engine.params["decoder"]
    out = model.transcribe(
        (0.2 * np.random.default_rng(2).standard_normal(12_000)).astype(np.float32),
        final_chunk=True,
    )
    assert isinstance(out, str)


def test_config_overrides_reach_the_engine(ckpt):
    """config_overrides is the public path to the WhisperConfig-level
    serving knobs (encoder_attn_impl, cross_kv_impl, max_target_positions
    — docs/serving.md recommends them but config.json can't carry them);
    it must land on the built engine's config and be validated."""
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=ckpt,
        quantize_cross_kv=True,
        config_overrides={
            "cross_kv_impl": "chunked",
            "cross_kv_chunk": 7,
            "max_target_positions": 64,
        },
    )
    model = d.blocking_try_to_model()
    cfg = model.engine.cfg
    assert cfg.cross_kv_impl == "chunked"
    assert cfg.cross_kv_chunk == 7
    assert cfg.max_target_positions == 64  # cache rows follow the override
    out = model.transcribe(
        (0.2 * np.random.default_rng(3).standard_normal(12_000)).astype(
            np.float32
        ),
        final_chunk=True,
    )
    assert isinstance(out, str)

    bad = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=ckpt,
        config_overrides={"encoder_atn_impl": "jax_flash"},  # typo'd field
    )
    with pytest.raises(ValueError) as ei:
        bad.blocking_try_to_model()
    assert "encoder_atn_impl" in str(ei.value)


def test_quantize_logits_rejects_unknown_string(ckpt):
    """A typo'd quantization name must raise, not silently select int8."""
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=ckpt,
        quantize_logits="INT4",
    )
    with pytest.raises(Exception) as ei:
        d.blocking_try_to_model()
    assert "quantize_logits" in str(ei.value)


def test_quantize_logits_rejects_unknown_string_prequantized(ckpt, tmp_path):
    """The same typo must raise on a PRE-QUANTIZED params file too — that
    branch skips re-quantization, and before the up-front validation a bad
    truthy value was coerced into a want-tier and merely warned."""
    import os
    import sys as _sys

    _sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import quantize_checkpoint

    out = tmp_path / "pq"
    argv_save = _sys.argv
    _sys.argv = [
        "quantize_checkpoint.py", ckpt, str(out), "--dtype", "f32",
        "--decoder",
    ]
    try:
        quantize_checkpoint.main()
    finally:
        _sys.argv = argv_save
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=str(out),
        quantize_logits="INT4",
    )
    with pytest.raises(Exception) as ei:
        d.blocking_try_to_model()
    assert "quantize_logits" in str(ei.value)


def test_weights_without_model_prefix(tmp_path, ckpt):
    """Some exports drop the leading 'model.' on tensor names; the loader
    must resolve either convention."""
    import shutil

    from checkpoint_fixture import random_hf_tensors, write_safetensors

    for f in ("config.json", "tokenizer.json"):
        shutil.copy(f"{ckpt}/{f}", tmp_path / f)
    import json

    vocab_size = json.load(open(f"{ckpt}/config.json"))["vocab_size"]
    tensors = {
        k[len("model."):]: v for k, v in random_hf_tensors(vocab_size).items()
    }
    write_safetensors(str(tmp_path / "model.safetensors"), tensors)

    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=str(tmp_path)
    )
    model = d.blocking_try_to_model()
    out = model.transcribe(
        (0.2 * np.random.default_rng(3).standard_normal(12_000)).astype(np.float32),
        final_chunk=True,
    )
    assert isinstance(out, str)


def test_missing_local_file_errors(tmp_path):
    from norma_tpu.errors import WhisperError

    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=str(tmp_path)
    )
    with pytest.raises(WhisperError, match="not found"):
        d.blocking_try_to_model()


def test_speculative_draft_definition_end_to_end(ckpt):
    """draft_local_dir switches the decode engine to SpeculativeEngine and
    the whole public path still works (self-draft: the fixture checkpoint
    drafts for itself, so every proposal is accepted)."""
    from norma_tpu.decode.speculative import SpeculativeEngine

    base = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt
    )
    spec = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt,
        draft=None, draft_local_dir=ckpt, spec_k=3,
    )
    m_base = base.blocking_try_to_model()
    m_spec = spec.blocking_try_to_model()
    assert isinstance(m_spec.engine, SpeculativeEngine)
    assert m_spec.engine.spec_k == 3
    audio = (
        0.2 * np.random.default_rng(5).standard_normal(12_000)
    ).astype(np.float32)
    a = m_base.transcribe(audio, final_chunk=True)
    b = m_spec.transcribe(audio, final_chunk=True)
    # Greedy draft/verify is token-for-token the target's own decode.
    assert b == a


def test_speculative_auto_draft_mapping():
    assert (
        multilingual.Definition(
            multilingual.ModelType.LARGE_V3, SelectedDevice.cpu(),
            draft="auto",
        ).draft
        == "distil-whisper/distil-large-v3"
    )
    with pytest.raises(ValueError, match="no official distil draft"):
        multilingual.Definition(
            multilingual.ModelType.TINY, SelectedDevice.cpu(), draft="auto"
        )
    with pytest.raises(ValueError, match="no official distil draft"):
        monolingual.Definition(
            monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), draft="auto"
        )


def test_self_kv_rejected_with_speculative(tmp_path):
    """quantize_self_kv + draft= must error clearly (the speculative
    draft/verify cache paths keep bf16 self-KV)."""
    import pytest

    from checkpoint_fixture import make_checkpoint_dir
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper import monolingual

    d = str(tmp_path / "ckpt")
    import os

    os.makedirs(d)
    make_checkpoint_dir(d)
    defn = monolingual.Definition(
        monolingual.ModelType.TINY_EN,
        SelectedDevice.cpu(),
        local_dir=d,
        draft="x",  # any draft selects the speculative engine
        draft_local_dir=d,
        quantize_self_kv=True,
    )
    with pytest.raises(ValueError, match="quantize_self_kv"):
        defn.blocking_try_to_model()


def test_decode_buckets_default_at_production_mtp(ckpt):
    """r5: checkpoints decoding at mtp >= 448 default to the bucketed
    chain (bitwise-identical, measured pure win — PERF.md "Bucketed
    decode"); explicit overrides and short-mtp configs are untouched."""
    base = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt
    )
    # Fixture checkpoint decodes at mtp=48: no default applied.
    assert base.blocking_try_to_model().engine.cfg.decode_buckets == ()

    prod = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt,
        config_overrides={"max_target_positions": 448},
    )
    assert prod.blocking_try_to_model().engine.cfg.decode_buckets == (128, 256)

    off = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt,
        config_overrides={
            "max_target_positions": 448, "decode_buckets": (),
        },
    )
    assert off.blocking_try_to_model().engine.cfg.decode_buckets == ()

    custom = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(), local_dir=ckpt,
        config_overrides={
            "max_target_positions": 448,
            "decode_buckets": tuple(range(48, 448, 48)),
        },
    )
    assert len(custom.blocking_try_to_model().engine.cfg.decode_buckets) == 9
