"""Model-registry tests: params clamps, languages, definitions, gguf."""

import numpy as np
import pytest

from norma_tpu.errors import ResponsivenessError
from norma_tpu.models import CommonModelParams, SelectedDevice
from norma_tpu.models.whisper import Language, VocabVersion
from norma_tpu.models.whisper.languages import ALL_LANGUAGES
from norma_tpu.models.whisper import monolingual, multilingual


# -- CommonModelParams clamps (reference: mod.rs:58-117) --------------------


def test_common_params_clamps():
    p = CommonModelParams(10, 3, 0)
    assert p.get_max_chunk_len() == 100  # MIN_CHUNK_LEN floor
    assert p.data_buffer_size == 5  # +2 ring slack
    assert p.string_buffer_size == 1  # floor at 1

    p.set_max_chunk_len(50)
    assert p.get_max_chunk_len() == 100
    p.set_max_chunk_len(5000)
    assert p.get_max_chunk_len() == 5000
    p.set_data_buffer_size(10)
    assert p.data_buffer_size == 12
    p.set_string_buffer_size(0)
    assert p.string_buffer_size == 1


# -- languages (reference: languages.rs) ------------------------------------


def test_language_count_and_order():
    assert len(ALL_LANGUAGES) == 99
    # First ten must match Whisper's token ordering exactly.
    assert [l.code for l in ALL_LANGUAGES[:10]] == [
        "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr",
    ]
    assert ALL_LANGUAGES[-1] is Language.SUNDANESE


def test_language_token_and_display():
    assert Language.ENGLISH.token() == "<|en|>"
    assert str(Language.HAITIAN_CREOLE) == "Haitian Creole"
    assert Language.HAWAIIAN.token() == "<|haw|>"


# -- monolingual metadata (reference: monolingual.rs:48-110) ----------------


def test_monolingual_repo_metadata():
    MT = monolingual.ModelType
    assert MT.DISTIL_LARGE_EN_V3.id() == "distil-whisper/distil-large-v3"
    assert MT.TINY_EN.rev() == "refs/pr/15"
    assert MT.BASE_EN.rev() == "refs/pr/13"
    assert MT.SMALL_EN.rev() == "refs/pr/10"
    assert MT.MEDIUM_EN.rev() == "main"
    assert MT.QUANTIZED_TINY_EN.quantized_ext() == "tiny-en"
    assert MT.TINY_EN.quantized_ext() is None
    assert MT.TINY_EN.vocab_version() is VocabVersion.EN_V1
    assert MT.DISTIL_MEDIUM_EN.vocab_version() is VocabVersion.V1
    assert MT.DISTIL_LARGE_EN_V3.vocab_version() is VocabVersion.V2
    assert MT.TINY_EN.language() is Language.ENGLISH


def test_multi_as_mono():
    mm = monolingual.MultiAsMono(
        model=multilingual.ModelType.LARGE_V3, lang=Language.FRENCH
    )
    assert mm.id() == "openai/whisper-large-v3"
    assert mm.language() is Language.FRENCH
    assert mm.vocab_version() is VocabVersion.V2


def test_multilingual_repo_metadata():
    MT = multilingual.ModelType
    assert MT.LARGE_V2.rev() == "refs/pr/57"
    assert MT.BASE.rev() == "refs/pr/22"
    assert MT.LARGE.rev() == "refs/pr/36"
    assert MT.QUANTIZED_TINY.quantized_ext() == "tiny"
    assert MT.LARGE_V3.vocab_version() is VocabVersion.V2
    assert multilingual.Task.TRANSCRIBE.token() == "<|transcribe|>"
    assert multilingual.Task.TRANSLATE.token() == "<|translate|>"
    # Extension beyond the reference list: the pruned-decoder serving
    # checkpoint (V2 vocab, same encoder lineage as large-v3).
    assert MT.LARGE_V3_TURBO.id() == "openai/whisper-large-v3-turbo"
    assert MT.LARGE_V3_TURBO.rev() == "main"
    assert MT.LARGE_V3_TURBO.vocab_version() is VocabVersion.V2
    assert MT.LARGE_V3_TURBO.quantized_ext() is None
    from norma_tpu.model import PRESETS

    p = PRESETS["large-v3-turbo"]
    assert (p.encoder_layers, p.decoder_layers) == (32, 4)
    assert (p.num_mel_bins, p.vocab_size) == (128, 51866)


# -- responsiveness clamp (reference: monolingual.rs:146-156) ---------------


def test_set_responsiveness():
    d = monolingual.Definition(monolingual.ModelType.TINY_EN, SelectedDevice.cpu())
    # default: 25s chunks
    assert d.common_params().get_max_chunk_len() == 16_000 * 25
    d.set_responsiveness(10.0)
    assert d.common_params().get_max_chunk_len() == 16_000 * 10
    with pytest.raises(ResponsivenessError):
        d.set_responsiveness(0.5)
    with pytest.raises(ResponsivenessError):
        d.set_responsiveness(31.0)


# -- gguf reader ------------------------------------------------------------


def test_gguf_roundtrip(tmp_path):
    """Write a synthetic GGUF v3 file with f32/f16/q8_0 tensors, read back."""
    import struct

    from norma_tpu.model.gguf import dequant_q8_0, read_gguf

    rng = np.random.default_rng(0)

    def gstr(s):
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    f32_t = rng.standard_normal((4, 8)).astype(np.float32)
    f16_t = rng.standard_normal((2, 16)).astype(np.float16)
    # q8_0 tensor: 64 elems = 2 blocks
    scales = np.array([0.05, 0.1], np.float16)
    qs = rng.integers(-127, 127, size=(2, 32)).astype(np.int8)
    q8_blocks = b"".join(
        scales[i].tobytes() + qs[i].tobytes() for i in range(2)
    )
    q8_expected = (qs.astype(np.float32) * scales.astype(np.float32)[:, None]).reshape(
        2, 32
    ).reshape(-1)

    # tensor data segment (32-byte aligned offsets)
    datas = [f32_t.tobytes(), f16_t.tobytes(), q8_blocks]
    offsets = []
    off = 0
    for d in datas:
        offsets.append(off)
        off += len(d)
        off = (off + 31) // 32 * 32

    header = struct.pack("<IIQQ", 0x46554747, 3, 3, 1)
    # one metadata kv: general.alignment = u32 32
    meta = gstr("general.alignment") + struct.pack("<I", 4) + struct.pack("<I", 32)
    infos = b""
    # dims are in ggml order (reversed numpy shape)
    infos += gstr("a") + struct.pack("<I", 2) + struct.pack("<QQ", 8, 4) + struct.pack(
        "<IQ", 0, offsets[0]
    )
    infos += gstr("b") + struct.pack("<I", 2) + struct.pack("<QQ", 16, 2) + struct.pack(
        "<IQ", 1, offsets[1]
    )
    infos += gstr("c") + struct.pack("<I", 1) + struct.pack("<Q", 64) + struct.pack(
        "<IQ", 8, offsets[2]
    )

    head = header + meta + infos
    pad = (-len(head)) % 32
    body = bytearray(head + b"\0" * pad)
    for d, o in zip(datas, offsets):
        need = len(head) + pad + o + len(d)
        if len(body) < need:
            body.extend(b"\0" * (need - len(body)))
        body[len(head) + pad + o : len(head) + pad + o + len(d)] = d

    path = tmp_path / "t.gguf"
    path.write_bytes(bytes(body))

    meta_out, tensors = read_gguf(str(path))
    assert meta_out["general.alignment"] == 32
    np.testing.assert_array_equal(tensors["a"], f32_t)
    np.testing.assert_allclose(tensors["b"], f16_t.astype(np.float32))
    np.testing.assert_allclose(tensors["c"], q8_expected, rtol=1e-3)


# -- Round-3 review fixes -----------------------------------------------------


def test_definition_roundtrip_preserves_extensions():
    """to_dict/from_dict must cover every constructor knob: a round-tripped
    Definition used to silently rebuild an unquantized, non-speculative,
    untimestamped model."""
    import jax.numpy as jnp

    from norma_tpu.models.whisper import monolingual, multilingual

    d = monolingual.Definition(
        monolingual.ModelType.DISTIL_LARGE_EN_V3,
        dtype=jnp.bfloat16,
        quantize_decoder=True,
        quantize_cross_kv=True,
        quantize_self_kv=True,
        timestamps=True,
        draft="distil-whisper/distil-small.en",
        spec_k="auto",
        local_dir="/tmp/ckpt",
        config_overrides={"encoder_attn_impl": "jax_flash",
                          "cross_kv_impl": "chunked"},
    )
    r = monolingual.Definition.from_dict(d.to_dict())
    assert r.config_overrides == {"encoder_attn_impl": "jax_flash",
                                  "cross_kv_impl": "chunked"}
    assert r.dtype == jnp.bfloat16
    assert r.quantize_decoder and r.quantize_cross_kv and r.timestamps
    assert r.quantize_self_kv
    assert r.draft == "distil-whisper/distil-small.en"
    assert r.spec_k == "auto"
    assert r.local_dir == "/tmp/ckpt"
    assert not r.quantize_encoder and not r.mel_center

    m = multilingual.Definition(
        multilingual.ModelType.LARGE_V3,
        task=multilingual.Task.TRANSLATE,
        quantize_encoder=True,
        mel_center=True,
    )
    r2 = multilingual.Definition.from_dict(m.to_dict())
    assert r2.task == multilingual.Task.TRANSLATE
    assert r2.quantize_encoder and r2.mel_center
    assert not r2.quantize_decoder

    # Old payloads (pre-extension) still load with defaults.
    legacy = {
        "model": monolingual.ModelType.TINY_EN.value,
        "device": {"kind": "auto", "ordinal": 0},
        "common_params": d.common_params().to_dict(),
    }
    r3 = monolingual.Definition.from_dict(legacy)
    assert not r3.quantize_decoder and r3.spec_k == 4 and r3.draft is None
    assert r3.config_overrides is None


def test_common_model_params_defaults_construct():
    from norma_tpu.models import MIN_CHUNK_LEN, CommonModelParams

    p = CommonModelParams()
    assert p.max_chunk_len == MIN_CHUNK_LEN
    assert p.data_buffer_size == 3  # 1 + ring slack
    assert p.string_buffer_size == 1


def test_selected_device_rejects_unknown_kind():
    import pytest

    from norma_tpu.models import SelectedDevice

    with pytest.raises(ValueError, match="unknown device kind"):
        SelectedDevice("gpu", 0).to_jax_device()


def test_selected_device_tpu_errors_without_tpu():
    """Explicit TPU selection must not silently fall back to CPU."""
    import pytest

    from norma_tpu.models import SelectedDevice

    with pytest.raises(Exception):  # jax raises RuntimeError on missing backend
        SelectedDevice.tpu(0).to_jax_device()
