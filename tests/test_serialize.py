"""Pre-quantized checkpoint save/load (model/serialize.py +
tools/quantize_checkpoint.py) — the GGUF-q8_0-workflow equivalent for the
in-house int8 layout."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config
from norma_tpu.model import fuse_qkv, init_params
from norma_tpu.model.serialize import (
    FORMAT_KEY,
    flatten_params,
    load_params_file,
    peek_format,
    save_params,
    unflatten_params,
    write_safetensors,
)


def test_flatten_unflatten_roundtrip():
    cfg = tiny_config()
    params = fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16))
    flat = flatten_params(params)
    assert "decoder/layers/qkv_w" in flat and "encoder/pos" in flat
    back = unflatten_params(flat)
    import jax

    a = jax.tree_util.tree_leaves_with_path(params)
    b = jax.tree_util.tree_leaves_with_path(back)
    assert len(a) == len(b)
    for (pa, la), (pb, lb) in zip(a, b):
        assert pa == pb
        assert la.dtype == lb.dtype, pa
        np.testing.assert_array_equal(np.asarray(la, np.float32),
                                      np.asarray(lb, np.float32))


def test_save_load_params_file_mixed_dtypes(tmp_path):
    """bf16/f32/int8 leaves round-trip bit-exactly, incl. nested quant
    dicts; metadata marks the format."""
    from norma_tpu.model.quant import quantize_decoder, quantize_encoder

    cfg = tiny_config()
    params = quantize_encoder(
        quantize_decoder(fuse_qkv(init_params(cfg, seed=1, dtype=jnp.bfloat16)))
    )
    path = str(tmp_path / "m.safetensors")
    save_params(path, params, metadata={"quant": "test"})

    meta = peek_format(path)
    assert meta and meta[FORMAT_KEY] == "params-v1" and meta["quant"] == "test"

    loaded, meta2 = load_params_file(path)
    assert meta2["quant"] == "test"
    lay = loaded["decoder"]["layers"]
    assert lay["qkv_w_q"].dtype == jnp.int8
    assert lay["qkv_w_s"].dtype == jnp.float32
    assert loaded["decoder"]["tok_emb"].dtype == jnp.bfloat16
    assert loaded["decoder"]["tok_emb_q8"]["q"].dtype == jnp.int8
    assert loaded["encoder"]["layers"]["fc1_w_q"].dtype == jnp.int8

    import jax

    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(loaded),
    ):
        assert pa == pb and la.dtype == lb.dtype, pa
        np.testing.assert_array_equal(
            np.asarray(la, np.float32), np.asarray(lb, np.float32)
        )


def test_loaded_params_tp_shardable(tmp_path):
    """A params file loaded from disk carries the same pytree structure as
    the in-memory quantized form, so Megatron tp-sharding and the sharded
    forward work identically on it."""
    import jax

    from norma_tpu.model.quant import quantize_decoder, quantize_encoder
    from norma_tpu.model.whisper import encode
    from norma_tpu.parallel.sharding import make_mesh, param_shardings, shard_params

    cfg = tiny_config()
    params = quantize_encoder(
        quantize_decoder(fuse_qkv(init_params(cfg, seed=2)))
    )
    path = str(tmp_path / "m.safetensors")
    save_params(path, params)
    loaded, _ = load_params_file(path)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sh = param_shardings(loaded, mesh)
    assert sh["encoder"]["layers"]["qkv_w_q"].spec[-1] == "tp"
    assert sh["decoder"]["tok_emb_q8"]["q"].spec[-1] == "tp"
    sp = shard_params(loaded, mesh)
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
        ),
        jnp.float32,
    )
    a = np.asarray(encode(sp, cfg, mel))
    b = np.asarray(encode(params, cfg, mel))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_peek_format_rejects_hf_checkpoint(tmp_path):
    """A plain HF safetensors file (no metadata marker) is NOT detected as
    a params file, and load_params_file refuses it."""
    from checkpoint_fixture import make_checkpoint_dir

    make_checkpoint_dir(tmp_path)
    hf = str(tmp_path / "model.safetensors")
    assert peek_format(hf) is None
    with pytest.raises(ValueError, match=FORMAT_KEY):
        load_params_file(hf)


def test_write_safetensors_rejects_unsupported_dtype(tmp_path):
    with pytest.raises(ValueError, match="unsupported dtype"):
        write_safetensors(
            str(tmp_path / "x.safetensors"),
            {"a": np.zeros(3, np.complex64)},
        )


def test_quantize_checkpoint_tool_gguf_input(tmp_path, monkeypatch):
    """The converter also accepts a GGUF q8_0 checkpoint dir (the
    reference's quantized distribution) and the output loads + decodes."""
    pytest.importorskip("tokenizers")
    from checkpoint_fixture import make_checkpoint_dir
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper import monolingual

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    make_checkpoint_dir(src, quantized_ext="-q80.gguf")
    assert not (src / "model.safetensors").exists()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import quantize_checkpoint

    monkeypatch.setattr(
        sys, "argv",
        ["quantize_checkpoint.py", str(src), str(out), "--dtype", "f32",
         "--decoder"],
    )
    quantize_checkpoint.main()
    d = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(out),
    )
    model = d.blocking_try_to_model()
    audio = (0.1 * np.random.default_rng(8).standard_normal(16_000)).astype(
        np.float32
    )
    text = model.transcribe(audio, final_chunk=True)
    assert isinstance(text, str)


def test_quantize_checkpoint_tool_end_to_end(tmp_path, monkeypatch):
    """The CLI converts a checkpoint dir offline; loading the output via a
    Definition produces the IDENTICAL transcript to on-the-fly
    quantization of the original (same grids, f32 roundtrip is exact)."""
    pytest.importorskip("tokenizers")
    from checkpoint_fixture import make_checkpoint_dir
    from norma_tpu.models import SelectedDevice
    from norma_tpu.models.whisper import monolingual

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    make_checkpoint_dir(src)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import quantize_checkpoint

    monkeypatch.setattr(
        sys, "argv",
        ["quantize_checkpoint.py", str(src), str(out),
         "--dtype", "f32", "--decoder", "--encoder"],
    )
    quantize_checkpoint.main()
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists() and (out / "tokenizer.json").exists()
    meta = peek_format(str(out / "model.safetensors"))
    assert meta["quant"] == "decoder-w8+encoder-w8a8"

    rng = np.random.default_rng(31)
    audio = (0.1 * rng.standard_normal(24_000)).astype(np.float32)

    d_fly = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(src), quantize_decoder=True, quantize_encoder=True,
    )
    d_pre = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(out),
    )
    m_fly = d_fly.blocking_try_to_model()
    m_pre = d_pre.blocking_try_to_model()
    # Identical param pytrees (structure + values) ...
    lay = m_pre.engine.params["decoder"]["layers"]
    assert "qkv_w_q" in lay and "qkv_w" not in lay
    assert "fc1_w_q" in m_pre.engine.params["encoder"]["layers"]
    # ... hence identical transcripts.
    t_fly = m_fly.transcribe(audio.copy(), final_chunk=True)
    t_pre = m_pre.transcribe(audio.copy(), final_chunk=True)
    assert t_fly == t_pre

    # A dtype mismatch with the file is WARNED about, not silently
    # ignored (the file fixes its dtypes at conversion time, like GGUF).
    import logging

    d_warn = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(out), dtype=jnp.bfloat16,  # file was --dtype f32
    )
    import norma_tpu.models.whisper.loader as loader_mod

    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    loader_mod.logger.addHandler(h)
    try:
        d_warn.blocking_try_to_model()
    finally:
        loader_mod.logger.removeHandler(h)
    assert any("dtype" in m and "ignored" in m for m in records), records

    # Pre-quantized dirs also work as the TARGET AND the DRAFT of a
    # speculative Definition (the draft branch has its own format
    # detection; self-draft => transcript equals the plain decode).
    from norma_tpu.decode.speculative import SpeculativeEngine

    d_spec = monolingual.Definition(
        monolingual.ModelType.TINY_EN, SelectedDevice.cpu(),
        local_dir=str(out), draft=None, draft_local_dir=str(out), spec_k=3,
    )
    m_spec = d_spec.blocking_try_to_model()
    assert isinstance(m_spec.engine, SpeculativeEngine)
    t_spec = m_spec.transcribe(audio.copy(), final_chunk=True)
    assert t_spec == t_pre


def test_non_safetensors_file_rejected_cleanly(tmp_path):
    """A file whose first 8 bytes decode to a huge u64 (e.g. GGUF
    magic+version ~= 14 GB) must raise a clean ValueError from both header
    readers, not attempt a multi-gigabyte read / MemoryError."""
    import struct

    import pytest

    from norma_tpu.model.gguf import GGUF_MAGIC
    from norma_tpu.model.load import read_safetensors
    from norma_tpu.model.serialize import load_params_file, peek_format

    p = tmp_path / "weights.safetensors"
    p.write_bytes(struct.pack("<II", GGUF_MAGIC, 3) + b"\x00" * 64)
    for fn in (peek_format, load_params_file, read_safetensors):
        with pytest.raises(ValueError, match="not a safetensors file"):
            fn(str(p))
    # Truncated file (< 8 bytes) is likewise a clean error.
    q = tmp_path / "tiny.safetensors"
    q.write_bytes(b"\x01")
    with pytest.raises(ValueError, match="too short"):
        peek_format(str(q))


def test_flatten_rejects_separator_keys():
    """'/' in a param key would corrupt the flat format on round-trip; it
    must raise even under -O (ValueError, not assert)."""
    import pytest

    from norma_tpu.model.serialize import flatten_params

    with pytest.raises(ValueError, match="separator"):
        flatten_params({"decoder": {"bad/key": 1}})
