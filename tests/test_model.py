"""Model-math tests: KV-cache equivalence, shapes, safetensors round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config
from norma_tpu.model import (
    cross_kv,
    decoder_full,
    decoder_prefill,
    decoder_step,
    encode,
    init_params,
    param_count,
)
from norma_tpu.model.load import params_from_hf_tensors, read_safetensors


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    return cfg, params


def test_encode_shape(setup):
    cfg, params = setup
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, cfg.num_mel_bins, 64)),
        jnp.float32,
    )
    feats = encode(params, cfg, mel)
    assert feats.shape == (2, 32, cfg.d_model)
    assert np.isfinite(np.asarray(feats)).all()


def test_incremental_matches_full(setup):
    """Prefill + N incremental steps == one full forward (KV-cache proof)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    B, Ta = 2, 16
    feats = jnp.asarray(rng.standard_normal((B, Ta, cfg.d_model)), jnp.float32)
    toks = rng.integers(0, cfg.vocab_size, size=(B, 10)).astype(np.int32)

    full = np.asarray(decoder_full(params, cfg, jnp.asarray(toks), feats))

    xk, xv = cross_kv(params, cfg, feats)
    P = 4
    logits, ck, cv = decoder_prefill(params, cfg, jnp.asarray(toks[:, :P]), xk, xv)
    np.testing.assert_allclose(np.asarray(logits), full[:, :P], rtol=2e-4, atol=2e-4)

    for pos in range(P, 10):
        step_logits, ck, cv = decoder_step(
            params, cfg, jnp.asarray(toks[:, pos]), jnp.int32(pos), ck, cv, xk, xv
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), full[:, pos], rtol=2e-4, atol=2e-4
        )


def test_param_count_tiny(setup):
    cfg, params = setup
    assert param_count(params) > 0


def test_safetensors_roundtrip(tmp_path, setup):
    """Write an HF-style checkpoint, read it back through our loader."""
    cfg, params = setup
    import json
    import struct

    rng = np.random.default_rng(2)
    D, V, M = cfg.d_model, cfg.vocab_size, cfg.num_mel_bins
    F = 4 * D

    tensors = {}

    def add(name, shape):
        tensors[name] = rng.standard_normal(shape).astype(np.float32)

    add("model.encoder.conv1.weight", (D, M, 3))
    add("model.encoder.conv1.bias", (D,))
    add("model.encoder.conv2.weight", (D, D, 3))
    add("model.encoder.conv2.bias", (D,))
    add("model.encoder.embed_positions.weight", (cfg.max_source_positions, D))
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        for proj in ("q_proj", "v_proj", "out_proj"):
            add(f"{p}.self_attn.{proj}.weight", (D, D))
            add(f"{p}.self_attn.{proj}.bias", (D,))
        add(f"{p}.self_attn.k_proj.weight", (D, D))
        add(f"{p}.self_attn_layer_norm.weight", (D,))
        add(f"{p}.self_attn_layer_norm.bias", (D,))
        add(f"{p}.fc1.weight", (F, D))
        add(f"{p}.fc1.bias", (F,))
        add(f"{p}.fc2.weight", (D, F))
        add(f"{p}.fc2.bias", (D,))
        add(f"{p}.final_layer_norm.weight", (D,))
        add(f"{p}.final_layer_norm.bias", (D,))
    add("model.encoder.layer_norm.weight", (D,))
    add("model.encoder.layer_norm.bias", (D,))
    add("model.decoder.embed_tokens.weight", (V, D))
    add("model.decoder.embed_positions.weight", (cfg.max_target_positions, D))
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "v_proj", "out_proj"):
                add(f"{p}.{attn}.{proj}.weight", (D, D))
                add(f"{p}.{attn}.{proj}.bias", (D,))
            add(f"{p}.{attn}.k_proj.weight", (D, D))
        add(f"{p}.self_attn_layer_norm.weight", (D,))
        add(f"{p}.self_attn_layer_norm.bias", (D,))
        add(f"{p}.encoder_attn_layer_norm.weight", (D,))
        add(f"{p}.encoder_attn_layer_norm.bias", (D,))
        add(f"{p}.fc1.weight", (F, D))
        add(f"{p}.fc1.bias", (F,))
        add(f"{p}.fc2.weight", (D, F))
        add(f"{p}.fc2.bias", (D,))
        add(f"{p}.final_layer_norm.weight", (D,))
        add(f"{p}.final_layer_norm.bias", (D,))
    add("model.decoder.layer_norm.weight", (D,))
    add("model.decoder.layer_norm.bias", (D,))

    # Write the safetensors file by hand.
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        b = arr.tobytes()
        header[name] = {
            "dtype": "F32",
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(b)],
        }
        offset += len(b)
        blobs.append(b)
    hj = json.dumps(header).encode()
    path = tmp_path / "model.safetensors"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)

    loaded_raw = read_safetensors(str(path))
    assert set(loaded_raw) == set(tensors)
    np.testing.assert_array_equal(
        loaded_raw["model.decoder.embed_tokens.weight"],
        tensors["model.decoder.embed_tokens.weight"],
    )

    params2 = params_from_hf_tensors(loaded_raw, cfg)
    # Linear weights transposed to [in, out]:
    np.testing.assert_allclose(
        np.asarray(params2["decoder"]["layers"]["q_w"][0]),
        tensors["model.decoder.layers.0.self_attn.q_proj.weight"].T,
    )
    # Conv weights to [width, in, out]:
    np.testing.assert_allclose(
        np.asarray(params2["encoder"]["conv1_w"]),
        tensors["model.encoder.conv1.weight"].transpose(2, 1, 0),
    )
    # And the whole thing runs.
    mel = jnp.zeros((1, M, 64), jnp.float32)
    feats = encode(params2, cfg, mel)
    assert feats.shape == (1, 32, D)


def test_attention_chunked_exact():
    """attention_chunked == attention bit-for-bit math (query chunking is
    exact: softmax normalizes over the full key axis per query row).  The
    TPU 'auto' impl relies on this equivalence (hardware check:
    tools/verify_encoder_attn_tpu.py)."""
    import numpy as np

    from norma_tpu.model.whisper import attention, attention_chunked

    rng = np.random.default_rng(0)
    B, T, D, H = 2, 500, 64, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        for _ in range(3)
    )
    want = np.asarray(attention(q, k, v, H))
    for chunk in (100, 250, 500):
        got = np.asarray(attention_chunked(q, k, v, H, chunk))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    # Non-dividing chunk falls back to full attention (still exact).
    got = np.asarray(attention_chunked(q, k, v, H, 333))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
