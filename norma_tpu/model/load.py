"""Parameter creation: random init and safetensors checkpoint loading.

Replaces the reference's ``VarBuilder::from_mmaped_safetensors`` path
(``monolingual.rs:237-239``) with a dependency-free safetensors reader
(the format is a little-endian u64 header length + JSON header + raw
tensor bytes) mapping HF whisper weight names onto our stacked pytree.
"""

from __future__ import annotations

import json
import mmap
import struct
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .whisper import sinusoids

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially below
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def read_safetensors(path: str, *, _parsed=None) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into a dict of numpy arrays (zero-copy mmap).

    ``_parsed``: optional ``(header_len, header)`` from a caller that
    already parsed the JSON header (serialize.load_params_file) — parsing
    the multi-thousand-entry header twice is measurable on large models.
    """
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    if _parsed is not None:
        header_len, header = _parsed
    else:
        if len(mm) < 8:
            raise ValueError(f"{path}: too short to be a safetensors file")
        (header_len,) = struct.unpack("<Q", mm[:8])
        # Validate BEFORE slicing: the u64 from a non-safetensors file
        # (e.g. GGUF magic+version decodes to ~14 GB) would otherwise
        # materialize a giant bytes copy / MemoryError.
        if header_len > len(mm) - 8:
            raise ValueError(
                f"{path}: not a safetensors file (header length "
                f"{header_len} exceeds file size {len(mm)})"
            )
        try:
            header = json.loads(mm[8 : 8 + header_len].decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: not a safetensors file ({e})") from e
    base = 8 + header_len
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        start, end = info["data_offsets"]
        shape = info["shape"]
        st_dtype = info["dtype"]
        # frombuffer(mm, offset=...) is a true zero-copy view into the map;
        # slicing the mmap (mm[a:b]) would materialize a bytes COPY of every
        # tensor and double peak host memory on multi-GB checkpoints.
        if st_dtype == "BF16":
            # numpy lacks bf16: widen via bit manipulation to f32.
            n = (end - start) // 2
            raw16 = np.frombuffer(mm, np.uint16, n, offset=base + start)
            arr = (raw16.astype(np.uint32) << 16).view(np.float32).reshape(shape)
        else:
            dt = np.dtype(_ST_DTYPES[st_dtype])
            n = (end - start) // dt.itemsize
            arr = np.frombuffer(mm, dt, n, offset=base + start).reshape(shape)
        out[name] = arr
    return out


def _stack(layer_dicts):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_dicts)


def _lin(w: np.ndarray, dtype) -> jnp.ndarray:
    """HF stores linear weights [out, in]; we use [in, out]."""
    return jnp.asarray(np.ascontiguousarray(w.T), dtype=dtype)


def params_from_hf_tensors(
    t: Dict[str, np.ndarray], cfg: WhisperConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Map HF whisper weight names ('model.encoder.layers.0....') to pytree."""

    def g(name):
        if name in t:
            return t[name]
        # Some exports drop the leading 'model.' prefix.
        alt = name[len("model.") :] if name.startswith("model.") else "model." + name
        return t[alt]

    def attn(prefix, px=""):
        d = {
            f"{px}q_w": _lin(g(f"{prefix}.q_proj.weight"), dtype),
            f"{px}q_b": jnp.asarray(g(f"{prefix}.q_proj.bias"), dtype),
            f"{px}k_w": _lin(g(f"{prefix}.k_proj.weight"), dtype),
            f"{px}v_w": _lin(g(f"{prefix}.v_proj.weight"), dtype),
            f"{px}v_b": jnp.asarray(g(f"{prefix}.v_proj.bias"), dtype),
            f"{px}o_w": _lin(g(f"{prefix}.out_proj.weight"), dtype),
            f"{px}o_b": jnp.asarray(g(f"{prefix}.out_proj.bias"), dtype),
        }
        return d

    def ln(name, gk, bk):
        return {
            gk: jnp.asarray(g(f"{name}.weight"), dtype),
            bk: jnp.asarray(g(f"{name}.bias"), dtype),
        }

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        d = {}
        d.update(attn(f"{p}.self_attn"))
        d.update(ln(f"{p}.self_attn_layer_norm", "attn_ln_g", "attn_ln_b"))
        d["fc1_w"] = _lin(g(f"{p}.fc1.weight"), dtype)
        d["fc1_b"] = jnp.asarray(g(f"{p}.fc1.bias"), dtype)
        d["fc2_w"] = _lin(g(f"{p}.fc2.weight"), dtype)
        d["fc2_b"] = jnp.asarray(g(f"{p}.fc2.bias"), dtype)
        d.update(ln(f"{p}.final_layer_norm", "mlp_ln_g", "mlp_ln_b"))
        enc_layers.append(d)

    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        d = {}
        d.update(attn(f"{p}.self_attn"))
        d.update(ln(f"{p}.self_attn_layer_norm", "attn_ln_g", "attn_ln_b"))
        xa = attn(f"{p}.encoder_attn", "x")
        d.update(xa)
        d.update(ln(f"{p}.encoder_attn_layer_norm", "xattn_ln_g", "xattn_ln_b"))
        d["fc1_w"] = _lin(g(f"{p}.fc1.weight"), dtype)
        d["fc1_b"] = jnp.asarray(g(f"{p}.fc1.bias"), dtype)
        d["fc2_w"] = _lin(g(f"{p}.fc2.weight"), dtype)
        d["fc2_b"] = jnp.asarray(g(f"{p}.fc2.bias"), dtype)
        d.update(ln(f"{p}.final_layer_norm", "mlp_ln_g", "mlp_ln_b"))
        dec_layers.append(d)

    try:
        enc_pos = jnp.asarray(g("model.encoder.embed_positions.weight"), jnp.float32)
    except KeyError:
        enc_pos = jnp.asarray(sinusoids(cfg.max_source_positions, cfg.d_model))

    # HF conv weight layout: [out, in, width] -> ours [width, in, out].
    def conv(name):
        w = g(f"{name}.weight")
        return (
            jnp.asarray(np.ascontiguousarray(w.transpose(2, 1, 0)), dtype),
            jnp.asarray(g(f"{name}.bias"), dtype),
        )

    c1w, c1b = conv("model.encoder.conv1")
    c2w, c2b = conv("model.encoder.conv2")

    params = {
        "encoder": {
            "conv1_w": c1w,
            "conv1_b": c1b,
            "conv2_w": c2w,
            "conv2_b": c2b,
            "pos": enc_pos,
            "layers": _stack(enc_layers),
            **ln("model.encoder.layer_norm", "ln_g", "ln_b"),
        },
        "decoder": {
            "tok_emb": jnp.asarray(g("model.decoder.embed_tokens.weight"), dtype),
            "pos_emb": jnp.asarray(g("model.decoder.embed_positions.weight"), dtype),
            "layers": _stack(dec_layers),
            **ln("model.decoder.layer_norm", "ln_g", "ln_b"),
        },
    }
    return params


def load_safetensors(path: str, cfg: WhisperConfig, dtype=jnp.float32):
    return params_from_hf_tensors(read_safetensors(path), cfg, dtype)


def init_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params with the exact checkpoint structure (tests/bench)."""
    rng = np.random.default_rng(seed)
    D, V = cfg.d_model, cfg.vocab_size
    F = 4 * D

    def w(*shape, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(shape[0]))
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype
        )

    def zeros(*shape):
        return jnp.zeros(shape, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    def attn_p(px=""):
        return {
            f"{px}q_w": w(D, D),
            f"{px}q_b": zeros(D),
            f"{px}k_w": w(D, D),
            f"{px}v_w": w(D, D),
            f"{px}v_b": zeros(D),
            f"{px}o_w": w(D, D),
            f"{px}o_b": zeros(D),
        }

    def enc_layer():
        return {
            **attn_p(),
            "attn_ln_g": ones(D),
            "attn_ln_b": zeros(D),
            "fc1_w": w(D, F),
            "fc1_b": zeros(F),
            "fc2_w": w(F, D),
            "fc2_b": zeros(D),
            "mlp_ln_g": ones(D),
            "mlp_ln_b": zeros(D),
        }

    def dec_layer():
        return {
            **enc_layer(),
            **attn_p("x"),
            "xattn_ln_g": ones(D),
            "xattn_ln_b": zeros(D),
        }

    return {
        "encoder": {
            "conv1_w": w(3, cfg.num_mel_bins, D, scale=0.05),
            "conv1_b": zeros(D),
            "conv2_w": w(3, D, D, scale=0.05),
            "conv2_b": zeros(D),
            "pos": jnp.asarray(sinusoids(cfg.max_source_positions, D)),
            "layers": _stack([enc_layer() for _ in range(cfg.encoder_layers)]),
            "ln_g": ones(D),
            "ln_b": zeros(D),
        },
        "decoder": {
            "tok_emb": w(V, D, scale=0.02),
            "pos_emb": w(cfg.max_target_positions, D, scale=0.02),
            "layers": _stack([dec_layer() for _ in range(cfg.decoder_layers)]),
            "ln_g": ones(D),
            "ln_b": zeros(D),
        },
    }


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def fuse_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse each layer stack's self-attention Q/K/V into one tensor.

    ``q_w``/``k_w``/``v_w`` [L, D, D] -> ``qkv_w`` [L, D, 3, D] (axis 2 =
    which projection, so tensor-parallel sharding of the last axis keeps
    Megatron head-sharding semantics for all three at once), and
    ``q_b``/``v_b`` -> ``qkv_b`` [L, 3, D] with zeros in the K slot
    (whisper's k_proj has no bias).  The per-token decode step then streams
    one weight tensor and issues one matmul instead of three
    (:func:`~norma_tpu.model.whisper.qkv_proj`).

    Also handles already-int8 layers (``q_w_q``/``q_w_s`` from
    :func:`~norma_tpu.model.quant.quantize_decoder`): per-out-channel
    scales stack the same way.  Idempotent; cross-attention projections
    are untouched (their K/V precompute in ``cross_kv`` is already one
    batched einsum).
    """

    def fuse_stack(layers: Dict[str, Any]) -> Dict[str, Any]:
        layers = dict(layers)
        if "q_w" in layers:
            qkv_w = jnp.stack(
                [layers.pop("q_w"), layers.pop("k_w"), layers.pop("v_w")],
                axis=2,
            )
            v_b = layers.pop("v_b")
            qkv_b = jnp.stack(
                [layers.pop("q_b"), jnp.zeros_like(v_b), v_b], axis=1
            )
            layers["qkv_w"] = qkv_w
            layers["qkv_b"] = qkv_b
        elif "q_w_q" in layers:
            layers["qkv_w_q"] = jnp.stack(
                [layers.pop("q_w_q"), layers.pop("k_w_q"), layers.pop("v_w_q")],
                axis=2,
            )
            layers["qkv_w_s"] = jnp.stack(
                [layers.pop("q_w_s"), layers.pop("k_w_s"), layers.pop("v_w_s")],
                axis=1,
            )
            v_b = layers.pop("v_b")
            layers["qkv_b"] = jnp.stack(
                [layers.pop("q_b"), jnp.zeros_like(v_b), v_b], axis=1
            )
        return layers

    out = dict(params)
    for part in ("encoder", "decoder"):
        sec = dict(out[part])
        sec["layers"] = fuse_stack(sec["layers"])
        out[part] = sec
    return out
