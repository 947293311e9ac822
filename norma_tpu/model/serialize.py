"""Pre-quantized checkpoint save/load (safetensors container).

The reference ships quantized checkpoints as GGUF q8_0 files and loads
them directly (``monolingual.rs:230-235`` via candle's quantized
VarBuilder) — quantization happens once, offline, and serving start-up
never touches float weights.  This module is the equivalent for OUR
quantized layout: the in-memory pytree that ``fuse_qkv`` +
``model.quant.quantize_*`` produce (per-out-channel int8 ``name_q`` /
``name_s`` stacks, fused QKV, optional int8/int4 logits heads) is
flattened to a safetensors file and loaded back structurally —
no HF-name mapping, no re-quantization, ~¼ the host I/O of the f32 file.

Format: standard safetensors (the reader in ``load.py`` already parses
it), tensor names are ``/``-joined pytree paths
(``decoder/layers/fc1_w_q``), and ``__metadata__`` carries
``{"norma_tpu_format": "params-v1", ...}`` — the marker
``models/whisper/loader.py`` auto-detects to skip the HF path.
Written via ``tools/quantize_checkpoint.py``.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_KEY = "norma_tpu_format"
FORMAT_V1 = "params-v1"

# numpy dtype (via ml_dtypes for bf16) <-> safetensors dtype tag.
_NP_TO_ST = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def _st_dtype(arr: np.ndarray) -> str:
    if arr.dtype.name == "bfloat16":  # ml_dtypes (what jax bf16 yields)
        return "BF16"
    try:
        return _NP_TO_ST[arr.dtype]
    except KeyError:
        raise ValueError(f"unsupported dtype for safetensors: {arr.dtype}")


def write_safetensors(
    path: str,
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write a safetensors file (LE u64 header length + JSON + raw bytes).

    Counterpart of :func:`~norma_tpu.model.load.read_safetensors`; bf16
    arrays (ml_dtypes) round-trip as BF16.
    """
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    for name, arr in tensors.items():
        # Offsets need only nbytes, so the header is complete before any
        # tensor bytes are materialized; the write loop below then streams
        # one tobytes() copy at a time instead of holding every blob
        # concurrently (which would double peak host memory on multi-GB
        # checkpoints — same concern read_safetensors fixes on the read
        # side with zero-copy views).
        header[name] = {
            "dtype": _st_dtype(arr),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + arr.nbytes],
        }
        offset += arr.nbytes
    hj = json.dumps(header, separators=(",", ":")).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for arr in tensors.values():
            f.write(np.ascontiguousarray(arr).tobytes())


def flatten_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Nested dict-of-dicts pytree -> flat {"a/b/c": host array}."""
    out: Dict[str, np.ndarray] = {}

    def walk(prefix: str, node: Any) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                if "/" in k:
                    # Hard format invariant (unflatten splits on '/'); a
                    # bare assert would vanish under -O and corrupt the
                    # saved tree silently.
                    raise ValueError(
                        f"param key {k!r} contains the path separator '/'"
                    )
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            out[prefix] = np.asarray(jax.device_get(node))

    walk("", params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of :func:`flatten_params`; leaves become jnp arrays."""
    root: Dict[str, Any] = {}
    for name, arr in flat.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return root


def save_params(
    path: str,
    params: Dict[str, Any],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    meta = {FORMAT_KEY: FORMAT_V1}
    if metadata:
        meta.update({k: str(v) for k, v in metadata.items()})
    write_safetensors(path, flatten_params(params), meta)


def _read_header(path: str) -> Tuple[int, Dict[str, Any]]:
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        raw = f.read(8)
        if len(raw) < 8:
            raise ValueError(f"{path}: too short to be a safetensors file")
        (header_len,) = struct.unpack("<Q", raw)
        # Validate BEFORE reading: the u64 from a non-safetensors file
        # (e.g. GGUF magic+version decodes to ~14 GB) would otherwise
        # drive a giant read/MemoryError instead of a clean error.
        if header_len > size - 8:
            raise ValueError(
                f"{path}: not a safetensors file (header length "
                f"{header_len} exceeds file size {size})"
            )
        try:
            return header_len, json.loads(f.read(header_len).decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: not a safetensors file ({e})") from e


def peek_format(path: str) -> Optional[Dict[str, str]]:
    """Return the file's ``__metadata__`` if it is a norma-tpu params file,
    else None (a plain HF checkpoint).  Reads only the JSON header."""
    _, header = _read_header(path)
    meta = header.get("__metadata__") or {}
    return meta if meta.get(FORMAT_KEY) else None


def load_params_file(path: str) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Load a params-v1 file -> (params pytree, metadata).

    ``read_safetensors`` widens BF16 to f32 (numpy has no bf16); leaves
    tagged BF16 in the header are narrowed back — exact, since widening
    bf16 bits to f32 is lossless.
    """
    from .load import read_safetensors

    # One header read serves the format check, the BF16-tag lookup AND the
    # tensor read below (quantized stacked-layer headers enumerate every
    # tensor; parsing the JSON repeatedly is measurable on large models).
    header_len, header = _read_header(path)
    meta = header.get("__metadata__") or {}
    if not meta.get(FORMAT_KEY):
        raise ValueError(
            f"{path}: not a norma-tpu params file (missing {FORMAT_KEY!r}"
            " metadata)"
        )
    if meta[FORMAT_KEY] != FORMAT_V1:
        raise ValueError(
            f"{path}: unsupported {FORMAT_KEY}={meta[FORMAT_KEY]!r}"
        )
    flat = {}
    for name, arr in read_safetensors(
        path, _parsed=(header_len, header)
    ).items():
        x = jnp.asarray(arr)
        if header[name]["dtype"] == "BF16":
            x = x.astype(jnp.bfloat16)
        flat[name] = x
    return unflatten_params(flat), meta
