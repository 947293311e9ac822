"""Device-mesh parallelism: sharding specs for the Whisper pytree.

The reference has no distributed layer at all (SURVEY.md §2c); its survey
mandates that the TPU build express weights with ``jax.sharding`` so
multi-core tensor parallelism over ICI is a mesh-config change, not a
rewrite.  This module provides exactly that:

  - ``make_mesh(dp, tp)``      — data-parallel axis over concurrent streams,
    tensor-parallel axis over attention heads / FFN (Megatron layout)
  - ``param_shardings(params)`` — NamedSharding per leaf; GSPMD inserts the
    all-reduces (psum over 'tp') at the o_proj/fc2 boundaries automatically
  - ``shard_params`` / ``shard_batch`` — placement helpers

Everything downstream (DecodeEngine, the batching scheduler) is written
batched and jit-compiled, so running SPMD is just: put params with these
shardings, put inputs with a 'dp' batch sharding, call the same functions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1, tp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Megatron-style tensor parallelism over the stacked-layer pytree.
# Keys are leaf names inside a layer dict; specs include the leading L axis.
_COL = ("q_w", "k_w", "v_w", "xq_w", "xk_w", "xv_w", "fc1_w")  # shard out-dim
_COL_B = ("q_b", "v_b", "xq_b", "xv_b", "fc1_b")  # shard bias
_ROW = ("o_w", "xo_w", "fc2_w")  # shard in-dim
# Fused QKV (load.fuse_qkv): [L, D, 3, D] — sharding the LAST axis keeps
# Megatron head-sharding for q, k and v simultaneously (axis 2 indexes
# which projection, so head boundaries never straddle ranks).
_QKV_W = P(None, None, None, "tp")
_QKV_B = P(None, None, "tp")  # [L, 3, D]


def _layer_leaf_spec(name: str) -> P:
    # int8 variants (quantize_decoder): name_q shards like the base weight;
    # name_s is per-out-channel and follows the out dim.
    if name == "qkv_w" or name == "qkv_w_q":
        return _QKV_W
    if name in ("qkv_b", "qkv_w_s"):
        return _QKV_B
    if name.endswith("_q"):
        base = name[:-2]
        if base in _COL:
            return P(None, None, "tp")
        if base in _ROW:
            return P(None, "tp", None)
    if name.endswith("_s"):
        base = name[:-2]
        if base in _COL:
            return P(None, "tp")
        if base in _ROW:
            return P()  # scales over the un-sharded out dim: replicated
    if name in _COL:
        return P(None, None, "tp")
    if name in _COL_B:
        return P(None, "tp")
    if name in _ROW:
        return P(None, "tp", None)
    return P()  # LN params, o_b/fc2_b: replicated


def param_shardings(params, mesh: Mesh):
    """Build a NamedSharding pytree matching ``params``."""

    def spec_for(path, leaf) -> P:
        keys = [getattr(p, "key", None) for p in path]
        if "layers" in keys:
            return _layer_leaf_spec(keys[-1])
        # Quantized logits heads: shard the vocab axis over tp (the head
        # is the single largest per-token weight read; each rank streams
        # its vocab slice and GSPMD gathers the [B, V] logits).
        if "tok_emb_q8" in keys:
            # q [D, V], s [V]
            return P(None, "tp") if keys[-1] == "q" else P("tp")
        if "tok_emb_q4" in keys:
            # REPLICATED: the int4 head runs as a Pallas (Mosaic) custom
            # call on TPU, which GSPMD cannot partition — a sharded spec
            # would force an all-gather of the packed head every step (or
            # fail to compile).  int8 is the tp-recommended quantized head;
            # int4 stays a single-chip memory lever.
            return P()
        if keys[-1] == "tok_emb":
            # Row-parallel (Megatron) tied embedding, D axis over tp: the
            # bf16 logits head is the single largest per-token weight read
            # ([V, D], ~133 MB for large-v3), so each rank streams D/tp of
            # it and GSPMD psums the [B, V] logits partials (~200 KB).
            # The token-embedding gather needs no collective under this
            # layout (every rank holds all V rows of its D slice).
            return P(None, "tp")
        # conv weights, positional embeddings, final LN: replicated (small
        # relative to the layer stack).
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (stream/batch) axis over 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
