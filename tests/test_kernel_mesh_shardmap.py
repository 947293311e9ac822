"""dp-mesh kernel carry (VERDICT r4 #2): the Pallas kernel operating point
must survive a data-parallel mesh.

r4's kernel×mesh guard fell back to XLA twins whenever params spanned >1
device — forfeiting the measured kernel wins for ANY multi-chip layout,
including pure dp where each device holds full weights and the kernels'
batch-major grid shards trivially.  r5 carries the kernels onto dp meshes
via ``jax.shard_map``: each device runs the hardware-validated
single-device program on its local rows (``DecodeEngine(mesh=...)``).

These tests run the kernel layouts in Pallas interpret mode on the CPU
mesh (hardware gates: tools/verify_*_tpu.py) and pin:
  - kernel impls are RETAINED (not overridden) on a dp-only mesh and the
    shard_mapped program produces tokens identical to the same kernel
    program on one device;
  - tp-sharded params still take the XLA-twin fallback with the warning;
  - non-dp-divisible batches fall back to the GSPMD twin program;
  - heterogeneous placement cannot bypass the guard (ADVICE r4).
"""

import logging

import jax
import numpy as np
import pytest

from helpers import (
    TEST_LANG_IDS,
    TEST_ST,
    ToyTokenizer,
    confident_params,
    texty_config,
)
from norma_tpu.decode import DecodeEngine
from norma_tpu.parallel import make_mesh, shard_batch, shard_params
from norma_tpu.utils import params_device_count

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2+ virtual devices"
)

KCFG_KW = dict(
    encoder_attn_impl="jax_flash",
    cross_kv_impl="kernel",
    self_kv_impl="kernel",
)


@pytest.fixture()
def interp_escapes(monkeypatch):
    # Kernel layouts run off-TPU in Pallas interpret mode via these
    # escapes (read at engine construction / trace time).
    monkeypatch.setenv("NORMA_XKV_KERNEL_INTERPRET", "1")
    monkeypatch.setenv("NORMA_SELF_KERNEL_INTERPRET", "1")


def _audio(b=8, seconds=1.0):
    rng = np.random.default_rng(0)
    sr = 16_000
    t = np.arange(int(sr * seconds)) / sr
    base = 0.1 * np.sin(2 * np.pi * 330.0 * t)
    return np.stack(
        [
            (base + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
            for _ in range(b)
        ]
    )


def _tokens(results):
    return [None if r is None else r.tokens for r in results]


def test_dp_mesh_carries_kernels_and_matches_single_device(
    interp_escapes, caplog
):
    cfg = texty_config(**KCFG_KW)
    params = confident_params(cfg)

    # Single-device engine running the SAME kernel impls (interpret mode):
    # the ground truth the shard_mapped program must reproduce bitwise
    # (greedy rung-0 accepts everywhere with confident_params; both sides
    # take the sequential arm at these row counts).
    e_one = DecodeEngine(
        params, cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, quantize_cross_kv=True,
    )
    assert e_one.cfg.cross_kv_impl == "kernel"  # no guard on one device
    from norma_tpu.frontend.mel import prepare_audio

    import jax.numpy as jnp

    raw = _audio(8)
    n_frames = 2 * cfg.max_source_positions
    audio = np.stack([prepare_audio(a, n_frames=n_frames) for a in raw])
    langs = np.full(8, TEST_LANG_IDS[0], np.int32)
    want, _ = e_one.transcribe_window(jnp.asarray(audio), langs, seed=0)

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    with caplog.at_level(logging.WARNING, logger="norma_tpu.decode.engine"):
        e_dp = DecodeEngine(
            shard_params(params, mesh), cfg, TEST_ST,
            language_token_ids=TEST_LANG_IDS, quantize_cross_kv=True,
            mesh=mesh,
        )
    # Carried: kernel config retained for the shard_mapped ladder; the
    # twin fallback only backs the non-shard_mapped programs; and the
    # kernel×mesh WARNING must not fire (it is a dp-carry, not a guard).
    assert e_dp._dp_mesh is mesh
    assert e_dp._kernel_cfg.cross_kv_impl == "kernel"
    assert e_dp._kernel_cfg.self_kv_impl == "kernel"
    assert e_dp._kernel_cfg.encoder_attn_impl == "jax_flash"
    assert e_dp.cfg.cross_kv_impl == "einsum"  # GSPMD programs use twins
    assert not [r for r in caplog.records if r.levelno >= logging.WARNING]

    got, _ = e_dp.transcribe_window(
        shard_batch(audio, mesh), langs, seed=0
    )
    assert _tokens(got) == _tokens(want)


def test_dp_mesh_detect_path_carries(interp_escapes):
    cfg = texty_config(**KCFG_KW)
    params = confident_params(cfg)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    e_dp = DecodeEngine(
        shard_params(params, mesh), cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, quantize_cross_kv=True,
        mesh=mesh,
    )
    from norma_tpu.frontend.mel import prepare_audio

    n_frames = 2 * cfg.max_source_positions
    audio = np.stack(
        [prepare_audio(a, n_frames=n_frames) for a in _audio(4)]
    )
    langs = np.full(4, -1, np.int32)  # in-graph detection, all rows
    out, info = e_dp.transcribe_window(shard_batch(audio, mesh), langs, seed=0)
    assert len(out) == 4
    assert all(int(l) in TEST_LANG_IDS for l in info["langs"])


def test_tp_sharded_params_still_fall_back(interp_escapes, caplog):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices for dp=2 tp=2")
    cfg = texty_config(**KCFG_KW)
    params = confident_params(cfg)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    with caplog.at_level(logging.WARNING, logger="norma_tpu.decode.engine"):
        e = DecodeEngine(
            shard_params(params, mesh), cfg, TEST_ST,
            language_token_ids=TEST_LANG_IDS, mesh=mesh,
        )
    assert e._dp_mesh is None
    assert e.cfg.cross_kv_impl == "einsum"
    assert e.cfg.self_kv_impl == "xla"
    assert any(
        "falling back to XLA twins" in r.getMessage()
        for r in caplog.records
    )


def test_non_divisible_batch_uses_gspmd_twin(interp_escapes):
    cfg = texty_config(**KCFG_KW)
    params = confident_params(cfg)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    e_dp = DecodeEngine(
        shard_params(params, mesh), cfg, TEST_ST,
        language_token_ids=TEST_LANG_IDS, mesh=mesh,
    )
    from norma_tpu.frontend.mel import prepare_audio

    import jax.numpy as jnp

    n_frames = 2 * cfg.max_source_positions
    audio = prepare_audio(_audio(1)[0], n_frames=n_frames)[None]
    out, _ = e_dp.transcribe_window(  # B=1 not divisible by dp=2
        jnp.asarray(audio), [TEST_LANG_IDS[0]], seed=0
    )
    assert len(out) == 1 and out[0] is not None


def test_heterogeneous_placement_counts_max_devices():
    # ADVICE r4: a small leaf committed to one device must not mask the
    # mesh-spanning weights from the guard.
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    from jax.sharding import NamedSharding, PartitionSpec as P

    one = jax.device_put(np.zeros(4, np.float32), jax.devices()[0])
    wide = jax.device_put(
        np.zeros((4, 4), np.float32), NamedSharding(mesh, P(None, "tp"))
    )
    assert params_device_count({"a": one, "b": wide}) == 2
