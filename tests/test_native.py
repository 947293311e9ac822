"""Native (C++) audio runtime tests: build, ring, packer, resampler, mixdown.

Skipped wholesale if no C++ toolchain is available.
"""

import threading
import time

import numpy as np
import pytest

from norma_tpu.audio.native import load

lib = load()
pytestmark = pytest.mark.skipif(lib is None, reason="native toolchain unavailable")


def test_native_ring_roundtrip_and_drop():
    from norma_tpu.audio.native.wrappers import NativeRing

    ring = NativeRing(3, 100)
    for i in range(5):
        ring.try_send(np.full(100, float(i), np.float32), 100)
    # 3 slots -> 2 dropped
    assert ring.dropped == 2
    vals = []
    for _ in range(3):
        c = ring.recv(timeout=1.0)
        vals.append(float(c.data[0]))
        ring.release(c)
    assert vals == [0.0, 1.0, 2.0]
    ring.close()
    assert ring.recv(timeout=0.2) is None


def test_native_ring_cross_thread_final_chunk():
    from norma_tpu.audio.native.wrappers import NativeRing

    ring = NativeRing(8, 50)
    lib_local = lib

    def producer():
        p = lib_local.nta_packer_new(ring.ptr)
        data = np.arange(120, dtype=np.float32)
        import ctypes

        fp = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        lib_local.nta_packer_append(p, fp, 120)
        lib_local.nta_packer_close(p)  # pops one -> final chunk of 19
        lib_local.nta_packer_free(p)
        ring.close()

    t = threading.Thread(target=producer)
    t.start()
    out = []
    while (c := ring.recv(timeout=2.0)) is not None:
        out.append((c.length, c.is_final))
        ring.release(c)
    t.join()
    assert out == [(50, False), (50, False), (19, True)]


def test_native_resampler_matches_python():
    from norma_tpu.audio.native.wrappers import NativeResampler
    from norma_tpu.audio.resample import StreamingResampler

    rng = np.random.default_rng(0)
    x = rng.standard_normal(12_000).astype(np.float32)

    py = StreamingResampler(48_000, 16_000)
    nat = NativeResampler(48_000, 16_000)

    out_py = np.concatenate([py.process(x[i : i + 1000]) for i in range(0, len(x), 1000)])
    out_nat = np.concatenate([nat.process(x[i : i + 1000]) for i in range(0, len(x), 1000)])
    n = min(len(out_py), len(out_nat))
    assert n > 3500
    # f32 vs f64 accumulation: allow small tolerance.
    np.testing.assert_allclose(out_py[:n], out_nat[:n], atol=2e-5)


def test_native_mixdown_formats():
    from norma_tpu.audio.native.wrappers import native_mixdown
    from norma_tpu.audio.pipeline import to_float

    rng = np.random.default_rng(1)
    for fmt, dtype in [("i16", np.int16), ("f32", np.float32), ("u8", np.uint8)]:
        if np.issubdtype(dtype, np.integer):
            info = np.iinfo(dtype)
            raw = rng.integers(info.min, info.max, size=400).astype(dtype)
        else:
            raw = rng.standard_normal(400).astype(dtype)
        got = native_mixdown(raw, 2, fmt)
        want = to_float(raw).reshape(-1, 2).mean(axis=1)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_alsa_gracefully_unavailable_or_lists():
    from norma_tpu.audio.native import alsa

    devs = alsa.list_devices()
    assert isinstance(devs, list)  # [] on hosts without libasound
