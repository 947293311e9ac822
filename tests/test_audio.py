"""Audio-layer tests: packer/ring protocol, resampler, conversion, ranking."""

import numpy as np
import pytest

from norma_tpu.audio import (
    Packer,
    StreamingResampler,
    SupportedConfig,
    rank_configs,
    select_device,
    to_float,
)
from norma_tpu.errors import DeviceError, SelectedDeviceNotFound
from norma_tpu.input import OnError, Settings
from norma_tpu.runtime.channels import RecycledRing


# -- Packer / ring (reference: lib.rs:224-262) ------------------------------


def test_packer_chunking_and_final():
    ring = RecycledRing(5, chunk_len=100)
    p = Packer(ring)
    p.append(np.ones(250, np.float32))
    p.close()  # pops one sample -> final chunk of 49

    lens = []
    finals = []
    ring.close()
    while (c := ring.recv()) is not None:
        lens.append(c.length)
        finals.append(c.is_final)
        ring.release(c)
    assert lens == [100, 100, 49]
    assert finals == [False, False, True]


def test_packer_close_on_exactly_full():
    """A buffer holding exactly chunk_len must still emit len<capacity."""
    ring = RecycledRing(5, chunk_len=100)
    p = Packer(ring)
    p.append(np.ones(100, np.float32))  # flushed on next append only
    p.close()
    ring.close()
    lens = []
    while (c := ring.recv()) is not None:
        lens.append((c.length, c.is_final))
        ring.release(c)
    # append filled the buffer without flushing; close pops one -> 99, final.
    assert lens == [(99, True)]


def test_ring_lossy_drop():
    ring = RecycledRing(2, chunk_len=10)
    sent = sum(ring.try_send(np.zeros(10, np.float32), 10) for _ in range(5))
    assert sent == 2
    assert ring.dropped == 3


# -- sample conversion (reference: dtype.rs / dasp to_sample) ---------------


def test_to_float_formats():
    assert to_float(np.array([0, 16384, -16384], np.int16)) == pytest.approx(
        [0.0, 0.5, -0.5]
    )
    assert to_float(np.array([128, 255, 0], np.uint8)) == pytest.approx(
        [0.0, 127 / 128, -1.0]
    )
    assert to_float(np.array([0.25], np.float32)) == pytest.approx([0.25])


# -- resampler (reference: lib.rs:189-216) ----------------------------------


@pytest.mark.parametrize("src,dst", [(48_000, 16_000), (44_100, 16_000), (8_000, 16_000)])
def test_resampler_preserves_tone(src, dst):
    f = 440.0
    t = np.arange(int(src * 1.0)) / src
    x = np.sin(2 * np.pi * f * t)
    r = StreamingResampler(src, dst)
    out = np.concatenate(
        [r.process(x[i : i + 4800]) for i in range(0, len(x), 4800)]
    )
    # Expected output length ~ dst samples (minus startup/tail)
    assert abs(len(out) - dst) < dst * 0.02 + 200
    # Dominant frequency must be preserved.
    skip = 400  # startup transient
    seg = out[skip : skip + 8192]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * dst / len(seg)
    assert abs(peak - f) < 5.0
    # Amplitude preserved within 5%.
    assert np.abs(seg).max() == pytest.approx(1.0, abs=0.05)


def test_resampler_rejects_aliases():
    """Content above the target Nyquist must be strongly attenuated, not
    folded back into the band (the point of the 128-tap sinc filter)."""
    src, dst = 48_000, 16_000
    t = np.arange(src) / src
    inband = np.sin(2 * np.pi * 5_000 * t)  # below 8k Nyquist
    alias = np.sin(2 * np.pi * 13_000 * t)  # would fold to 3k
    r1, r2 = StreamingResampler(src, dst), StreamingResampler(src, dst)
    out_in = r1.process(inband)[400:]
    out_alias = r2.process(alias)[400:]
    rms_in = np.sqrt(np.mean(out_in**2))
    rms_alias = np.sqrt(np.mean(out_alias**2))
    assert rms_in > 0.5  # in-band passes (~0.707 for unit sine)
    assert rms_alias < rms_in * 0.05  # >26 dB alias rejection


def test_resampler_streaming_equals_oneshot():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(20_000)
    a = StreamingResampler(48_000, 16_000)
    out_stream = np.concatenate(
        [a.process(x[i : i + 1000]) for i in range(0, len(x), 1000)]
    )
    b = StreamingResampler(48_000, 16_000)
    out_once = b.process(x)
    n = min(len(out_stream), len(out_once))
    np.testing.assert_allclose(out_stream[:n], out_once[:n], atol=1e-9)


# -- device config ranking (reference: cmp_mic_config, lib.rs:559-600) ------


def _cfg(minr, maxr, fmt, ch):
    return SupportedConfig(minr, maxr, fmt, ch)


def test_rank_prefers_model_rate_support():
    a = _cfg(8_000, 48_000, "i16", 2)  # supports 16k
    b = _cfg(44_100, 48_000, "f32", 1)  # does not
    ranked = rank_configs([b, a], 16_000, np.float32)
    assert ranked[-1] == a  # best last (popped from tail)


def test_rank_prefers_matching_format_when_rate_supported():
    a = _cfg(8_000, 48_000, "i16", 1)
    b = _cfg(8_000, 48_000, "f32", 1)
    ranked = rank_configs([a, b], 16_000, np.float32)
    assert ranked[-1] == b


def test_rank_fallback_prefers_f64_then_float_then_mono():
    a = _cfg(44_100, 48_000, "i16", 1)
    b = _cfg(44_100, 48_000, "f32", 2)
    c = _cfg(44_100, 48_000, "f64", 2)
    ranked = rank_configs([a, b, c], 16_000, np.float32)
    assert ranked[-1] == c
    assert ranked[-2] == b


def test_rank_mono_tiebreak():
    a = _cfg(8_000, 48_000, "f32", 2)
    b = _cfg(8_000, 48_000, "f32", 1)
    ranked = rank_configs([a, b], 16_000, np.float32)
    assert ranked[-1] == b


def test_pick_rate():
    assert _cfg(8_000, 48_000, "f32", 1).pick_rate(16_000) == 16_000
    assert _cfg(44_100, 48_000, "f32", 1).pick_rate(16_000) == 48_000


# -- device selection policy (reference: lib.rs:508-525) --------------------


def test_select_device_policies():
    devs = ["usb-mic", "builtin"]
    assert select_device(devs, Settings(), "builtin") == "builtin"
    assert select_device(devs, Settings(selected_device="usb-mic"), "builtin") == "usb-mic"
    assert (
        select_device(devs, Settings(selected_device="nope"), "builtin") == "builtin"
    )
    with pytest.raises(SelectedDeviceNotFound):
        select_device(
            devs, Settings(selected_device="nope", on_error=OnError.ERROR), "builtin"
        )
    with pytest.raises(DeviceError):
        select_device(devs, Settings(), None)


# -- Sources / pipeline robustness (round-3 review fixes) --------------------


def test_failing_source_still_fires_on_end():
    """A source whose block generator raises mid-stream must still fire
    on_end — without it the pipeline never closes the ring and the
    consumer blocks forever."""
    import threading

    from norma_tpu.audio.sources import SyntheticSource

    class Exploding(SyntheticSource):
        def _next_block(self):
            raise RuntimeError("truncated file")

    src = Exploding(sample_rate=16_000, channels=1, duration=1.0)
    ended = threading.Event()
    src.start(lambda b: None, on_end=ended.set)
    assert ended.wait(timeout=5), "on_end never fired after source failure"
    src.stop()


def test_failing_on_data_still_fires_on_end():
    import threading

    from norma_tpu.audio.sources import SyntheticSource

    src = SyntheticSource(sample_rate=16_000, channels=1, duration=1.0)
    ended = threading.Event()

    def bad_on_data(block):
        raise ValueError("packer exploded")

    src.start(bad_on_data, on_end=ended.set)
    assert ended.wait(timeout=5)
    src.stop()


def test_synthetic_source_exact_duration():
    """The stream is EXACTLY duration*rate frames — the final block is
    clamped instead of overshooting by up to a full block."""
    import threading

    from norma_tpu.audio.sources import SyntheticSource

    got = []
    done = threading.Event()
    src = SyntheticSource(
        sample_rate=48_000, channels=2, duration=0.05, block_frames=1600
    )
    src.start(lambda b: got.append(len(b)), on_end=done.set)
    assert done.wait(timeout=5)
    src.stop()
    frames = sum(got) // 2  # interleaved stereo
    assert frames == int(0.05 * 48_000), frames


def test_file_source_24bit_wav(tmp_path):
    """24-bit PCM WAVs load (widened to int32) and round-trip the signal."""
    import wave

    from norma_tpu.audio.sources import FileSource

    sr = 16_000
    t = np.arange(sr // 10) / sr
    mono = (0.5 * np.sin(2 * np.pi * 440 * t) * (2**23 - 1)).astype(np.int32)
    b = np.zeros((len(mono), 3), np.uint8)
    u = mono.view(np.uint32) if mono.dtype == np.uint32 else mono.astype(np.int64)
    b[:, 0] = (u & 0xFF).astype(np.uint8)
    b[:, 1] = ((u >> 8) & 0xFF).astype(np.uint8)
    b[:, 2] = ((u >> 16) & 0xFF).astype(np.uint8)
    path = str(tmp_path / "t24.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(sr)
        w.writeframes(b.tobytes())

    src = FileSource(path)
    assert src.dtype == np.dtype(np.int32)
    blocks = []
    import threading

    done = threading.Event()
    src.start(blocks.append, on_end=done.set)
    assert done.wait(timeout=5)
    src.stop()
    out = np.concatenate(blocks)
    assert len(out) == len(mono)
    # Widened by <<8: exact per-sample equality after shifting back.
    np.testing.assert_array_equal(out >> 8, mono)


def test_file_source_rejects_unknown_width(tmp_path):
    from norma_tpu.audio.sources import FileSource

    path = str(tmp_path / "bad.wav")
    # Hand-craft a WAV header claiming a 5-byte sample width.
    import struct

    data = b"\x00" * 40
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 5, 5, 40)
        + b"data" + struct.pack("<I", len(data))
    )
    with open(path, "wb") as f:
        f.write(hdr + data)
    with pytest.raises((ValueError, Exception)):
        FileSource(path)


def test_pipeline_carries_partial_frames():
    """A block split mid-frame must not desynchronize the channel
    interleave: the partial frame is carried into the next block."""
    from norma_tpu.audio.pipeline import StreamPipeline

    class _Ring:
        chunk_len = 1600

        def send(self, *a, **k):
            pass

        def close(self):
            pass

    class _SplitSource:
        sample_rate = 16_000
        channels = 2
        dtype = np.dtype(np.float32)

        def __init__(self):
            self.on_data = None

        def start(self, on_data, on_end=None):
            self.on_data = on_data

        def stop(self):
            pass

    src = _SplitSource()
    ring = _Ring()
    pipe = StreamPipeline(src, 16_000, np.float32, ring)
    pipe.start()

    # Stereo signal: L channel = 1.0, R channel = 0.0 -> mono mean 0.5.
    frames = np.tile(np.asarray([1.0, 0.0], np.float32), 8)  # 8 frames
    out = []
    pipe.packer.append = lambda mono: out.append(np.array(mono))
    # Deliver split mid-frame: 5 samples then the rest.
    src.on_data(frames[:5])
    src.on_data(frames[5:])
    mono = np.concatenate(out)
    assert len(mono) == 8
    np.testing.assert_allclose(mono, 0.5)


def test_pipeline_eof_flushes_resampler_tail():
    """A finite resampled source must emit (almost) its full duration: the
    sinc filter's half-taps of pending history are flushed at EOF instead
    of silently dropped (review fix, pipeline.py _flush_resampler_tail)."""
    import threading

    from norma_tpu.audio.pipeline import StreamPipeline
    from norma_tpu.audio.sources import SyntheticSource
    from norma_tpu.runtime.channels import RecycledRing

    dur, model_rate = 0.1, 16_000
    src = SyntheticSource(sample_rate=48_000, channels=2, duration=dur)
    ring = RecycledRing(capacity=64, chunk_len=400)
    pipe = StreamPipeline(src, model_rate, np.float32, ring)
    pipe.start()

    total = 0
    while True:
        chunk = ring.recv(timeout=5)
        if chunk is None:
            break
        total += chunk.length
        ring.release(chunk)
    # packer.close() pops exactly one sample (EOS protocol); the resampler
    # startup transient costs a couple more.  Without the tail flush this
    # came out ~20 samples (half-taps/ratio) short.
    expect = int(dur * model_rate)
    assert expect - 4 <= total <= expect, total
    pipe.stop()  # releases the source after natural EOF; must be a no-op


def test_pipeline_stop_after_eof_releases_source_exactly_once():
    """stop() after a natural end still stops the source (file handles /
    worker threads are released) but must NOT re-run finalization (double
    packer.close would pop an extra sample and emit a second EOS chunk)."""
    import threading

    from norma_tpu.audio.pipeline import StreamPipeline
    from norma_tpu.runtime.channels import RecycledRing

    class SpySource:
        sample_rate = 16_000
        channels = 1
        dtype = np.dtype(np.float32)
        stop_calls = 0

        def start(self, on_data, on_end=None):
            on_data(np.zeros(1000, np.float32))
            on_end()

        def stop(self):
            self.stop_calls += 1

    src = SpySource()
    ring = RecycledRing(capacity=8, chunk_len=400)
    pipe = StreamPipeline(src, 16_000, np.float32, ring)
    pipe.start()  # SpySource delivers + ends synchronously
    pipe.stop()
    pipe.stop()  # idempotent
    assert src.stop_calls == 2  # source release is never skipped

    chunks = []
    while True:
        c = ring.recv(timeout=1)
        if c is None:
            break
        chunks.append(c.length)
    # 1000 samples - 1 (EOS pop) = 999: two full chunks + ONE short chunk.
    assert chunks == [400, 400, 199], chunks
