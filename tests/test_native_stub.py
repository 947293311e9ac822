"""Hermetic native ALSA path via the stub libasound (VERDICT r2 item 8).

The ranked config-negotiation + capture path previously skipped on hosts
without libasound; the stub (tests/stub_alsa/stub_asound.c) implements the
exact snd_* surface norma_audio.cpp dlopens, so enumeration, hw-params
query, ranked open and real blocking capture reads now execute everywhere.

The stub is injected with the NTA_ALSA_LIB env override, which dlopen
consults at AlsaFns.load() time — the checks run in a SUBPROCESS so a
host with a real libasound (already cached in this process) cannot mask
the stub.
"""

import subprocess

import pytest

from helpers import build_alsa_stub, run_stub_driver


@pytest.fixture(scope="module")
def stub_lib(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stub_alsa") / "libasound_stub.so")
    try:
        return build_alsa_stub(out)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"no C toolchain to build the ALSA stub: {e}")


DRIVER = r"""
import sys

sys.path.insert(0, sys.argv[1])
import numpy as np

from norma_tpu.audio.native import load
from norma_tpu.audio.native.alsa import (
    list_devices, open_native_mic, query_configs,
)
from norma_tpu.input import Settings

lib = load()
assert lib is not None, "native library unavailable"
assert lib.nta_alsa_available() == 1, "stub libasound not picked up"

devices = list_devices(lib)
assert "stubmic" in devices, devices

configs = query_configs(lib, "stubmic")
# 3 formats x 2 channel counts advertised by the stub.
assert len(configs) == 6, configs
fmts = {c.sample_format for c in configs}
assert fmts == {"i16", "i32", "f32"}, fmts
for c in configs:
    assert (c.min_sample_rate, c.max_sample_rate) == (16000, 48000)
    assert c.channels in (1, 2)

# PRODUCTION ranked open: f32 model at 16 kHz must negotiate the f32
# format (reference cmp_mic_config: 16k support > matching format > float,
# lib.rs:559-600) at the model rate with mono preferred.
pipeline, ring = open_native_mic(
    Settings(selected_device="stubmic"), 16000, np.float32,
    n_slots=8, chunk_len=1600,
)
chunks = []
for _ in range(3):
    c = ring.recv(timeout=2.0)
    assert c is not None, "no audio from stub capture"
    chunks.append(np.asarray(c.data, np.float32).copy())
pipeline.stop()
audio = np.concatenate(chunks)
rms = float(np.sqrt(np.mean(audio**2)))
# 440 Hz sine at 0.5 amplitude -> rms ~0.354 (resampler ramp-in lowers
# the first chunk a little).
assert 0.2 < rms < 0.6, rms
# Spectral peak at 440 Hz (sample rate 16 kHz after the capture path).
spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
peak_hz = float(np.argmax(spec)) * 16000.0 / audio.size
assert abs(peak_hz - 440.0) < 15.0, peak_hz
print("STUB-NATIVE-OK", rms, peak_hz)
"""


def test_ranked_negotiation_and_capture_via_stub(stub_lib):
    proc = run_stub_driver(DRIVER, stub_lib, timeout=120)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "STUB-NATIVE-OK" in proc.stdout, proc.stdout


def test_stub_rejects_unknown_device(stub_lib):
    driver = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "from norma_tpu.audio.native import load\n"
        "from norma_tpu.audio.native.alsa import query_configs\n"
        "lib = load(); assert lib is not None\n"
        "assert query_configs(lib, 'nonexistent-device') == []\n"
        "print('REJECT-OK')\n"
    )
    proc = run_stub_driver(driver, stub_lib, timeout=60)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "REJECT-OK" in proc.stdout