"""File-source EOF semantics: the stream finalizes without stop()."""

import time
import wave

import numpy as np

from norma_tpu import Transcriber
from norma_tpu.audio.sources import FileSource
from norma_tpu.input import Settings
from norma_tpu.models.mock import FINAL_MSG, MSG, MockDef


def _write_wav(path, seconds=0.7, sr=16_000):
    t = np.arange(int(seconds * sr)) / sr
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_eof_finalizes_stream_and_allows_restart(tmp_path):
    path = tmp_path / "tone.wav"
    _write_wav(path)

    jh, th = Transcriber.blocking_spawn(MockDef())
    stream = th.blocking_start(Settings(source=FileSource(str(path))))

    # No stop(): EOF must flush the final chunk and close the channel.
    res = list(stream)
    assert res, "expected messages from the file stream"
    assert res.count(FINAL_MSG) == 1
    for m in res:
        assert m in (MSG, FINAL_MSG)

    # The keepalive must have been cleared: a new start succeeds.
    deadline = time.time() + 5
    stream2 = None
    while time.time() < deadline:
        try:
            stream2 = th.blocking_start(Settings(source=FileSource(str(path))))
            break
        except Exception:
            time.sleep(0.05)
    assert stream2 is not None
    res2 = list(stream2)
    assert res2.count(FINAL_MSG) == 1

    th.close()
    jh.join(timeout=10)
