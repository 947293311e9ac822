"""Doc-example smoke test: the README quickstart shape runs end to end
(with an injected source and the mock model — no network/mic/TPU needed).
Mirrors the reference's crate-root doc test (lib.rs:16-52, `no_run` there;
actually executed here)."""

import threading
import time

import numpy as np

from norma_tpu import Transcriber
from norma_tpu.audio.sources import SyntheticSource
from norma_tpu.input import Settings
from norma_tpu.models.mock import MockDef


def test_readme_quickstart_shape():
    jh, th = Transcriber.blocking_spawn(MockDef())
    stream = th.blocking_start(
        Settings(
            source=SyntheticSource(
                sample_rate=48_000, channels=2, dtype=np.int16, realtime=False
            )
        )
    )

    seen = []
    t = threading.Thread(
        target=lambda: [seen.append(seg) for seg in stream], daemon=True
    )
    t.start()

    time.sleep(0.4)
    th.stop()
    th.close()
    t.join(timeout=10)

    assert seen
    jh.join(timeout=10)
