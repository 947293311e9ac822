"""Serve many WAV files concurrently on one chip (continuous batching).

Usage: python examples/multi_stream.py a.wav b.wav ... [--ckpt DIR]

Each file becomes one stream; the BatchedTranscriber pads the ready set
into one compiled program per decode round, so 8 streams cost roughly one.
"""

import sys
import threading

from norma_tpu import BatchedTranscriber
from norma_tpu.audio.sources import FileSource
from norma_tpu.input import Settings
from norma_tpu.models import SelectedDevice
from norma_tpu.models.whisper import monolingual


def main() -> None:
    args = sys.argv[1:]
    local_dir = None
    if "--ckpt" in args:
        i = args.index("--ckpt")
        local_dir = args[i + 1]
        del args[i : i + 2]

    definition = monolingual.Definition(
        monolingual.ModelType.DISTIL_LARGE_EN_V3,
        SelectedDevice.auto(),
        local_dir=local_dir,
        timestamps=True,
        # Throughput-first serving knobs (all opt-in; each trades a small,
        # measured accuracy delta — PERF.md "Levers"):
        #   quantize_decoder=True   (int8 decoder weights, -15% window)
        #   quantize_encoder=True   (int8-MXU encoder projections)
        #   quantize_cross_kv=True  (int8 cross-K/V; small-batch knob)
        #   quantize_self_kv=True   (int8 self-KV cache; long-mtp knob)
        #   config_overrides={"encoder_attn_impl": "jax_flash"}
        #                           (batched encoder win; the hook for
        #                           every WhisperConfig-level knob)
    )
    model = definition.blocking_try_to_model()

    bt = BatchedTranscriber(
        model,
        max_streams=max(len(args), 1),
        # r5 latency posture: rounds auto-size so predicted queue wait
        # meets the SLA (metrics()["sla"] shows the live cap), and each
        # stream's first window decodes ~0.4 s after admission instead
        # of after a full chunk period (docs/serving.md "Latency knobs").
        target_p99_ms=800.0,
        first_partial_seconds=0.4,
    )
    # Compile every batch bucket the scheduler can dispatch up front, so
    # no live round pays a mid-stream XLA compile.
    bt.warmup()
    handles = [
        (path, bt.blocking_start(Settings(source=FileSource(path))))
        for path in args
    ]

    def reader(path, handle):
        for seg in handle.receiver:
            print(f"{path}: {seg}", flush=True)

    threads = [
        threading.Thread(target=reader, args=(p, h), daemon=True)
        for p, h in handles
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bt.close()


if __name__ == "__main__":
    main()
