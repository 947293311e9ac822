"""Public API stability pin (the cargo-semver-checks equivalent).

The reference CI gates API stability with cargo-semver-checks
(/root/reference/.github/workflows/check.yml); Python has no compiler to
enforce it, so this test snapshots the public surface — exported names and
the signatures users program against — and fails on accidental breaks.
Intentional API changes must update this file (and the version).
"""

import inspect

import norma_tpu
from norma_tpu import Transcriber, TranscriberHandle
from norma_tpu.input import Settings
from norma_tpu.models import CommonModelParams, Model, ModelDefinition, SelectedDevice
from norma_tpu.models.whisper import monolingual, multilingual
from norma_tpu.runtime.batching import BatchedTranscriber


def _params(fn):
    return list(inspect.signature(fn).parameters)


def test_top_level_exports():
    assert set(norma_tpu.__all__) == {
        "audio", "eval", "input", "models", "parallel", "tracing",
        "BatchedTranscriber", "Transcriber", "TranscriberHandle",
        "JoinHandle", "StringReceiver",
        "NormaError", "StartError", "StopError",
        "TranscriberDown", "TranscriberRunning", "NoStreamRunning",
        "__version__",
    }
    for name in norma_tpu.__all__:
        assert hasattr(norma_tpu, name), name


def test_transcriber_construction_variants():
    """The reference's 4 construction variants (lib.rs:316-391)."""
    assert _params(Transcriber.blocking_new) == ["definition"]
    assert _params(Transcriber.blocking_spawn) == ["definition"]
    assert inspect.iscoroutinefunction(Transcriber.new.__func__)
    assert inspect.iscoroutinefunction(Transcriber.spawn.__func__)


def test_handle_api():
    """start/blocking_start/stop (lib.rs:610-694) + close."""
    assert _params(TranscriberHandle.blocking_start)[:2] == ["self", "settings"]
    assert inspect.iscoroutinefunction(TranscriberHandle.start)
    assert _params(TranscriberHandle.stop) == ["self"]
    assert hasattr(TranscriberHandle, "close")


def test_settings_fields():
    s = Settings()
    assert hasattr(s, "selected_device")
    assert hasattr(s, "on_error")
    assert hasattr(s, "source")  # injectable AudioSource extension


def test_model_definition_protocol():
    """ModelDefinition: async + blocking builder + common_params
    (models/mod.rs:13-22); Model: SAMPLE_RATE + transcribe
    (models/mod.rs:24-34)."""
    assert hasattr(ModelDefinition, "blocking_try_to_model")
    assert hasattr(ModelDefinition, "try_to_model")
    assert hasattr(ModelDefinition, "common_params")
    assert hasattr(Model, "transcribe")
    assert hasattr(CommonModelParams, "set_max_chunk_len")
    assert hasattr(CommonModelParams, "set_data_buffer_size")
    assert hasattr(CommonModelParams, "set_string_buffer_size")


def test_selected_device_variants():
    """Cpu/Tpu(ordinal)/auto (reference SelectedDevice + the Tpu addition,
    models/mod.rs:38-56)."""
    assert hasattr(SelectedDevice, "cpu")
    assert hasattr(SelectedDevice, "tpu")
    assert hasattr(SelectedDevice, "auto")


def test_whisper_definitions():
    """16 checkpoints + knobs (monolingual.rs / multilingual.rs)."""
    assert len(list(monolingual.ModelType)) >= 8
    assert len(list(multilingual.ModelType)) >= 8
    for mod in (monolingual, multilingual):
        d = mod.Definition
        assert hasattr(d, "set_responsiveness")
        assert hasattr(d, "set_data_buffer_size")
        assert hasattr(d, "set_string_buffer_size")
        assert hasattr(d, "to_dict")
        assert hasattr(d, "from_dict")
    assert hasattr(multilingual, "Task")
    assert hasattr(monolingual.ModelType, "MULTI_AS_MONO") or hasattr(
        monolingual, "MultiAsMono"
    )


def test_batched_transcriber_api():
    assert _params(BatchedTranscriber.__init__) == [
        "self", "model", "max_streams", "mesh", "max_round_streams",
        "target_p99_ms", "first_partial_seconds",  # r5 latency knobs
    ]
    assert hasattr(BatchedTranscriber, "blocking_start")
    assert hasattr(BatchedTranscriber, "close")
    assert hasattr(BatchedTranscriber, "from_definition")
