"""Structured tracing and profiling.

Re-creation of the reference's observability layer (SURVEY.md §5): the
reference instruments every public entry with ``tracing`` spans carrying
hot-path metrics (``#[instrument]`` at lib.rs:315,342,369,381,393,502,559;
model.rs:54,163; decode telemetry at model.rs:180-185,208).  TPU-native
equivalents here:

  - ``span`` / ``instrument`` — structured spans on Python ``logging`` with
    wall-time and user fields (the subscriber/handler choice is left to the
    application, as in the reference)
  - ``decode_telemetry`` — the reference's per-decode trace fields
    (at_temp, logprob, no_speech_prob)
  - ``profile`` — wraps a region in a ``jax.profiler`` trace so device-side
    encoder/decoder timings land in TensorBoard-compatible traces
"""

from __future__ import annotations

import contextlib
import functools
import inspect
import logging
import time
from typing import Any, Dict, Optional

logger = logging.getLogger("norma_tpu")


@contextlib.contextmanager
def span(name: str, level: int = logging.DEBUG, **fields: Any):
    """A timed, structured span: logs entry fields and exit duration.

    Errors are captured at ERROR level with the elapsed time, mirroring the
    reference's ``#[instrument(err)]`` captures (lib.rs:315,342,...)."""
    t0 = time.perf_counter()
    logger.log(level, "%s enter %s", name, fields if fields else "")
    try:
        yield fields
    except Exception as e:
        logger.log(logging.ERROR, "%s error after %.3fms: %r",
                   name, (time.perf_counter() - t0) * 1e3, e)
        raise
    else:
        logger.log(level, "%s exit %.3fms", name, (time.perf_counter() - t0) * 1e3)


def instrument(
    _fn=None,
    *,
    name: Optional[str] = None,
    level: int = logging.DEBUG,
    fields: Optional[Dict[str, Any]] = None,
):
    """Decorator mirroring the reference's ``#[instrument]`` spans.

    ``fields`` maps a span-field name to an extractor over the call's bound
    arguments (the reference's ``fields(input_data_len = data.len(), ...)``,
    model.rs:54); extraction and formatting are skipped entirely when the
    norma_tpu logger isn't enabled for ``level``.
    """

    def deco(fn):
        span_name = name or fn.__qualname__
        sig = inspect.signature(fn) if fields else None

        def extract(args, kwargs) -> Dict[str, Any]:
            fvals: Dict[str, Any] = {}
            if fields:
                try:
                    bound = sig.bind_partial(*args, **kwargs)
                    bound.apply_defaults()
                except Exception:  # never let telemetry break the call
                    return fvals
                for k, fx in fields.items():
                    # span() takes (name, level) positionally; a field
                    # with either name would TypeError at the call —
                    # the one failure the per-field guard can't catch.
                    key = k if k not in ("name", "level") else k + "_"
                    try:
                        fvals[key] = fx(bound.arguments)
                    except Exception:
                        # One failing extractor must not discard the
                        # healthy fields.
                        pass
            return fvals

        # The enabled-check may skip the span's enter/exit records, but the
        # ERROR capture (the reference's #[instrument(err)], lib.rs:315)
        # must fire at production log levels too — a logger at INFO still
        # records failures of instrumented entry points.
        if inspect.iscoroutinefunction(fn):

            @functools.wraps(fn)
            async def awrapper(*args, **kwargs):
                if not logger.isEnabledFor(level):
                    try:
                        return await fn(*args, **kwargs)
                    except Exception as e:
                        logger.error("%s error: %r", span_name, e)
                        raise
                with span(span_name, level=level, **extract(args, kwargs)):
                    return await fn(*args, **kwargs)

            return awrapper

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not logger.isEnabledFor(level):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:
                    logger.error("%s error: %r", span_name, e)
                    raise
            with span(span_name, level=level, **extract(args, kwargs)):
                return fn(*args, **kwargs)

        return wrapper

    return deco(_fn) if _fn is not None else deco


def decode_telemetry(at_temp: float, avg_logprob: float, no_speech_prob: float) -> None:
    """The reference's decode trace fields (model.rs:180-185)."""
    logger.debug(
        "decoded at_temp=%.1f logprob=%.3f no_speech_prob=%.3f",
        at_temp,
        avg_logprob,
        no_speech_prob,
    )


@contextlib.contextmanager
def profile(log_dir: str = "/tmp/norma_tpu_profile"):
    """Capture a jax.profiler device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a profiler trace (shows up on the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def profiled_device_ms(fn, n: int, trace_dir: str, ops: int = 0):
    """Run ``fn`` ``n`` times under the profiler; return the average device
    milliseconds per call (sum of the "XLA Modules" line / n) and, when
    ``ops`` > 0, the top fused-op rows
    ``[{"op", "ms_per_call", "n"}, ...]`` for attribution.

    The single measurement path behind ``bench.py`` and the
    ``tools/perf_*_ab.py`` A/Bs, so every artifact's "device ms" is
    produced by the same code (PERF.md methodology).
    """
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with profile(trace_dir):
        for _ in range(n):
            fn()
    # One proto-parsing pass for both line names (the xplane files can be
    # tens of MB; parsing them once per line doubled tooling latency).
    lines = ("XLA Modules", "XLA Ops") if ops else ("XLA Modules",)
    reports = device_time_report_multi(trace_dir, lines)
    mods = reports["XLA Modules"]
    if not mods:
        # No device-plane module events (CPU backend, or a trace the
        # profiler failed to populate): raising lets callers' guards report
        # "unavailable" — silently returning 0.0 would publish rtf_device=0
        # (an infinitely fast chip) in the scored artifact.
        raise RuntimeError(
            f"no 'XLA Modules' device events in trace under {trace_dir}"
        )
    avg = sum(t for t, _ in mods.values()) / n
    if not ops:
        return avg, []
    rows = [
        {"op": k[:90], "ms_per_call": round(t / n, 3), "n": c}
        for k, (t, c) in list(reports["XLA Ops"].items())[:ops]
    ]
    return avg, rows


def device_time_report(trace_dir: str, line: str = "XLA Modules"):
    """Aggregate per-program DEVICE time from a jax.profiler trace.

    Parses the raw ``*.xplane.pb`` files under ``trace_dir`` directly
    (tensorflow's tsl xplane proto), aggregating the TPU device plane's
    events by name.  Returns ``{name: (total_ms, count)}`` sorted by
    total time descending.

    Why this exists: on a remotely-attached TPU, wall-clock timings carry
    per-call dispatch/fetch overhead that dwarfs and distorts device
    compute (PERF.md "Measurement methodology") — per-program device time
    from the profiler is the only trustworthy comparison.  ``line`` may
    be "XLA Modules" (per jitted program) or "XLA Ops" (per fused op).
    """
    return device_time_report_multi(trace_dir, (line,))[line]


def device_time_report_multi(trace_dir: str, lines):
    """Like :func:`device_time_report` for several line names in ONE
    proto-parsing pass: ``{line: {name: (total_ms, count)}}``.

    Multi-core traces (SPMD over a mesh) carry one TPU plane PER CORE, each
    with its own copy of the same dispatch's events; the report takes the
    per-name MAX across planes — the program's latency is the slowest
    core's time, not the sum of concurrent cores (summing would inflate
    "device ms per call" by the core count).  Single-core traces are
    unaffected.
    """
    import glob

    from tensorflow.tsl.profiler.protobuf.xplane_pb2 import XSpace  # type: ignore

    lines = tuple(lines)
    # {line: {plane_key: ({name: total_ms}, {name: count})}}
    per_plane: Dict[str, Dict[Any, tuple]] = {ln: {} for ln in lines}
    for path in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        xs = XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            for pl_line in plane.lines:
                if pl_line.name not in per_plane:
                    continue
                key = (path, plane.name)
                t, c = per_plane[pl_line.name].setdefault(key, ({}, {}))
                for ev in pl_line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    name = md.display_name or md.name
                    t[name] = t.get(name, 0.0) + ev.duration_ps / 1e9
                    c[name] = c.get(name, 0) + 1
    out = {}
    for ln in lines:
        merged: Dict[str, tuple] = {}
        for t, c in per_plane[ln].values():
            for name, total in t.items():
                if name not in merged or total > merged[name][0]:
                    merged[name] = (total, c[name])
        out[ln] = dict(sorted(merged.items(), key=lambda kv: -kv[1][0]))
    return out
