"""TPU perf probe: DEVICE-time attribution of the production programs.

Produces the numbers behind PERF.md's tables using the only trustworthy
methodology on a remotely-attached TPU (wall-clock carries 70-200 ms/call
of tunnel overhead): capture a jax.profiler trace of the PRODUCTION
programs and aggregate per-program / per-op device time from the xplane.

Run ON TPU (no JAX_PLATFORMS override):  python tools/perf_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, init_params
    from norma_tpu.tracing import device_time_report, profile

    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    params = jax.device_put(
        init_params(cfg, seed=0, dtype=jnp.bfloat16), jax.devices()[0]
    )
    engine = DecodeEngine(params, cfg, st)

    rng = np.random.default_rng(0)
    a1 = jnp.asarray(
        prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
    )[None]
    a8 = jnp.tile(a1, (8, 1))
    s1 = engine.prefill_window(a1, 50259)

    runs = [
        ("window_B1", lambda: engine.transcribe_window(a1, [50259], seed=0)),
        ("window_B8", lambda: engine.transcribe_window(a8, [50259] * 8, seed=0)),
        ("loop_B1", lambda: engine.run_loop(s1, 0.0, seed=0)),
    ]
    for _, fn in runs:
        fn()  # compile + warm

    trace_dir = "/tmp/norma_perf_probe"
    os.system(f"rm -rf {trace_dir}")
    walls = {}
    with profile(trace_dir):
        for name, fn in runs:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            walls[name] = round(min(ts) * 1e3, 1)

    modules = device_time_report(trace_dir, "XLA Modules")
    per_program = {
        name: round(total / max(n, 1), 2)
        for name, (total, n) in modules.items()
        if n >= 3 and total > 1.0
    }
    ops = device_time_report(trace_dir, "XLA Ops")
    top_ops = [
        {"op": name, "total_ms": round(total, 2), "count": n}
        for name, (total, n) in list(ops.items())[:12]
    ]
    print(json.dumps({
        "wall_ms": walls,
        "device_ms_per_program_call": per_program,
        "top_device_ops": top_ops,
    }, indent=2))


if __name__ == "__main__":
    main()
