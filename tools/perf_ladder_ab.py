"""Device-time A/B of the born-finished-rows ladder optimization.

VERDICT r2 item 2 / ADVICE r2: no-speech-gated, settled and pad rows
used to decode at full length.  Round 3 initializes the token loop's
``fin`` state from the gated/settled mask (engine.py).  Measured here in
the production fused window program (distil-large-v3 dims, forced
132-token decodes):

  - silent_B1: the no-speech probe fires -> with fin the whole
    speculative 6-rung ladder is born-finished (zero decode steps, the
    reference's early-exit semantics, model.rs:308-315); without it all
    rungs decode to full length before the host discards them.  This is
    the headline win (every silent/leading-silence window in streaming).
  - voiced_B1 / voiced_B8: nothing is gated -> fin must cost nothing.

A first version of this tool tried to A/B per-stream rung escalation at
B=8; random weights defeat it (every rung-0 decode NaN-accepts, and
per-step cost is weight-bound so row masking barely moves whole-batch
time).  What remains measurable and real is the early-exit above; the
rung-compaction behavior itself is pinned functionally by the CPU tests
(born-finished rows freeze their state and the step loop ends with the
unsettled rows).

Run ON TPU:  python tools/perf_ladder_ab.py
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

    import norma_tpu.decode.engine as engine_mod
    from norma_tpu.constants import N_SAMPLES
    from norma_tpu.decode import DecodeEngine
    from norma_tpu.decode.masks import SpecialTokens
    from norma_tpu.frontend.mel import prepare_audio
    from norma_tpu.model import PRESETS, fuse_qkv, init_params
    from norma_tpu.tracing import profiled_device_ms

    # Forced 132-token decodes make loop length deterministic; the lever
    # under test is which ROWS are born-finished.
    cfg = PRESETS["distil-large-v3"].with_(max_target_positions=136)
    st = SpecialTokens(
        sot=50258, eot=-1, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    params = jax.device_put(
        fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16)),
        jax.devices()[0],
    )

    rng = np.random.default_rng(0)
    a1 = jnp.asarray(
        prepare_audio((0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32))
    )[None]
    a8 = jnp.tile(a1, (8, 1))

    orig_token_loop = DecodeEngine._token_loop

    def no_fin_token_loop(self, *args, **kwargs):
        kwargs.pop("fin_init", None)  # old behavior: all rows decode
        return orig_token_loop(self, *args, **kwargs)

    # scenario -> (audio, constant patches).  NO_SPEECH_THRESHOLD=-1 makes
    # the probe fire for every stream (the "silent window" condition
    # without needing weights that actually produce silence).
    scenarios = {
        # B=1 silent window, SPECULATIVE path: with fin the whole 6-rung
        # ladder is born-finished (zero decode steps, reference
        # model.rs:308-315 semantics); without it all 6 rungs decode 132
        # tokens each before the host discards them.
        "silent_B1": (a1, {"NO_SPEECH_THRESHOLD": -1.0}),
        # B=1 voiced window: fin must cost nothing when it cannot help.
        "voiced_B1": (a1, {}),
        # B=8 all streams voiced, sequential ladder: ditto at batch.
        "voiced_B8": (a8, {}),
    }

    results = {}
    for sname, (audio, patches) in scenarios.items():
        B = audio.shape[0]
        for fin in (True, False):
            saved = {k: getattr(engine_mod, k) for k in patches}
            for k, v in patches.items():
                setattr(engine_mod, k, v)
            if not fin:
                DecodeEngine._token_loop = no_fin_token_loop
            try:
                engine = DecodeEngine(params, cfg, st)
                engine.transcribe_window(audio, [50259] * B, seed=0)
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    engine.transcribe_window(audio, [50259] * B, seed=0)
                    walls.append(time.perf_counter() - t0)
                tdir = f"/tmp/ladder_ab/{sname}_{'fin' if fin else 'nofin'}"
                dev, _ = profiled_device_ms(
                    lambda: engine.transcribe_window(audio, [50259] * B, seed=0),
                    2, tdir,
                )
                dev = round(dev, 2)
            finally:
                DecodeEngine._token_loop = orig_token_loop
                for k, v in saved.items():
                    setattr(engine_mod, k, v)
            key = f"{sname}_{'fin' if fin else 'nofin'}"
            results[key] = {
                "device_ms": dev,
                "wall_ms": round(min(walls) * 1e3, 1),
            }
            print(json.dumps({key: results[key]}), flush=True)

    print("==== SUMMARY ====")
    for s in scenarios:
        f = results[f"{s}_fin"]["device_ms"]
        n = results[f"{s}_nofin"]["device_ms"]
        print(f"{s:12s} fin {f:8.2f} ms   nofin {n:8.2f} ms   ({f/n:.2f}x)")


if __name__ == "__main__":
    main()
