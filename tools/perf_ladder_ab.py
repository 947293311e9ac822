"""Device-time A/B of the sequential-ladder born-finished optimization.

VERDICT r2 item 2: settled/no-speech/pad rows used to re-decode at every
rung.  Round 3 initializes the token loop's ``fin`` state from the
settled mask (engine.py), so rung r+1 costs only the UNSETTLED streams'
work.  This tool measures that on hardware, in the production fused
window program (distil-large-v3 dims, real EOT termination, B=8):

  - accept_all:  every stream accepts at rung 0 (the production common
                 case) — baseline round cost.
  - one_decodes: 7 of 8 streams no-speech-gate at birth, one stream
                 decodes and fails every rung (worst case) — with
                 born-finished rows this costs ~1 stream's ladder; with
                 the old behavior (fin_init disabled) every rung re-ran
                 all 8 rows to the longest row's length.
  - all_reject:  every stream fails every rung (bench worst case) —
                 fin_init is inert here (nothing settles), pinning that
                 the optimization costs nothing when it cannot help.

Run ON TPU:  python tools/perf_ladder_ab.py
"""

import json
import os
import shutil
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
    from norma_tpu.tracing import device_time_report, profile

    cfg = PRESETS["distil-large-v3"]  # real mtp=448, real EOT
    st = SpecialTokens(
        sot=50258, eot=50257, task=50360, no_speech=50363,
        no_timestamps=50364, zero_sec=50365, one_sec=50415,
    )
    params = jax.device_put(
        fuse_qkv(init_params(cfg, seed=0, dtype=jnp.bfloat16)),
        jax.devices()[0],
    )

    rng = np.random.default_rng(0)
    wins = np.stack([
        prepare_audio(
            (0.1 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
        )
        for _ in range(8)
    ])
    a8 = jnp.asarray(wins)

    # Probe per-stream no-speech probs once (default engine).
    probe_engine = DecodeEngine(params, cfg, st)
    drs, _ = probe_engine.transcribe_window(a8, [50259] * 8, seed=0)
    nsps = np.array([d.no_speech_prob for d in drs])
    lo = np.sort(nsps)[:2]
    gate7 = float(lo.mean())  # below 7 streams' nsp, above the lowest
    print(f"# nsp per stream: {np.round(nsps, 4).tolist()}  gate7={gate7:.4f}")

    orig_token_loop = DecodeEngine._token_loop

    def no_fin_token_loop(self, *args, **kwargs):
        kwargs.pop("fin_init", None)  # old behavior: all rows decode
        return orig_token_loop(self, *args, **kwargs)

    scenarios = {
        "accept_all": {"LOGPROB_THRESHOLD": -100.0},
        "one_decodes": {"NO_SPEECH_THRESHOLD": gate7},
        "all_reject": {},
    }

    results = {}
    for sname, patches in scenarios.items():
        for fin in (True, False):
            saved = {k: getattr(engine_mod, k) for k in patches}
            for k, v in patches.items():
                setattr(engine_mod, k, v)
            if not fin:
                DecodeEngine._token_loop = no_fin_token_loop
            try:
                engine = DecodeEngine(params, cfg, st)
                engine.transcribe_window(a8, [50259] * 8, seed=0)  # compile
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    engine.transcribe_window(a8, [50259] * 8, seed=0)
                    walls.append(time.perf_counter() - t0)
                tdir = f"/tmp/ladder_ab/{sname}_{'fin' if fin else 'nofin'}"
                shutil.rmtree(tdir, ignore_errors=True)
                with profile(tdir):
                    for _ in range(2):
                        engine.transcribe_window(a8, [50259] * 8, seed=0)
                mods = device_time_report(tdir, "XLA Modules")
                dev = round(
                    sum(t for t, _ in mods.values()) / 2, 2
                )
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

    base = results["accept_all_fin"]["device_ms"]
    print("==== SUMMARY ====")
    for k, v in results.items():
        print(f"{k:22s} device {v['device_ms']:8.2f} ms  ({v['device_ms']/base:.2f}x of accept_all)")


if __name__ == "__main__":
    main()
