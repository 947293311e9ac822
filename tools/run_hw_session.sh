#!/usr/bin/env bash
# Hardware measurement runbook: everything queued for the real TPU, in
# VALUE order, outputs under /tmp/hw_session/.  Run when the tunnel is
# up:   bash tools/run_hw_session.sh
#
# Ordering rationale (tunnel compiles are the scarce resource — the FIRST
# compile of a changed program can take 20-40 minutes through the tunnel,
# subsequent ones hit the persistent cache):
#   1. bench.py first — the SCORED artifact; running it here also
#      pre-warms the compile cache so the driver's round-end bench run is
#      fast even if this session is interrupted.
#   2. sample_kernel — small program, quick signal.
#   3. decoder_core — the standing decoder-loop A/B set (post
#      cache-as-carry baselines + the full lv3 quant stack).
#   4. spec_parity / encoder_attn / encoder_q8 — standing hardware gates.
#   5. spec_batch — the best-batched-lv3 arm (w8 + jax_flash).
#   6. soak — 3-minute serving endurance (axon RSS envelope documented
#      in PERF.md "axon transfer leak").
#
# Each step is timeboxed; a failure does not stop later steps.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_session
mkdir -p "$OUT"

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.log"
  # $? after a pipeline is tee's status (always 0); the step's own rc is
  # PIPESTATUS[0] — without it a crashed/timed-out step banners rc=0 and
  # the operator believes the hardware gate passed.
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

# Generous timeouts: cold-cache compiles through the tunnel are slow and
# killing a step mid-compile wastes the whole wait.
# 1. The SCORED core first (r3 lesson: the driver artifact is the round's
#    deliverable — land it before exploring).  bench.py is now budgeted
#    (NORMA_BENCH_BUDGET_S, default 900 s) and emits partial JSON on
#    timeout, so this step cannot eat the session.
run bench           1800 python bench.py
# 2. Standing serving A/Bs (all harvested in r4 — rerun only when the
#    implementations change): best_vs_skv/448 settled self-kernel vs
#    int8-self-KV (kernel decisive at 448 post-stacked), xkv4/448
#    settled int4 cross-KV (perf-neutral, memory lever).
run skv_ab          5400 python tools/perf_spec_ab.py best_vs_skv448
run xkv4_ab         5400 python tools/perf_spec_ab.py xkv4_448
run step_attr_b8    3600 python tools/perf_step_attr.py lv3_b8_w8_xkvk_selfk
# 3. Exploratory arms the scored bench no longer carries.
run full_sweep      5400 python tools/perf_full_sweep.py
# 4. Standing kernel gates (rerun each session: Mosaic lowering + parity).
run sample_kernel   2400 python tools/verify_sample_kernel_tpu.py
run xkv_kernel_gate 3600 python tools/verify_paged_cross_tpu.py
run self_gate       3600 python tools/verify_self_decode_tpu.py
run spec_parity     3600 python tools/verify_spec_parity_tpu.py
run encoder_attn    2400 python tools/verify_encoder_attn_tpu.py
run encoder_q8      3600 python tools/verify_encoder_q8_tpu.py
# Harvested in r3 (PERF.md): xkv_sweep (hpc auto-tile wins), xkv_paged
# (kernel −8.9% at lv3 B=8), spec_xkv (composes), self_kernel_ab
# (full-tile WIN, −1.5% B=8 — new auto), skv448 (full production stack
# −10.9%), fused_block (decisive LOSS — kernel REMOVED in r4, PERF.md
# keeps the record).  Re-add an arm only when its implementation changes.
# 5. Endurance + latency distribution under churn (prints percentiles).
run soak            1800 python tools/soak_serving.py --minutes 3

echo "All logs in $OUT/"
