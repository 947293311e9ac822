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
#   2. int8_mxu / sample_kernel — small programs, quick signal.
#   3. encoder_q8 + encoder_ab — the w8a8 device A/B (VERDICT item).
#   4. decoder_skv — int8 self-KV A/B at production mtp=448.
#   5. spec_parity / encoder_attn — standing hardware gates.
#   6. soak — 3-minute serving endurance.
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
run bench           7200 python bench.py
run int8_mxu        1800 python tools/perf_int8_mxu.py
run sample_kernel   2400 python tools/verify_sample_kernel_tpu.py
run encoder_q8      3600 python tools/verify_encoder_q8_tpu.py
run encoder_ab_w8a8 5400 python tools/perf_encoder_ab.py xla jax_flash512 w8a8 w8a8_jf w8a16_enc w8a8_pallas
run decoder_skv     3600 python tools/perf_decoder_ab.py fused448 fused448_skv fused448_w8_skv fused_skv fused
run spec_batch      5400 python tools/perf_spec_ab.py batch
run spec_parity     3600 python tools/verify_spec_parity_tpu.py
run encoder_attn    2400 python tools/verify_encoder_attn_tpu.py
run soak            1800 python tools/soak_serving.py --minutes 3

echo "All logs in $OUT/"
