#!/usr/bin/env bash
# Hardware measurement runbook: everything queued for the real TPU, in
# dependency order, outputs under /tmp/hw_session/.  Run when the tunnel
# is up:   bash tools/run_hw_session.sh
#
# 1. perf_int8_mxu      — does XLA's s8 dot hit the MXU native mode?
#                         (decides whether quantize_encoder's ceiling is real)
# 2. verify_encoder_q8  — w8a8 accuracy report (token parity, feature drift)
# 3. perf_encoder_ab    — in-context device A/B: w8a8 vs bf16 vs flash,
#                         incl. the w8a16 ablation arm
# 4. verify_sample_kernel / verify_spec_parity / verify_encoder_attn —
#                         standing hardware gates (regressions)
# 5. bench.py           — the scored artifact (now incl. batched8_e8,
#                         batched8_serving_e8, turbo8_serving fields)
#
# Each step is timeboxed; a failure does not stop later steps.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_session
mkdir -p "$OUT"

run() {
  name="$1"; shift
  echo "=== $name ==="
  timeout 1800 "$@" 2>&1 | tee "$OUT/$name.log"
  # $? after a pipeline is tee's status (always 0); the step's own rc is
  # PIPESTATUS[0] — without it a crashed/timed-out step banners rc=0 and
  # the operator believes the hardware gate passed.
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

run int8_mxu        python tools/perf_int8_mxu.py
run encoder_q8      python tools/verify_encoder_q8_tpu.py
run encoder_ab_w8a8 python tools/perf_encoder_ab.py xla jax_flash512 w8a8 w8a8_jf w8a16_enc w8a8_pallas
run sample_kernel   python tools/verify_sample_kernel_tpu.py
run spec_parity     python tools/verify_spec_parity_tpu.py
run encoder_attn    python tools/verify_encoder_attn_tpu.py
run decoder_skv     python tools/perf_decoder_ab.py fused448 fused448_skv fused448_w8_skv fused_skv fused
run soak            python tools/soak_serving.py --minutes 3
run bench           python bench.py

echo "All logs in $OUT/"
