#!/usr/bin/env bash
# First-networked-machine runbook (VERDICT r3 #7): the moment this
# framework runs somewhere with egress, ONE command produces the evidence
# zero-egress has blocked — real-checkpoint goldens, LibriSpeech WER for
# bf16 AND the quantized serving tiers, and the reference cross-check.
#
# Usage:
#   tools/first_network_run.sh [LIBRISPEECH_DIR] [OUT_DIR]
#
# LIBRISPEECH_DIR: a LibriSpeech test-clean directory ALREADY converted to
# 16 kHz mono WAV (see the ffmpeg loop below).  If omitted, the WER steps
# are skipped and only checkpoint download + goldens + quantization run.
#
# Every step logs to OUT_DIR and a failed step aborts (set -e) — partial
# evidence is worse than a clear failure line.
set -euo pipefail

# --dry-run: execute the OFFLINE PREFIX only (no egress) — validate every
# API and tool flag the networked steps will use, so signature drift can't
# rot this script between rounds (VERDICT r4 #8).  Run by CI via
# tests/test_first_network_dryrun.py.
if [ "${1:-}" = "--dry-run" ]; then
    cd "$(dirname "$0")/.."
    echo "=== first_network_run DRY RUN (offline prefix)"
    python - <<'EOF'
# Step-1 API surface: the exact constructions the download step performs,
# minus the network call.
from norma_tpu.models import SelectedDevice
from norma_tpu.models.whisper.monolingual import Definition, ModelType

for mt in (ModelType.TINY_EN, ModelType.DISTIL_LARGE_EN_V3):
    d = Definition(mt, SelectedDevice.cpu())
    assert hasattr(d, "blocking_try_to_model")
# Step-3 cache-resolution import.
import huggingface_hub  # noqa: F401
from huggingface_hub import hf_hub_download  # noqa: F401
print("# API surface OK")
EOF
    # Steps 2-4 tool flags: every flag the script passes must exist.
    check_flags() {
        local tool="$1"; shift
        local help
        help="$(python "$tool" --help 2>&1)"
        for flag in "$@"; do
            echo "$help" | grep -q -- "$flag" || {
                echo "DRIFT: $tool lost flag $flag"; exit 1; }
        done
        echo "# $tool flags OK: $*"
    }
    check_flags tools/make_golden.py --repo --lang
    check_flags tools/quantize_checkpoint.py --decoder --encoder
    check_flags tools/eval_wer.py --local-dir --librispeech
    echo "=== DRY RUN OK — networked steps validated offline"
    exit 0
fi

LS_DIR="${1:-}"
OUT="${2:-/tmp/norma_first_network_$(date +%Y%m%d_%H%M%S)}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "=== first_network_run -> $OUT"

# -- 0. Preflight: egress + deps ---------------------------------------
python - <<'EOF'
import sys
try:
    import huggingface_hub  # noqa: F401
except Exception as e:
    sys.exit(f"huggingface_hub unavailable: {e!r}")
EOF

# -- 1. Download the two flagship checkpoints (pinned revisions ride the
#       Definitions; these calls exercise models/whisper/loader.py's
#       _hub_download end to end — the one untested code path).
python - "$OUT" <<'EOF'
import sys

from norma_tpu.models.whisper.monolingual import Definition, ModelType
from norma_tpu.models import SelectedDevice

out = sys.argv[1]
for mt in (ModelType.TINY_EN, ModelType.DISTIL_LARGE_EN_V3):
    print(f"# downloading + building {mt} ...", flush=True)
    d = Definition(mt, SelectedDevice.cpu())
    m = d.blocking_try_to_model()
    print(f"# {mt}: model built OK (sr={m.SAMPLE_RATE})", flush=True)
EOF

# -- 2. Real-checkpoint goldens (commit these to tests/golden/). -------
python tools/make_golden.py --repo openai/whisper-tiny.en --lang en \
    "$OUT/golden_tiny_en.json" | tee "$OUT/make_golden_tiny.log"
python tools/make_golden.py --repo distil-whisper/distil-large-v3 --lang en \
    "$OUT/golden_distil_large_v3.json" | tee "$OUT/make_golden_distil.log"

# -- 3. Quantized serving checkpoint (int8 decoder + w8a8 encoder). ----
CKPT_BF16="$OUT/ckpt_distil_bf16"
CKPT_Q8="$OUT/ckpt_distil_q8"
python - "$CKPT_BF16" <<'EOF'
# Resolve the HF cache paths of the just-downloaded checkpoint into a
# plain local dir for the quantizer.
import shutil, sys

from huggingface_hub import hf_hub_download

out = sys.argv[1]
import os
os.makedirs(out, exist_ok=True)
for f in ("config.json", "tokenizer.json", "model.safetensors"):
    shutil.copy(hf_hub_download("distil-whisper/distil-large-v3", f), out)
EOF
python tools/quantize_checkpoint.py "$CKPT_BF16" "$CKPT_Q8" \
    --decoder --encoder | tee "$OUT/quantize.log"

# -- 4. WER: bf16 vs quantized serving tiers on LibriSpeech test-clean.
if [ -n "$LS_DIR" ]; then
    # Convert once if only .flac present:
    #   find "$LS_DIR" -name '*.flac' -exec sh -c \
    #     'ffmpeg -n -i "$1" -ar 16000 -ac 1 "${1%.flac}.wav"' _ {} \;
    python tools/eval_wer.py --local-dir "$CKPT_BF16" \
        --librispeech "$LS_DIR" "$OUT/wer_bf16.json" \
        | tee "$OUT/wer_bf16.log"
    python tools/eval_wer.py --local-dir "$CKPT_Q8" \
        --librispeech "$LS_DIR" "$OUT/wer_q8.json" \
        | tee "$OUT/wer_q8.log"
    python - "$OUT" <<'EOF'
import json, sys

out = sys.argv[1]
b = json.load(open(f"{out}/wer_bf16.json"))
q = json.load(open(f"{out}/wer_q8.json"))
print(f"WER bf16 {b['wer']:.4f}  quantized {q['wer']:.4f}  "
      f"delta {q['wer']-b['wer']:+.4f}")
print("Compare vs reference table mod.rs:20-28 "
      "(distil-large-v3 short-form 9.7%) and update PARITY.md + PERF.md "
      "('Quant-tier accuracy proxy' section is superseded by this).")
EOF
else
    echo "# LIBRISPEECH_DIR not given: WER steps skipped"
fi

echo "=== first_network_run complete; artifacts in $OUT"
