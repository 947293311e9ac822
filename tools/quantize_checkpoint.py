"""Offline checkpoint quantizer: HF safetensors -> pre-quantized params file.

The serving equivalent of the reference's GGUF q8_0 distribution
(``monolingual.rs:230-235``): quantize ONCE here, then every model load
reads int8 weights directly — no f32 pass, no per-start re-quantization,
~¼ the host I/O.  The output directory is a drop-in ``local_dir`` for the
Definitions (config.json + tokenizer.json are copied alongside); the
loader auto-detects the format from the file's safetensors metadata
(``norma_tpu_format: params-v1``) and skips HF-name mapping, QKV fusion
and the quantize_* flags (they are baked in).

Usage:
  python tools/quantize_checkpoint.py IN_DIR OUT_DIR \
      [--dtype bf16|f32] [--decoder] [--encoder] [--logits int8|int4]

--decoder  int8 decoder-layer weights + int8 logits head (w8a16 compute)
--encoder  int8 encoder-layer weights (w8a8 int8-MXU compute)
--logits   quantize only the logits head (ignored with --decoder)
No quant flag at all still helps: the output is fused-QKV bf16/f32 with
structural (no-name-mapping) loading.
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("in_dir", help="dir with config.json/tokenizer.json/model.safetensors")
    ap.add_argument("out_dir")
    ap.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--decoder", action="store_true", help="int8 decoder weights + head")
    ap.add_argument("--encoder", action="store_true", help="w8a8 int8 encoder weights")
    ap.add_argument("--logits", choices=("int8", "int4"), default=None)
    args = ap.parse_args()

    import jax

    # Host-side transform: never touch (or wait for) an accelerator.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from norma_tpu.model import WhisperConfig, fuse_qkv
    from norma_tpu.model.load import load_safetensors
    from norma_tpu.model.serialize import save_params

    import glob

    def find(stem: str) -> str:
        # Quantized HF repos suffix the sidecar files (config-<ext>.json,
        # reference naming); prefer the plain name, fall back to the glob.
        plain = os.path.join(args.in_dir, f"{stem}.json")
        if os.path.exists(plain):
            return plain
        hits = sorted(glob.glob(os.path.join(args.in_dir, f"{stem}*.json")))
        # tokenizer*.json must never match tokenizer_config.json — copying
        # the config as tokenizer.json produces a dir that only fails much
        # later, when the serving loader tries to parse it.
        hits = [
            h for h in hits
            if os.path.basename(h) != f"{stem}_config.json"
        ]
        if not hits:
            raise SystemExit(f"{args.in_dir}: no {stem}*.json found")
        return hits[0]

    cfg_path = find("config")
    tok_path = find("tokenizer")
    cfg = WhisperConfig.from_json(cfg_path)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    st_path = os.path.join(args.in_dir, "model.safetensors")
    if os.path.exists(st_path):
        params = load_safetensors(st_path, cfg, dtype)
    else:
        # Fall back to a GGUF q8_0 file (the reference's quantized
        # distribution format) so those checkpoints convert too.
        ggufs = sorted(glob.glob(os.path.join(args.in_dir, "*.gguf")))
        if not ggufs:
            raise SystemExit(
                f"{args.in_dir}: no model.safetensors or *.gguf found"
            )
        from norma_tpu.model.gguf import load_gguf_q8

        params = load_gguf_q8(ggufs[0], cfg, dtype)
    params = fuse_qkv(params)

    tiers = []
    if args.decoder:
        from norma_tpu.model.quant import quantize_decoder

        # Same composition rule as the runtime loader (loader.py): an
        # explicit --logits int4 keeps the int4 head alongside the int8
        # layers instead of being downgraded to the int8 head.
        params = quantize_decoder(
            params, logits="int4" if args.logits == "int4" else "int8"
        )
        tiers.append("decoder-w8")
        if args.logits == "int4":
            tiers.append("logits-int4")
    elif args.logits == "int4":
        from norma_tpu.model.quant import quantize_logits_head_int4

        params = quantize_logits_head_int4(params)
        tiers.append("logits-int4")
    elif args.logits == "int8":
        from norma_tpu.model.quant import quantize_logits_head

        params = quantize_logits_head(params)
        tiers.append("logits-w8")
    if args.encoder:
        from norma_tpu.model.quant import quantize_encoder

        params = quantize_encoder(params)
        tiers.append("encoder-w8a8")

    os.makedirs(args.out_dir, exist_ok=True)
    # Normalize sidecars to the plain names: the output is a standard
    # safetensors checkpoint dir.
    shutil.copy(cfg_path, os.path.join(args.out_dir, "config.json"))
    shutil.copy(tok_path, os.path.join(args.out_dir, "tokenizer.json"))
    out_path = os.path.join(args.out_dir, "model.safetensors")
    save_params(
        out_path, params,
        metadata={"quant": "+".join(tiers) or "none", "dtype": args.dtype},
    )
    print(
        f"wrote {out_path} ({os.path.getsize(out_path) / 1e6:.1f} MB, "
        f"quant={'+'.join(tiers) or 'none'}, {args.dtype})"
    )


if __name__ == "__main__":
    main()
