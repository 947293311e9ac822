"""Build a complete tiny Whisper checkpoint directory on disk:
config.json + tokenizer.json (real `tokenizers` file with the whisper
special-token layout) + model.safetensors (random weights, HF tensor names)
— so the full Definition -> loader -> Transcriber path runs offline."""

from __future__ import annotations

import json
import struct

import numpy as np

from norma_tpu.models.whisper.languages import ALL_LANGUAGES

D_MODEL = 64
HEADS = 2
LAYERS = 2
N_MELS = 80
MAX_SRC = 32  # window = 2*32*160 = 10240 samples (fast tests)
MAX_TGT = 48
N_TEXT = 100  # w0..w99


def build_vocab():
    """Whisper-style layout: text, eot, sot, 99 langs, tasks, nospeech,
    notimestamps, 1501 timestamps."""
    vocab = {f"w{i}": i for i in range(N_TEXT)}
    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += [l.token() for l in ALL_LANGUAGES]
    specials += ["<|translate|>", "<|transcribe|>", "<|nospeech|>", "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(1501)]
    return vocab, specials


def write_safetensors(path, tensors):
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        b = np.ascontiguousarray(arr, np.float32).tobytes()
        header[name] = {
            "dtype": "F32",
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(b)],
        }
        offset += len(b)
        blobs.append(b)
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)


def random_hf_tensors(vocab_size, seed=0):
    rng = np.random.default_rng(seed)
    D, F, M = D_MODEL, 4 * D_MODEL, N_MELS
    t = {}

    def add(name, shape, scale=0.05):
        t[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    add("model.encoder.conv1.weight", (D, M, 3))
    add("model.encoder.conv1.bias", (D,))
    add("model.encoder.conv2.weight", (D, D, 3))
    add("model.encoder.conv2.bias", (D,))
    add("model.encoder.embed_positions.weight", (MAX_SRC, D))
    for side, n in (("encoder", LAYERS), ("decoder", LAYERS)):
        for i in range(n):
            p = f"model.{side}.layers.{i}"
            attns = ["self_attn"] + (["encoder_attn"] if side == "decoder" else [])
            for attn in attns:
                for proj in ("q_proj", "v_proj", "out_proj"):
                    add(f"{p}.{attn}.{proj}.weight", (D, D), 0.1)
                    add(f"{p}.{attn}.{proj}.bias", (D,), 0.0)
                add(f"{p}.{attn}.k_proj.weight", (D, D), 0.1)
                ln = (
                    "self_attn_layer_norm"
                    if attn == "self_attn"
                    else "encoder_attn_layer_norm"
                )
                t[f"{p}.{ln}.weight"] = np.ones(D, np.float32)
                t[f"{p}.{ln}.bias"] = np.zeros(D, np.float32)
            add(f"{p}.fc1.weight", (F, D), 0.1)
            add(f"{p}.fc1.bias", (F,), 0.0)
            add(f"{p}.fc2.weight", (D, F), 0.1)
            add(f"{p}.fc2.bias", (D,), 0.0)
            t[f"{p}.final_layer_norm.weight"] = np.ones(D, np.float32)
            t[f"{p}.final_layer_norm.bias"] = np.zeros(D, np.float32)
        t[f"model.{side}.layer_norm.weight"] = np.ones(D, np.float32)
        t[f"model.{side}.layer_norm.bias"] = np.zeros(D, np.float32)
    add("model.decoder.embed_tokens.weight", (vocab_size, D), 0.1)
    add("model.decoder.embed_positions.weight", (MAX_TGT, D), 0.02)
    return t


def make_checkpoint_dir(dirpath, quantized_ext=None) -> int:
    """Write a loadable checkpoint into ``dirpath``; returns vocab_size."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    dirpath = str(dirpath)
    vocab, specials = build_vocab()
    tok = Tokenizer(WordLevel(vocab, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    vocab_size = tok.get_vocab_size()

    suffix = f"-{quantized_ext}" if quantized_ext else ""
    tok.save(f"{dirpath}/tokenizer{suffix}.json")

    config = {
        "num_mel_bins": N_MELS,
        "vocab_size": vocab_size,
        "d_model": D_MODEL,
        "encoder_layers": LAYERS,
        "encoder_attention_heads": HEADS,
        "decoder_layers": LAYERS,
        "decoder_attention_heads": HEADS,
        "max_source_positions": MAX_SRC,
        "max_target_positions": MAX_TGT,
        "suppress_tokens": [1, 2, 3],
    }
    with open(f"{dirpath}/config{suffix}.json", "w") as f:
        json.dump(config, f)

    tensors = random_hf_tensors(vocab_size)
    if quantized_ext:
        _write_gguf_q8(f"{dirpath}/model-{quantized_ext}-q80.gguf", tensors)
    else:
        write_safetensors(f"{dirpath}/model.safetensors", tensors)
    return vocab_size


def _write_gguf_q8(path, tensors):
    """GGUF v3 with q8_0 2-D tensors (1-D stay f32)."""

    def gstr(s):
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    infos = b""
    datas = []
    offsets = []
    off = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, np.float32)
        # ggml requires the INNERMOST dim (ne0) to be a block multiple for
        # quantized types; quantizing on total-size divisibility produced
        # blocks spanning rows (e.g. conv1.weight ne0=3) — invalid ggml
        # that only a flat reader accepts.  Real q8_0 whisper files keep
        # such tensors unquantized; mirror that.
        if arr.ndim >= 2 and arr.shape[-1] % 32 == 0:
            flat = arr.reshape(-1, 32)
            scales = np.abs(flat).max(axis=1) / 127.0
            scales = np.where(scales > 0, scales, 1.0)
            qs = np.clip(np.round(flat / scales[:, None]), -127, 127).astype(np.int8)
            blob = b"".join(
                scales[i].astype(np.float16).tobytes() + qs[i].tobytes()
                for i in range(flat.shape[0])
            )
            ttype = 8
        else:
            blob = arr.tobytes()
            ttype = 0
        dims = list(reversed(arr.shape))
        infos += (
            gstr(name)
            + struct.pack("<I", len(dims))
            + b"".join(struct.pack("<Q", d) for d in dims)
            + struct.pack("<IQ", ttype, off)
        )
        offsets.append(off)
        datas.append(blob)
        off += len(blob)
        off = (off + 31) // 32 * 32

    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), 1)
    meta = gstr("general.alignment") + struct.pack("<I", 4) + struct.pack("<I", 32)
    head = header + meta + infos
    pad = (-len(head)) % 32
    body = bytearray(head + b"\0" * pad)
    base = len(head) + pad
    for blob, o in zip(datas, offsets):
        need = base + o + len(blob)
        if len(body) < need:
            body.extend(b"\0" * (need - len(body)))
        body[base + o : base + o + len(blob)] = blob
    with open(path, "wb") as f:
        f.write(bytes(body))
