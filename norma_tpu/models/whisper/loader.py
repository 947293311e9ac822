"""Shared checkpoint loader for the whisper Definitions.

Re-creation of the loader halves of ``monolingual.rs:186-451`` /
``multilingual.rs``: resolve config/tokenizer/weights (HF hub download with
pinned revision, or a local directory for offline use), parse the config,
load weights onto the selected device, resolve special tokens, and build the
decode engine (the suppression masks are built inside DecodeEngine from the
config's suppress list, mirroring monolingual.rs:252-296).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...constants import TRANSCRIBE_TOKEN
from ...decode import (
    DecodeEngine,
    LanguageState,
    SpecialTokens,
    SpeculativeEngine,
)
from ...errors import MelBinsError, WhisperError
from ...model.config import WhisperConfig
from ...model.load import load_safetensors
from ...tracing import instrument

logger = logging.getLogger("norma_tpu.loader")
from .. import CommonModelParams, SelectedDevice  # noqa: E402

_DTYPE_NAMES = {jnp.float32: "f32", jnp.bfloat16: "bf16", jnp.float16: "f16"}
_DTYPE_FROM_NAME = {v: k for k, v in _DTYPE_NAMES.items()}


def definition_ext_to_dict(defn) -> dict:
    """Serialize the TPU-extension fields both Definitions share.

    Without these, a round-tripped Definition silently rebuilt an
    unquantized, non-speculative, untimestamped model — to_dict/from_dict
    must cover every constructor knob, like the reference's serde derive
    covers every struct field (monolingual.rs:29).
    """
    d = {
        "dtype": _DTYPE_NAMES.get(defn.dtype, "f32"),
        "quantize_logits": defn.quantize_logits,
        "quantize_decoder": defn.quantize_decoder,
        "quantize_encoder": defn.quantize_encoder,
        "quantize_cross_kv": defn.quantize_cross_kv,
        "quantize_self_kv": defn.quantize_self_kv,
        "mel_center": defn.mel_center,
        "timestamps": defn.timestamps,
        "spec_k": defn.spec_k,
    }
    if getattr(defn, "config_overrides", None):
        d["config_overrides"] = dict(defn.config_overrides)
    # Optional fields only when set (keeps old payloads readable).
    if defn.local_dir:
        d["local_dir"] = defn.local_dir
    if defn.draft:
        d["draft"] = defn.draft  # "auto" is resolved at construction
    if defn.draft_local_dir:
        d["draft_local_dir"] = defn.draft_local_dir
    return d


def apply_definition_ext(defn, d: dict) -> None:
    """Restore the fields written by :func:`definition_ext_to_dict`.

    Tolerates payloads from before these fields existed (defaults apply).
    """
    defn.dtype = _DTYPE_FROM_NAME.get(d.get("dtype", "f32"), jnp.float32)
    defn.quantize_logits = d.get("quantize_logits", False)
    defn.quantize_decoder = d.get("quantize_decoder", False)
    defn.quantize_encoder = d.get("quantize_encoder", False)
    defn.quantize_cross_kv = d.get("quantize_cross_kv", False)
    defn.quantize_self_kv = d.get("quantize_self_kv", False)
    defn.mel_center = d.get("mel_center", False)
    defn.timestamps = d.get("timestamps", False)
    defn.spec_k = d.get("spec_k", 4)
    defn.local_dir = d.get("local_dir")
    defn.draft = d.get("draft")
    defn.draft_local_dir = d.get("draft_local_dir")
    defn.config_overrides = d.get("config_overrides")
from . import token_id
from .languages import ALL_LANGUAGES
from .model import WhisperModel
from .tokenizer import WhisperTokenizer


@dataclass(frozen=True)
class CheckpointFiles:
    config: str
    tokenizer: str
    weights: str


def _file_names(quantized_ext: Optional[str]) -> Tuple[str, str, str]:
    """Mirrors monolingual.rs:189-211: quantized checkpoints use
    ``config-{ext}.json`` / ``tokenizer-{ext}.json`` / ``model-{ext}-q80.gguf``,
    normal ones ``config.json`` / ``tokenizer.json`` / ``model.safetensors``."""
    if quantized_ext is not None:
        return (
            f"config-{quantized_ext}.json",
            f"tokenizer-{quantized_ext}.json",
            f"model-{quantized_ext}-q80.gguf",
        )
    return ("config.json", "tokenizer.json", "model.safetensors")


def _local_files(local_dir: str, names) -> CheckpointFiles:
    paths = tuple(os.path.join(local_dir, n) for n in names)
    for p in paths:
        if not os.path.exists(p):
            raise WhisperError(f"checkpoint file not found: {p}")
    return CheckpointFiles(*paths)


def _hub_download(repo_id: str, filename: str, revision: str) -> str:
    """One hub fetch (cache-aware); monkeypatchable seam for tests."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise WhisperError(
            "huggingface_hub unavailable and no local_dir given"
        ) from e
    return hf_hub_download(repo_id=repo_id, filename=filename, revision=revision)


def resolve_files(
    repo_id: str,
    revision: str,
    quantized_ext: Optional[str],
    local_dir: Optional[str] = None,
) -> CheckpointFiles:
    """Find config/tokenizer/weights locally or via the HF hub (blocking)."""
    names = _file_names(quantized_ext)
    if local_dir is not None:
        return _local_files(local_dir, names)
    return CheckpointFiles(
        *(_hub_download(repo_id, n, revision) for n in names)
    )


async def resolve_files_async(
    repo_id: str,
    revision: str,
    quantized_ext: Optional[str],
    local_dir: Optional[str] = None,
) -> CheckpointFiles:
    """Structurally-async resolve: the reference's ``try_to_model`` awaits
    genuinely-async hf-hub downloads (monolingual.rs:186-318, tokio api).
    Here the three files fetch CONCURRENTLY and the coroutine yields at each
    network await, so multiple model loads overlap on one event loop."""
    import asyncio

    names = _file_names(quantized_ext)
    if local_dir is not None:
        return _local_files(local_dir, names)
    paths = await asyncio.gather(
        *(asyncio.to_thread(_hub_download, repo_id, n, revision) for n in names)
    )
    return CheckpointFiles(*paths)


@instrument(
    fields={"repo_id": lambda a: a.get("repo_id"), "revision": lambda a: a.get("revision")}
)  # reference #[instrument], monolingual.rs:185,319
def build_model(
    *,
    repo_id: str,
    revision: str,
    quantized_ext: Optional[str],
    device: SelectedDevice,
    task_token_str: str = TRANSCRIBE_TOKEN,
    const_language_token_str: Optional[str] = None,
    local_dir: Optional[str] = None,
    dtype=jnp.float32,
    seed: int = 0,
    quantize_logits: "bool | str" = False,
    quantize_decoder: bool = False,
    quantize_encoder: bool = False,
    quantize_cross_kv: "bool | str" = False,
    quantize_self_kv: bool = False,
    mel_center: bool = False,
    timestamps: bool = False,
    config_overrides: Optional[dict] = None,
    files: Optional[CheckpointFiles] = None,
    draft_repo_id: Optional[str] = None,
    draft_revision: str = "main",
    draft_local_dir: Optional[str] = None,
    draft_files: Optional[CheckpointFiles] = None,
    spec_k: "int | str" = 4,
) -> WhisperModel:
    """Build a WhisperModel from a checkpoint.

    ``const_language_token_str`` set => monolingual (ConstLang); otherwise
    the model detects the language per utterance (Detect).  ``files``
    short-circuits resolution (the async path resolves ahead of time).

    ``draft_repo_id``/``draft_files`` select a shallow DRAFT checkpoint
    (e.g. distil-large-v3 drafting for large-v3 — the distil models share
    the target's encoder lineage, vocab and tokenizer) and switch the
    decode engine to speculative draft/verify greedy decoding
    (:class:`~norma_tpu.decode.SpeculativeEngine`): the draft proposes
    ``spec_k`` tokens per round and the target scores them in one chunked
    forward, committing up to ``spec_k + 1`` tokens per target weight
    stream with EXACTLY the target-only greedy output.  No reference
    equivalent (the reference decodes one token per target forward,
    model.rs:317-371); this is a TPU-native serving lever for the
    weight-bound deep decoders.
    """
    # True/"int8" -> per-channel int8 head; "int4" -> blockwise int4.
    # Validated up front so a bad value errors in EVERY flag combination —
    # including the pre-quantized branch, which otherwise coerces a typo'd
    # truthy string into a want-tier and merely warns.
    if quantize_logits not in (None, False, True, "int8", "int4"):
        raise ValueError(
            f"quantize_logits={quantize_logits!r}: expected True,"
            " False, 'int8' or 'int4'"
        )
    if files is None:
        files = resolve_files(repo_id, revision, quantized_ext, local_dir)
    cfg = WhisperConfig.from_json(files.config)
    if config_overrides:
        # Serving/perf knobs the checkpoint's config.json cannot carry
        # (encoder_attn_impl, cross_kv_impl, max_target_positions, ...) —
        # without this hook the documented levers are unreachable from
        # the public Definition path.  Applied to the TARGET config only
        # (a speculative draft keeps checkpoint defaults: it decodes at
        # B=1-per-stream where the defaults are the measured winners).
        valid = {f.name for f in dataclasses.fields(WhisperConfig)}
        unknown = set(config_overrides) - valid
        if unknown:
            raise ValueError(
                f"unknown WhisperConfig field(s) in config_overrides: "
                f"{sorted(unknown)}; valid fields: {sorted(valid)}"
            )
        cfg = cfg.with_(**config_overrides)
    if cfg.max_target_positions >= 448 and not cfg.decode_buckets and not (
        config_overrides and "decode_buckets" in config_overrides
    ):
        # Default bucketed decode at production decode lengths (r5):
        # bitwise-identical output, measured −1.7% on the B=8 serving
        # stack and −6.9% at B=1 with this ladder (−16.7% with the
        # opt-in 48-step one) — a pure win whose only cost is compiling
        # the chained loops once at warmup.  Disable explicitly with
        # config_overrides={"decode_buckets": ()}.  PERF.md "Bucketed
        # decode".
        cfg = cfg.with_(decode_buckets=(128, 256))
    tokenizer = WhisperTokenizer.from_file(files.tokenizer)

    jdev = device.to_jax_device()
    prequantized = False
    if quantized_ext is not None:
        from ...model.gguf import load_gguf_q8

        params = load_gguf_q8(files.weights, cfg, dtype)
    else:
        from ...model.serialize import peek_format

        if peek_format(files.weights):
            # Pre-quantized/pre-fused params file written by
            # tools/quantize_checkpoint.py (the GGUF-q8_0-workflow
            # equivalent for our layout): load structurally, skip
            # HF-name mapping, QKV fusion and re-quantization — the
            # quantize_* flags below are already baked in.
            from ...model.serialize import load_params_file

            params, _qmeta = load_params_file(files.weights)
            prequantized = True
            # Like GGUF, a params file fixes its dtypes at conversion
            # time; the Definition's dtype= is not applied.  Surface a
            # mismatch instead of silently ignoring it.
            file_dt = _qmeta.get("dtype")
            # Same name table the converter writes — an inline re-mapping
            # here diverged for f16 once and warned on every correct load.
            want_dt = _DTYPE_NAMES.get(dtype, str(dtype))
            if file_dt and file_dt != want_dt:
                logger.warning(
                    "pre-quantized params file was converted at dtype=%s; "
                    "the requested dtype=%s is ignored (re-run "
                    "tools/quantize_checkpoint.py --dtype to change it)",
                    file_dt, want_dt,
                )
            # Same for the quantize_* flags: a params file bakes its quant
            # tiers in at conversion time.  Surface a mismatch so an A/B
            # doesn't silently measure the wrong configuration.
            want_tiers = set()
            if quantize_decoder:
                want_tiers.add("decoder-w8")
                if quantize_logits == "int4":
                    want_tiers.add("logits-int4")
            elif quantize_logits:
                want_tiers.add(
                    "logits-int4" if quantize_logits == "int4" else "logits-w8"
                )
            if quantize_encoder:
                want_tiers.add("encoder-w8a8")
            file_tiers = set(
                t for t in (_qmeta.get("quant") or "").split("+")
                if t and t != "none"
            )
            if want_tiers - file_tiers:
                logger.warning(
                    "pre-quantized params file has quant tiers %s; the "
                    "requested %s are ignored (re-run "
                    "tools/quantize_checkpoint.py with the matching flags)",
                    sorted(file_tiers) or "none",
                    sorted(want_tiers - file_tiers),
                )
        else:
            params = load_safetensors(files.weights, cfg, dtype)
    if not prequantized:
        from ...model.load import fuse_qkv

        params = fuse_qkv(params)  # one fused QKV matmul in the hot path
        if quantize_decoder:
            from ...model.quant import quantize_decoder as _qd

            # An explicit int4 head request composes with the int8 layers
            # instead of being silently downgraded to the int8 head.
            params = _qd(
                params,
                logits="int4" if quantize_logits == "int4" else "int8",
            )
        elif quantize_logits:
            if quantize_logits == "int4":
                from ...model.quant import quantize_logits_head_int4

                params = quantize_logits_head_int4(params)
            else:
                from ...model.quant import quantize_logits_head

                params = quantize_logits_head(params)
        if quantize_encoder:
            # w8a8 encoder: int8-MXU compute for the window-dominant
            # cost.  Orthogonal to the decoder knobs (combine freely).
            from ...model.quant import quantize_encoder as _qe

            params = _qe(params)
    params = jax.device_put(params, jdev)

    st = SpecialTokens.from_tokenizer(tokenizer, task_token_str)

    lang_token_ids = [token_id(tokenizer, l.token()) for l in ALL_LANGUAGES]

    if const_language_token_str is not None:
        lang_state = LanguageState(
            const=token_id(tokenizer, const_language_token_str)
        )
    else:
        lang_state = LanguageState()

    if (
        draft_repo_id is not None
        or draft_files is not None
        or draft_local_dir is not None
    ):
        if quantize_self_kv:
            raise ValueError(
                "quantize_self_kv is not supported with speculative "
                "decoding (the draft/verify cache paths keep bf16 "
                "self-KV) — checked before any draft download/load"
            )
        if draft_files is None:
            draft_files = resolve_files(
                draft_repo_id, draft_revision, None, draft_local_dir
            )
        draft_cfg = WhisperConfig.from_json(draft_files.config)
        from ...model.serialize import peek_format as _peek

        if _peek(draft_files.weights):
            from ...model.serialize import load_params_file

            draft_params, _ = load_params_file(draft_files.weights)
        else:
            from ...model.load import fuse_qkv as _fuse

            draft_params = _fuse(
                load_safetensors(draft_files.weights, draft_cfg, dtype)
            )
        draft_params = jax.device_put(draft_params, jdev)
        engine = SpeculativeEngine(
            params, cfg, draft_params, draft_cfg, st,
            language_token_ids=lang_token_ids,
            mel_center=mel_center,
            quantize_cross_kv=quantize_cross_kv,
            spec_k=spec_k,
        )
    else:
        engine = DecodeEngine(
            params, cfg, st,
            language_token_ids=lang_token_ids,
            mel_center=mel_center,
            quantize_cross_kv=quantize_cross_kv,
            quantize_self_kv=quantize_self_kv,
        )
    return WhisperModel(
        engine,
        tokenizer,
        lang_state,
        language_tokens=lang_token_ids,
        seed=seed,
        timestamps=timestamps,
    )


async def build_model_async(**kwargs) -> WhisperModel:
    """Structurally-async build (reference: try_to_model,
    monolingual.rs:186-318): the three checkpoint files download
    concurrently with real await points, then the CPU/device-bound model
    construction runs off the event loop.  Two model loads awaited together
    overlap their downloads — and a speculative build's draft checkpoint
    downloads concurrently with its target, not serially inside
    build_model."""
    import asyncio

    draft_wanted = (
        kwargs.get("draft_repo_id") is not None
        or kwargs.get("draft_local_dir") is not None
    ) and kwargs.get("draft_files") is None
    # Mirror build_model's pre-download guard: an invalid speculative flag
    # combination must fail BEFORE any bytes move — and before any
    # coroutine is created, or the raise leaks a never-awaited coroutine.
    if draft_wanted and kwargs.get("quantize_self_kv"):
        raise ValueError(
            "quantize_self_kv is not supported with speculative "
            "decoding (the draft/verify cache paths keep bf16 "
            "self-KV) — checked before any draft download/load"
        )
    target = resolve_files_async(
        kwargs["repo_id"],
        kwargs["revision"],
        kwargs["quantized_ext"],
        kwargs.get("local_dir"),
    )
    if draft_wanted:
        files, draft_files = await asyncio.gather(
            target,
            resolve_files_async(
                kwargs.get("draft_repo_id"),
                kwargs.get("draft_revision", "main"),
                None,
                kwargs.get("draft_local_dir"),
            ),
        )
        kwargs["draft_files"] = draft_files
    else:
        files = await target
    return await asyncio.to_thread(build_model, files=files, **kwargs)
