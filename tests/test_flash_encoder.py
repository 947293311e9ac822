"""Trace-time checks of the flash encoder attention wrappers.

The kernels only *execute* on TPU (numerics are hardware-verified by
tools/verify_encoder_attn_tpu.py), but block-size handling and shapes are
checked at trace time, so ``jax.eval_shape`` pins them on any backend.
"""

import jax
import jax.numpy as jnp

from norma_tpu.ops.flash_encoder import jax_flash_self_attention


def _shape_of(T: int, block: int):
    q = jnp.zeros((1, T, 64), jnp.bfloat16)
    return jax.eval_shape(
        lambda q: jax_flash_self_attention(
            q, q, q, 2, block_q=block, block_k=block
        ),
        q,
    )


def test_blocks_clamped_to_short_sequences():
    """The tuned 1536 tiles exceed a short encoder's padded length; the
    wrapper must clamp instead of tripping pallas' BlockSizes check
    (regression: flash_attention=True on a max_source_positions=512
    model raised ValueError at trace time)."""
    out = _shape_of(500, 1536)
    assert out.shape == (1, 500, 64)
    out = _shape_of(512, 1536)
    assert out.shape == (1, 512, 64)


def test_production_length_keeps_tuned_tiles():
    out = _shape_of(1500, 1536)
    assert out.shape == (1, 1500, 64)
