"""Masked temporal reduction over true sequence lengths.

Replaces the reference's per-sample Python loop (models.py:754-785) with a
single vectorized masked reduction — the loop is a batch-size-linear host
bottleneck on GPU and uncompilable under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def actual_output_length(seq_length: jax.Array, *, num_layers: int,
                         time_pool_size: int, kernel_size: int,
                         head_layers: int) -> jax.Array:
    """Model-output frames for a given input length (models.py:757-760).

    floor-divides by time_pool_size once per layer >= 1, then subtracts the
    heads' receptive-field shrinkage (kernel_size-1 per head layer).
    """
    length = seq_length.astype(jnp.float32)
    for _ in range(num_layers - 1):
        length = jnp.floor(length / time_pool_size)
    return length.astype(jnp.int32) - (kernel_size - 1) * head_layers


def masked_time_reduce(x: jax.Array, lengths: jax.Array | None, *,
                       use_max: bool = False) -> jax.Array:
    """Reduce (N, R, T) -> (N, R) over the first `lengths[n]` frames.

    With lengths=None reduces over the full axis (models.py:786-797).
    Mean matches torch.mean over a slice; max matches torch.max.

    Note: with use_max the reference only max-pools batch element 0 and
    mean-pools the rest (models.py:766-783) — a loop bug we do not reproduce;
    the intended uniform reduction is applied to every element.
    """
    if lengths is None:
        return jnp.max(x, axis=-1) if use_max else jnp.mean(x, axis=-1)
    t = x.shape[-1]
    mask = jnp.arange(t)[None, None, :] < lengths[:, None, None]
    if use_max:
        return jnp.max(jnp.where(mask, x, -jnp.inf), axis=-1)
    denom = jnp.maximum(lengths, 1).astype(x.dtype)[:, None]
    return jnp.sum(jnp.where(mask, x, 0), axis=-1) / denom
