"""Octave folding and time pooling (reference models.py:82-133, 349-350)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def octave_max_pool(x: jax.Array, pitch_classes: int = 12,
                    kernel_depth: int = 1) -> jax.Array:
    """Fold pitches into pitch classes by max over octaves (models.py:95-106).

    Pads the pitch axis to a multiple of `pitch_classes` with -inf, then a
    dilated max-window (dilation = pitch_classes) takes, for each pitch class,
    the max across all octaves.

    x: (N, P, T, C) -> (N, pitch_classes, T - kernel_depth + 1, C)
    """
    p = x.shape[1]
    ksize = -(-p // pitch_classes)  # ceil(P / 12)
    pad = ksize * pitch_classes - p
    if pad:
        fill = jnp.full((x.shape[0], pad, x.shape[2], x.shape[3]),
                        -jnp.inf, dtype=x.dtype)
        x = jnp.concatenate([x, fill], axis=1)
    if kernel_depth == 1:
        # The dilated window over rows {pc, pc+12, ...} is exactly a
        # reshape-(octave, pc)-and-reduce — differentiable and cheaper than
        # lax.reduce_window with window_dilation (which also has no VJP).
        n, _, t, c = x.shape
        return jnp.max(x.reshape(n, ksize, pitch_classes, t, c), axis=1)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, ksize, kernel_depth, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
        window_dilation=(1, pitch_classes, 1, 1))


def octave_dilated_conv(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array | None = None, *,
                        pitch_classes: int = 12,
                        pitches_in: int | None = None) -> jax.Array:
    """Learned octave folding: dilated conv (models.py:108-133, flag p2pc_conv).

    kernel: (ksize, kd, Cin, Cout) with row dilation = pitch_classes.
    The reference pads with -inf before the conv (KeyDataset-style padding
    value reused); with the default geometry (P divisible by 12) the pad is
    empty. A non-empty -inf pad would poison a linear conv, so we pad with
    zeros instead and note the divergence (reference models.py:116 marks the
    padding "not really needed").
    """
    p = x.shape[1]
    if pitches_in is None:
        pitches_in = p
    ksize = kernel.shape[0]
    pad = ksize * pitch_classes - pitches_in
    if pad:
        fill = jnp.zeros((x.shape[0], pad, x.shape[2], x.shape[3]), x.dtype)
        x = jnp.concatenate([x, fill], axis=1)
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)], dimension_numbers=_DN,
        rhs_dilation=(pitch_classes, 1))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def time_max_pool(x: jax.Array, pool_size: int) -> jax.Array:
    """MaxPool2d((1, pool_size)) with torch floor semantics (models.py:349-350)."""
    t = x.shape[2]
    t_keep = (t // pool_size) * pool_size
    x = x[:, :, :t_keep]
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, pool_size, 1),
        window_strides=(1, 1, pool_size, 1),
        padding="VALID")
