"""Transposition-equivariant pitch-class ops as pure JAX functions.

These are the compute primitives of PitchClassNet, designed TPU-first:
NHWC layout ``(batch, pitch, time, channel)`` so XLA tiles convolutions onto
the MXU, static shapes throughout, and circular boundary handling expressed
as concatenation (bit-identical to the reference semantics at
models.py:45-47, so the equivariance proof carries over exactly).

Weight layouts are JAX-native HWIO; `models/torch_port.py` transposes torch
OIHW checkpoints into these layouts.

Reference components reimplemented here:
  equivariant_pc_conv      <- EquivariantPitchClassConvolutionSimple (models.py:22-51)
  circular_conv2d          <- Pitch2Pitch / ResBlock convs, pool_semi (models.py:221-232,313,337)
  semitone_pool_conv       <- layer-0/"re-pool" third->semitone conv (models.py:313,337)
  third_upsample           <- up_sixth ConvTranspose2d((3,1),(3,1)) (models.py:325)
  pc_to_pitch_tile         <- PitchClass2Pitch (models.py:135-143)
  pc_to_pitch_memory_add   <- PitchClass2Pitch_MemoryVariant (models.py:145-166)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def wrap_pitch_classes(x: jax.Array, pitch_classes: int = 12) -> jax.Array:
    """Append rows 0..pc-2 below the last row (reference models.py:45).

    A full-height conv over the wrapped input is circular-shift equivariant
    by construction: shifting the 12 input rows circularly by n shifts the 12
    output rows by n.
    """
    return jnp.concatenate([x, x[:, : pitch_classes - 1]], axis=1)


def equivariant_pc_conv(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array | None = None, *,
                        same_depth_padding: bool = False) -> jax.Array:
    """Circular conv over the pitch-class axis (models.py:36-51).

    x      : (N, 12, T, Cin)
    kernel : (12, kd, Cin, Cout)  — full height; output height is again 12
    returns: (N, 12, T', Cout), T' = T if same_depth_padding else T - kd + 1

    Evaluated via the circulant expansion rather than a height-12
    convolution over the wrap-concat input:

        out(n,p,t,o) = sum_{q,dt,ci} x(n,q,t+dt,ci) * W[(q-p) % 12, dt,ci,o]

    This is term-for-term the reference's wrap-concat conv (xw row p+dp is
    x row (p+dp) % 12 with dp = q-p): shifting the input rows permutes q,
    which permutes the output rows over the same summands — equivariance
    holds to float roundoff (< 1e-7; the matmul tiling may reassociate the
    reduction). The XLA TPU backend compiles a kernel-height-12 conv in
    ~60 s and runs it off the MXU; the circulant form lowers to a single
    MXU-friendly op (see below).
    """
    pc = kernel.shape[0]
    kd = kernel.shape[1]
    cin, cout = kernel.shape[2], kernel.shape[3]
    if same_depth_padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (kd // 2, kd // 2), (0, 0)))
    n, _, t, _ = x.shape
    # circulant expansion: wexp[q, p] = kernel[(q - p) % pc]
    wexp = jnp.stack([jnp.roll(kernel, p, axis=0) for p in range(pc)],
                     axis=1)                             # (q, p, kd, Cin, Cout)
    # fold the pitch-class axis into channels and run ONE standard time-conv:
    # out(n,p,t,o) = sum_{q,dt,ci} x(n,q,t+dt,ci) * wexp[q,p,dt,ci,o]
    # as conv over (N, 1, T, pc*Cin) with kernel (1, kd, pc*Cin, pc*Cout).
    # An explicit time-im2col einsum materializes a kd-times-duplicated cols
    # tensor in HBM (the model's dominant traffic at large batch); the conv
    # form streams patches through VMEM instead, and its channel counts
    # (12*Cin x 12*Cout) are finally MXU-sized.
    xf = x.transpose(0, 2, 1, 3).reshape(n, 1, t, pc * cin)
    wf = wexp.transpose(2, 0, 3, 1, 4).reshape(1, kd, pc * cin, pc * cout)
    y = lax.conv_general_dilated(xf, wf.astype(x.dtype), window_strides=(1, 1),
                                 padding="VALID", dimension_numbers=_DN)
    y = y.reshape(n, t - kd + 1, pc, cout).transpose(0, 2, 1, 3)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _circular_pad(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Wrap-pad the pitch (axis 1) and time (axis 2) axes."""
    if ph > 0:
        x = jnp.concatenate([x[:, -ph:], x, x[:, :ph]], axis=1)
    if pw > 0:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    return x


def circular_conv2d(x: jax.Array, kernel: jax.Array,
                    bias: jax.Array | None = None, *,
                    strides: tuple = (1, 1),
                    circular_pad: tuple = None) -> jax.Array:
    """Conv2d with torch-style circular padding (models.py:221,230,409).

    circular_pad defaults to (kh//2, kw//2) — torch's
    ``padding=(k//2,k//2), padding_mode='circular'``.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if circular_pad is None:
        circular_pad = (kh // 2, kw // 2)
    xp = _circular_pad(x, *circular_pad)
    y = lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), window_strides=strides,
        padding=[(0, 0), (0, 0)], dimension_numbers=_DN)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def semitone_pool_conv(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """Third-of-semitone -> semitone learned pooling (models.py:313,337).

    Torch: Conv2d(k=3, stride=(3,1), padding=(0,1), padding_mode='circular')
    i.e. circular padding on the *time* axis only; pitch height divides by 3.
    x: (N, P, T, C) -> (N, P//3, T, C')
    """
    return circular_conv2d(x, kernel, bias, strides=(3, 1), circular_pad=(0, 1))


def third_upsample(x: jax.Array, kernel: jax.Array,
                   bias: jax.Array | None = None) -> jax.Array:
    """Semitone -> third-of-semitone transposed conv (models.py:325).

    Torch ConvTranspose2d(kernel=(3,1), stride=(3,1)) with kernel == stride is
    exactly a per-row expansion: out[:, 3p+r] = sum_ci x[:, p, :, ci] * w[r, ci, :].
    Expressed as an einsum + reshape (a single MXU matmul) instead of a
    transposed convolution.

    x: (N, P, T, Cin); kernel: (3, Cin, Cout) -> (N, 3P, T, Cout)
    """
    n, p, t, _ = x.shape
    y = jnp.einsum("nptc,rcd->nprtd", x, kernel.astype(x.dtype))
    y = y.reshape(n, p * 3, t, kernel.shape[2])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def pc_to_pitch_tile(x: jax.Array, pitches: int) -> jax.Array:
    """Tile pitch-class rows up to `pitches` rows and crop (models.py:140-143)."""
    reps = -(-pitches // x.shape[1])  # ceil
    return jnp.tile(x, (1, reps, 1, 1))[:, :pitches]


def pc_to_pitch_memory_add(pitches: jax.Array, pitch_classes: jax.Array,
                           n_pc_rows: int) -> jax.Array:
    """Memory variant: add pc features onto pitch features (models.py:151-166).

    Channel groups of `pitch_classes` are summed down to the pitch stream's
    channel count, then broadcast-added over row-major blocks of the pitch
    axis (reference reshape semantics preserved: pitch axis split as
    (n_pc_rows, P//n_pc_rows) row-major).

    pitches       : (N, P, T, C1)
    pitch_classes : (N, n_pc_rows, T, C2) with C2 % C1 == 0
    """
    n, p, t, c1 = pitches.shape
    c2 = pitch_classes.shape[-1]
    pc = pitch_classes.reshape(n, n_pc_rows, t, c1, c2 // c1).sum(axis=-1)
    blocks = p // n_pc_rows
    out = pitches.reshape(n, n_pc_rows, blocks, t, c1) + pc[:, :, None]
    return out.reshape(n, p, t, c1)
