"""Fused Pallas TPU kernel for the CQT octave response.

The hot inner op of the front-end (ops/cqt.py::_octave_response) as one
Pallas kernel: a single MXU matmul against the combined cos|sin kernel bank
with the magnitude + sqrt-length scale + log1p epilogue fused in-register —
the (T, 2*bpo) complex response never round-trips through HBM, and Pallas
double-buffers the frame tiles HBM->VMEM automatically.

The overlapping-window frame gather stays in XLA (a take along the signal),
which Mosaic handles better than per-frame unaligned HBM DMAs (arbitrary
frame centers break the (8,128) HBM tiling alignment required for manual
DMA slices — measured on TPU v5e).

Replaces the reference's librosa C-FFT per-file loop (KeyDataset.py:490-494)
as the throughput-critical component (BASELINE.json north_star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cqt import CQTParams, downsample2, halfband_taps, kernel_bank

TILE_T = 128  # frames per grid step


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_response(frames, kmat, scales, *, interpret: bool = False):
    """(B, T, n_fft) frames -> (B, T, bpo) log1p-magnitudes, tiled over T."""
    b, t, n_fft = frames.shape
    bpo = kmat.shape[1] // 2
    t_pad = -(-t // TILE_T) * TILE_T
    if t_pad != t:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - t), (0, 0)))
    frames = frames.reshape(b * (t_pad // TILE_T), TILE_T, n_fft)

    grid_spec = pl.GridSpec(
        grid=(frames.shape[0],),
        in_specs=[
            pl.BlockSpec((1, TILE_T, n_fft), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, bpo), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(frames_ref, kmat_ref, scales_ref, out_ref):
        r = jnp.dot(frames_ref[0], kmat_ref[:],
                    preferred_element_type=jnp.float32)
        cc = r[:, :bpo]
        ss = r[:, bpo:]
        out_ref[0] = jnp.log1p(jnp.sqrt(cc * cc + ss * ss) * scales_ref[:])

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((frames.shape[0], TILE_T, bpo),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * frames.shape[0] * TILE_T * n_fft * 2 * bpo,
            bytes_accessed=(frames.size + kmat.size
                            + frames.shape[0] * TILE_T * 2 * bpo) * 4,
            transcendentals=frames.shape[0] * TILE_T * bpo,
        ),
        interpret=interpret,
    )(frames, kmat, scales)
    return out.reshape(b, t_pad, bpo)[:, :t]


def cqt_pallas(y: jax.Array, p: CQTParams, *, interpret: bool = False) -> jax.Array:
    """Batched fused log1p-CQT: (B, L) -> (B, n_bins, T).

    Same semantics as ops.cqt.cqt(..., log1p=True); the halfband downsample
    cascade and frame gather stay in XLA, each octave's response runs as the
    fused Pallas kernel above.
    """
    if y.ndim == 1:
        y = y[None]
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    half = n_fft // 2
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]], axis=1))
    taps = jnp.asarray(halfband_taps())

    n_frames = 1 + y.shape[1] // p.hop
    t_idx = jnp.arange(n_frames, dtype=jnp.float32)
    arange_fft = jnp.arange(n_fft)[None, :]

    octs = []
    cur = y.astype(jnp.float32)
    for o in range(p.octaves):
        if o > 0:
            cur = downsample2(cur, taps)
        centers = jnp.round(t_idx * (p.hop / (2 ** o))).astype(jnp.int32)
        ypad = jnp.pad(cur, ((0, 0), (half, half + 1)), mode="reflect")
        frames = ypad[:, centers[:, None] + arange_fft]      # (B, T, n_fft)
        scales = jnp.asarray(bank["scales"] * (2.0 ** (o / 2)))[None, :]
        octs.append(_fused_response(frames, kmat, scales, interpret=interpret))
    out = jnp.concatenate(list(reversed(octs)), axis=-1)
    return jnp.transpose(out, (0, 2, 1))
