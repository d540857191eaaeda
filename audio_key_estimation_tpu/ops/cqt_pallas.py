"""Fused Pallas TPU kernel for the CQT octave response — sparse-window DMA.

Replaces the reference's librosa C-FFT per-file loop (KeyDataset.py:490-494)
on the device side; the polyphase downsample cascade stays in XLA (it needs
every sample; ops/cqt.py::downsample2 already runs it on the MXU).

Why a third design. Round 1 fused only the response matmul epilogue; round
2 consumed (TILE_T, stride)-blocks of the stream layout. Both DMA the FULL
octave stream into VMEM — but with hop >> n_fft (reference hop 4410 vs
n_fft 512) only ~12% of the stream ever participates in a frame, and the
XLA strided-conv path pays the same full-stream read. This kernel keeps the
padded stream in HBM (`memory_space=ANY`) and issues one small async copy
PER FRAME WINDOW (ypad[b_tile, off : off + n_fft], off = offset_r +
j*stride from a scalar-prefetched offset table), so HBM traffic drops to
the frames actually consumed: at B=256, T=601, 8 octaves that is ~630 MB
per step instead of the ~2.7 GB full-stream reads — the front-end's
remaining HBM wall (PERFNOTES.md round-3: 72 ms/step CQT, ~20 GB/step).
In VMEM each grid step then fuses:

    frames(TILE_B, TILE_T, n_fft)  ->  [cos|sin] matmul (MXU)
    -> magnitude -> per-bin scale (incl. PCM normalization) -> log1p

int16 (raw PCM) and bfloat16 stream storage DMA at half the bytes; the
matmul accumulates in float32 either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cqt import (CQTParams, downsample2, halfband_taps, interleave_streams,
                  kernel_bank, stream_plan)


def _tile_t(tq: int) -> int:
    """Frames per grid step: enough rows to feed the MXU without wasting
    DMAs on short low-octave streams (large q => tq of a few frames)."""
    return min(32, -(-tq // 8) * 8)


_TILE_B = 8


@functools.partial(
    jax.jit, static_argnames=("stride", "n_fft", "tq_pad", "tile_t",
                              "interpret"))
def _octave_response_sparse(ypad, offsets, kmat, scales, *, stride: int,
                            n_fft: int, tq_pad: int, tile_t: int,
                            interpret: bool = False):
    """(B, Lpad) padded octave signal -> (B, q, tq_pad, bpo) fused
    log1p-magnitude responses, reading only the frame windows from HBM.

    B must be a multiple of _TILE_B and tq_pad of tile_t (caller pads).
    Frame windows beyond the signal end are clamped to the last in-range
    window (their rows are sliced away by the caller).
    """
    B, Lpad = ypad.shape
    q = offsets.shape[0]
    bpo = kmat.shape[1] // 2
    tile_b = _TILE_B
    grid = (B // tile_b, q, tq_pad // tile_t)
    in_dtype = ypad.dtype

    def kernel(off_ref, ypad_ref, kmat_ref, scales_ref, out_ref,
               frames, sems):
        bi = pl.program_id(0)
        qi = pl.program_id(1)
        ti = pl.program_id(2)
        base = off_ref[qi] + ti * tile_t * stride
        copies = []
        for j in range(tile_t):
            off = jnp.minimum(base + j * stride, Lpad - n_fft)
            copies.append(pltpu.make_async_copy(
                ypad_ref.at[pl.ds(bi * tile_b, tile_b), pl.ds(off, n_fft)],
                frames.at[:, j], sems.at[j]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        fr = frames[:].reshape(tile_b * tile_t, n_fft).astype(jnp.float32)
        r = jnp.dot(fr, kmat_ref[:], preferred_element_type=jnp.float32)
        cc = r[:, :bpo]
        ss = r[:, bpo:]
        mag = jnp.sqrt(cc * cc + ss * ss) * scales_ref[:]
        out_ref[:, 0] = jnp.log1p(mag).reshape(tile_b, tile_t, bpo)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # offsets table
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # ypad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kmat
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
        ],
        out_specs=pl.BlockSpec(
            (_TILE_B, 1, tile_t, bpo),
            lambda s, b, qi, ti: (b, qi, ti, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_b, tile_t, n_fft), in_dtype),
            pltpu.SemaphoreType.DMA((tile_t,)),
        ],
    )

    frames_total = B * q * tq_pad
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, q, tq_pad, bpo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * frames_total * n_fft * 2 * bpo,
            bytes_accessed=(frames_total * n_fft * in_dtype.itemsize
                            + kmat.size * 4 + frames_total * bpo * 4),
            transcendentals=2 * frames_total * bpo,
        ),
        interpret=interpret,
    )(offsets, ypad, kmat, scales)


def _pad_signal_for_plan(cur, plan, n_fft, tq_pad):
    """Reflect-pad like librosa's centered frames, then zero-extend so the
    LAST REAL frame window is in range (clamping covers the tq_pad tail)."""
    q, stride, offsets, tq = plan
    half = n_fft // 2
    need = max(offsets) + (tq - 1) * stride + n_fft
    ypad = jnp.pad(cur, ((0, 0), (half, half + 1)), mode="reflect")
    if ypad.shape[1] < need:
        ypad = jnp.pad(ypad, ((0, 0), (0, need - ypad.shape[1])))
    return ypad


def cqt_pallas(y: jax.Array, p: CQTParams, *,
               stream_dtype: jnp.dtype | str = jnp.float32,
               interpret: bool = False) -> jax.Array:
    """Batched fused log1p-CQT: (B, L) -> (B, n_bins, T).

    Same semantics as ops.cqt.cqt(..., log1p=True). The half-band polyphase
    cascade runs in XLA; each octave's frame read + filterbank + magnitude
    + scale + log1p runs as the sparse-window Pallas kernel. int16 input
    (raw PCM) is DMA'd as int16 for the top octave with the normalization
    folded into the scale epilogue. stream_dtype=bfloat16 stores the
    downsampled octave signals (and their DMAs) at half the bytes.
    Octaves whose stream stride is smaller than the frame length fall back
    to the XLA gather path.
    """
    from .cqt import cqt as _xla_cqt

    if y.ndim == 1:
        y = y[None]
    stream_dtype = jnp.dtype(stream_dtype)
    in_scale = 1.0
    if jnp.issubdtype(y.dtype, jnp.integer):
        if y.dtype != jnp.int16:
            raise ValueError(f"raw PCM input must be int16, got {y.dtype}")
        in_scale = 1.0 / 32768.0
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]],
                                      axis=1))
    taps = halfband_taps()   # host values: they build the polyphase matrix
    n_frames = 1 + y.shape[1] // p.hop

    plans = [stream_plan(p.hop, o, n_fft, n_frames) for o in range(p.octaves)]
    if any(plan is None for plan in plans):
        return _xla_cqt(y, p)

    b = y.shape[0]
    b_pad = -(-b // _TILE_B) * _TILE_B
    octs = []
    cur = y if in_scale != 1.0 else y.astype(jnp.float32)
    for o, plan in enumerate(plans):
        if o > 0:
            cur = downsample2(cur, taps,
                              out_scale=in_scale if o == 1 else 1.0)
            if stream_dtype != jnp.float32:
                cur = cur.astype(stream_dtype)
        q, stride, offsets, tq = plan
        tile_t = _tile_t(tq)
        tq_pad = -(-tq // tile_t) * tile_t
        ypad = _pad_signal_for_plan(cur, plan, n_fft, tq_pad)
        if b_pad != b:
            ypad = jnp.pad(ypad, ((0, b_pad - b), (0, 0)))
        oct_scale = in_scale if o == 0 else 1.0
        scales = jnp.asarray(
            bank["scales"] * (oct_scale * 2.0 ** (o / 2)),
            jnp.float32)[None, :]
        resp = _octave_response_sparse(
            ypad, jnp.asarray(offsets, jnp.int32), kmat, scales,
            stride=stride, n_fft=n_fft, tq_pad=tq_pad, tile_t=tile_t,
            interpret=interpret)
        resp = resp[:b, :, :tq]
        octs.append(interleave_streams(resp, plan, n_frames))
    out = jnp.concatenate(list(reversed(octs)), axis=-1)
    return jnp.transpose(out, (0, 2, 1))
