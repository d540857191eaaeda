"""Fused Pallas TPU kernel for the CQT octave response — frame-table DMA.

Replaces the reference's librosa C-FFT per-file loop (KeyDataset.py:490-494)
on the device side; the polyphase downsample cascade stays in XLA (it needs
every sample; ops/cqt.py::downsample2 already runs it on the MXU).

Why a fourth design. Rounds 1-3 all organized the octave response around
the *stream* decomposition of the frame centers (ops/cqt.py::stream_plan),
either materializing streams in HBM (r1/r2) or DMA-ing per-stream windows
(r3, sparse-window). But streams only matter to the XLA path, which needs
integer-strided slices; a kernel addressing HBM directly needs only the
FRAME START of each window, and those are **static host-side integers**
(start(t) = round(t*hop/2**o), reflect-pad offset included). The r3 kernel
paid for the stream detour: its (B/8, q, tq_pad/tile_t) grid exploded to
~4,200 steps at bench geometry — at high octaves q reaches 64 while only
~41 real frames exist, so tq pads 8-12x — and measured ~17 us/step of DMA
issue+wait latency against a ~1 ms traffic floor (215 MB of windows).

This kernel takes a flat scalar-prefetched table of per-frame window
starts (padded entries repeat the last start; their rows are sliced away
by the caller). Grid is (B/32, T_pad/8): ~500 steps at bench geometry,
fat DMAs (32 batch rows x one window each), no stream padding, and no
stride >= n_fft constraint — ANY hop/octave geometry works, overlapping
windows included. Each step fuses in VMEM:

    8 aligned window DMAs (32, n_fft+128)    [HBM -> VMEM]
    dynamic-rotate to the true start          [tpu.dynamic_rotate]
    [cos|sin] matmul (MXU) -> magnitude -> per-bin scale -> log1p

Window starts are arbitrary sample offsets, which Mosaic cannot slice on
the 128-lane-tiled minor dim; each DMA therefore fetches the window
rounded down to a 128 boundary (_ALIGN wider) and the kernel rotates
in-register. int16 (raw PCM) top octaves and bfloat16 stream storage DMA
at half the bytes; the matmul accumulates in float32 either way.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cqt import CQTParams, downsample2, halfband_taps, kernel_bank

# Mosaic can only reason about lane-dim (minor) slice offsets that are
# provably multiples of the 128-lane tiling; frame windows start at
# arbitrary sample offsets, so each DMA fetches a 128-aligned window
# _ALIGN wider than n_fft and the kernel rotates to the true offset
# in-register (tpu.dynamic_rotate via pltpu.roll).
_ALIGN = 128
# batch rows per grid step: a multiple of 16 so 2-byte dtypes (int16 PCM,
# bf16 streams) keep packed-sublane slice alignment, and wide enough that
# one DMA moves a fat (rows x window) block.
_TILE_B = 32
# frames per grid step (DMA chain length); shrinks when n_fft is so large
# that tile_t windows would not fit the VMEM scratch budget.
_TILE_T = 8
_VMEM_BUDGET = 4 << 20


def _tile_t(win: int, itemsize: int) -> int:
    return max(1, min(_TILE_T, _VMEM_BUDGET // (_TILE_B * win * itemsize)))


@functools.partial(
    jax.jit, static_argnames=("n_fft", "t_pad", "tile_t", "interpret"))
def _octave_response_frames(ypad, starts, kmat, scales, *, n_fft: int,
                            t_pad: int, tile_t: int,
                            interpret: bool = False):
    """(B, Lpad) padded octave signal -> (B, t_pad, bpo) fused
    log1p-magnitude responses, reading only the frame windows from HBM.

    B must be a multiple of _TILE_B and t_pad of tile_t (caller pads).
    `starts` are window starts into ypad; every entry must satisfy
    start + n_fft + _ALIGN <= Lpad (caller pads the signal and repeats
    the last start for table padding).
    """
    B, Lpad = ypad.shape
    bpo = kmat.shape[1] // 2
    in_dtype = ypad.dtype
    tile_b = _TILE_B
    grid = (B // tile_b, t_pad // tile_t)
    win = n_fft + _ALIGN

    def kernel(st_ref, ypad_ref, kmat_ref, scales_ref, out_ref,
               frames, sems):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        copies = []
        rems = []
        for j in range(tile_t):
            off = st_ref[ti * tile_t + j]
            off_al = pl.multiple_of(off // _ALIGN * _ALIGN, _ALIGN)
            rems.append(off - off_al)
            copies.append(pltpu.make_async_copy(
                ypad_ref.at[pl.ds(bi * tile_b, tile_b), pl.ds(off_al, win)],
                frames.at[j], sems.at[j]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        rows = []
        for j in range(tile_t):
            # left-rotate by rem == right-rotate by win - rem (roll needs a
            # non-negative shift); rem < _ALIGN so [:n_fft] never wraps
            buf = frames[j].astype(jnp.float32)
            rows.append(pltpu.roll(buf, win - rems[j], 1)[:, :n_fft])
        fr = jnp.stack(rows, axis=1).reshape(tile_b * tile_t, n_fft)
        r = jnp.dot(fr, kmat_ref[:], preferred_element_type=jnp.float32)
        cc = r[:, :bpo]
        ss = r[:, bpo:]
        mag = jnp.sqrt(cc * cc + ss * ss) * scales_ref[:]
        out_ref[...] = jnp.log1p(mag).reshape(tile_b, tile_t, bpo)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # frame-start table
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # ypad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kmat
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_t, bpo),
            # index_map args are (*grid_indices, *scalar_prefetch_refs) —
            # the starts ref rides LAST and is unused for the out index
            lambda b, t, s: (b, t, 0)),
        scratch_shapes=[
            # leading (untiled) dim is the frame index so each DMA's
            # destination frames.at[j] never slices the tiled sublane dim
            pltpu.VMEM((tile_t, tile_b, win), in_dtype),
            pltpu.SemaphoreType.DMA((tile_t,)),
        ],
    )

    frames_total = B * t_pad
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_pad, bpo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * frames_total * n_fft * 2 * bpo,
            bytes_accessed=(frames_total * win * in_dtype.itemsize
                            + kmat.size * 4 + frames_total * bpo * 4),
            transcendentals=2 * frames_total * bpo,
        ),
        interpret=interpret,
    )(starts, ypad, kmat, scales)


def _frame_starts(hop: int, octave: int, n_frames: int) -> list[int]:
    """Window starts into the REFLECT-PADDED octave signal. Frame t's
    center at octave o is round(t*hop/2**o) (half-up, matching
    ops/cqt.py::stream_plan's center rule); the n_fft//2 left pad makes
    the center the window start."""
    return [math.floor(t * hop / 2 ** octave + 0.5) for t in range(n_frames)]


def _pad_signal_for_starts(cur, starts, n_fft):
    """Reflect-pad like librosa's centered frames, then zero-extend so the
    LAST frame's ALIGNED window (start rounded down to the 128-lane
    boundary, _ALIGN wider) is in range. Width rounds up to a multiple of
    _ALIGN."""
    half = n_fft // 2
    need = starts[-1] + n_fft + _ALIGN
    need = -(-need // _ALIGN) * _ALIGN
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
    + scale + log1p runs as the frame-table Pallas kernel. int16 input
    (raw PCM) is DMA'd as int16 for the top octave with the normalization
    folded into the scale epilogue. stream_dtype=bfloat16 stores the
    downsampled octave signals (and their DMAs) at half the bytes.
    """
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

    b = y.shape[0]
    b_pad = -(-b // _TILE_B) * _TILE_B
    octs = []
    cur = y if in_scale != 1.0 else y.astype(jnp.float32)
    for o in range(p.octaves):
        if o > 0:
            cur = downsample2(cur, taps,
                              out_scale=in_scale if o == 1 else 1.0)
            if stream_dtype != jnp.float32:
                cur = cur.astype(stream_dtype)
        starts = _frame_starts(p.hop, o, n_frames)
        tile_t = _tile_t(n_fft + _ALIGN, jnp.dtype(cur.dtype).itemsize)
        t_pad = -(-n_frames // tile_t) * tile_t
        starts = starts + [starts[-1]] * (t_pad - n_frames)
        ypad = _pad_signal_for_starts(cur, starts, n_fft)
        if b_pad != b:
            ypad = jnp.pad(ypad, ((0, b_pad - b), (0, 0)))
        oct_scale = in_scale if o == 0 else 1.0
        scales = jnp.asarray(
            bank["scales"] * (oct_scale * 2.0 ** (o / 2)),
            jnp.float32)[None, :]
        resp = _octave_response_frames(
            ypad, jnp.asarray(starts, jnp.int32), kmat, scales,
            n_fft=n_fft, t_pad=t_pad, tile_t=tile_t, interpret=interpret)
        octs.append(resp[:b, :n_frames])
    out = jnp.concatenate(list(reversed(octs)), axis=-1)
    return jnp.transpose(out, (0, 2, 1))
