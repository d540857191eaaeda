"""Fused Pallas TPU kernel for the CQT octave response — time-major
frame-table DMA. First front-end design to beat the pure-XLA path on
hardware (+12.6% cqt-alone at bench geometry, TPU v5e, B=256).

Replaces the reference's librosa C-FFT per-file loop (KeyDataset.py:490-494)
on the device side; the polyphase downsample cascade runs in XLA time-major
(downsample2_tm — it needs every sample, and as a block matmul it already
lives on the MXU).

Design history (PERFNOTES.md "Pallas CQT kernel status"):

* r1/r2 (stream-layout): materialized the octave streams in HBM before a
  fused slice+matmul+mag+log1p kernel — lost ~48% to XLA, which fuses the
  stream construction into its response einsums without materializing.
* r3 (sparse-window): kept the signal in HBM (ANY) and DMA'd only the
  per-stream frame windows. Never actually ran on hardware until round 2
  fixed an index_map argument-order bug its octaves=4 interpret tests had
  masked (every stream_plan was None there, silently exercising the XLA
  fallback) — then lost ~15%: the (B/8, q, tq_pad/tile_t) grid exploded
  to ~4,200 steps (q reaches 64 at octave 7 for ~41 real frames).
* v4 (frame-table): dropped the stream decomposition — per-frame window
  starts are static host integers, scalar-prefetched as one flat table.
  ~500 grid steps, any hop/octave geometry. Still lost ~14%: batch-major
  (tile_b, win) DMAs are 32 scattered ~2.5 KB row segments each (rows are
  Lpad-strided in HBM) — ~100 K descriptor-bound segments per bench step
  against a ~1 ms traffic floor.
* v5 (this file, time-major): the signal lives as (L, B); one frame
  window is a single CONTIGUOUS (win, B) block, so each DMA moves
  ~0.5 MB linearly and the response stage runs ~50 fat grid steps. The
  cascade runs time-major too (same samples, block axis leading) so
  streams never transpose; only the raw input transposes once and the
  final (T, bins, B) output transposes back.

Per grid step the kernel fuses in VMEM:

    tile_t aligned window DMAs (win, B)       [HBM -> VMEM, contiguous]
    dynamic-rotate rows to the true start      [tpu.dynamic_rotate]
    [cos|sin]^T matmul (MXU, lane-concatenated frames)
    -> magnitude -> per-bin scale -> log1p

Window starts are arbitrary sample offsets, which Mosaic cannot slice on
a tiled dim; each DMA therefore fetches the window rounded down to the
sublane tile boundary (_ALIGN_TM wider) and the kernel rotates
in-register. int16 (raw PCM) top octaves and bfloat16 stream storage DMA
at half the bytes; the matmul accumulates in float32 either way.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cqt import CQTParams, halfband_taps, kernel_bank

# sublane alignment for time-major window slices: f32 tiles 8 sublanes,
# 2-byte dtypes pack two per sublane word => 16 covers both.
_ALIGN_TM = 16
# frames per grid step (DMA chain length); shrinks when n_fft is so large
# that tile_t windows would not fit the VMEM scratch budget.
_TILE_T = 8
# per-grid-step working-set budget: the (tile_t, win, B) window scratch
# PLUS the f32 frame concat the matmul reads (tile_t * n_fft * B * 4).
# 12 MB keeps the bench-measured flagship tilings (tile_t=8 at B=256,
# 7 at B=512) while still forcing large-n_fft geometries to chunk.
_VMEM_BUDGET = 12 << 20
# when even ONE frame at the full lane-padded batch exceeds _VMEM_BUDGET
# (large-n_fft geometries, e.g. octaves=4 => n_fft=8192), the batch is
# processed in lane chunks sized against this budget. Note it is smaller
# than _VMEM_BUDGET in absolute terms but larger PER FRAME: chunked mode
# runs tile_t=1, so the whole 10 MB funds a single frame's working set,
# vs _VMEM_BUDGET/_TILE_T ≈ 1.5 MB per frame on the unchunked path.
_VMEM_CHUNK_BUDGET = 10 << 20


def _response_plan(n_fft: int, b_pad: int, itemsize: int):
    """(tile_t, b_chunk) for the response kernel at this octave geometry.

    per-lane working set = window scratch (win * itemsize) + f32 frame
    concat (n_fft * 4). b_chunk < b_pad means the caller runs the kernel
    per lane chunk; b_chunk == 0 means even 128 lanes do not fit and the
    caller must fall back to the XLA path. The caller chunks at b_chunk
    with one smaller REMAINDER chunk when b_chunk does not divide b_pad —
    at most two compiled shapes, and never the launch fragmentation a
    divides-b_pad constraint degenerates to (e.g. 3x128-lane launches
    where 256+128 would do, each re-reading kmat and re-running the
    full t_pad grid)."""
    win = n_fft + _ALIGN_TM
    # 2 x window scratch: the kernel double-buffers the window DMAs
    # across grid steps (next step's chain issues before this step's
    # compute), so two steps' frames are live at once
    per_lane = 2 * win * itemsize + n_fft * 4
    if b_pad * per_lane <= _VMEM_BUDGET:
        tile_t = max(1, min(_TILE_T, _VMEM_BUDGET // (b_pad * per_lane)))
        return tile_t, b_pad
    return 1, min(_VMEM_CHUNK_BUDGET // per_lane // 128 * 128, b_pad)


def downsample2_tm(y: jax.Array, taps, *, out_scale: float = 1.0,
                   out_dtype: jnp.dtype | None = None):
    """Time-major halfband decimate: (L, B) -> (ceil(L/2), B).

    Same polyphase block matmul as ops.cqt.downsample2 with the block axis
    leading, so the MXU contraction emits time-major output directly — no
    transpose pass. For f32/int16 inputs the samples match downsample2 up
    to f32 summation order (pinned by test_downsample2_tm_matches_batch_
    major); for bf16 inputs the two quantize at different points (this
    path upcasts the window to f32 and rounds at the stored stream,
    downsample2 contracts bf16 operands), so they agree only to bf16
    epsilon — the same split as the XLA-vs-Pallas front-end comparison
    (tests/test_data.py::test_dataset_pallas_frontend_matches_xla).
    """
    from .cqt import _POLY_BLOCK, _poly_matrix

    taps = np.asarray(taps, np.float32)
    n_taps = taps.shape[0]
    pad = n_taps // 2
    block = _POLY_BLOCK
    out_block = block // 2
    integer_in = jnp.issubdtype(y.dtype, jnp.integer)
    w = jnp.asarray(_poly_matrix(taps, block))
    if out_scale != 1.0:
        w = w * out_scale
    L, b = y.shape
    nb = -(-L // block)
    out_len = (L - 1) // 2 + 1
    yp = jnp.pad(y, ((pad, nb * block + block + pad - L), (0, 0)))
    # split contraction over reshape views — block n's window is
    # [block n | first 2*pad of block n+1] — instead of materializing the
    # staged (nb, block+2*pad, b) concat in HBM (see ops.cqt.downsample2).
    # f32 matmul operands: XLA:TPU fuses the convert into the matmul
    # read (traffic stays at the stored width); XLA:CPU's DotThunk
    # cannot execute bf16 x bf16 contractions at all
    a = yp[: (nb + 1) * block].reshape(nb + 1, block, b)
    if out_dtype is None:
        out_dtype = jnp.float32 if integer_in else y.dtype
    # chunk the block axis so the f32 dot intermediates stay bounded:
    # unchunked at the 512-clip bench geometry the first dot's (nb, m, b)
    # f32 output alone is 5 GB and the program OOMs HBM
    seg = max(1, min(nb, (256 << 20) // (out_block * b * 4)))
    outs = []
    for s0 in range(0, nb, seg):
        s1 = min(s0 + seg, nb)
        o = jnp.einsum("nwb,wm->nmb", a[s0:s1].astype(jnp.float32),
                       w[:block], preferred_element_type=jnp.float32)
        o = o + jnp.einsum("nwb,wm->nmb",
                           a[s0 + 1: s1 + 1, : 2 * pad].astype(jnp.float32),
                           w[block:], preferred_element_type=jnp.float32)
        outs.append(o.astype(out_dtype))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(nb * out_block, b)[:out_len]


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "t_pad", "tile_t", "b_chunk", "interpret"))
def _octave_response_frames(ypadT, starts, lane0, kmat_t, scales, *,
                            n_fft: int, t_pad: int, tile_t: int,
                            b_chunk: int = 0, interpret: bool = False):
    """(Lpad, B) time-major padded octave signal -> (t_pad, bpo, Bc) fused
    log1p-magnitude responses; each window is one contiguous DMA.

    B must be a multiple of 128 (the caller lane-pads) and t_pad of
    tile_t (the caller pads `starts` by repeating the last entry); every
    start must satisfy start + n_fft + _ALIGN_TM <= Lpad.

    b_chunk (0 = full width) runs the kernel over the Bc = b_chunk lanes
    beginning at lane0 (a (1,) int32 array, multiple of 128): the DMAs
    lane-slice ypadT IN PLACE in HBM, so VMEM-constrained geometries never
    materialize per-chunk signal copies (ADVICE r2), and because lane0 is
    a runtime scalar every chunk shares this one compiled kernel. Full
    width keeps the contiguous whole-row DMA.
    """
    if t_pad % tile_t:
        # the grid floor-divides; a non-dividing t_pad would silently
        # leave the last t_pad % tile_t frames UNWRITTEN (round-4 bug:
        # the span-plan branch handed this kernel a multiple-of-K t_pad)
        raise ValueError(f"t_pad={t_pad} not a multiple of tile_t={tile_t}")
    Lpad, B = ypadT.shape
    Bc = b_chunk or B
    bpo = kmat_t.shape[0] // 2
    in_dtype = ypadT.dtype
    grid = (t_pad // tile_t,)
    win = n_fft + _ALIGN_TM
    full = Bc == B

    def kernel(st_ref, lane_ref, ypad_ref, kmat_ref, scales_ref, out_ref,
               frames, sems):
        ti = pl.program_id(0)
        nsteps = pl.num_programs(0)
        lane = pl.multiple_of(lane_ref[0], 128)

        # double-buffered window DMAs: step ti's chain was issued at step
        # ti-1 (step 0 issues its own), so the DMA engine fills slot
        # (ti+1)%2 while the MXU consumes slot ti%2 — without this the
        # chain's issue+completion latency serializes with compute and the
        # response stage runs ~9x above its bandwidth floor (PERFNOTES
        # round-7). Rebuilding the copy descriptor at wait time is the
        # standard pattern: wait only decrements the slot's semaphore.
        def make_copy(step, slot, j):
            off = st_ref[step * tile_t + j]
            off_al = pl.multiple_of(off // _ALIGN_TM * _ALIGN_TM, _ALIGN_TM)
            src = (ypad_ref.at[pl.ds(off_al, win)] if full
                   else ypad_ref.at[pl.ds(off_al, win), pl.ds(lane, Bc)])
            return off - off_al, pltpu.make_async_copy(
                src, frames.at[slot, j], sems.at[slot, j])

        @pl.when(ti == 0)
        def _issue_first():
            for j in range(tile_t):
                make_copy(0, 0, j)[1].start()

        @pl.when(ti + 1 < nsteps)
        def _issue_next():
            for j in range(tile_t):
                make_copy(ti + 1, (ti + 1) % 2, j)[1].start()

        slot = ti % 2
        rems = []
        for j in range(tile_t):
            rem, c = make_copy(ti, slot, j)
            c.wait()
            rems.append(rem)
        cols = []
        for j in range(tile_t):
            # rows (time) are the sublane dim: rotate sublanes left by rem
            # == right by win - rem (roll needs a non-negative shift);
            # rem < _ALIGN_TM so [:n_fft] never wraps
            buf = frames[slot, j].astype(jnp.float32)
            cols.append(pltpu.roll(buf, win - rems[j], 0)[:n_fft])
        fr = jnp.concatenate(cols, axis=1)          # (n_fft, tile_t*Bc)
        r = jnp.dot(kmat_ref[:], fr, preferred_element_type=jnp.float32)
        cc = r[:bpo]
        ss = r[bpo:]
        mag = jnp.sqrt(cc * cc + ss * ss) * scales_ref[:]
        lg = jnp.log1p(mag)                         # (bpo, tile_t*Bc)
        for j in range(tile_t):
            out_ref[j] = lg[:, j * Bc:(j + 1) * Bc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # frame-start table + lane offset
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # ypadT stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kmat_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales (bpo, 1)
        ],
        out_specs=pl.BlockSpec(
            (tile_t, bpo, Bc),
            # index_map args are (*grid_indices, *scalar_prefetch_refs) —
            # the starts/lane0 refs ride LAST and are unused for the index
            lambda t, s, l: (t, 0, 0)),
        scratch_shapes=[
            # leading (untiled) dims are (buffer slot, frame index) so
            # each DMA's destination frames.at[slot, j] never slices a
            # tiled dim; 2 slots double-buffer across grid steps
            pltpu.VMEM((2, tile_t, win, Bc), in_dtype),
            pltpu.SemaphoreType.DMA((2, tile_t)),
        ],
    )

    frames_total = Bc * t_pad
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, bpo, Bc), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * frames_total * n_fft * 2 * bpo,
            bytes_accessed=(t_pad * win * Bc * in_dtype.itemsize
                            + kmat_t.size * 4 + frames_total * bpo * 4),
            transcendentals=2 * frames_total * bpo,
        ),
        interpret=interpret,
    )(starts, lane0, ypadT, kmat_t, scales)


_SPAN_K = (32, 16, 8, 4)      # frames per span DMA, largest fitting wins
_SPAN_TRAFFIC = 1.25          # max span bytes / window-mode bytes ratio


def _span_plan(n_fft: int, b_pad: int, itemsize: int, spacing: float):
    """(K, span_len) for the span-mode response kernel, or None.

    Deep octaves' frame windows overlap (spacing = hop/2**o < n_fft), so
    tile_t per-window DMAs re-read the stream up to win/spacing times AND
    pay the ~5 us per-DMA issue cost 4800 times per batch (PERFNOTES
    round-7b: the response stage is DMA-COUNT-bound, not bandwidth-bound).
    Span mode issues ONE DMA covering K consecutive frames; frames are
    carved out in VMEM by a static slice + <=31-row dynamic roll. Only
    engaged when the span's bytes stay within _SPAN_TRAFFIC of window
    mode's (shallow octaves keep the window kernel) and the working set
    fits VMEM at full lane width."""
    win = n_fft + _ALIGN_TM
    wlen = n_fft + 48
    for K in _SPAN_K:
        span_len = int(math.floor((K - 1) * spacing)) // 16 * 16 + wlen
        if span_len > _SPAN_TRAFFIC * K * win:
            continue
        cost = (2 * span_len * itemsize        # double-buffered span
                + wlen * 4                     # rolled f32 frame
                + 2 * 24 * K * 4)              # out block (auto dbl-buf)
        if b_pad * cost <= _VMEM_BUDGET:
            return K, span_len
    return None


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "t_pad", "K", "span_len", "s16", "interpret"))
def _octave_response_span(ypadT, starts, kmat_t, scales, *, n_fft: int,
                          t_pad: int, K: int, span_len: int,
                          s16: tuple, interpret: bool = False):
    """(Lpad, B) time-major padded octave signal -> (t_pad, bpo, B) fused
    log1p-magnitude responses; ONE contiguous DMA per K frames.

    `starts` must be the CONTINUED frame progression (floor(t*h+0.5) for
    all t < t_pad, not last-entry-repeated) so every intra-tile delta
    stays within the static offset table `s16` (s16[k] = floor16(k*h)):
    the frame's row inside the span buffer is s16[k] + r_k with
    r_k = starts[tK+k] - floor16(starts[tK]) - s16[k] in [0, 32). The
    caller must pad the signal to floor16(starts[t_pad-K]) + span_len."""
    Lpad, B = ypadT.shape
    bpo = kmat_t.shape[0] // 2
    in_dtype = ypadT.dtype
    wlen = n_fft + 48

    def kernel(st_ref, ypad_ref, kmat_ref, scales_ref, out_ref,
               span, sems):
        ti = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def make_copy(step, slot):
            base_al = pl.multiple_of(
                st_ref[step * K] // _ALIGN_TM * _ALIGN_TM, _ALIGN_TM)
            return pltpu.make_async_copy(
                ypad_ref.at[pl.ds(base_al, span_len)],
                span.at[slot], sems.at[slot])

        @pl.when(ti == 0)
        def _issue_first():
            make_copy(0, 0).start()

        @pl.when(ti + 1 < nsteps)
        def _issue_next():
            make_copy(ti + 1, (ti + 1) % 2).start()

        slot = ti % 2
        make_copy(ti, slot).wait()
        base_al = st_ref[ti * K] // _ALIGN_TM * _ALIGN_TM
        for k in range(K):
            r = st_ref[ti * K + k] - base_al - s16[k]
            wbuf = span[slot, s16[k]: s16[k] + wlen].astype(jnp.float32)
            fr = pltpu.roll(wbuf, wlen - r, 0)[:n_fft]
            rk = jnp.dot(kmat_ref[:], fr,
                         preferred_element_type=jnp.float32)
            cc = rk[:bpo]
            ss = rk[bpo:]
            out_ref[k] = jnp.log1p(jnp.sqrt(cc * cc + ss * ss)
                                   * scales_ref[:])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_pad // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # ypadT stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kmat_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales (bpo, 1)
        ],
        out_specs=pl.BlockSpec((K, bpo, B), lambda t, s: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, span_len, B), in_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, bpo, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * n_fft * 2 * bpo,
            bytes_accessed=((t_pad // K) * span_len * B
                            * in_dtype.itemsize
                            + kmat_t.size * 4 + t_pad * bpo * B * 4),
            transcendentals=2 * t_pad * bpo * B,
        ),
        interpret=interpret,
    )(starts, ypadT, kmat_t, scales)


def _frame_starts(hop: int, octave: int, n_frames: int) -> list[int]:
    """Window starts into the REFLECT-PADDED octave signal. Frame t's
    center at octave o is round(t*hop/2**o) (half-up, matching
    ops/cqt.py::stream_plan's center rule); the n_fft//2 left pad makes
    the center the window start."""
    return [math.floor(t * hop / 2 ** octave + 0.5) for t in range(n_frames)]


def _pad_signal_for_starts(curT, starts, n_fft, *, min_len=0, round_to=None):
    """Reflect-pad like librosa's centered frames, then zero-extend so the
    LAST frame's ALIGNED window (start rounded down to the sublane tile
    boundary, _ALIGN_TM wider) is in range. Length rounds up to a
    multiple of _ALIGN_TM (or `round_to`); `min_len` extends the zero
    tail (the fused cascade kernel reads a fixed-size halo per tile)."""
    half = n_fft // 2
    need = max(starts[-1] + n_fft + _ALIGN_TM, min_len)
    r = round_to or _ALIGN_TM
    need = -(-need // r) * r
    ypad = jnp.pad(curT, ((half, half + 1), (0, 0)), mode="reflect")
    if ypad.shape[0] < need:
        ypad = jnp.pad(ypad, ((0, need - ypad.shape[0]), (0, 0)))
    return ypad


# ---------------------------------------------------------------------------
# fused halfband cascade: previous padded stream -> next PADDED stream.
#
# The XLA cascade path (downsample2_tm + _pad_signal_for_starts per octave)
# pays four full passes over every stream: the polyphase window staging /
# operand materialization around the einsum, the (n, m, b) -> (n*m, b)
# relayout of the dot output, and the reflect-pad copy of the result. The
# honest wall at the 512-clip bench geometry is ~123 ms for the cascade
# plus pad copies (PERFNOTES round-7). This kernel fuses all of it: each
# grid step DMAs one input tile (+ filter halo), decimates it on the MXU
# with the polyphase block matmul IN VMEM, interleaves the block outputs
# in registers, and writes the next octave's padded buffer directly —
# per octave the stream is read once and written once.
# ---------------------------------------------------------------------------

_CASC_TILE = 512          # max output rows per grid step (multiple of 128)
_CASC_VMEM = 12 << 20     # working-set budget before falling back to XLA


def _casc_tile(head: int) -> int:
    """Output rows per grid step for this geometry, or 0 = cannot run.

    The clip on the kernel's input offset must only ever fire on grid
    steps whose every output row is masked (sr < 0 leading-pad tiles),
    which requires head % tile == 0; head = n_fft//2 is a power of two,
    so min(512, head) divides it whenever head >= 128. 128 also keeps the
    out BlockSpec a whole number of 8-sublane f32 tiles and, with
    head % 16 == 0, the per-step input offsets sublane-aligned."""
    tile = min(_CASC_TILE, head)
    return tile if tile >= 128 and head % tile == 0 else 0


def _casc_in_rows(tile: int) -> int:
    # 2*tile input rows + 2*24 filter halo + _ALIGN_TM alignment slack
    return 2 * tile + 48 + _ALIGN_TM


def _cascade_fits(n_fft: int, b_pad: int, itemsize: int) -> bool:
    tile = _casc_tile(n_fft // 2)
    if tile == 0:
        return False
    in_rows = _casc_in_rows(tile)
    # scratch (in dtype) + f32 loaded value + out tile double-buffered
    work = in_rows * (itemsize + 4) + tile * 4 * 2
    return b_pad * work <= _CASC_VMEM


@functools.partial(
    jax.jit,
    static_argnames=("L_in", "L_out", "head", "need_out", "tile",
                     "out_dtype", "interpret"))
def _cascade_pad_tm(ypad_in, w, *, L_in: int, L_out: int, head: int,
                    need_out: int, tile: int = _CASC_TILE,
                    out_dtype=jnp.float32, interpret: bool = False):
    """(Lpad_in, B) padded stream -> (need_out, B) next padded stream.

    Interior rows [head, head + L_out) hold the halfband-decimated
    stream (same samples as downsample2_tm: zero-extension outside the
    input interior, f32 contraction); everything else is zero — the
    caller patches the reflect rows (_reflect_fix). `w` is the (304, 128)
    f32 polyphase matrix with any output scale folded in.
    """
    from .cqt import _POLY_BLOCK

    block = _POLY_BLOCK
    Lpad_in, B = ypad_in.shape
    in_rows = _casc_in_rows(tile)
    # every grid step's input offset is head + 2*(i*tile - head) - 24
    # minus a STATIC remainder to the sublane tile boundary: offsets step
    # by 2*tile (a multiple of 256) and head % 16 == 0, so one remainder
    # serves every step. head % tile == 0 (see _casc_tile) guarantees the
    # low clip only fires on fully-masked leading-pad tiles.
    rem = (head - 24) % _ALIGN_TM
    in_dtype = ypad_in.dtype
    n_blocks = tile // (block // 2)
    kw = block + 48   # polyphase window rows per block (2*pad halo)

    def kernel(ypad_ref, w_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        s0 = i * tile - head               # first output stream row
        off = head + 2 * s0 - 24 - rem
        off = jnp.clip(off, 0, Lpad_in - in_rows)
        cp_in = pltpu.make_async_copy(
            ypad_ref.at[pl.ds(pl.multiple_of(off, _ALIGN_TM), in_rows)],
            scratch, sem)
        cp_in.start()
        cp_in.wait()
        # zero the halo outside the true stream interior: matches
        # downsample2_tm's zero-extension AND neutralizes clamped reads
        rows = off + jax.lax.broadcasted_iota(jnp.int32, (in_rows, 1), 0)
        ok = (rows >= head) & (rows < head + L_in)
        fw = jnp.where(ok, scratch[...].astype(jnp.float32), 0.0)
        parts = []
        for j in range(n_blocks):
            win = fw[rem + block * j: rem + block * j + kw]   # (kw, B)
            parts.append(jax.lax.dot_general(
                w_ref[...], win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))          # (block//2, B)
        val = jnp.concatenate(parts, axis=0)                  # (tile, B)
        sr = s0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        keep = (sr >= 0) & (sr < L_out)
        out_ref[...] = jnp.where(keep, val, 0.0).astype(out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(need_out // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, B), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((need_out, B), out_dtype),
        scratch_shapes=[pltpu.VMEM((in_rows, B), in_dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * need_out * kw * B,
            bytes_accessed=(need_out * 2 * B * in_dtype.itemsize
                            + need_out * B * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ypad_in, w)


def _reflect_fix(buf, L_out: int, head: int):
    """Patch the reflect rows of a cascade-produced padded buffer in place
    (in-place per XLA's dynamic-update-slice elision: `buf` has no other
    use). Matches jnp.pad(stream, (head, head+1), mode='reflect'):
    row head-1-k = stream[k+1], row head+L_out+k = stream[L_out-2-k]."""
    half = head
    head_rows = lax.rev(
        lax.dynamic_slice_in_dim(buf, half + 1, half, 0), (0,))
    buf = lax.dynamic_update_slice_in_dim(buf, head_rows, 0, 0)
    tail_rows = lax.rev(
        lax.dynamic_slice_in_dim(buf, half + L_out - half - 2,
                                 half + 1, 0), (0,))
    return lax.dynamic_update_slice_in_dim(buf, tail_rows, half + L_out, 0)


def cqt_pallas(y: jax.Array, p: CQTParams, *,
               stream_dtype: jnp.dtype | str = jnp.float32,
               interpret: bool = False) -> jax.Array:
    """Batched fused log1p-CQT: (B, L) -> (B, n_bins, T).

    Same semantics as ops.cqt.cqt(..., log1p=True). The input transposes
    to (L, B) once on device; the half-band polyphase cascade runs
    time-major in XLA; each octave's frame read + filterbank + magnitude
    + scale + log1p runs as the contiguous-window Pallas kernel; the
    output transposes back. int16 input (raw PCM) transposes and DMAs as
    int16 with the normalization folded into the scale epilogue.
    stream_dtype=bfloat16 stores the downsampled octave signals (and
    their DMAs) at half the bytes. Any hop/octave geometry works,
    overlapping windows included: large-n_fft geometries whose per-frame
    working set exceeds the VMEM budget run the grid per 128-lane batch
    chunk, and geometries where even one chunk cannot fit fall back to
    the XLA path (ops.cqt.cqt) outright.
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
    kmat_t = jnp.asarray(np.ascontiguousarray(
        np.concatenate([bank["k_cos"], bank["k_sin"]], axis=1).T))
    taps = halfband_taps()   # host values: they build the polyphase matrix
    n_frames = 1 + y.shape[1] // p.hop

    b = y.shape[0]
    # batch rides the 128-lane dim: pad it so the kernel's per-frame lane
    # slices (j*B..(j+1)*B) stay tile-aligned; <128 lanes waste identical
    # VPU/MXU hardware anyway
    b_pad = -(-b // 128) * 128
    if _response_plan(n_fft, b_pad, 4)[1] == 0:
        # even a single 128-lane chunk of f32 frames overflows VMEM:
        # this geometry cannot run the kernel at all
        from .cqt import cqt
        return cqt(y, p, conv_dtype=stream_dtype)
    octs = []
    curT = jnp.transpose(y)                 # (L, B), int16 stays int16
    if in_scale == 1.0:
        curT = curT.astype(jnp.float32)
    if b_pad != b:
        curT = jnp.pad(curT, ((0, 0), (0, b_pad - b)))
    head = n_fft // 2
    casc_tile = _casc_tile(head)
    in_rows = _casc_in_rows(casc_tile or _CASC_TILE)
    lens = [y.shape[1]]
    for o in range(1, p.octaves):
        lens.append((lens[o - 1] - 1) // 2 + 1)
    # fused pad+decimate+relayout cascade kernel (one read + one write per
    # octave); falls back to the XLA cascade when the geometry's head is
    # not tile-aligned, a stream is too short for the reflect rows, or
    # the lane width overflows the kernel's VMEM working set
    use_casc = (_cascade_fits(n_fft, b_pad, jnp.dtype(curT.dtype).itemsize)
                and _cascade_fits(n_fft, b_pad,
                                  jnp.dtype(stream_dtype).itemsize)
                and all(ln >= head + 2 for ln in lens))
    from .cqt import _poly_matrix
    ypadT = None
    for o in range(p.octaves):
        spacing = p.hop / 2 ** o
        item = jnp.dtype(curT.dtype if o == 0 else stream_dtype).itemsize
        tile_t, b_chunk = _response_plan(n_fft, b_pad, item)
        span = (_span_plan(n_fft, b_pad, item, spacing)
                if b_chunk == b_pad else None)
        if span is not None:
            K, span_len = span
            t_pad = -(-n_frames // K) * K
            # CONTINUED progression (not last-entry-repeated): span mode's
            # static intra-tile offset table requires monotone deltas
            starts = _frame_starts(p.hop, o, t_pad)
            span_need = starts[t_pad - K] // _ALIGN_TM * _ALIGN_TM \
                + span_len
            # static frame offsets inside the span buffer: frame k of a
            # tile sits at s16[k] + r_k with r_k = starts[tK+k]
            # - floor16(starts[tK]) - s16[k] in [0, 32) for every tile
            # (the progression's deltas differ from k*spacing by < 1)
            s16 = tuple(int(k * spacing) // _ALIGN_TM * _ALIGN_TM
                        for k in range(K))
        else:
            t_pad = -(-n_frames // tile_t) * tile_t
            starts = _frame_starts(p.hop, o, n_frames)
            starts = starts + [starts[-1]] * (t_pad - n_frames)
            span_need = 0
        if not use_casc:
            if o > 0:
                curT = downsample2_tm(curT, taps,
                                      out_scale=in_scale if o == 1 else 1.0,
                                      out_dtype=stream_dtype)
            ypadT = _pad_signal_for_starts(curT, starts, n_fft,
                                           min_len=span_need)
        elif o == 0:
            ypadT = _pad_signal_for_starts(
                curT, starts, n_fft,
                min_len=max(head + lens[0] + in_rows, span_need),
                round_to=casc_tile)
        else:
            w = _poly_matrix(np.asarray(taps)) \
                * (in_scale if o == 1 else 1.0)
            need = max(starts[-1] + n_fft + _ALIGN_TM,
                       head + lens[o] + in_rows, span_need)
            need = -(-need // casc_tile) * casc_tile
            ypadT = _cascade_pad_tm(
                ypadT, jnp.asarray(w, jnp.float32),
                L_in=lens[o - 1], L_out=lens[o], head=head,
                need_out=need, tile=casc_tile, out_dtype=stream_dtype,
                interpret=interpret)
            ypadT = _reflect_fix(ypadT, lens[o], head)
        oct_scale = in_scale if o == 0 else 1.0
        scales = jnp.asarray(
            bank["scales"] * (oct_scale * 2.0 ** (o / 2)),
            jnp.float32)[:, None]
        starts_dev = jnp.asarray(starts, jnp.int32)
        if span is not None:
            # deep-octave overlapping windows: ONE DMA per K frames
            resp = _octave_response_span(
                ypadT, starts_dev, kmat_t, scales, n_fft=n_fft,
                t_pad=t_pad, K=K, span_len=span_len, s16=s16,
                interpret=interpret)
        else:
            chunks = []
            for c0 in range(0, b_pad, b_chunk):
                # the kernel lane-slices ypadT in place in HBM via the
                # lane0 scalar — no per-chunk signal copy; at most two
                # compiled shapes (full chunks + one remainder)
                bc = min(b_chunk, b_pad - c0)
                chunks.append(_octave_response_frames(
                    ypadT, starts_dev, jnp.asarray([c0], jnp.int32),
                    kmat_t, scales, n_fft=n_fft, t_pad=t_pad,
                    tile_t=tile_t, b_chunk=(bc if bc < b_pad else 0),
                    interpret=interpret))
            resp = chunks[0] if len(chunks) == 1 \
                else jnp.concatenate(chunks, axis=2)
        octs.append(resp[:n_frames])
    out = jnp.concatenate(list(reversed(octs)), axis=1)   # (T, n_bins, B)
    return jnp.transpose(out, (2, 1, 0))[:b]
