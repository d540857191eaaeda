"""Constant-Q transform front-end, TPU-first.

Replaces the reference's per-file ``librosa.cqt`` call (KeyDataset.py:485-499,
the hot preprocessing loop) with a batched on-device transform:

  * one complex log-frequency kernel bank is built for the TOP octave only
    (host-side numpy, static per (sr, hop, bins/octave) config);
  * lower octaves reuse the SAME bank on a progressively halfband-
    downsampled signal (multirate CQT — at half the rate the same kernel
    analyzes half the frequency);
  * each octave's responses are computed by STRIDED VALID convolutions of
    the (padded) octave-rate signal with the cos/sin bank — the conv's
    window walks the stream directly, so no frame matrix ever materializes
    in HBM (the frames tensor is ~630 MB/octave at the 256-clip bench
    batch; eliminating it cut the measured CQT step 93.6 -> 81.1 ms, and
    bf16 operand storage -> 72.2 ms, PERFNOTES.md round-3) — then
    magnitude -> sqrt-length scaling -> log1p, all MXU/VPU-friendly XLA
    ops (and a fused Pallas kernel in cqt_pallas.py).

Conventions follow librosa.cqt defaults: fmin = C1, hann window,
filter_scale 1, L1-normalized kernels, scale=True (output multiplied by
sqrt(kernel_length)), reflect-padded centered frames, hop = round(sr/frames)
(KeyDataset.py:485). Output: (n_bins, T) ascending in frequency with
T = 1 + len(y)//hop, matching librosa's frame count.

Documented divergence: librosa requires hop % 2**(n_octaves-1) == 0 and
raises otherwise (the reference's hops — e.g. round(22050/5)=4410 — do NOT
satisfy this, so the reference's exact configuration cannot run under its
pinned librosa either). We instead round each lower octave's frame centers
to the nearest sample at that octave's rate: a sub-sample (< 0.5 sample at
the octave rate, i.e. < 0.4% of the shortest kernel in the octave) alignment
error.

Numerical validation, two independent oracles:
  * exact full-rate direct-convolution CQT (ops/cqt_oracle.py) — interior
    frames < 1.5% of octave peak, non-downsampled top octave < 1%
    (tests/test_cqt.py::test_fast_cqt_matches_direct_convolution_oracle);
  * a pure-NumPy transcription of librosa 0.9.2's own recursive multirate
    algorithm incl. resampy 0.3.1 kaiser resampling (ops/librosa_ref.py) —
    measured agreement at the flagship geometry (36 bins/oct, 6 octaves,
    hop 4416): octaves 1..5 < 0.6% of octave peak on interior AND boundary
    frames; lowest octave < 1.9% interior / < 2.6% boundary (5 resampling
    stages: our uniform 49-tap kaiser halfband cascade vs resampy's
    kaiser_fast) — tests/test_cqt_librosa.py. Boundary frames are thus no
    longer "implementation-defined": they track librosa's reflect-pad
    convention to the same sub-percent bound wherever the multirate trees
    coincide; only librosa's early-downsample configurations (never hit by
    reference training configs) widen the lowest-octave boundary bound to
    ~25% of peak (different mirror-point rate — pinned in the same test).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

C1_HZ = 32.70319566257483  # librosa note_to_hz('C1')


@dataclass(frozen=True)
class CQTParams:
    sr: int
    hop: int
    bins_per_octave: int = 36
    octaves: int = 8
    fmin: float = C1_HZ
    filter_scale: float = 1.0

    @property
    def n_bins(self) -> int:
        return self.bins_per_octave * self.octaves

    @property
    def q(self) -> float:
        return self.filter_scale / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.lru_cache(maxsize=16)
def kernel_bank(p: CQTParams):
    """Top-octave CQT kernel bank (host-side, cached per config).

    Returns dict of numpy arrays:
      k_cos, k_sin : (n_fft, bins_per_octave) — conjugated, L1-normalized,
                     hann-windowed exponentials, centered in the n_fft window
      scales       : (bins_per_octave,) = sqrt(kernel_length)  (scale=True)
      n_fft        : frame length
    """
    bpo, q, sr = p.bins_per_octave, p.q, p.sr
    top0 = p.n_bins - bpo
    freqs = p.fmin * 2.0 ** ((top0 + np.arange(bpo)) / bpo)
    lengths = q * sr / freqs
    n_fft = _next_pow2(int(math.ceil(lengths.max())))
    k = np.zeros((n_fft, bpo), np.complex128)
    for i, (f, flen) in enumerate(zip(freqs, lengths)):
        ilen = int(np.floor(flen))
        # periodic hann window, L1-normalized (librosa filters.constant_q norm=1)
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ilen) / ilen)
        w /= w.sum()
        t = np.arange(ilen) - ilen // 2
        sig = w * np.exp(-2j * np.pi * f * t / sr)
        off = (n_fft - ilen) // 2
        k[off:off + ilen, i] = sig
    return {
        "k_cos": np.ascontiguousarray(k.real, np.float32),
        "k_sin": np.ascontiguousarray(k.imag, np.float32),
        "scales": np.sqrt(lengths).astype(np.float32),
        "n_fft": n_fft,
    }


@functools.lru_cache(maxsize=4)
def halfband_taps(num_taps: int = 49) -> np.ndarray:
    """Kaiser windowed-sinc half-band lowpass for decimation by 2."""
    n = np.arange(num_taps) - (num_taps - 1) / 2
    h = np.sinc(n / 2) / 2
    beta = 8.0
    w = np.i0(beta * np.sqrt(np.clip(1 - (2 * n / (num_taps - 1)) ** 2, 0, 1)))
    w /= np.i0(beta)
    h = h * w
    return (h / h.sum() * 1.0).astype(np.float32)  # unity DC gain


_POLY_BLOCK = 256  # input samples per polyphase block (128 outputs)


@functools.lru_cache(maxsize=8)
def _poly_matrix_cached(taps_bytes: bytes, num_taps: int,
                        block: int) -> np.ndarray:
    taps = np.frombuffer(taps_bytes, np.float32)
    pad = num_taps // 2
    out_block = block // 2
    w = np.zeros((block + 2 * pad, out_block), np.float32)
    for m in range(out_block):
        w[2 * m: 2 * m + num_taps, m] = taps
    return w


def _poly_matrix(taps=None, block: int = _POLY_BLOCK) -> np.ndarray:
    """Polyphase decimation-by-2 as one dense matmul operand.

    W[(j, m)] = taps[j - 2m]: an input window of `block + 2*(taps//2)`
    samples times W yields `block//2` consecutive decimated outputs. A
    1-channel FIR conv cannot use the MXU at all (C_in = C_out = 1); this
    block-matmul form runs the same filter 5x faster on TPU v5e
    (scripts/microbench_frontend.py). Built from the GIVEN taps (host
    values; default half-band), cached by tap values.
    """
    taps = halfband_taps() if taps is None else np.asarray(taps, np.float32)
    return _poly_matrix_cached(taps.tobytes(), len(taps), block)


def downsample2(y: jax.Array, taps: jax.Array, *,
                out_scale: float = 1.0,
                out_dtype: jnp.dtype | None = None) -> jax.Array:
    """Halve the sample rate: half-band FIR + decimate, (B, L) -> (B, ceil(L/2)).

    Identical output (up to f32 summation order) to the direct strided
    conv; evaluated as a polyphase block matmul so the MXU executes it.

    Integer input (raw PCM16 ingestion) stays integer through the pad /
    reshape / concat staging — half the HBM traffic — and is converted
    inside the matmul read; `out_scale` (the PCM normalization) is folded
    into the constant polyphase matrix, so the output is normalized float32.

    `taps` must hold concrete host values (it parameterizes the constant
    polyphase matrix); a jnp array of constants is accepted, a traced
    value raises.
    """
    n_taps = taps.shape[0]
    pad = n_taps // 2
    block = _POLY_BLOCK
    out_block = block // 2
    integer_in = jnp.issubdtype(y.dtype, jnp.integer)
    w = jnp.asarray(_poly_matrix(np.asarray(taps), block))
    if out_scale != 1.0:
        w = w * out_scale
    b, L = y.shape
    nb = -(-L // block)
    out_len = (L - 1) // 2 + 1
    yp = jnp.pad(y, ((0, 0), (pad, nb * block + block + pad - L)))
    # split contraction: block n's polyphase window is [block n | first
    # 2*pad of block n+1], so contract the two K-slices as separate
    # einsums over RESHAPE VIEWS of yp and add. The naive concat form
    # materializes the whole staged (b, nb, block+2*pad) window tensor in
    # HBM (~6.4 GB at the 512-clip bench octave 1); the split keeps both
    # operands as fused reads (honest cascade wall 123 -> 77 ms at B=512,
    # PERFNOTES round-7)
    a = yp[:, : (nb + 1) * block].reshape(b, nb + 1, block)
    if out_dtype is None:
        # default: float32 for integer input, else the input dtype; an
        # explicit out_dtype lets the caller store the stream at the conv
        # width directly (no full-rate f32 intermediate in HBM)
        out_dtype = jnp.float32 if integer_in else y.dtype
    cdt = jnp.float32 if (integer_in or y.dtype == jnp.float32) else y.dtype
    # chunk the block axis so the f32 dot intermediates stay bounded (the
    # unchunked dot's (b, nb, m) f32 output is ~5 GB at bench geometry)
    seg = max(1, min(nb, (256 << 20) // (out_block * b * 4)))
    outs = []
    for s0 in range(0, nb, seg):
        s1 = min(s0 + seg, nb)
        o = jnp.einsum("bnw,wm->bnm", a[:, s0:s1].astype(cdt),
                       w[:block].astype(cdt),
                       preferred_element_type=jnp.float32)
        o = o + jnp.einsum("bnw,wm->bnm",
                           a[:, s0 + 1: s1 + 1, : 2 * pad].astype(cdt),
                           w[block:].astype(cdt),
                           preferred_element_type=jnp.float32)
        outs.append(o.astype(out_dtype))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out.reshape(b, nb * out_block)[:, :out_len]


def stream_plan(hop: int, octave: int, n_fft: int, n_frames: int):
    """Static stride decomposition of one octave's frame centers.

    Frame t's center at octave o is round(t * hop / 2**o). Writing
    t = j*q + r with q = 2**o / gcd(hop, 2**o), the centers split into q
    arithmetic streams with EXACT integer stride = hop / gcd(hop, 2**o) and
    static integer offsets round(r * hop / 2**o):

        center(j*q + r) = offset_r + j * stride.

    When stride >= n_fft, consecutive stream frames never overlap, so the
    frame matrix is a zero-copy reshape of each stream plus a static column
    slice — no gather, no strided conv (the TPU-native framing trick).

    Returns (q, stride, offsets, frames_per_stream), or None when
    stride < n_fft (very small hops; callers fall back to a gather).
    """
    g = math.gcd(hop, 2 ** octave)
    q = 2 ** octave // g
    stride = hop // g
    if stride < n_fft:
        return None
    tq = -(-n_frames // q)
    # round-half-UP, not python/numpy half-even: t*hop/2^o and r*hop/2^o
    # share their fractional part (q*hop/2^o == stride exactly), so any
    # PARITY-INDEPENDENT tie-break makes offset_r + j*stride equal the
    # rounded center for every t — half-even breaks that on exact halves
    # (tests/test_cqt.py::test_stream_plan_reconstructs_exact_frame_centers)
    offsets = [math.floor(r * hop / 2 ** octave + 0.5) for r in range(q)]
    return q, stride, offsets, tq


def _padded_signal(y: jax.Array, plan, n_fft: int):
    """Reflect-pad by n_fft//2 (+1) like librosa's centered frames, then
    zero-extend on the right so every stream window is in range (the zero
    region only feeds frames t >= n_frames, which interleave_streams
    discards). Shared by the XLA (octave_frames) and Pallas
    (octave_streams) framing paths so their boundary conventions cannot
    drift. Returns (ypad, width = Tq*stride)."""
    q, stride, offsets, tq = plan
    half = n_fft // 2
    width = tq * stride
    need = max(offsets) + width
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    if ypad.shape[1] < need:
        ypad = jnp.pad(ypad, ((0, 0), (0, need - ypad.shape[1])))
    return ypad, width


def octave_streams(y: jax.Array, plan, n_fft: int) -> jax.Array:
    """(B, L) octave-rate signal -> (B, q, Tq*stride) stream windows
    (q static slices of the padded signal)."""
    ypad, width = _padded_signal(y, plan, n_fft)
    return jnp.stack([ypad[:, c: c + width] for c in plan[2]], axis=1)


def octave_frames(y: jax.Array, plan, n_fft: int) -> jax.Array:
    """(B, L) octave-rate signal -> (B, q, Tq, n_fft) frame matrices.

    Same frames as octave_streams + reshape + [:, :n_fft], but each stream
    is column-sliced to n_fft BEFORE the stack, so the materialized tensor
    is n_fft/stride (~23%) of the full stream width — the streams concat
    otherwise dominates the front-end's HBM traffic at large batch.
    """
    q, stride, offsets, tq = plan
    ypad, width = _padded_signal(y, plan, n_fft)
    b = y.shape[0]
    per = [ypad[:, c: c + width].reshape(b, tq, stride)[:, :, :n_fft]
           for c in offsets]
    return jnp.stack(per, axis=1)


def interleave_streams(resp: jax.Array, plan, n_frames: int) -> jax.Array:
    """(B, q, Tq, K) per-stream responses -> (B, n_frames, K) in time order."""
    b, q, tq, k = resp.shape
    out = resp.transpose(0, 2, 1, 3).reshape(b, tq * q, k)
    return out[:, :n_frames]


def _gather_frames(y: jax.Array, centers: jax.Array, n_fft: int) -> jax.Array:
    """Fallback framing for hops smaller than n_fft (gather-based)."""
    half = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    idx = centers[:, None] + jnp.arange(n_fft)[None, :]
    return ypad[:, idx]                                        # (B, T, n_fft)


def cqt(y: jax.Array, p: CQTParams, *, log1p: bool = True,
        conv_dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Batched CQT: (B, L) waveforms -> (B, n_bins, T) magnitudes.

    T = 1 + L // hop. All octaves share T; lower octaves' frame centers are
    rounded to the nearest sample at that rate. Each octave's response is
    one strided VALID convolution per stream of the plan (kernel = the
    [cos|sin] bank, window stride = the plan stride) -> magnitude ->
    sqrt-length scale. The conv reads the padded stream in place — XLA's
    TPU conv emitter streams the windows through VMEM — where a
    frames-matrix + matmul formulation materializes ~630 MB of frames per
    octave at B=256 (write+read ~10 GB/step of pure overhead traffic;
    measured 93.6 -> 81.1 ms/step CQT by this change alone, bit-identical
    output). Whenever stride < n_fft (tiny hops) the gather+einsum
    fallback below is used instead.

    conv_dtype selects the conv OPERAND storage dtype. bfloat16 halves the
    response path's HBM traffic (81.1 -> 72.2 ms/step) at < 0.2% relative
    feature error: the TPU MXU evaluates f32 convolutions by bf16-operand
    decomposition anyway, so precision loss is confined to the one
    int16->bf16 top-octave quantization (measured 6e-4 absolute on 0.43
    peak). Product paths default to bf16 via `Config.cqt_conv_dtype`;
    numerical tests pin the f32 default against the direct-convolution
    oracle.

    Integer input is raw PCM (the host-I/O-only decode path,
    data/audio_io.py::decode_audio(raw=True)): the signal stays int16
    through the top octave's pad/frame staging (half the HBM traffic, half
    the H2D transfer) and the 1/32768 normalization folds into the existing
    per-octave scale multiply and the first downsample's constant matrix —
    outputs are bit-comparable to feeding pre-normalized float32 (the fold
    only reassociates a scalar multiply; tests pin <1e-5 relative).
    """
    if y.ndim == 1:
        y = y[None]
    bank = kernel_bank(p)
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]], axis=1))
    scales = jnp.asarray(bank["scales"])
    n_fft = bank["n_fft"]
    bpo = p.bins_per_octave
    taps = halfband_taps()   # host values: they build the polyphase matrix
    in_scale = 1.0
    if jnp.issubdtype(y.dtype, jnp.integer):
        if y.dtype != jnp.int16:
            raise ValueError(f"raw PCM input must be int16, got {y.dtype}")
        in_scale = 1.0 / 32768.0

    n_frames = 1 + y.shape[1] // p.hop
    kern = kmat.reshape(1, n_fft, 1, 2 * bpo).astype(conv_dtype)

    octs = []
    cur = y if in_scale != 1.0 else y.astype(jnp.float32)
    for o in range(p.octaves):
        if o > 0:
            # after the first downsample `cur` is normalized float, stored
            # at conv_dtype (bf16 halves every later octave's cascade and
            # frame-staging HBM traffic; the quantization point matches
            # cqt_pallas's stream_dtype semantics)
            cur = downsample2(cur, taps,
                              out_scale=in_scale if o == 1 else 1.0,
                              out_dtype=conv_dtype)
        oct_scale = in_scale if o == 0 else 1.0
        plan = stream_plan(p.hop, o, n_fft, n_frames)
        if plan is not None:
            q, stride, offsets, tq = plan
            ypad, _ = _padded_signal(cur, plan, n_fft)
            # stream r's frame j covers [offset_r + j*stride, ... + n_fft);
            # stride >= n_fft guarantees ypad covers need (need <= width)
            need = (tq - 1) * stride + n_fft
            rs = []
            for c in offsets:
                xi = ypad[:, c: c + need].astype(conv_dtype)[:, None, :, None]
                rr = lax.conv_general_dilated(
                    xi, kern, (1, stride), "VALID", dimension_numbers=_DN,
                    preferred_element_type=jnp.float32)
                rs.append(rr[:, 0])                        # (B, tq, 2bpo)
            r = jnp.stack(rs, axis=1)                      # (B, q, tq, 2bpo)
            mag = jnp.sqrt(r[..., :bpo] ** 2 + r[..., bpo:] ** 2)
            resp = interleave_streams(mag, plan, n_frames)     # (B, T, bpo)
        else:
            t_idx = jnp.arange(n_frames, dtype=jnp.float32)
            # half-up to match the stream-plan path's center convention
            centers = jnp.floor(t_idx * (p.hop / (2 ** o))
                                + 0.5).astype(jnp.int32)
            frames = _gather_frames(cur, centers, n_fft)
            r = jnp.einsum("btn,nk->btk", frames.astype(jnp.float32), kmat,
                           preferred_element_type=jnp.float32)
            resp = jnp.sqrt(r[..., :bpo] ** 2 + r[..., bpo:] ** 2)
        # scale=True uses the full-rate kernel length: L_fullrate = L * 2**o,
        # so each octave down gains sqrt(2) (librosa's downsample compensation)
        octs.append(resp * (scales[None, None, :]
                            * (oct_scale * 2.0 ** (o / 2))))
    # octave o analyzes bins [n_bins - (o+1)*bpo : n_bins - o*bpo]
    out = jnp.concatenate(list(reversed(octs)), axis=-1)       # (B, T, n_bins)
    out = jnp.transpose(out, (0, 2, 1))                        # (B, n_bins, T)
    if log1p:
        out = jnp.log1p(out)
    return out


def reference_hop(sr: int, frames: int, window_size: int = 592,
                  signal_len: int | None = None) -> int:
    """The reference's hop rule (KeyDataset.py:485,490): frames per second,
    or window_size total frames when frames == 0."""
    if frames > 0:
        return int(round(sr / frames))
    assert signal_len is not None
    return signal_len // window_size + 1
