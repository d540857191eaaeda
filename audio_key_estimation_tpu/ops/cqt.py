"""Constant-Q transform front-end, TPU-first.

Replaces the reference's per-file ``librosa.cqt`` call (KeyDataset.py:485-499,
the hot preprocessing loop) with a batched on-device transform:

  * one complex log-frequency kernel bank is built for the TOP octave only
    (host-side numpy, static per (sr, hop, bins/octave) config);
  * lower octaves reuse the SAME bank on a progressively halfband-
    downsampled signal (multirate CQT — at half the rate the same kernel
    analyzes half the frequency);
  * each octave is frames-gather + two real matmuls (cos/sin) -> magnitude
    -> sqrt-length scaling -> log1p — all MXU/VPU-friendly XLA ops
    (and a fused Pallas kernel in cqt_pallas.py).

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

Numerical validation: every octave of this fast path is pinned against an
exact full-rate direct-convolution CQT oracle (ops/cqt_oracle.py) — interior
frames agree to < 1.5% of the octave peak, the non-downsampled top octave to
< 1% everywhere (tests/test_cqt.py::test_fast_cqt_matches_direct_convolution
_oracle). Boundary frames are implementation-defined to within the
reflect-pad mirror-point shift at the downsampled rate (any recursive
multirate CQT, librosa's included, shares this property). Absolute
comparison against librosa itself remains pending librosa availability in
this environment.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

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


def downsample2(y: jax.Array, taps: jax.Array) -> jax.Array:
    """Halve the sample rate: FIR lowpass + decimate (batched, (B, L))."""
    pad = taps.shape[0] // 2
    y4 = y[:, None, :, None]  # NHWC with H=1
    k = taps[None, :, None, None].astype(y.dtype)  # HWIO (1, taps, 1, 1)
    out = jax.lax.conv_general_dilated(
        y4, k, window_strides=(1, 2), padding=[(0, 0), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[:, 0, :, 0]


def _octave_response(y: jax.Array, centers: jax.Array, k_cos, k_sin, scales):
    """CQT magnitudes of one octave: (B, L) signal -> (B, T, bpo).

    centers: (T,) int32 frame centers in samples at this octave's rate.
    """
    n_fft = k_cos.shape[0]
    half = n_fft // 2
    # reflect-pad so centered frames are defined at the edges
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    idx = centers[:, None] + jnp.arange(n_fft)[None, :]       # (T, n_fft)
    frames = ypad[:, idx]                                      # (B, T, n_fft)
    c = jnp.einsum("btn,nk->btk", frames, k_cos,
                   preferred_element_type=jnp.float32)
    s = jnp.einsum("btn,nk->btk", frames, k_sin,
                   preferred_element_type=jnp.float32)
    return jnp.sqrt(c * c + s * s) * scales[None, None, :]


def cqt(y: jax.Array, p: CQTParams, *, log1p: bool = True) -> jax.Array:
    """Batched CQT: (B, L) waveforms -> (B, n_bins, T) magnitudes.

    T = 1 + L // hop. All octaves share T; lower octaves' frame centers are
    rounded to the nearest sample at that rate.
    """
    if y.ndim == 1:
        y = y[None]
    bank = kernel_bank(p)
    k_cos = jnp.asarray(bank["k_cos"])
    k_sin = jnp.asarray(bank["k_sin"])
    scales = jnp.asarray(bank["scales"])
    taps = jnp.asarray(halfband_taps())

    n_frames = 1 + y.shape[1] // p.hop
    # frame centers computed in-graph (iota) — avoids baking n_frames x n_fft
    # index constants into the HLO, which bloats compile time
    t_idx = jnp.arange(n_frames, dtype=jnp.float32)

    octs = []
    cur = y.astype(jnp.float32)
    for o in range(p.octaves):
        if o > 0:
            cur = downsample2(cur, taps)
        centers = jnp.round(t_idx * (p.hop / (2 ** o))).astype(jnp.int32)
        # scale=True uses the full-rate kernel length: L_fullrate = L * 2**o,
        # so each octave down gains sqrt(2) (librosa's downsample compensation)
        octs.append(_octave_response(cur, centers, k_cos, k_sin, scales)
                    * (2.0 ** (o / 2)))
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
