"""Exact direct-convolution CQT — the numerical oracle for ops/cqt.py.

This is the textbook constant-Q transform computed the slow, unambiguous
way: every bin gets its own full-rate kernel (length Q*sr/f, periodic hann,
L1-normalized, scale=True sqrt-length scaling — librosa.cqt's conventions,
reference KeyDataset.py:490-494) and is correlated directly against the
reflect-padded full-rate signal at the exact frame centers t*hop. No
multirate downsampling, no pow2 frame windows, no frame-center rounding.

O(n_bins * T * kernel_len) — test-only. tests/test_cqt.py pins the fast
multirate path (ops/cqt.py) against this per octave, which bounds the
combined error of (a) halfband decimation, (b) kernel-length quantization
at the downsampled rate, and (c) frame-center rounding (< 0.5 sample at
each octave's rate).
"""

from __future__ import annotations

import numpy as np

from .cqt import CQTParams


def oracle_cqt(y: np.ndarray, p: CQTParams, *, log1p: bool = True) -> np.ndarray:
    """(B, L) or (L,) float waveforms -> (B, n_bins, T) CQT magnitudes.

    T = 1 + L // hop, matching ops.cqt.cqt.
    """
    y = np.asarray(y, np.float64)
    if y.ndim == 1:
        y = y[None]
    b, L = y.shape
    n_frames = 1 + L // p.hop
    freqs = p.fmin * 2.0 ** (np.arange(p.n_bins) / p.bins_per_octave)
    lengths = p.q * p.sr / freqs

    pad = int(np.ceil(lengths.max() / 2)) + 2
    if pad >= L:
        raise ValueError(
            f"signal too short for oracle reflect pad: need L > {pad}")
    ypad = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    out = np.zeros((b, p.n_bins, n_frames))
    centers = np.arange(n_frames) * p.hop
    for j, (f, flen) in enumerate(zip(freqs, lengths)):
        ilen = int(np.floor(flen))
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ilen) / ilen)
        w /= w.sum()
        t = np.arange(ilen) - ilen // 2
        k = w * np.exp(-2j * np.pi * f * t / p.sr)
        starts = pad + centers - ilen // 2
        # (T, ilen) full-rate windows around each exact frame center
        seg = ypad[:, starts[:, None] + np.arange(ilen)[None, :]]
        out[:, j, :] = np.abs(seg @ k) * np.sqrt(ilen)
    if log1p:
        out = np.log1p(out)
    return out.astype(np.float32)
