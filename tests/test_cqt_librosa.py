"""Fast TPU CQT vs the librosa-0.9.2-algorithm oracle (ops/librosa_ref.py).

The reference's features come from librosa.cqt (KeyDataset.py:490-494,
librosa 0.9.2 + resampy 0.3.1 pinned). ops/cqt_oracle.py pins the textbook
direct-convolution CQT; these tests pin the fast path against the SPECIFIC
recursive multirate algorithm that produced the reference's training data —
downsample filtering, pow2-FFT framing, reflect boundary frames included.

Measured agreement (multi-tone + noise, 6 octaves, sr 22050, hop 4416):
octaves 1-5 agree to < 0.6% of octave peak on interior AND boundary frames;
the lowest octave (5 resampling stages: our kaiser halfband cascade vs
resampy's kaiser_fast) to < 1.9% interior / < 2.6% boundary. Tolerances
below add ~30% headroom over measured.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt
from audio_key_estimation_tpu.ops.librosa_ref import (C1_HZ, ParameterError,
                                                      librosa_cqt,
                                                      librosa_resample,
                                                      resampy_resample)


def _fixture(sr=22050, seconds=2.5, n_bins=216, bpo=36, seed=0):
    """Tones on exact transform bins spread over every octave + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    y = np.zeros_like(t, dtype=np.float64)
    n_oct = n_bins // bpo
    for o in range(n_oct):
        k = o * bpo + int(rng.integers(2, bpo - 2))
        f = C1_HZ * 2 ** (k / bpo)
        y += 0.3 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    y += 0.02 * rng.standard_normal(len(t))
    return y.astype(np.float32)


def _compare(y, sr, hop, bpo, octaves, tol_interior, tol_boundary):
    p = CQTParams(sr=sr, hop=hop, bins_per_octave=bpo, octaves=octaves)
    ours = np.asarray(cqt(jnp.asarray(y), p, log1p=False))[0]
    ref = np.abs(librosa_cqt(y, sr, hop, bpo * octaves, bpo))
    T = min(ours.shape[1], ref.shape[1])
    ours, ref = ours[:, :T], ref[:, :T]
    for o in range(octaves):
        a, b = ours[o * bpo:(o + 1) * bpo], ref[o * bpo:(o + 1) * bpo]
        peak = b.max()
        d_int = np.abs(a[:, 1:-1] - b[:, 1:-1]).max() / peak
        d_bnd = max(np.abs(a[:, 0] - b[:, 0]).max(),
                    np.abs(a[:, -1] - b[:, -1]).max()) / peak
        assert d_int < tol_interior(o), (o, d_int)
        assert d_bnd < tol_boundary(o), (o, d_bnd)


def test_fast_cqt_matches_librosa_algorithm_36bpo():
    """6 octaves x 36 bins (the flagship front-end geometry) with a hop
    that satisfies librosa's 2^(n_octaves-1) divisibility rule."""
    y = _fixture()
    _compare(y, 22050, 4416, 36, 6,
             tol_interior=lambda o: 0.025 if o == 0 else 0.008,
             tol_boundary=lambda o: 0.035 if o == 0 else 0.010)


def test_fast_cqt_matches_librosa_algorithm_12bpo():
    """12 bins/octave — the only_semitones / multi-scale model2 front-end
    (KeyDataset.py:492-494)."""
    y = _fixture(n_bins=60, bpo=12)
    _compare(y, 22050, 4416, 12, 5,
             tol_interior=lambda o: 0.035 if o == 0 else 0.015,
             tol_boundary=lambda o: 0.045 if o == 0 else 0.02)


def test_fast_cqt_matches_librosa_early_downsample_path():
    """4 octaves triggers librosa's __early_downsample (factor 4 at this
    hop). The multirate trees genuinely differ here — librosa: ONE resampy
    kaiser_fast (16-zero, rolloff .85) step by 1/4, then halvings; ours:
    uniform 49-tap kaiser halfband halvings — so the divergence bound is
    looser, dominated by passband-ripple differences (interior) and the
    reflect-pad mirror point living at a 4x coarser rate (boundary).
    NOTE: no reference training configuration triggers early downsampling
    (8 octaves x 36 bpo puts the top-octave cutoff within a factor 2 of
    0.85*nyquist at both 22.05 and 44.1 kHz), so this path is exercised
    for algorithm completeness, not feature parity."""
    y = _fixture(n_bins=144)
    _compare(y, 22050, 4416, 36, 4,
             tol_interior=lambda o: 0.08 if o == 0 else 0.012,
             tol_boundary=lambda o: 0.30 if o == 0 else 0.05)


def test_librosa_hop_divisibility_raises():
    """The reference's own default configuration (hop=round(22050/5)=4410,
    8 octaves) violates 0.9.2's hop rule and raises — the documented
    divergence motivating ops/cqt.py's rounded frame centers."""
    y = _fixture(seconds=1.0)
    with pytest.raises(ParameterError, match="hop_length"):
        librosa_cqt(y, 22050, 4410, 288, 36)


def test_resampy_halving_preserves_tone():
    """resampy kaiser_fast transcription: a mid-band sine downsampled 2x
    keeps amplitude and frequency (checked against an ideal sine at the
    new rate, interior samples)."""
    sr = 8000
    t = np.arange(2 * sr) / sr
    f0 = 440.0
    y = np.sin(2 * np.pi * f0 * t).astype(np.float64)
    d = resampy_resample(y, 2, 1, filt="kaiser_fast")
    ideal = np.sin(2 * np.pi * f0 * np.arange(len(d)) / (sr / 2))
    err = np.abs(d[100:-100] - ideal[100:len(d) - 100])
    assert err.max() < 5e-3, err.max()


def test_librosa_resample_scale_energy():
    """librosa resample(scale=True) multiplies amplitude by sqrt(2) on a
    2x downsample (the recursion's per-octave energy compensation)."""
    rng = np.random.default_rng(1)
    y = rng.standard_normal(4096)
    d = librosa_resample(y, 2, 1, res_type="kaiser_fast", scale=True)
    assert len(d) == 2048
    ratio = np.sqrt(np.mean(d[64:-64] ** 2) / np.mean(y ** 2))
    # lowpass removes ~half the white-noise energy, then *sqrt(2) restores
    assert 0.85 < ratio < 1.15, ratio
