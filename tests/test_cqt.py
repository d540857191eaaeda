"""CQT front-end property tests (librosa unavailable in-env; the transform's
defining mathematical properties are pinned instead — SURVEY.md §7 step 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_key_estimation_tpu.ops.cqt import (CQTParams, cqt, downsample2,
                                              halfband_taps, kernel_bank,
                                              reference_hop)

SR = 22050
P = CQTParams(sr=SR, hop=reference_hop(SR, 5), bins_per_octave=36, octaves=6)


def _sine(freq, seconds=3.0, sr=SR, amp=1.0):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _bin_freq(p, k):
    return p.fmin * 2.0 ** (k / p.bins_per_octave)


def test_frame_count_matches_librosa_rule():
    y = _sine(440.0, seconds=2.0)
    out = cqt(jnp.asarray(y), P)
    assert out.shape == (1, P.n_bins, 1 + len(y) // P.hop)


@pytest.mark.parametrize("k", [18, 54, 90, 126, 162, 198])
def test_sine_peaks_at_its_bin(k):
    """A pure sine at bin k's center frequency peaks at bin k — across
    octaves, i.e. through the downsample cascade."""
    y = _sine(_bin_freq(P, k))
    out = np.asarray(cqt(jnp.asarray(y), P, log1p=False))[0]
    mid = out[:, out.shape[1] // 2]  # away from edges
    assert int(mid.argmax()) == k


def test_semitone_shift_moves_peak_three_bins():
    k = 108
    f = _bin_freq(P, k)
    up = f * 2 ** (1 / 12)
    o1 = np.asarray(cqt(jnp.asarray(_sine(f)), P, log1p=False))[0]
    o2 = np.asarray(cqt(jnp.asarray(_sine(up)), P, log1p=False))[0]
    t = o1.shape[1] // 2
    assert int(o2[:, t].argmax()) - int(o1[:, t].argmax()) == 3


def test_scale_convention_sqrt_length():
    """scale=True convention: unit sine at bin k -> |C| ~ sqrt(L_k)/2."""
    bank = kernel_bank(P)
    for k in (90, 198):
        y = _sine(_bin_freq(P, k))
        out = np.asarray(cqt(jnp.asarray(y), P, log1p=False))[0]
        t = out.shape[1] // 2
        q = P.q
        expected = np.sqrt(q * SR / _bin_freq(P, k)) / 2
        assert abs(out[k, t] - expected) / expected < 0.05, (k, out[k, t], expected)


def test_amplitude_linearity():
    y1 = _sine(440.0, amp=0.25)
    y2 = _sine(440.0, amp=0.5)
    o1 = np.asarray(cqt(jnp.asarray(y1), P, log1p=False))[0]
    o2 = np.asarray(cqt(jnp.asarray(y2), P, log1p=False))[0]
    t = o1.shape[1] // 2
    k = o2[:, t].argmax()
    np.testing.assert_allclose(o2[k, t] / o1[k, t], 2.0, rtol=1e-3)


def test_silence_gives_zeros_and_log1p():
    y = jnp.zeros((2, SR), jnp.float32)
    out = np.asarray(cqt(y, P))
    assert out.shape[0] == 2
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_batched_equals_single():
    ya = _sine(220.0)
    yb = _sine(1000.0)
    batch = np.asarray(cqt(jnp.asarray(np.stack([ya, yb])), P))
    solo = np.asarray(cqt(jnp.asarray(yb), P))
    np.testing.assert_allclose(batch[1], solo[0], atol=1e-5)


def test_downsample2_preserves_low_freq_tone():
    y = jnp.asarray(_sine(500.0, seconds=1.0))[None]
    d = np.asarray(downsample2(y, jnp.asarray(halfband_taps())))[0]
    assert d.shape[0] == SR // 2
    # RMS of a sine is invariant under ideal decimation
    rms_in = np.sqrt(np.mean(np.asarray(y[0][2000:-2000]) ** 2))
    rms_out = np.sqrt(np.mean(d[1000:-1000] ** 2))
    np.testing.assert_allclose(rms_out, rms_in, rtol=0.02)


def test_downsample2_rejects_above_nyquist():
    y = jnp.asarray(_sine(10000.0, seconds=0.5))[None]  # > 5512.5 Hz
    d = np.asarray(downsample2(y, jnp.asarray(halfband_taps())))[0]
    assert np.abs(d[500:-500]).max() < 0.05


def test_reference_hop_rule():
    assert reference_hop(22050, 5) == 4410
    assert reference_hop(44100, 5) == 8820
    assert reference_hop(22050, 0, window_size=592, signal_len=661500) == 1118


def test_only_semitones_12_bins():
    p12 = CQTParams(sr=SR, hop=4410, bins_per_octave=12, octaves=6)
    y = _sine(_bin_freq(p12, 30))
    out = np.asarray(cqt(jnp.asarray(y), p12, log1p=False))[0]
    assert out.shape[0] == 72
    assert int(out[:, out.shape[1] // 2].argmax()) == 30
