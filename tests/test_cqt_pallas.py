"""Fused frame-table Pallas CQT kernel vs the pure-JAX reference.

Runs in Pallas interpreter mode on CPU; the same kernel compiles for TPU
(exercised by bench.py / scripts/microbench_pallas_sparse.py on hardware).

The kernel addresses HBM by per-frame window starts (a scalar-prefetched
static table), so unlike the earlier stream-layout designs it has no
stride >= n_fft constraint: it engages at EVERY geometry, including
few-octave configs (octaves=4 => n_fft=8192) whose overlapping windows
previously forced an XLA fallback. Tests cover the flagship 8-octave
geometry (multi-tile grids — an earlier single-tile-only suite hid a
real-TPU index_map bug), the large-n_fft geometry, int16 PCM, bf16
streams, and odd batch padding.
"""

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
# flagship front-end geometry (Config defaults): n_fft=512
P = CQTParams(sr=SR, hop=4410, bins_per_octave=36, octaves=8)
# large-kernel geometry: n_fft=8192 > hop, heavily overlapping windows
P_BIG_FFT = CQTParams(sr=SR, hop=4410, bins_per_octave=36, octaves=4)


def _sine(freq, seconds=2.0):
    t = np.arange(int(seconds * SR)) / SR
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_pallas_matches_jax_reference(rng):
    y = np.stack([_sine(440.0), _sine(1318.5)])
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_noise_input(rng):
    y = rng.normal(size=(1, SR)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_multi_tile_grid(rng):
    """B=48 (two batch tiles after padding to 32) x 8s (multiple time
    tiles): non-trivial block indices on both grid axes. This is the case
    that catches index_map argument-order mistakes (grid indices first,
    scalar-prefetch refs last) which single-tile tests cannot see."""
    y = rng.normal(size=(48, 8 * SR)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_large_nfft_overlapping_windows(rng):
    """octaves=4 => n_fft=8192 with hop 4410: windows overlap and the
    VMEM budget drops tile_t below its cap. The frame-table kernel
    handles this geometry (the stream-layout ancestors could not)."""
    y = np.stack([_sine(440.0)])
    ref = np.asarray(cqt(jnp.asarray(y), P_BIG_FFT))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P_BIG_FFT, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_int16_raw_pcm_matches_float(rng):
    """Raw PCM16 input: the top octave DMAs int16 windows and folds the
    1/32768 normalization into the scale epilogue."""
    yf = np.stack([_sine(440.0), 0.5 * _sine(220.0)])
    yi = np.round(yf * 32768.0).clip(-32768, 32767).astype(np.int16)
    ref = np.asarray(cqt_pallas(jnp.asarray(yi.astype(np.float32) / 32768.0),
                                P, interpret=True))
    got = np.asarray(cqt_pallas(jnp.asarray(yi), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_pallas_bf16_streams_close_to_f32(rng):
    """bfloat16 stream storage halves the downsampled octaves' DMA bytes;
    features stay within bf16 quantization of the f32 path."""
    y = np.stack([_sine(330.0)])
    ref = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P,
                                stream_dtype=jnp.bfloat16, interpret=True))
    assert np.max(np.abs(got - ref)) < 0.02 * np.max(ref)


def test_pallas_odd_batch_padding(rng):
    """Batch not divisible by the kernel's TILE_B pads and slices back."""
    y = rng.normal(size=(3, SR)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
