"""Fused Pallas CQT kernel vs the pure-JAX reference implementation.

Runs in Pallas interpreter mode on CPU; the same kernel compiles for TPU
(exercised by bench.py / __graft_entry__ on hardware).
"""

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
P = CQTParams(sr=SR, hop=4410, bins_per_octave=36, octaves=4)


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
