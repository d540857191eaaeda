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
