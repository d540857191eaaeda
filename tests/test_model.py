"""PitchClassNet model tests: shapes across all modes + exact equivariance.

The reference's human-inspected heatmap check (equivariance_test.py:235-253)
becomes an exact assert: with a >= (k//2 + 3·n)-row zero guard band, shifting
the input up by n semitones (3n CQT rows) circularly shifts the 12 key/tonic
outputs by n.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.models.multi_scale import init_multi_model


def _forward(cfg, mel, seq_length=None, seed=0):
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(seed), mel, seq_length, False)
    return model.apply(variables, mel, seq_length, False)


BASE = Config(octaves=4, num_layers=2, conv_layers=2, n_filters=4,
              kernel_size=7, head_layers=2)


def test_global_forward_shapes(rng):
    mel = jnp.asarray(rng.normal(size=(2, BASE.pitches, 64, 1)), jnp.float32)
    key, tonic = _forward(BASE, mel)
    assert key.shape == (2, 12) and tonic.shape == (2, 12)
    assert ((np.asarray(key) >= 0) & (np.asarray(key) <= 1)).all()


def test_genre_head_emits_11_logits(rng):
    cfg = BASE.replace(genre=True)
    mel = jnp.asarray(rng.normal(size=(1, cfg.pitches, 64, 1)), jnp.float32)
    key, tonic, genre = _forward(cfg, mel)
    assert genre.shape == (1, 11)


def test_masked_lengths_change_output(rng):
    mel = jnp.asarray(rng.normal(size=(2, BASE.pitches, 64, 1)), jnp.float32)
    model = PitchClassNet(BASE)
    variables = model.init(jax.random.PRNGKey(0), mel, None, False)
    full = model.apply(variables, mel, jnp.array([64, 64]))
    part = model.apply(variables, mel, jnp.array([64, 30]))
    np.testing.assert_allclose(np.asarray(full[0][0]), np.asarray(part[0][0]),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(full[0][1]), np.asarray(part[0][1]))


def test_bucket_padding_invariance_with_seq_mask(rng):
    """A song's eval outputs must not depend on how much zero padding its
    batch bucket carries, as long as seq_length masks the pooling — the
    regression behind window-mode (frames==0) seq=None, where bucket
    choice changed every score.

    Exact equality is impossible by reference design: the pitch-stream
    convs replicate torch's padding_mode='circular' on BOTH spatial axes
    (reference models.py:221), so frame 0's receptive field wraps around
    to the END of the padded axis — real tail data in the short layout,
    zeros in the padded one. That residual is confined to the k//2 edge
    frames of a few-hundred-frame mean (measured ~5e-4 on sigmoid
    outputs); the seq mask removes the O(1) padding dilution."""
    t = 60
    mel = rng.normal(size=(1, BASE.pitches, t, 1)).astype(np.float32)
    model = PitchClassNet(BASE)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(mel), jnp.array([t]), False)
    small = model.apply(variables, jnp.asarray(mel), jnp.array([t]), False)
    big = np.zeros((1, BASE.pitches, 2 * t, 1), np.float32)
    big[..., :t, :] = mel
    padded = model.apply(variables, jnp.asarray(big), jnp.array([t]), False)
    for a, b in zip(small, padded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)
    # dilution check: the UNMASKED padded forward (seq=None means mean
    # over the full padded axis) must diverge far beyond the circular-wrap
    # residual above — that is the regression this test guards against
    masked_diff = max(np.abs(np.asarray(a) - np.asarray(b)).max()
                      for a, b in zip(small, padded))
    diluted = model.apply(variables, jnp.asarray(big), None, False)
    diluted_diff = np.abs(np.asarray(diluted[1])
                          - np.asarray(small[1])).max()
    assert diluted_diff > 5 * masked_diff


@pytest.mark.parametrize("mode", ["resblock", "denseblock", "stay_sixth",
                                  "only_semitones", "p2pc_conv", "pc2p_mem",
                                  "max_pool", "three_layers"])
def test_variant_forward_shapes(rng, mode):
    kw = {}
    if mode == "three_layers":
        kw = dict(num_layers=3)
    elif mode in ("resblock", "denseblock", "stay_sixth", "only_semitones",
                  "p2pc_conv", "pc2p_mem", "max_pool"):
        kw = {mode: True}
    cfg = BASE.replace(**kw)
    t = 128 if mode == "three_layers" else 64
    mel = jnp.asarray(rng.normal(size=(1, cfg.pitches, t, 1)), jnp.float32)
    key, tonic = _forward(cfg, mel)
    assert key.shape == (1, 12) and tonic.shape == (1, 12)


def test_local_mode_shapes(rng):
    cfg = BASE.replace(local=True, frames=5, loc_window_size=10)
    t = 80
    mel = jnp.asarray(rng.normal(size=(1, cfg.pitches, t, 1)), jnp.float32)
    key, tonic = _forward(cfg, mel)
    # output frames = T - (frames*loc_window - 1) = 80 - 49 = 31
    assert key.shape == (1, 31, 12) and tonic.shape == (1, 31, 12)


def test_multi_scale_forward(rng):
    cfg = BASE.replace(multi_scale=True)
    model, variables = init_multi_model(cfg, jax.random.PRNGKey(0), 64)
    mel1 = jnp.asarray(rng.normal(size=(1, cfg.octaves * 36, 64, 1)), jnp.float32)
    mel2 = jnp.asarray(rng.normal(size=(1, cfg.octaves * 12, 64, 1)), jnp.float32)
    key, tonic = model.apply(variables, mel1, mel2, None, False)
    assert key.shape == (1, 12) and tonic.shape == (1, 12)


def test_multi_scale_linear_reg(rng):
    cfg = BASE.replace(multi_scale=True, linear_reg_multi=True, genre=True)
    model, variables = init_multi_model(cfg, jax.random.PRNGKey(0), 64)
    mel1 = jnp.asarray(rng.normal(size=(1, cfg.octaves * 36, 64, 1)), jnp.float32)
    mel2 = jnp.asarray(rng.normal(size=(1, cfg.octaves * 12, 64, 1)), jnp.float32)
    key, tonic, genre = model.apply(variables, mel1, mel2, None, False)
    assert genre.shape == (1, 11)


# ---------------------------------------------------------------------------
# the load-bearing invariant
# ---------------------------------------------------------------------------

def _blob_input(rng, pitches, t, guard):
    mel = np.zeros((1, pitches, t, 1), np.float32)
    lo, hi = guard, pitches - guard
    mel[0, lo + 20:lo + 60, 5:40, 0] = rng.random((40, 35)).astype(np.float32)
    mel[0, lo + 5:lo + 8, 45:60, 0] = 3.0
    assert hi - (lo + 60) > 36  # room to shift a full octave
    return jnp.asarray(mel)


@pytest.mark.parametrize("shift_semitones", [1, 3, 12])
def test_full_model_transposition_equivariance(rng, shift_semitones):
    cfg = Config(octaves=5, num_layers=2, conv_layers=2, n_filters=4,
                 kernel_size=7, head_layers=2)
    guard = 36  # one octave of zero rows top+bottom (equivariance_test.py:174-175)
    mel = _blob_input(rng, cfg.pitches, 64, guard)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(1), mel, None, False)
    key0, tonic0 = model.apply(variables, mel, None, False)
    shifted = jnp.roll(mel, 3 * shift_semitones, axis=1)
    key1, tonic1 = model.apply(variables, shifted, None, False)
    np.testing.assert_allclose(np.roll(np.asarray(key0), shift_semitones, axis=1),
                               np.asarray(key1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.roll(np.asarray(tonic0), shift_semitones, axis=1),
                               np.asarray(tonic1), rtol=2e-4, atol=2e-5)


def test_equivariance_exact_for_resblock(rng):
    cfg = Config(octaves=5, num_layers=2, conv_layers=2, n_filters=4,
                 kernel_size=7, head_layers=2, resblock=True)
    mel = _blob_input(rng, cfg.pitches, 64, 36)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(2), mel, None, False)
    key0, _ = model.apply(variables, mel, None, False)
    key1, _ = model.apply(variables, jnp.roll(mel, 3, axis=1), None, False)
    np.testing.assert_allclose(np.roll(np.asarray(key0), 1, axis=1),
                               np.asarray(key1), rtol=2e-4, atol=2e-5)


def test_equivariance_approximate_for_denseblock(rng):
    """Dense blocks zero-pad the pitch axis (torchvision heritage, reference
    models.py:468), which cuts the tiled periodic pitch pattern at the
    boundary octaves — so the dense variant is only approximately
    equivariant, in the reference exactly as here. Assert the deviation is
    small but do not require exactness."""
    cfg = Config(octaves=5, num_layers=2, conv_layers=2, n_filters=4,
                 kernel_size=7, head_layers=2, denseblock=True)
    mel = _blob_input(rng, cfg.pitches, 64, 36)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(2), mel, None, False)
    key0, _ = model.apply(variables, mel, None, False)
    key1, _ = model.apply(variables, jnp.roll(mel, 3, axis=1), None, False)
    dev = np.abs(np.roll(np.asarray(key0), 1, axis=1) - np.asarray(key1)).max()
    assert dev < 0.05, dev


def test_batchnorm_stats_update_in_train_mode(rng):
    mel = jnp.asarray(rng.normal(size=(2, BASE.pitches, 64, 1)), jnp.float32)
    model = PitchClassNet(BASE)
    variables = model.init(jax.random.PRNGKey(0), mel, None, False)
    out, mutated = model.apply(variables, mel, None, True,
                               mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bfloat16_compute_with_f32_params(rng):
    """cfg.dtype='bfloat16': params stay float32 (trainable/checkpointable),
    compute runs in bf16, outputs return as float32 and track the f32 path."""
    cfg = BASE.replace(dtype="bfloat16")
    mel = jnp.asarray(rng.normal(size=(2, cfg.pitches, 64, 1)), jnp.float32)
    model16 = PitchClassNet(cfg, dtype=jnp.bfloat16)
    variables = model16.init(jax.random.PRNGKey(0), mel, None, False)
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(variables["params"]))
    key16, tonic16 = model16.apply(variables, mel, None, False)
    assert key16.dtype == jnp.float32
    model32 = PitchClassNet(BASE)
    key32, tonic32 = model32.apply(variables, mel, None, False)
    np.testing.assert_allclose(np.asarray(key16), np.asarray(key32),
                               atol=0.05)
