"""Op-level tests: exact transposition equivariance + parity vs torch CPU.

The equivariance heatmap-eyeball of reference equivariance_test.py becomes an
exact assert here: roll(f(roll(x, n)), -n) == f(x) (SURVEY.md §4).
Torch parity pins our conv semantics (wrap/circular padding, strides,
transposed conv) to the reference's nn.Conv2d behavior with shared weights.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from audio_key_estimation_tpu import ops


def _nchw(x_nhwc):
    return torch.tensor(np.asarray(x_nhwc)).permute(0, 3, 1, 2).double()


def _from_nchw(y):
    return y.permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# equivariance properties
# ---------------------------------------------------------------------------

def test_equivariant_pc_conv_is_shift_equivariant(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 30, 3)), jnp.float64)
    w = jnp.asarray(rng.normal(size=(12, 7, 3, 5)), jnp.float64)
    b = jnp.asarray(rng.normal(size=(5,)), jnp.float64)
    base = ops.equivariant_pc_conv(x, w, b, same_depth_padding=True)
    for n in (1, 4, 11):
        shifted = ops.equivariant_pc_conv(jnp.roll(x, n, axis=1), w, b,
                                          same_depth_padding=True)
        np.testing.assert_allclose(np.roll(np.asarray(base), n, axis=1),
                                   np.asarray(shifted), rtol=1e-10, atol=1e-10)


def test_octave_pool_is_shift_equivariant(rng):
    # shifting semitone rows by n*? -> rolling by n on pc axis needs a shift
    # of n rows at semitone resolution with P multiple of 12
    x = jnp.asarray(rng.normal(size=(1, 96, 20, 2)), jnp.float64)
    base = ops.octave_max_pool(x)
    for n in (1, 5):
        shifted = ops.octave_max_pool(jnp.roll(x, n, axis=1))
        np.testing.assert_allclose(np.roll(np.asarray(base), n, axis=1),
                                   np.asarray(shifted))


def test_tile_then_pool_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 12, 8, 2)), jnp.float64)
    tiled = ops.pc_to_pitch_tile(x, 288)
    assert tiled.shape == (1, 288, 8, 2)
    np.testing.assert_allclose(np.asarray(ops.octave_max_pool(tiled)),
                               np.asarray(x))


# ---------------------------------------------------------------------------
# torch parity (shared weights)
# ---------------------------------------------------------------------------

def test_equivariant_conv_matches_torch_wrap_conv(rng):
    """Wrap-concat + full-height Conv2d, as in reference models.py:45-47."""
    x = rng.normal(size=(2, 12, 25, 3))
    w = rng.normal(size=(4, 3, 12, 7))          # torch OIHW
    b = rng.normal(size=(4,))
    xt = _nchw(x)
    x_wrap = torch.cat([xt, xt[:, :, 0:11, :]], dim=2)
    ref = F.conv2d(x_wrap, torch.tensor(w).double(), torch.tensor(b).double(),
                   padding=(0, 3))
    ours = ops.equivariant_pc_conv(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b),
        same_depth_padding=True)
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref),
                               rtol=1e-9, atol=1e-9)


def test_circular_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 24, 20, 3))
    w = rng.normal(size=(5, 3, 7, 7))
    b = rng.normal(size=(5,))
    ref = F.conv2d(F.pad(_nchw(x), (3, 3, 3, 3), mode="circular"),
                   torch.tensor(w).double(), torch.tensor(b).double())
    ours = ops.circular_conv2d(jnp.asarray(x),
                               jnp.asarray(w.transpose(2, 3, 1, 0)),
                               jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref),
                               rtol=1e-9, atol=1e-9)


def test_semitone_pool_conv_matches_torch(rng):
    """Conv2d(1,1,3,stride=(3,1),padding=(0,1),padding_mode='circular')
    — reference models.py:313."""
    x = rng.normal(size=(1, 288, 31, 1))
    w = rng.normal(size=(1, 1, 3, 3))
    b = rng.normal(size=(1,))
    ref = F.conv2d(F.pad(_nchw(x), (1, 1, 0, 0), mode="circular"),
                   torch.tensor(w).double(), torch.tensor(b).double(),
                   stride=(3, 1))
    ours = ops.semitone_pool_conv(jnp.asarray(x),
                                  jnp.asarray(w.transpose(2, 3, 1, 0)),
                                  jnp.asarray(b))
    assert ours.shape == (1, 96, 31, 1)
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref),
                               rtol=1e-9, atol=1e-9)


def test_third_upsample_matches_torch_conv_transpose(rng):
    """ConvTranspose2d((3,1), stride=(3,1)) — reference models.py:325."""
    x = rng.normal(size=(2, 12, 15, 4))
    w = rng.normal(size=(4, 6, 3, 1))            # torch (Cin, Cout, 3, 1)
    b = rng.normal(size=(6,))
    ref = F.conv_transpose2d(_nchw(x), torch.tensor(w).double(),
                             torch.tensor(b).double(), stride=(3, 1))
    ours = ops.third_upsample(jnp.asarray(x),
                              jnp.asarray(w[:, :, :, 0].transpose(2, 0, 1)),
                              jnp.asarray(b))
    assert ours.shape == (2, 36, 15, 6)
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref),
                               rtol=1e-9, atol=1e-9)


def test_octave_max_pool_matches_torch(rng):
    """MaxPool2d((8,1), (1,1), dilation=(12,1)) over 96 rows (models.py:92)."""
    x = rng.normal(size=(2, 96, 10, 3))
    ref = F.max_pool2d(_nchw(x), kernel_size=(8, 1), stride=(1, 1),
                       dilation=(12, 1))
    ours = ops.octave_max_pool(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref))


def test_octave_dilated_conv_matches_torch(rng):
    """Conv2d dilation=(12,1) p2pc_conv variant (models.py:108-133)."""
    x = rng.normal(size=(1, 96, 9, 2))
    w = rng.normal(size=(2, 2, 8, 1))
    b = rng.normal(size=(2,))
    ref = F.conv2d(_nchw(x), torch.tensor(w).double(),
                   torch.tensor(b).double(), dilation=(12, 1))
    ours = ops.octave_dilated_conv(jnp.asarray(x),
                                   jnp.asarray(w.transpose(2, 3, 1, 0)),
                                   jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref),
                               rtol=1e-9, atol=1e-9)


def test_time_max_pool_matches_torch(rng):
    x = rng.normal(size=(2, 12, 31, 3))           # odd T -> floor semantics
    ref = F.max_pool2d(_nchw(x), kernel_size=(1, 2))
    ours = ops.time_max_pool(jnp.asarray(x), 2)
    assert ours.shape[2] == 15
    np.testing.assert_allclose(np.asarray(ours), _from_nchw(ref))


def test_pc_to_pitch_memory_add_matches_torch_reference_semantics(rng):
    """Reshape/sum/add semantics of models.py:151-166."""
    n, c1, p, t = 2, 3, 288, 7
    n_pc = 36
    c2 = 12
    pitches = rng.normal(size=(n, c1, p, t))
    pcs = rng.normal(size=(n, c2, n_pc, t))
    # torch-side reference computation (NCHW), transcribing the reference math
    pt = torch.tensor(pitches)
    ct = torch.tensor(pcs)
    ct_sum = ct.reshape(n, c1, c2 // c1, n_pc, t).sum(axis=2)
    p_int = pt.reshape(n, c1, n_pc, p // n_pc, t)
    out_ref = (p_int + ct_sum.reshape(n, c1, n_pc, 1, t)).reshape(n, c1, p, t)
    ours = ops.pc_to_pitch_memory_add(
        jnp.asarray(pitches.transpose(0, 2, 3, 1)),
        jnp.asarray(pcs.transpose(0, 2, 3, 1)), n_pc)
    np.testing.assert_allclose(np.asarray(ours),
                               out_ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# masked reduction
# ---------------------------------------------------------------------------

def test_actual_output_length():
    seq = jnp.array([100, 57, 12])
    out = ops.actual_output_length(seq, num_layers=2, time_pool_size=2,
                                   kernel_size=7, head_layers=2)
    np.testing.assert_array_equal(np.asarray(out), [50 - 12, 28 - 12, 6 - 12])


def test_masked_time_reduce_matches_loop(rng):
    x = jnp.asarray(rng.normal(size=(3, 12, 20)), jnp.float64)
    lengths = jnp.array([20, 7, 1])
    mean = ops.masked_time_reduce(x, lengths)
    mx = ops.masked_time_reduce(x, lengths, use_max=True)
    for i, ln in enumerate([20, 7, 1]):
        np.testing.assert_allclose(np.asarray(mean)[i],
                                   np.asarray(x)[i, :, :ln].mean(-1))
        np.testing.assert_allclose(np.asarray(mx)[i],
                                   np.asarray(x)[i, :, :ln].max(-1))
