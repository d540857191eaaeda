"""Parity for the fused serving ConvStack kernel (interpret mode).

Pins ops/convstack_pallas.py against blocks.ConvStack (flax, eval mode)
— conv + BatchNorm + leaky-relu x3 with circular padding on both
spatial axes — on CPU via pallas interpret mode. The kernel computes in
bf16 streams with f32 accumulation, so tolerances are bf16-storage
bounds relative to the f32 flax reference; the dense block-Toeplitz
weight itself is checked EXACTLY against the direct conv in f32.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audio_key_estimation_tpu.models import blocks  # noqa: E402
from audio_key_estimation_tpu.ops import convstack_pallas as CP  # noqa: E402


def _direct_conv(x, w, bias):
    """f32 circular (7,7) conv, numpy reference."""
    H, T, ci, B = x.shape
    xp = np.concatenate([x[-3:], x, x[:3]], 0)
    xp = np.concatenate([xp[:, -3:], xp, xp[:, :3]], 1)
    out = np.zeros((H, T, w.shape[3], B), np.float32)
    for dh in range(7):
        for dt in range(7):
            out += np.einsum("io,htib->htob", w[dh, dt],
                             xp[dh:dh + H, dt:dt + T])
    return out + bias[None, None, :, None]


def test_pack_dense_w_exact():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((7, 7, 8, 8)).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    wd, b128 = CP.pack_dense_w(w, bias)
    x = rng.standard_normal((8, 12, 8, 4)).astype(np.float32)
    ref = _direct_conv(x, w, bias)
    # one output block (h0=4, t0=8): patch = padded window rows 4..13,
    # cols 8..17 -> the dense row m=(ih*4+jt)*8+co must reproduce it
    xp = np.concatenate([x[-3:], x, x[:3]], 0)
    xp = np.concatenate([xp[:, -3:], xp, xp[:, :3]], 1)
    patch = xp[4:14, 8:18].reshape(800, 4)
    got = (wd @ patch + b128).reshape(4, 4, 8, 4)
    np.testing.assert_allclose(got, ref[4:8, 8:12], rtol=1e-4, atol=1e-4)


def _flax_stack(x, layers, cin):
    """Reference: blocks.ConvStack eval with injected params."""
    stack = blocks.ConvStack(cin, 8, 7, len(layers), equivariant=False)
    var = stack.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), False)
    params = jax.tree_util.tree_map(lambda a: a, var["params"])
    bstats = jax.tree_util.tree_map(lambda a: a, var["batch_stats"])
    for i, (w, b, gamma, beta, mean, vvar) in enumerate(layers):
        params[f"seq_{3 * i}"]["kernel"] = jnp.asarray(w)
        params[f"seq_{3 * i}"]["bias"] = jnp.asarray(b)
        params[f"seq_{3 * i + 1}"]["bn"]["scale"] = jnp.asarray(gamma)
        params[f"seq_{3 * i + 1}"]["bn"]["bias"] = jnp.asarray(beta)
        bstats[f"seq_{3 * i + 1}"]["bn"]["mean"] = jnp.asarray(mean)
        bstats[f"seq_{3 * i + 1}"]["bn"]["var"] = jnp.asarray(vvar)
    return np.asarray(stack.apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x), False))


def _rand_layers(rng, cins):
    out = []
    for ci in cins:
        out.append((
            rng.standard_normal((7, 7, ci, 8)).astype(np.float32)
            * (0.5 / np.sqrt(49 * ci)),
            rng.standard_normal(8).astype(np.float32) * 0.1,
            1.0 + 0.2 * rng.standard_normal(8).astype(np.float32),
            0.1 * rng.standard_normal(8).astype(np.float32),
            0.05 * rng.standard_normal(8).astype(np.float32),
            (1.0 + 0.3 * rng.random(8)).astype(np.float32),
        ))
    return out


@pytest.mark.parametrize("cin,T,chunk", [(5, 23, 8), (8, 24, 12),
                                         (5, 31, 16)])
def test_fused_stack_matches_flax(cin, T, chunk):
    rng = np.random.default_rng(cin + T)
    B, H = 128, 8
    x = rng.standard_normal((B, H, T, cin)).astype(np.float32)
    flayers = _rand_layers(rng, [cin, 8, 8])
    ref = _flax_stack(x, flayers, cin)
    folded = [(w, b) + CP.fold_bn_affine(g, be, m, v)
              for (w, b, g, be, m, v) in flayers]
    got = np.asarray(CP.fused_convstack(
        jnp.asarray(x), folded, chunk=chunk, interpret=True),
        np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-2, rel
    mean_rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert mean_rel < 1e-2, mean_rel


def test_fold_convstack_params_roundtrip():
    rng = np.random.default_rng(3)
    B, H, T, cin = 128, 8, 16, 8
    x = rng.standard_normal((B, H, T, cin)).astype(np.float32)
    stack = blocks.ConvStack(cin, 8, 7, 3, equivariant=False)
    var = stack.init(jax.random.PRNGKey(1), jnp.asarray(x[:1]), False)
    ref = np.asarray(stack.apply(var, jnp.asarray(x), False))
    folded = CP.fold_convstack_params(var["params"], var["batch_stats"], 3)
    got = np.asarray(CP.fused_convstack(
        jnp.asarray(x), folded, chunk=8, interpret=True), np.float32)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 5e-2, rel
