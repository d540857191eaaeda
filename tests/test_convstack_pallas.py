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


def test_pack_dense_w_jax_matches_numpy():
    """The traceable packer must agree with the numpy packer EXACTLY
    (same f32 arithmetic, just gather-built) — it is what the flax
    serving gate runs inside jit on live checkpoint params."""
    rng = np.random.default_rng(11)
    for ci in (5, 8):
        w = rng.standard_normal((7, 7, ci, 8)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        s = 1 + 0.1 * rng.standard_normal(8).astype(np.float32)
        t = 0.1 * rng.standard_normal(8).astype(np.float32)
        wd_np, b_np = CP.pack_dense_w(w, b, s, t)
        wd_jx, b_jx = CP.pack_dense_w_jax(jnp.asarray(w), jnp.asarray(b),
                                          jnp.asarray(s), jnp.asarray(t))
        np.testing.assert_array_equal(wd_np, np.asarray(wd_jx))
        np.testing.assert_array_equal(b_np, np.asarray(b_jx))
        # no-affine variant
        wd_np, b_np = CP.pack_dense_w(w, b)
        wd_jx, b_jx = CP.pack_dense_w_jax(jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_array_equal(wd_np, np.asarray(wd_jx))
        np.testing.assert_array_equal(b_np, np.asarray(b_jx))


def test_pick_chunk_properties():
    for B in (128, 256, 512, 1024):
        for T in (1, 4, 16, 151, 152, 153, 300, 601, 1024, 2048):
            c = CP.pick_chunk(T, B)
            assert c % 4 == 0 and c >= 4
            t_pad = -(-T // c) * c
            assert t_pad >= T
            # the double-buffered slab + output block must fit the
            # measured 16 MiB scoped-vmem limit (the round-5 chunk=304
            # OOM class)
            vmem = (2 * 10 * (c + 6) * 8 * B * 2
                    + 2 * 4 * c * 8 * B * 2)
            assert vmem <= 15 * 2 ** 20, (B, T, c, vmem)


def test_model_gate_fused_matches_plain(monkeypatch):
    """End-to-end: PitchClassNet with cfg.fused_convstack=True takes the
    fused path for the layer-1 p2p stack (asserted via a call counter)
    and matches the plain model's outputs to bf16-stream tolerance."""
    from audio_key_estimation_tpu.config import Config
    from audio_key_estimation_tpu.models import PitchClassNet

    calls = {"n": 0}
    orig = CP.fused_convstack

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(CP, "fused_convstack", counting)

    cfg = Config(octaves=2, only_semitones=True, n_filters=4,
                 conv_layers=3, num_layers=2, kernel_size=7,
                 head_layers=2, fused_convstack=True)
    B, T = 128, 64
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((B, cfg.pitches, T, 1)),
                      jnp.float32)
    seq = jnp.full((B,), T, jnp.int32)

    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel[:1], seq[:1], False)
    assert calls["n"] == 0, "init must run the plain path (param creation)"

    key_f, tonic_f = model.apply(variables, mel, seq, False)
    assert calls["n"] == 1, "eval apply must dispatch the fused kernel"

    plain = PitchClassNet(cfg.replace(fused_convstack=False))
    key_p, tonic_p = plain.apply(variables, mel, seq, False)

    key_f, key_p = np.asarray(key_f), np.asarray(key_p)
    tonic_f, tonic_p = np.asarray(tonic_f), np.asarray(tonic_p)
    assert np.abs(key_f - key_p).max() < 3e-2
    rel = np.abs(tonic_f - tonic_p).max() / np.abs(tonic_p).max()
    assert rel < 3e-2, rel


def test_model_gate_falls_back_off_geometry(monkeypatch):
    """B not a lane multiple -> plain path even with the flag on."""
    from audio_key_estimation_tpu.config import Config
    from audio_key_estimation_tpu.models import PitchClassNet

    calls = {"n": 0}
    orig = CP.fused_convstack

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(CP, "fused_convstack", counting)
    cfg = Config(octaves=2, only_semitones=True, n_filters=4,
                 conv_layers=3, num_layers=2, kernel_size=7,
                 head_layers=2, fused_convstack=True)
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal((4, cfg.pitches, 64, 1)),
                      jnp.float32)
    seq = jnp.full((4,), 64, jnp.int32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel, seq, False)
    model.apply(variables, mel, seq, False)
    assert calls["n"] == 0


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
