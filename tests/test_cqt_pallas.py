"""Fused time-major frame-table Pallas CQT kernel vs the pure-JAX path.

Runs in Pallas interpreter mode on CPU; the same kernel compiles for TPU
(exercised by bench.py / scripts/microbench_pallas_sparse.py on hardware,
where it beats the XLA front-end — PERFNOTES.md).

The kernel addresses HBM by per-frame window starts (a scalar-prefetched
static table), so it has no stride >= n_fft constraint: it engages at
EVERY geometry, including few-octave configs (octaves=4 => n_fft=8192)
whose overlapping windows the early stream-layout designs could not run.
Tests use multi-tile grids — an earlier single-tile-only suite hid a
real-TPU index_map bug — and cover int16 PCM, bf16 streams, and odd
batch (lane-pad) handling.
"""

import jax.numpy as jnp
import numpy as np
import pytest

# interpreter-mode Pallas runs are compile-heavy: excluded from the fast
# tier (pytest -m 'not slow'); test_cqt.py keeps a fast pallas smoke test
pytestmark = pytest.mark.slow

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
    # 2.13 s: L is NOT a hop multiple, so the last frame start sits well
    # before L and the fused transpose+pad's tail clamp is exercised
    y = np.stack([_sine(440.0, 2.13), _sine(1318.5, 2.13), rng.normal(
        size=int(2.13 * SR)).astype(np.float32)])
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_multi_tile_grid(rng):
    """8s input: several time tiles per octave (t_pad/tile_t > 1) so the
    grid index and the scalar-table addressing are both exercised. This
    is the case that catches index_map argument-order mistakes (grid
    indices first, scalar-prefetch refs last) which single-tile tests
    cannot see."""
    y = rng.normal(size=(2, 8 * SR)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_large_nfft_overlapping_windows(rng):
    """octaves=4 => n_fft=8192 with hop 4410: windows overlap and the
    VMEM budget drops tile_t to 1. The frame-table kernel handles this
    geometry (the stream-layout ancestors could not)."""
    y = np.stack([_sine(440.0)])
    ref = np.asarray(cqt(jnp.asarray(y), P_BIG_FFT))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P_BIG_FFT, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_int16_raw_pcm_matches_float(rng):
    """Raw PCM16 input: transpose and top-octave DMAs stay int16 and the
    1/32768 normalization folds into the scale epilogue."""
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


def test_pallas_odd_batch_lane_padding(rng):
    """Batch not divisible by the kernel's 128-lane tile pads and slices
    back."""
    y = rng.normal(size=(3, SR)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_downsample2_tm_matches_batch_major(rng):
    """The time-major polyphase cascade computes the same samples as
    ops.cqt.downsample2 (transposed), for f32 and raw-int16 inputs."""
    from audio_key_estimation_tpu.ops.cqt import downsample2, halfband_taps
    from audio_key_estimation_tpu.ops.cqt_pallas import downsample2_tm
    taps = halfband_taps()
    y = rng.normal(size=(3, 5000)).astype(np.float32)
    ref = np.asarray(downsample2(jnp.asarray(y), taps))
    got = np.asarray(downsample2_tm(jnp.asarray(y.T), taps))
    np.testing.assert_allclose(got, ref.T, rtol=1e-5, atol=1e-6)
    yi = (y * 30000).astype(np.int16)
    ref_i = np.asarray(downsample2(jnp.asarray(yi), taps,
                                   out_scale=1 / 32768.0))
    got_i = np.asarray(downsample2_tm(jnp.asarray(yi.T), taps,
                                      out_scale=1 / 32768.0))
    np.testing.assert_allclose(got_i, ref_i.T, rtol=1e-5, atol=1e-6)


# A fused Pallas transpose+reflect-pad kernel for the (B, L) -> (L, B)
# input flip was built and measured on hardware, then removed: in-situ it
# was a -2.3 ms loss (86.7 vs 84.4 ms full-path) because XLA already
# fuses the input transpose into its consumers (the cascade einsum's
# operand read and the pallas-operand pad) — the 43 ms "transpose alone"
# measurement that motivated it was a materialization artifact of the
# isolated harness. See PERFNOTES.md "input-transpose kernel" and git
# history for the kernel (MXU identity-matmul transpose with an exact
# bf16 hi/lo two-pass split).


def test_pallas_lane_chunked_large_nfft(rng, monkeypatch):
    """When one frame at the full lane-padded batch exceeds the VMEM
    budget, the response grid runs per 128-lane chunk; when even a single
    chunk cannot fit, cqt_pallas falls back to the XLA path outright.
    Exercised by shrinking the budgets (interpret mode)."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    y = rng.normal(size=(130, SR)).astype(np.float32)  # b_pad = 256
    ref = np.asarray(cqt(jnp.asarray(y), P))
    # force chunking: one 256-lane frame (2*win*4 double-buffered + n_fft*4
    # per lane) must
    # overflow _VMEM_BUDGET while a 128-lane chunk fits the chunk budget
    per_lane = 2 * (mod.kernel_bank(P)["n_fft"] + mod._ALIGN_TM) * 4 \
        + mod.kernel_bank(P)["n_fft"] * 4
    monkeypatch.setattr(mod, "_VMEM_BUDGET", 255 * per_lane)
    monkeypatch.setattr(mod, "_VMEM_CHUNK_BUDGET", 129 * per_lane)
    assert mod._response_plan(mod.kernel_bank(P)["n_fft"], 256, 4) \
        == (1, 128)
    got = np.asarray(mod.cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # now make even one chunk impossible: whole-call XLA fallback
    monkeypatch.setattr(mod, "_VMEM_CHUNK_BUDGET", 64 * per_lane)
    assert mod._response_plan(mod.kernel_bank(P)["n_fft"], 256, 4)[1] == 0
    got2 = np.asarray(mod.cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-6)


def test_pallas_remainder_chunk(rng, monkeypatch):
    """A chunk size that does not divide b_pad runs full chunks plus one
    smaller remainder chunk (256 + 128 at b_pad=384), not a degenerate
    all-128 fragmentation; results match the XLA reference."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    y = rng.normal(size=(300, SR)).astype(np.float32)  # b_pad = 384
    ref = np.asarray(cqt(jnp.asarray(y), P))
    per_lane = 2 * (mod.kernel_bank(P)["n_fft"] + mod._ALIGN_TM) * 4 \
        + mod.kernel_bank(P)["n_fft"] * 4
    monkeypatch.setattr(mod, "_VMEM_BUDGET", 383 * per_lane)
    monkeypatch.setattr(mod, "_VMEM_CHUNK_BUDGET", 257 * per_lane)
    assert mod._response_plan(mod.kernel_bank(P)["n_fft"], 384, 4) \
        == (1, 256)
    got = np.asarray(mod.cqt_pallas(jnp.asarray(y), P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_cascade_kernel_matches_downsample2_tm(rng):
    """Direct parity of the fused pad+decimate+relayout cascade kernel
    (_cascade_pad_tm + _reflect_fix) against the XLA path it replaces
    (downsample2_tm + _pad_signal_for_starts), at both tile geometries —
    head=256 -> tile 256 (the SR-22050 bench n_fft=512) with an ODD input
    length, and head=512 -> tile 512 (SR-44100's n_fft=1024) — including
    the zero tail beyond the reflect rows."""
    from audio_key_estimation_tpu.ops.cqt import _poly_matrix, halfband_taps
    from audio_key_estimation_tpu.ops.cqt_pallas import (
        _cascade_pad_tm, _casc_in_rows, _casc_tile, _pad_signal_for_starts,
        _reflect_fix, downsample2_tm)

    taps = halfband_taps()
    for n_fft, L in ((512, 5137), (1024, 6000)):
        head = n_fft // 2
        tile = _casc_tile(head)
        assert tile == min(512, head) and head % tile == 0
        y = (rng.standard_normal((L, 128)) * 8000).astype(np.int16)
        ref = np.asarray(downsample2_tm(jnp.asarray(y), taps,
                                        out_scale=1 / 32768.0))
        L_out = (L - 1) // 2 + 1
        in_rows = _casc_in_rows(tile)
        ypad_in = np.asarray(_pad_signal_for_starts(
            jnp.asarray(y), [0, L - 1], n_fft,
            min_len=head + L + in_rows, round_to=tile))
        w = _poly_matrix(np.asarray(taps)) * (1 / 32768.0)
        need = max(900 + n_fft + 16, head + L_out + in_rows)
        need = -(-need // tile) * tile
        out = _cascade_pad_tm(
            jnp.asarray(ypad_in), jnp.asarray(w, jnp.float32),
            L_in=L, L_out=L_out, head=head, need_out=need, tile=tile,
            out_dtype=jnp.float32, interpret=True)
        out = np.asarray(_reflect_fix(out, L_out, head))
        np.testing.assert_allclose(out[head:head + L_out], ref,
                                   rtol=1e-5, atol=1e-6)
        ref_pad = np.asarray(_pad_signal_for_starts(
            jnp.asarray(ref), [0, need - n_fft - 16], n_fft))
        np.testing.assert_allclose(out[:head + L_out + head + 1],
                                   ref_pad[:head + L_out + head + 1],
                                   rtol=1e-5, atol=1e-6)
        assert np.all(out[head + L_out + head + 1:] == 0)


def test_cascade_engages_at_flagship_geometry(rng, monkeypatch):
    """cqt_pallas at the flagship geometry must actually RUN the fused
    cascade for every downsampled octave — guarding the silent-fallback
    failure mode where a gate regression would route through the XLA
    cascade and the parity tests would still pass — and match the XLA
    reference."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    calls = []
    orig = mod._cascade_pad_tm
    monkeypatch.setattr(
        mod, "_cascade_pad_tm",
        lambda *a, **k: calls.append(k.get("tile")) or orig(*a, **k))
    y = rng.normal(size=(2, int(2.13 * SR))).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), P))
    got = np.asarray(mod.cqt_pallas(jnp.asarray(y), P, interpret=True))
    assert calls == [256] * (P.octaves - 1)   # n_fft=512 -> tile 256
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_span_mode_regression_tile_t_not_dividing(rng):
    """Round-4 regression (VERDICT r4 weak #1): at this geometry
    _span_plan engages (K=16) while _response_plan's tile_t=3 does NOT
    divide t_pad=16 — the old dispatch handed the span t_pad to the
    frames kernel, whose floor-divided grid left frame 15 of 16 unwritten
    (NaN). The span kernel must produce finite, XLA-matching output."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    p = CQTParams(sr=SR, hop=300, bins_per_octave=36, octaves=1,
                  fmin=1046.5)
    n_fft = mod.kernel_bank(p)["n_fft"]
    assert mod._span_plan(n_fft, 128, 4, 300.0) is not None
    tile_t = mod._response_plan(n_fft, 128, 4)[0]
    t_pad = -(-16 // mod._span_plan(n_fft, 128, 4, 300.0)[0]) \
        * mod._span_plan(n_fft, 128, 4, 300.0)[0]
    assert t_pad % tile_t != 0   # the geometry that caught the bug
    y = rng.normal(size=(2, 15 * 300)).astype(np.float32)
    ref = np.asarray(cqt(jnp.asarray(y), p))
    got = np.asarray(cqt_pallas(jnp.asarray(y), p, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_span_mode_engages_at_deep_octaves(rng, monkeypatch):
    """The flagship geometry's deep octaves (spacing = hop/2**o < n_fft)
    must actually RUN the span kernel — guarding the silent-fallback
    failure mode — and match the XLA reference. Also covers multi-tile
    span grids (t_pad//K > 1) and int16 top-octave input."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    calls = []
    orig = mod._octave_response_span
    monkeypatch.setattr(
        mod, "_octave_response_span",
        lambda *a, **k: calls.append(k["K"]) or orig(*a, **k))
    y = rng.normal(size=(2, 4 * SR)).astype(np.float32)
    yi = np.round(y * 8000).clip(-32768, 32767).astype(np.int16)
    ref = np.asarray(cqt(jnp.asarray(yi.astype(np.float32) / 32768.0), P))
    got = np.asarray(cqt_pallas(jnp.asarray(yi), P, interpret=True))
    assert len(calls) > 0 and all(K in mod._SPAN_K for K in calls)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_frames_kernel_rejects_non_dividing_t_pad():
    """_octave_response_frames must refuse a t_pad its grid cannot cover
    (the round-4 silent-corruption class becomes a loud error)."""
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    ypadT = jnp.zeros((1024, 128), jnp.float32)
    starts = jnp.zeros((16,), jnp.int32)
    kmat_t = jnp.zeros((72, 512), jnp.float32)
    scales = jnp.zeros((36, 1), jnp.float32)
    with pytest.raises(ValueError, match="multiple of tile_t"):
        mod._octave_response_frames(
            ypadT, starts, jnp.asarray([0], jnp.int32), kmat_t, scales,
            n_fft=512, t_pad=16, tile_t=3, interpret=True)


def test_plan_invariants_property_sweep():
    """Static-planning invariants over a (n_fft, b_pad, itemsize, hop,
    octave) grid — the round-4 bug class is a planning invariant silently
    violated by an adjacent branch, exactly what this sweep catches:

      * _response_plan: tile_t in [1, _TILE_T]; chunked => b_chunk is a
        multiple of 128 within the chunk budget;
      * _span_plan: for EVERY tile of the continued progression, frame
        k's dynamic roll r_k = starts[tK+k] - floor16(starts[tK]) - s16[k]
        stays in [0, 32) and the rolled window s16[k] + r_k + n_fft fits
        the span buffer; span bytes within _SPAN_TRAFFIC of window mode;
      * _casc_tile: tile divides head and keeps the low input clip on
        fully-masked tiles only.
    """
    from audio_key_estimation_tpu.ops import cqt_pallas as mod

    for n_fft in (512, 1024, 2048, 4096):
        for b_pad in (128, 256, 512):
            for item in (2, 4):
                tile_t, b_chunk = mod._response_plan(n_fft, b_pad, item)
                assert 1 <= tile_t <= mod._TILE_T
                per_lane = 2 * (n_fft + mod._ALIGN_TM) * item + n_fft * 4
                if b_chunk == b_pad:
                    assert tile_t == 1 or \
                        tile_t * b_pad * per_lane <= mod._VMEM_BUDGET
                elif b_chunk:
                    assert b_chunk % 128 == 0
                    assert b_chunk * per_lane <= mod._VMEM_CHUNK_BUDGET
                for hop in (300, 443, 4410, 4416, 8820):
                    for o in range(8):
                        spacing = hop / 2 ** o
                        span = mod._span_plan(n_fft, b_pad, item, spacing)
                        if span is None:
                            continue
                        K, span_len = span
                        wlen = n_fft + 48
                        win = n_fft + mod._ALIGN_TM
                        assert span_len <= mod._SPAN_TRAFFIC * K * win
                        s16 = tuple(
                            int(k * spacing) // mod._ALIGN_TM
                            * mod._ALIGN_TM for k in range(K))
                        n_frames = 101
                        t_pad = -(-n_frames // K) * K
                        starts = mod._frame_starts(hop, o, t_pad)
                        for t0 in range(0, t_pad, K):
                            base = starts[t0] // mod._ALIGN_TM \
                                * mod._ALIGN_TM
                            for k in range(K):
                                r = starts[t0 + k] - base - s16[k]
                                assert 0 <= r < 2 * mod._ALIGN_TM, (
                                    n_fft, b_pad, item, hop, o, t0, k, r)
                                assert s16[k] + r + n_fft <= span_len
        for head in (128, 256, 512, 1024, 2048):
            tile = mod._casc_tile(head)
            if tile:
                assert head % tile == 0 and tile % 128 == 0


def test_use_pallas_cqt_tristate_validation():
    """'auto' resolves by platform, bad strings fail loudly, bare CLI flag
    keeps its historical switch meaning."""
    import argparse

    from audio_key_estimation_tpu.config import Config, add_config_args

    cfg = Config()
    assert cfg.pallas_cqt_enabled(platform="tpu") is True
    assert cfg.pallas_cqt_enabled(platform="cpu") is False
    assert cfg.replace(use_pallas_cqt="on").pallas_cqt_enabled("cpu")
    assert not cfg.replace(use_pallas_cqt="off").pallas_cqt_enabled("tpu")
    assert cfg.replace(use_pallas_cqt=True).pallas_cqt_enabled("cpu")
    with pytest.raises(ValueError):
        cfg.replace(use_pallas_cqt="ture").pallas_cqt_enabled("tpu")
    p = argparse.ArgumentParser()
    add_config_args(p)
    assert p.parse_args([]).use_pallas_cqt == "auto"
    assert p.parse_args(["--use_pallas_cqt"]).use_pallas_cqt == "on"
    assert p.parse_args(["--use_pallas_cqt", "off"]).use_pallas_cqt == "off"
