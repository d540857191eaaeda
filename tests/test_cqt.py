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


# ---------------------------------------------------------------------------
# direct-convolution oracle (VERDICT r1 item 4): the fast multirate path is
# pinned per octave against an exact full-rate textbook CQT.
# ---------------------------------------------------------------------------

def _oracle_case(sr, octaves, seconds=8, seed=1):
    from audio_key_estimation_tpu.ops.cqt_oracle import oracle_cqt
    p = CQTParams(sr=sr, hop=round(sr / 5), bins_per_octave=36,
                  octaves=octaves)
    rng = np.random.default_rng(seed)
    L = seconds * sr
    tt = np.arange(L) / sr
    y = (rng.normal(size=(1, L)) * 0.1).astype(np.float32)
    for o in range(octaves):  # one tone per octave at an exact bin center
        f = p.fmin * 2.0 ** (o + 13 / 36)
        y[0] += 0.15 * np.sin(2 * np.pi * f * tt).astype(np.float32)
    fast = np.asarray(cqt(jnp.asarray(y), p))
    oracle = oracle_cqt(y, p)
    return p, fast, oracle


@pytest.mark.parametrize("sr,octaves", [(8000, 6), (22050, 8)])
def test_fast_cqt_matches_direct_convolution_oracle(sr, octaves):
    """Every octave of the multirate fast path agrees with the exact
    full-rate direct-convolution CQT on interior frames to <1.5% of the
    octave's peak (combined halfband + kernel-quantization + frame-center
    rounding error). Boundary frames are implementation-defined to within
    the mirror-point shift of reflect padding at the downsampled rate
    (up to 2**o samples), so they get a loose bound only."""
    p, fast, oracle = _oracle_case(sr, octaves)
    T = fast.shape[-1]
    m = 2 * 5  # 2 s margin: longest (lowest-octave) kernels span ~1.6 s
    for o in range(octaves):
        sl = slice(o * 36, (o + 1) * 36)
        scale = max(oracle[:, sl].max(), 1e-6)
        interior = np.abs(fast[:, sl, m:T - m]
                          - oracle[:, sl, m:T - m]).max() / scale
        full = np.abs(fast[:, sl] - oracle[:, sl]).max() / scale
        assert interior < 0.015, f"octave {o}: interior rel {interior:.4f}"
        assert full < 0.8, f"octave {o}: boundary rel {full:.4f}"
    # top octave is the direct (non-downsampled) matmul: tighter everywhere
    sl = slice((octaves - 1) * 36, octaves * 36)
    scale = max(oracle[:, sl].max(), 1e-6)
    assert np.abs(fast[:, sl] - oracle[:, sl]).max() / scale < 0.01


def test_frame_center_rounding_bound():
    """Lower-octave frame centers are rounded to the nearest sample at that
    octave's rate: center error <= 0.5 sample, i.e. <= 0.37% of the shortest
    kernel in any octave (ilen_min ~ Q*sr/f_max ~ 137 samples at the octave
    rate) — the quantified bound promised in ops/cqt.py."""
    p = CQTParams(sr=22050, hop=4410, bins_per_octave=36, octaves=8)
    n_frames = 32
    t = np.arange(n_frames)
    ilen_min = p.q / 2.0 ** (1 / 36) / (p.fmin * 2.0 ** (p.octaves - 1)) \
        * p.sr / 2.0 ** 0  # shortest kernel, in top-octave-rate samples
    for o in range(p.octaves):
        centers = np.round(t * (p.hop / 2 ** o))
        err = np.abs(centers - t * (p.hop / 2 ** o)).max()
        assert err <= 0.5
        assert err / ilen_min < 0.004


def test_oracle_rejects_too_short_signal():
    from audio_key_estimation_tpu.ops.cqt_oracle import oracle_cqt
    p = CQTParams(sr=22050, hop=4410, bins_per_octave=36, octaves=8)
    with pytest.raises(ValueError):
        oracle_cqt(np.zeros(1000, np.float32), p)


def test_cqt_int16_matches_normalized_float(rng):
    """Raw PCM16 ingestion: int16 input with the on-device folded /32768
    equals pre-normalized float32 input (stream AND gather framing paths)."""
    sr = 8000
    x16 = (rng.uniform(-0.6, 0.6, sr * 2) * 32767).astype(np.int16)
    xf = x16.astype(np.float32) / 32768.0
    for hop in (1600, 40):  # 1600: stream plan; 40: gather fallback octaves
        p = CQTParams(sr=sr, hop=hop, bins_per_octave=12, octaves=3)
        a = np.asarray(cqt(jnp.asarray(x16[None]), p))
        b = np.asarray(cqt(jnp.asarray(xf[None]), p))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_stream_plan_reconstructs_exact_frame_centers(rng):
    """The framing trick's load-bearing identity: for every frame t and
    octave o, the stream decomposition's offset_r + j*stride (t = j*q + r)
    must equal round(t * hop / 2**o) EXACTLY, and stride >= n_fft so
    frames never overlap within a stream."""
    from audio_key_estimation_tpu.ops.cqt import (interleave_streams,
                                                  stream_plan)
    checked = 0
    for hop in map(int, rng.integers(512, 6000, 25)):
        for o in range(8):
            n_fft, n_frames = 512, 101
            plan = stream_plan(hop, o, n_fft, n_frames)
            if plan is None:
                # None is only legal when the exact stride really is
                # smaller than the window
                g = np.gcd(hop, 2 ** o)
                assert hop // g < n_fft, (hop, o)
                continue
            q, stride, offsets, tq = plan
            assert stride >= n_fft
            for t in range(n_frames):
                j, r = divmod(t, q)
                # half-up convention (see stream_plan): python round() is
                # half-even and would be parity-inconsistent on exact halves
                want = int(np.floor(t * hop / 2 ** o + 0.5))
                assert offsets[r] + j * stride == want, (hop, o, t)
            checked += 1
            # interleave inverts the decomposition: encode t into resp
            enc = np.zeros((1, q, tq, 1), np.float32)
            for t in range(q * tq):
                j, r = divmod(t, q)
                enc[0, r, j, 0] = t
            out = np.asarray(interleave_streams(jnp.asarray(enc),
                                                plan, n_frames))
            np.testing.assert_array_equal(out[0, :, 0], np.arange(n_frames))
    assert checked > 50  # the property actually ran


def test_cqt_under_jit_matches_eager(rng):
    """cqt must trace cleanly under jax.jit (the product path always jits
    it; host-side constants like the polyphase taps must not leak into the
    trace as tracers) and match the eager result."""
    import jax
    sr = 8000
    x = (rng.uniform(-0.6, 0.6, sr * 2) * 32767).astype(np.int16)
    p = CQTParams(sr=sr, hop=1600, bins_per_octave=12, octaves=3)
    a = np.asarray(cqt(jnp.asarray(x[None]), p))
    b = np.asarray(jax.jit(lambda v: cqt(v, p))(jnp.asarray(x[None])))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_cqt_bf16_conv_operands_close_to_f32(rng):
    """The product default (Config.cqt_conv_dtype=bfloat16: conv operand
    AND inter-octave stream storage at bf16 — same quantization point as
    cqt_pallas's stream_dtype — halves front-end HBM traffic) stays within
    bf16 quantization (~2% of peak, the bound test_pallas_bf16_streams
    uses) of the oracle-pinned f32 path on both int16 and float inputs."""
    sr = 8000
    x16 = (rng.uniform(-0.6, 0.6, sr * 2) * 32767).astype(np.int16)
    for x in (x16, x16.astype(np.float32) / 32768.0):
        p = CQTParams(sr=sr, hop=1600, bins_per_octave=12, octaves=3)
        a = np.asarray(cqt(jnp.asarray(x[None]), p))
        b = np.asarray(cqt(jnp.asarray(x[None]), p,
                           conv_dtype=jnp.bfloat16))
        assert np.abs(a - b).max() <= 0.02 * np.abs(a).max()


def test_cqt_rejects_non_int16_integers(rng):
    p = CQTParams(sr=8000, hop=1600, bins_per_octave=12, octaves=2)
    with np.testing.assert_raises(ValueError):
        cqt(jnp.zeros((1, 8000), jnp.int32), p)


def test_compute_cqt_pallas_accepts_int16(rng):
    from audio_key_estimation_tpu.ops.frontend import compute_cqt
    sr = 8000
    x16 = (rng.uniform(-0.6, 0.6, sr * 2) * 32767).astype(np.int16)
    xf = x16.astype(np.float32) / 32768.0
    p = CQTParams(sr=sr, hop=1600, bins_per_octave=12, octaves=3)
    a = np.asarray(compute_cqt(jnp.asarray(x16[None]), p, use_pallas=True))
    b = np.asarray(compute_cqt(jnp.asarray(xf[None]), p, use_pallas=True))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
