"""librosa-algorithm CQT oracle (pure NumPy/SciPy, test-only).

The reference computes its training features with ``librosa.cqt``
(/root/reference/KeyDataset.py:490-494) under the pinned environment
librosa 0.9.2 + resampy 0.3.1 (/root/reference/requirements.txt). Neither
package is installable here, so this module transcribes that exact
algorithm — ``cqt`` == ``vqt(gamma=0)`` in 0.9.2 — step for step:

  * recursive multirate evaluation: the top octave's filter bank is built
    at the current rate, the signal is halved per octave with resampy's
    kaiser windowed-sinc resampler (``kaiser_fast``/``kaiser_best``
    selected by the same filter-cutoff rule), hop halved alongside;
  * optional early downsampling by the same count rule (BW_FASTEST=0.85);
  * per octave: L1-normalized hann-windowed complex filters on the
    ``np.arange(-ilen//2, ilen//2)`` sample grid, padded to a pow2 n_fft,
    scaled by ``lengths/n_fft``, FFT'd, row-sparsified at quantile 0.01,
    then dotted with a rectangular-window reflect-padded STFT;
  * ``fft_basis *= sqrt(sr/my_sr)`` downsampling compensation, trim-stack,
    and the ``scale=True`` division by ``sqrt(constant_q_lengths)``.

It exists to pin ``ops/cqt.py``'s fast TPU path against the *specific*
algorithm that produced the reference's features (frame alignment,
boundary behavior, downsample filtering), not just against the textbook
direct-convolution oracle in ``ops/cqt_oracle.py``. It is deliberately
slow, NumPy-only and float64-friendly; never imported by product code.

Faithfulness caveats (documented, not guessable from code):
  * resampy's inner loop accumulates ``time_register += 1/ratio`` in
    float; this transcription computes ``t / ratio`` vectorized. For the
    integer-factor resampling cqt performs (ratio 1/2**k) both are exact.
  * librosa 0.9.2 *raises* unless ``hop % 2**(n_octaves-1) == 0``
    (reproduced here). The reference's own default configuration —
    hop = round(22050/5) = 4410 with 8 octaves — violates this, i.e. it
    cannot run under its pinned librosa either; see ops/cqt.py for the
    rounded-frame-center policy our fast path uses instead.
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.signal

C1_HZ = 32.70319566257483  # librosa note_to_hz('C1')
BW_FASTEST = 0.85          # librosa.core.audio.BW_FASTEST

# resampy 0.3.1 precomputed filter parameters (resampy/filters.py data
# generation: sinc_window(num_zeros, precision, kaiser(beta), rolloff)).
_RESAMPY_FILTERS = {
    "kaiser_best": dict(num_zeros=64, precision=9,
                        rolloff=0.9475937167399596,
                        beta=14.769656459379492),
    "kaiser_fast": dict(num_zeros=16, precision=9,
                        rolloff=0.85,
                        beta=8.555504641634386),
}


class ParameterError(ValueError):
    pass


# ---------------------------------------------------------------------------
# resampy 0.3.1: kaiser windowed-sinc resampler
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _resampy_filter(name: str):
    """Right half (incl. center) of the interpolation window + num_bits."""
    p = _RESAMPY_FILTERS[name]
    num_bits = 2 ** p["precision"]
    n = num_bits * p["num_zeros"]
    t = np.linspace(-p["num_zeros"], p["num_zeros"], 2 * n + 1,
                    endpoint=True)
    sinc_win = p["rolloff"] * np.sinc(p["rolloff"] * t)
    taper = np.kaiser(2 * n + 1, p["beta"])
    return (taper * sinc_win)[n:], num_bits


def resampy_resample(x: np.ndarray, sr_orig: int, sr_new: float,
                     filt: str = "kaiser_best") -> np.ndarray:
    """resampy.resample for 1-D input (core.resample_f, vectorized over t)."""
    sample_ratio = float(sr_new) / sr_orig
    n_out = int(len(x) * sample_ratio)
    if n_out < 1:
        raise ParameterError("input too short to resample")
    interp_win, num_bits = _resampy_filter(filt)
    interp_win = interp_win.copy()
    if sample_ratio < 1:
        interp_win *= sample_ratio
    interp_delta = np.zeros_like(interp_win)
    interp_delta[:-1] = np.diff(interp_win)

    scale = min(1.0, sample_ratio)
    index_step = int(scale * num_bits)
    nwin = len(interp_win)
    n_orig = len(x)
    y = np.zeros(n_out, np.float64)
    xf = x.astype(np.float64)

    t = np.arange(n_out, dtype=np.float64)
    time_register = t / sample_ratio
    n = time_register.astype(np.int64)
    frac = scale * (time_register - n)

    for invert in (False, True):
        if invert:
            wing_frac = scale - frac
        else:
            wing_frac = frac
        index_frac = wing_frac * num_bits
        offset = index_frac.astype(np.int64)
        eta = index_frac - offset
        if invert:
            i_max = np.minimum(n_orig - n - 1, (nwin - offset) // index_step)
        else:
            i_max = np.minimum(n + 1, (nwin - offset) // index_step)
        for i in range(int(max(i_max.max(initial=0), 0))):
            m = i < i_max
            idx = offset[m] + i * index_step
            w = interp_win[idx] + eta[m] * interp_delta[idx]
            src = n[m] + i + 1 if invert else n[m] - i
            y[m] += w * xf[src]
    return y.astype(x.dtype)


def librosa_resample(y: np.ndarray, orig_sr: float, target_sr: float,
                     res_type: str = "kaiser_best", fix: bool = True,
                     scale: bool = False) -> np.ndarray:
    """librosa.core.audio.resample (0.9.2), resampy branch only."""
    if orig_sr == target_sr:
        return y
    ratio = float(target_sr) / orig_sr
    n_samples = int(np.ceil(y.shape[-1] * ratio))
    y_hat = resampy_resample(y, orig_sr, target_sr, filt=res_type)
    if fix:  # util.fix_length: pad with zeros / truncate to n_samples
        if len(y_hat) > n_samples:
            y_hat = y_hat[:n_samples]
        elif len(y_hat) < n_samples:
            y_hat = np.pad(y_hat, (0, n_samples - len(y_hat)))
    if scale:
        y_hat = y_hat / np.sqrt(ratio)
    return y_hat.astype(y.dtype)


# ---------------------------------------------------------------------------
# librosa 0.9.2 filter construction
# ---------------------------------------------------------------------------

def window_bandwidth_hann() -> float:
    return 1.50018310546875  # librosa.filters.WINDOW_BANDWIDTHS['hann']


def constant_q_lengths(sr: float, fmin: float, n_bins: int,
                       bins_per_octave: int,
                       filter_scale: float = 1.0) -> np.ndarray:
    """librosa.filters.constant_q_lengths (gamma=0): fractional lengths."""
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
    Q = float(filter_scale) / alpha
    freq = fmin * 2.0 ** (np.arange(n_bins, dtype=float) / bins_per_octave)
    if freq[-1] * (1 + 0.5 * window_bandwidth_hann() / Q) > sr / 2.0:
        raise ParameterError("Filter pass-band lies beyond Nyquist")
    return Q * sr / freq


def constant_q(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
               filter_scale: float = 1.0):
    """librosa.filters.constant_q (norm=1, hann, pad_fft=True).

    Returns (filters (n_bins, n_fft) complex128, float lengths).
    """
    lengths = constant_q_lengths(sr, fmin, n_bins, bins_per_octave,
                                 filter_scale)
    freqs = fmin * 2.0 ** (np.arange(n_bins, dtype=float) / bins_per_octave)
    filts = []
    for ilen, freq in zip(lengths, freqs):
        # exact grid: np.arange(-ilen//2, ilen//2) on the FLOAT length
        t = np.arange(-ilen // 2, ilen // 2, dtype=float)
        sig = np.exp(t * 1j * 2 * np.pi * freq / sr)
        win = scipy.signal.get_window("hann", len(sig), fftbins=True)
        sig = sig * win
        sig = sig / np.sum(np.abs(sig))  # util.normalize(norm=1)
        filts.append(sig)
    max_len = int(2.0 ** np.ceil(np.log2(max(len(f) for f in filts))))
    out = np.zeros((n_bins, max_len), np.complex128)
    for i, f in enumerate(filts):  # util.pad_center
        off = (max_len - len(f)) // 2
        out[i, off:off + len(f)] = f
    return out, lengths


def sparsify_rows(x: np.ndarray, quantile: float = 0.01) -> np.ndarray:
    """librosa.util.sparsify_rows, returned dense: per row, zero the
    smallest-magnitude entries whose cumulative L1 share is < quantile."""
    mags = np.abs(x)
    norms = np.sum(mags, axis=1, keepdims=True)
    mag_sort = np.sort(mags, axis=1)
    cumulative = np.cumsum(mag_sort / norms, axis=1)
    threshold_idx = np.argmin(cumulative < quantile, axis=1)
    out = np.zeros_like(x)
    for i, j in enumerate(threshold_idx):
        keep = mags[i] >= mag_sort[i, j]
        out[i, keep] = x[i, keep]
    return out


def _cqt_filter_fft(sr: float, fmin: float, n_bins: int,
                    bins_per_octave: int, filter_scale: float,
                    sparsity: float = 0.01):
    """librosa.core.constantq.__cqt_filter_fft (gamma=0, no hop clamp)."""
    basis, lengths = constant_q(sr, fmin, n_bins, bins_per_octave,
                                filter_scale)
    n_fft = basis.shape[1]
    basis = basis * (lengths[:, np.newaxis] / float(n_fft))
    fft_basis = np.fft.fft(basis, n=n_fft, axis=1)[:, : (n_fft // 2) + 1]
    return sparsify_rows(fft_basis, quantile=sparsity), n_fft, lengths


def _stft_ones(y: np.ndarray, n_fft: int, hop: int,
               pad_mode: str = "reflect") -> np.ndarray:
    """librosa.stft(window='ones', center=True): rectangular window,
    reflect-padded by n_fft//2, (1 + len(y)//hop) frames, full FFT's
    non-negative half (== rfft)."""
    yp = np.pad(y.astype(np.float64), n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(yp) - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    return np.fft.rfft(yp[idx], axis=1).T  # (n_fft//2+1, n_frames)


def _cqt_response(y, n_fft, hop, fft_basis, pad_mode) -> np.ndarray:
    return fft_basis @ _stft_ones(y, n_fft, hop, pad_mode)


# ---------------------------------------------------------------------------
# librosa 0.9.2 cqt == vqt(gamma=0)
# ---------------------------------------------------------------------------

def _num_two_factors(x: int) -> int:
    if x <= 0:
        return 0
    n = 0
    while x % 2 == 0:
        n += 1
        x //= 2
    return n


def _early_downsample_count(nyquist, filter_cutoff, hop_length, n_octaves):
    c1 = max(0, int(np.ceil(np.log2(BW_FASTEST * nyquist / filter_cutoff))
                    - 1) - 2)
    c2 = max(0, _num_two_factors(hop_length) - n_octaves + 1)
    return min(c1, c2)


def librosa_cqt(y: np.ndarray, sr: int, hop_length: int, n_bins: int,
                bins_per_octave: int, fmin: float = C1_HZ,
                filter_scale: float = 1.0, sparsity: float = 0.01,
                scale: bool = True, pad_mode: str = "reflect",
                res_type: str | None = None) -> np.ndarray:
    """librosa.cqt 0.9.2 on a 1-D signal -> (n_bins, T) complex.

    tuning=0 (the reference's call site), norm=1, hann window. Raises
    ParameterError exactly where 0.9.2 does (Nyquist overflow, hop
    two-factor shortfall, too-short input).
    """
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)
    len_orig = len(y)
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0

    freqs = fmin * 2.0 ** (np.arange(n_bins, dtype=float) / bins_per_octave)
    freqs_top = freqs[-bins_per_octave:]
    fmin_t = np.min(freqs_top)
    fmax_t = np.max(freqs_top)

    Q = float(filter_scale) / alpha
    filter_cutoff = fmax_t * (1 + 0.5 * window_bandwidth_hann() / Q)
    nyquist = sr / 2.0

    auto_resample = False
    if not res_type:
        auto_resample = True
        res_type = ("kaiser_fast" if filter_cutoff < BW_FASTEST * nyquist
                    else "kaiser_best")

    # __early_downsample (only ever fires on the kaiser_fast path)
    downsample_count = _early_downsample_count(nyquist, filter_cutoff,
                                               hop_length, n_octaves)
    if downsample_count > 0 and res_type == "kaiser_fast":
        downsample_factor = 2 ** downsample_count
        hop_length //= downsample_factor
        if len(y) < downsample_factor:
            raise ParameterError(
                f"Input signal length={len_orig} is too short")
        new_sr = sr / float(downsample_factor)
        y = librosa_resample(y, sr, new_sr, res_type=res_type, scale=True)
        if not scale:
            y = y * np.sqrt(downsample_factor)
        sr = new_sr

    cqt_resp = []

    if auto_resample and res_type != "kaiser_fast":
        # top octave at kaiser_best quality, then drop to kaiser_fast
        fft_basis, n_fft, _ = _cqt_filter_fft(sr, fmin_t, n_filters,
                                              bins_per_octave, filter_scale,
                                              sparsity)
        cqt_resp.append(_cqt_response(y, n_fft, hop_length, fft_basis,
                                      pad_mode))
        fmin_t /= 2
        fmax_t /= 2
        n_octaves -= 1
        filter_cutoff = fmax_t * (1 + 0.5 * window_bandwidth_hann() / Q)
        res_type = "kaiser_fast"

    if _num_two_factors(hop_length) < n_octaves - 1:
        raise ParameterError(
            f"hop_length must be a positive integer multiple of "
            f"2^{n_octaves - 1:d} for {n_octaves:d}-octave CQT")

    my_y, my_sr, my_hop = y, float(sr), hop_length
    for i in range(n_octaves):
        if i > 0:
            if len(my_y) < 2:
                raise ParameterError(
                    f"Input signal length={len_orig} is too short for "
                    f"{n_octaves:d}-octave CQT")
            my_y = librosa_resample(my_y, 2, 1, res_type=res_type,
                                    scale=True)
            my_sr /= 2.0
            my_hop //= 2
        fft_basis, n_fft, _ = _cqt_filter_fft(my_sr, fmin_t * 2.0 ** -i,
                                              n_filters, bins_per_octave,
                                              filter_scale, sparsity)
        fft_basis = fft_basis * np.sqrt(sr / my_sr)
        cqt_resp.append(_cqt_response(my_y, n_fft, my_hop, fft_basis,
                                      pad_mode))

    # __trim_stack
    max_col = min(r.shape[-1] for r in cqt_resp)
    V = np.empty((n_bins, max_col), np.complex128)
    end = n_bins
    for r in cqt_resp:
        n_oct = r.shape[0]
        if end < n_oct:
            V[:end] = r[-end:, :max_col]
        else:
            V[end - n_oct:end] = r[:, :max_col]
        end -= n_oct

    if scale:
        lengths = constant_q_lengths(sr, fmin, n_bins, bins_per_octave,
                                     filter_scale)
        V = V / np.sqrt(lengths[:, np.newaxis])
    return V
