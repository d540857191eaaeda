"""Differential tests: MPEG-2 / MPEG-2.5 (LSF) Layer III vs the oracle.

The reference decodes mp3 through torchaudio (reference KeyDataset.py:341),
which handles the lower-sampling-frequency profile natively; data/mp3.py
now does too. These tests prove the LSF surface equivalent to libavcodec
(tests/av_oracle.py) on synthetic streams from tests/mp3_builder.py:
all 6 LSF sample rates (MPEG-2: 22050/24000/16000, MPEG-2.5:
11025/12000/8000), the 9-bit scalefac_compress partition arithmetic in
all three blocknumber ranges (incl. the implied-preflag 500..512 range),
short and mixed blocks (incl. the 8 kHz geometry), MS and io-based
intensity stereo, the 8-bit main_data_begin reservoir, and per-region
Huffman table splits against the LSF band boundaries.

Tolerances as in tests/test_mp3.py: the oracle computes in float32, the
numpy decoder in float64.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import mp3_builder as B  # noqa: E402
from av_oracle import get_oracle  # noqa: E402

from audio_key_estimation_tpu.data import _mp3_tables_lsf as TL  # noqa: E402
from audio_key_estimation_tpu.data.mp3 import (  # noqa: E402
    Mp3Error, decode_mp3_bytes)

_ORACLE = get_oracle()
needs_oracle = pytest.mark.skipif(
    _ORACLE is None, reason="libavcodec oracle unavailable")

ALL_LSF_RATES = (22050, 24000, 16000, 11025, 12000, 8000)


def _rel_diff(data: bytes) -> float:
    mine, _sr = decode_mp3_bytes(data)
    ref, _ = _ORACLE.decode(data)
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    a = mine.astype(np.float64)
    b = ref.astype(np.float64)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-30))


def _pairs(rng, n, mx):
    return tuple((int(rng.integers(-mx, mx + 1)),
                  int(rng.integers(-mx, mx + 1))) for _ in range(n))


def _quads(rng, n):
    return tuple(tuple(int(v) for v in rng.integers(-1, 2, 4))
                 for _ in range(n))


def _sf_lsf(rng, sfc, intensity=False, short=False, mixed=False):
    """Random scalefactors legal for the partition layout of `sfc`."""
    slens, nsfb, _pre = TL.lsf_scalefactor_layout(sfc, intensity,
                                                  short, mixed)
    out = []
    for n, sl in zip(nsfb, slens):
        out += [int(rng.integers(0, 1 << sl)) if sl else 0
                for _ in range(n)]
    return tuple(out)


# ------------------------------------------------------- sample rates


@needs_oracle
@pytest.mark.parametrize("sr", ALL_LSF_RATES)
def test_lsf_sample_rates(sr):
    """Long blocks with scalefactors at every LSF rate (both versions)."""
    rng = np.random.default_rng(sr)
    sfc = 150
    g = B.Granule(big_values=60, big_pairs=_pairs(rng, 60, 7),
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=_sf_lsf(rng, sfc), global_gain=200)
    data = B.build_stream([B.build_frame_lsf(g, sr=sr, bitrate=64)] * 6)
    mine, sr_out = decode_mp3_bytes(data)
    assert sr_out == sr
    assert mine.shape == (6 * 576, 1)
    assert _rel_diff(data) < 1e-5


# --------------------------------------- scalefac_compress partitions


@needs_oracle
@pytest.mark.parametrize("sfc", [0, 23, 170, 399,     # blocknumber 0
                                 405, 460, 499,       # blocknumber 1
                                 500, 505, 511])      # blk 2, preflag=1
def test_lsf_scalefac_partitions(sfc):
    """All three 9-bit scalefac_compress ranges, incl. the implied
    preflag of the 500..512 range (no preflag bit exists in LSF side
    info — ISO 13818-3 2.4.3.4)."""
    rng = np.random.default_rng(sfc)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=_sf_lsf(rng, sfc), global_gain=205)
    data = B.build_stream([B.build_frame_lsf(g)] * 5)
    assert _rel_diff(data) < 1e-5


@needs_oracle
def test_lsf_scalefac_scale():
    """scalefac_scale doubles the scalefactor step in LSF too."""
    rng = np.random.default_rng(77)
    sfc = 23
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=_sf_lsf(rng, sfc), scalefac_scale=1,
                  global_gain=210)
    assert _rel_diff(B.build_stream([B.build_frame_lsf(g)] * 5)) < 1e-5


# ------------------------------------------------------------- blocks


@needs_oracle
@pytest.mark.parametrize("sr", [22050, 8000])
def test_lsf_short_blocks(sr):
    rng = np.random.default_rng(sr + 1)
    sfc = 210                       # blk 0 short: 9+9+9+9 partitions
    sfs = _sf_lsf(rng, sfc, short=True)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=2,
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=sfs, subblock_gain=(1, 0, 2), global_gain=200)
    assert _rel_diff(
        B.build_stream([B.build_frame_lsf(g, sr=sr)] * 5)) < 1e-5


@needs_oracle
@pytest.mark.parametrize("sr", [22050, 8000])
def test_lsf_mixed_blocks(sr):
    """Mixed blocks: 6 long sfb + short sfb 3.. (vs MPEG-1's 8 long);
    8 kHz exercises the MPEG-2.5 wide-band boundary geometry."""
    rng = np.random.default_rng(sr + 2)
    sfc = 210
    sfs = _sf_lsf(rng, sfc, short=True, mixed=True)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=2, mixed_block=True,
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=sfs, subblock_gain=(0, 1, 0), global_gain=200)
    assert _rel_diff(
        B.build_stream([B.build_frame_lsf(g, sr=sr)] * 5)) < 1e-5


@needs_oracle
def test_lsf_mixed_8k_deep_spectrum():
    """The geometry discriminator for the MPEG-2.5 8 kHz mixed-block
    per-stage rules (mp3.py::_GEO_8K): 180 pairs reach line 360 — deep
    enough that a wrong reorder start/band origin (e.g. the spec-coherent
    48-line split instead of the oracle's 72) corrupts the de-interleave
    (rel err ~1.1 observed), and a single hot scalefactor per sweep pins
    the exponent walk (sf_long_end=6/short_start=3, NOT the 4/2 that
    band_l[4]=3*band_s[2]=48 would suggest)."""
    rng = np.random.default_rng(9)
    pairs = _pairs(rng, 180, 2)
    g = B.Granule(big_values=180, big_pairs=pairs,
                  window_switching=True, block_type=2, mixed_block=True,
                  table_select=(10, 10, 10), global_gain=200)
    assert _rel_diff(
        B.build_stream([B.build_frame_lsf(g, sr=8000)] * 5)) < 1e-5
    sfc = 210
    slens, nsfb, _ = TL.lsf_scalefactor_layout(sfc, False, True, True)
    flat_slen = [sl for n, sl in zip(nsfb, slens) for _ in range(n)]
    total = len(flat_slen)
    for hot in range(0, total, 7):
        sf = [0] * total
        sf[hot] = min(3, (1 << flat_slen[hot]) - 1) if flat_slen[hot] else 0
        g2 = B.Granule(big_values=180, big_pairs=pairs,
                       window_switching=True, block_type=2,
                       mixed_block=True, table_select=(10, 10, 10),
                       scalefac_compress=sfc, scalefacs=tuple(sf),
                       global_gain=200)
        r = _rel_diff(B.build_stream([B.build_frame_lsf(g2, sr=8000)] * 5))
        assert r < 1e-5, (hot, r)


@needs_oracle
@pytest.mark.parametrize("bt", [1, 3])
def test_lsf_start_stop_blocks(bt):
    rng = np.random.default_rng(bt + 40)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=bt,
                  table_select=(10, 10, 10), global_gain=195)
    assert _rel_diff(B.build_stream([B.build_frame_lsf(g)] * 5)) < 1e-5


# ------------------------------------------------------------- stereo


@needs_oracle
@pytest.mark.parametrize("mode,mode_ext", [
    ("stereo", 0), ("joint", 2), ("joint", 1), ("joint", 3)])
def test_lsf_stereo_modes(mode, mode_ext):
    """LSF intensity stereo is io-based (io = 2^-1/4 when the >>1'd
    compress value is odd, else 2^-1/2) with per-band slen-width
    positions — a different algorithm from MPEG-1's tan()-table
    (ISO 13818-3 2.4.3.4), so both io parities are exercised."""
    rng = np.random.default_rng(mode_ext + 50)
    sfc_l = 23
    gl = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                   table_select=(10, 10, 10), scalefac_compress=sfc_l,
                   scalefacs=_sf_lsf(rng, sfc_l), global_gain=195)
    intensity = mode == "joint" and (mode_ext & 1)
    for sfc_r in ((180 * 2, 181 * 2 + 1) if intensity else (23,)):
        nr = 10 if intensity else 40
        sfr = _sf_lsf(rng, sfc_r, intensity=bool(intensity))
        gr = B.Granule(big_values=nr, big_pairs=_pairs(rng, nr, 7),
                       table_select=(10, 10, 10), scalefac_compress=sfc_r,
                       scalefacs=sfr, global_gain=195)
        data = B.build_stream(
            [B.build_frame_lsf([gl, gr], mode=mode,
                               mode_ext=mode_ext)] * 5)
        mine, _ = decode_mp3_bytes(data)
        assert mine.shape[1] == 2
        assert _rel_diff(data) < 1e-5


# ---------------------------------------------------------- reservoir


@needs_oracle
def test_lsf_bit_reservoir():
    """8-bit main_data_begin (LSF) — frame 2's main data lives in frame
    1's padding."""
    rng = np.random.default_rng(60)
    g1 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), global_gain=195)
    g2 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(13, 13, 13), global_gain=190)
    sfb, _ = B._scalefac_bits_lsf(g2, False)
    hb = B._encode_values(g2, 22050)
    bits = B.Bits()
    bits.put_str(sfb + hb)
    res = bits.tobytes()
    f1 = bytearray(B.build_frame_lsf(g1))
    f1[len(f1) - len(res):] = res
    f2 = bytearray(B.build_frame_lsf(g2, main_data_begin=len(res)))
    f2[4 + 9:] = bytes(len(f2) - 4 - 9)     # mono LSF side info: 9 bytes
    f3 = B.build_frame_lsf(g1)
    assert _rel_diff(
        B.build_stream([bytes(f1), bytes(f2), f3, f3])) < 1e-5


# ------------------------------------------------------------ regions


@needs_oracle
def test_lsf_region_split_tables():
    """Different Huffman table per big-values region: the region
    boundaries come from the LSF band tables (behaviorally probed), so a
    mismatch there desyncs the whole Huffman section."""
    rng = np.random.default_rng(61)
    g = B.Granule(big_values=100, big_pairs=_pairs(rng, 100, 2),
                  table_select=(7, 13, 2), region0_count=4,
                  region1_count=3, global_gain=195)
    data = B.build_stream([B.build_frame_lsf(g)] * 5)
    assert _rel_diff(data) < 1e-5


@needs_oracle
def test_lsf_count1_and_fuzz():
    rng = np.random.default_rng(0)

    def rand_gr():
        tbl = int(rng.choice([1, 2, 5, 7, 10, 13, 15, 16, 24]))
        mx = min({1: 1, 2: 2, 5: 3, 7: 5}.get(tbl, 15), 7)
        nb = int(rng.integers(0, 50))
        return B.Granule(
            big_values=nb, big_pairs=_pairs(rng, nb, mx),
            count1_quads=_quads(rng, int(rng.integers(0, 20))),
            table_select=(tbl, tbl, tbl),
            global_gain=int(rng.integers(150, 211)),
            count1table_select=int(rng.integers(0, 2)))

    for trial in range(4):
        sr = int(rng.choice(ALL_LSF_RATES))
        frames = [B.build_frame_lsf(rand_gr(), sr=sr) for _ in range(6)]
        r = _rel_diff(B.build_stream(frames))
        assert r < 1e-5, (trial, sr, r)


# ----------------------------------------------------- native fast path


def _lsf_surface_streams():
    """Representative LSF streams across the format surface (seeded)."""
    rng = np.random.default_rng(77)
    out = {}
    for sr in ALL_LSF_RATES:
        sfc = 150
        g = B.Granule(big_values=60, big_pairs=_pairs(rng, 60, 7),
                      table_select=(10, 10, 10), scalefac_compress=sfc,
                      scalefacs=_sf_lsf(rng, sfc), global_gain=200)
        out[f"sr{sr}"] = B.build_stream(
            [B.build_frame_lsf(g, sr=sr)] * 3)
    for sr in (22050, 8000):
        sfc = 210
        sho = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                        window_switching=True, block_type=2,
                        table_select=(10, 10, 10), scalefac_compress=sfc,
                        scalefacs=_sf_lsf(rng, sfc, short=True),
                        subblock_gain=(1, 0, 2), global_gain=200)
        mix = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                        window_switching=True, block_type=2,
                        mixed_block=True, table_select=(10, 10, 10),
                        scalefac_compress=sfc,
                        scalefacs=_sf_lsf(rng, sfc, short=True, mixed=True),
                        subblock_gain=(0, 1, 0), global_gain=200)
        out[f"short+mixed@{sr}"] = B.build_stream(
            [B.build_frame_lsf(sho, sr=sr), B.build_frame_lsf(mix, sr=sr)])
    gl = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), scalefac_compress=23,
                   scalefacs=_sf_lsf(rng, 23), global_gain=195)
    for name, mode, ext, sfc_r in (("stereo", "stereo", 0, 23),
                                   ("ms", "joint", 2, 23),
                                   ("int-even", "joint", 1, 360),
                                   ("ms+int-odd", "joint", 3, 363)):
        intensity = ext & 1
        nr = 10 if intensity else 30
        gr = B.Granule(big_values=nr, big_pairs=_pairs(rng, nr, 7),
                       table_select=(10, 10, 10), scalefac_compress=sfc_r,
                       scalefacs=_sf_lsf(rng, sfc_r,
                                         intensity=bool(intensity)),
                       global_gain=195)
        out[name] = B.build_stream(
            [B.build_frame_lsf([gl, gr], mode=mode, mode_ext=ext)] * 3)
    # 8-bit reservoir
    g2 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(13, 13, 13), global_gain=190)
    sfb, _ = B._scalefac_bits_lsf(g2, False)
    hb = B._encode_values(g2, 22050)
    bits = B.Bits()
    bits.put_str(sfb + hb)
    res = bits.tobytes()
    g1 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), global_gain=195)
    f1 = bytearray(B.build_frame_lsf(g1))
    f1[len(f1) - len(res):] = res
    f2 = bytearray(B.build_frame_lsf(g2, main_data_begin=len(res)))
    f2[4 + 9:] = bytes(len(f2) - 4 - 9)
    out["reservoir"] = B.build_stream(
        [bytes(f1), bytes(f2), B.build_frame_lsf(g1)])
    return out


def test_native_lsf_bitexact_vs_python():
    """The C++ fast path must match data/mp3.py EXACTLY on the LSF
    surface too (same double math, same operation order)."""
    from test_mp3 import _load_native, _native_decode
    lib = _load_native()
    if lib is None:
        pytest.skip("native library unavailable")
    for name, data in _lsf_surface_streams().items():
        py_pcm, py_sr = decode_mp3_bytes(data)
        nat, nat_sr = _native_decode(lib, data)
        assert nat_sr == py_sr, name
        np.testing.assert_array_equal(
            nat, py_pcm[:, 0].astype(np.float32), err_msg=name)


# ---------------------------------------------------- non-oracle gates


def test_lsf_stream_metadata():
    g = B.Granule(count1_quads=_quads(np.random.default_rng(1), 10),
                  global_gain=190)
    mine, sr = decode_mp3_bytes(
        B.build_stream([B.build_frame_lsf(g, sr=11025)] * 4))
    assert sr == 11025 and mine.shape == (4 * 576, 1)


def test_decode_audio_lsf_no_external_tools(monkeypatch, tmp_path):
    """decode_audio on an MPEG-2.5 file works with ffmpeg/mpg123 absent
    from PATH — the LSF path closes the reference's last decode-format
    gap (torchaudio decodes LSF natively, KeyDataset.py:341)."""
    import shutil

    from audio_key_estimation_tpu.data.audio_io import decode_audio
    monkeypatch.setattr(shutil, "which", lambda name: None)
    rng = np.random.default_rng(13)
    g = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                  table_select=(10, 10, 10), global_gain=195)
    p = tmp_path / "clip.mp3"
    p.write_bytes(B.build_stream([B.build_frame_lsf(g, sr=16000)] * 4))
    samples, sr = decode_audio(str(p))
    assert sr == 16000
    assert samples.shape == (4 * 576,)
    assert samples.dtype == np.float32
    assert np.abs(samples).max() > 0


def test_reserved_version_raises():
    # version bits 01 are reserved (neither MPEG-1 nor LSF)
    hdr = bytes([0xFF, 0xEB, 0x90, 0x00]) + bytes(400)
    with pytest.raises(Mp3Error):
        decode_mp3_bytes(hdr * 3)
