"""Differential tests: in-tree MP3 decoder vs an independent oracle.

The reference decodes mp3 through torchaudio (reference KeyDataset.py:341);
8 of its 14 corpora are mp3 (KeyDataset.py:779-833, 1039-1234). The rebuild
owns the decoder (data/mp3.py). These tests prove it equivalent to a second,
independent implementation — the libavcodec bundled with the opencv wheel
(tests/av_oracle.py) — on synthetic streams from tests/mp3_builder.py that
sweep the full MPEG-1 Layer III format surface: every Huffman table,
long/start/short/stop/mixed blocks, scalefactors (+preflag, scalefac_scale,
scfsi, subblock gain), all stereo modes, the bit reservoir, all three
sample rates, and libavcodec's escape-value clamp semantics.

PCM tolerances: libavcodec decodes in float32 and my decoder in float64, so
agreement is limited by the oracle's own rounding (~2e-6 of full scale on
ordinary content; ~1e-5 on pathological full-scale content).
"""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import mp3_builder as B  # noqa: E402
from av_oracle import get_oracle  # noqa: E402

from audio_key_estimation_tpu.data import _mp3_tables as T  # noqa: E402
from audio_key_estimation_tpu.data.mp3 import (  # noqa: E402
    Mp3Error, decode_mp3_bytes)

_ORACLE = get_oracle()
needs_oracle = pytest.mark.skipif(
    _ORACLE is None, reason="libavcodec oracle unavailable")


def _rel_diff(data: bytes) -> float:
    """max |mine - oracle| / oracle full scale; asserts matching shapes."""
    mine, sr_m = decode_mp3_bytes(data)
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


_ALL_TABLES = sorted(set(list(T.HUFF_DECODE) + list(T.PAIR_TABLE)))


def _table_max(tbl: int) -> int:
    base = max(max(r[2], r[3])
               for r in T.HUFF_DECODE[T.PAIR_TABLE.get(tbl, tbl)])
    lb = T.LINBITS.get(tbl, 0)
    return base + ((1 << lb) - 1 if base == 15 and lb else 0)


def _sf_long(rng, sfc):
    s1, s2 = B.SLEN[sfc]
    return tuple(int(rng.integers(0, 1 << s)) for s in [s1] * 11 + [s2] * 10)


# ------------------------------------------------------------ huffman


@needs_oracle
@pytest.mark.parametrize("tbl", _ALL_TABLES)
def test_huffman_table(tbl):
    rng = np.random.default_rng(tbl)
    mx = min(_table_max(tbl), 60)
    pairs = _pairs(rng, 40, mx)
    g = B.Granule(big_values=40, big_pairs=pairs,
                  table_select=(tbl, tbl, tbl), global_gain=185)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
@pytest.mark.parametrize("c1", [0, 1])
def test_count1_tables(c1):
    rng = np.random.default_rng(c1)
    g = B.Granule(count1_quads=_quads(rng, 30), count1table_select=c1,
                  global_gain=195)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
def test_region_split_tables():
    """Different Huffman table per big-values region."""
    rng = np.random.default_rng(5)
    g = B.Granule(big_values=100, big_pairs=_pairs(rng, 100, 2),
                  table_select=(7, 13, 2), region0_count=4, region1_count=3,
                  global_gain=190)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
def test_random_content_fuzz():
    rng = np.random.default_rng(0)

    def rand_gr():
        tbl = int(rng.choice(_ALL_TABLES))
        mx = min(_table_max(tbl), 60)
        nb = int(rng.integers(0, 60))
        return B.Granule(
            big_values=nb, big_pairs=_pairs(rng, nb, mx),
            count1_quads=_quads(rng, int(rng.integers(0, 20))),
            table_select=(tbl, tbl, tbl),
            global_gain=int(rng.integers(140, 211)),
            count1table_select=int(rng.integers(0, 2)))

    for trial in range(6):
        frames = [B.build_frame([rand_gr(), rand_gr()]) for _ in range(6)]
        r = _rel_diff(B.build_stream(frames))
        assert r < 5e-6, (trial, r)


# ------------------------------------------------- escape-value clamp


@needs_oracle
def test_escape_clamp_matches_oracle():
    """libavcodec zeroes escape-path values its fixed-point requantizer
    cannot hold (mp3.py::_escape_clamp). Probe both sides of the boundary
    and the small-value path that never clamps."""
    sil = B.Granule()
    cases = [  # (table, value, gain, zeroed)
        (31, 2048, 166, False), (31, 2048, 167, True),   # xr/1.759 ~ 8
        (13, 15, 204, False), (13, 15, 205, True),       # no-linbits escape
        (31, 14, 255, False),                            # v<15: never zeroed
        (16, 15, 210, True),
    ]
    for tbl, v, gain, zeroed in cases:
        g = B.Granule(big_values=1, big_pairs=((v, 0),),
                      table_select=(tbl, tbl, tbl), global_gain=gain)
        data = B.build_stream([B.build_frame([g, sil])] * 2)
        mine, _ = decode_mp3_bytes(data)
        ref, _ = _ORACLE.decode(data)
        assert (np.abs(ref).max() < 1e-9) == zeroed, (tbl, v, gain)
        assert (np.abs(mine).max() < 1e-9) == zeroed, (tbl, v, gain)
        assert _rel_diff(data) < 5e-6, (tbl, v, gain)


# -------------------------------------------------------- scalefactors


@needs_oracle
@pytest.mark.parametrize("sfc", [1, 5, 11, 15])
def test_scalefactors_long(sfc):
    rng = np.random.default_rng(sfc)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  table_select=(10, 10, 10), scalefac_compress=sfc,
                  scalefacs=_sf_long(rng, sfc), global_gain=190)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
def test_preflag_and_scalefac_scale():
    rng = np.random.default_rng(9)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  table_select=(10, 10, 10), scalefac_compress=11,
                  preflag=1, scalefac_scale=1, scalefacs=_sf_long(rng, 11),
                  global_gain=200)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
@pytest.mark.parametrize("mask", [0b1010, 0b1111])
def test_scfsi_shares_granule0_scalefactors(mask):
    rng = np.random.default_rng(mask)
    mk = lambda: B.Granule(  # noqa: E731
        big_values=60, big_pairs=_pairs(rng, 60, 7),
        table_select=(10, 10, 10), scalefac_compress=13,
        scalefacs=_sf_long(rng, 13), global_gain=195)
    data = B.build_stream(
        [B.build_frame([mk(), mk()], scfsi=(mask,))] * 3)
    assert _rel_diff(data) < 5e-6


# ------------------------------------------------------- block types


@needs_oracle
def test_short_blocks():
    rng = np.random.default_rng(2)
    s1, s2 = B.SLEN[10]
    sfs = tuple(int(rng.integers(0, 1 << s1)) for _ in range(18)) + \
        tuple(int(rng.integers(0, 1 << s2)) for _ in range(18))
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=2,
                  table_select=(10, 10, 10), scalefac_compress=10,
                  scalefacs=sfs, subblock_gain=(1, 0, 2), global_gain=195)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
def test_mixed_blocks():
    rng = np.random.default_rng(3)
    s1, s2 = B.SLEN[10]
    sfm = tuple(int(rng.integers(0, 1 << s1)) for _ in range(17)) + \
        tuple(int(rng.integers(0, 1 << s2)) for _ in range(18))
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=2, mixed_block=True,
                  table_select=(10, 10, 10), scalefac_compress=10,
                  scalefacs=sfm, subblock_gain=(0, 1, 0), global_gain=195)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
@pytest.mark.parametrize("bt", [1, 3])
def test_start_stop_blocks(bt):
    rng = np.random.default_rng(bt)
    g = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                  window_switching=True, block_type=bt,
                  table_select=(10, 10, 10), global_gain=190)
    assert _rel_diff(B.build_stream([B.build_frame([g, g])] * 3)) < 5e-6


@needs_oracle
def test_long_short_transition():
    """start -> short -> stop window sequence across granules."""
    rng = np.random.default_rng(4)
    lng = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                    table_select=(10, 10, 10), global_gain=190)
    sta = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                    window_switching=True, block_type=1,
                    table_select=(10, 10, 10), global_gain=190)
    sho = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                    window_switching=True, block_type=2,
                    table_select=(10, 10, 10), global_gain=190)
    sto = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                    window_switching=True, block_type=3,
                    table_select=(10, 10, 10), global_gain=190)
    frames = [B.build_frame([lng, sta]), B.build_frame([sho, sho]),
              B.build_frame([sto, lng])]
    assert _rel_diff(B.build_stream(frames)) < 5e-6


# ------------------------------------------------------------- stereo


@needs_oracle
@pytest.mark.parametrize("mode,mode_ext", [
    ("stereo", 0), ("joint", 2), ("joint", 1), ("joint", 3)])
def test_stereo_modes(mode, mode_ext):
    rng = np.random.default_rng(mode_ext)
    gl = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), global_gain=185)
    # intensity modes: right channel band-limited below the left
    nr = 10 if mode_ext & 1 else 30
    gr = B.Granule(big_values=nr, big_pairs=_pairs(rng, nr, 7),
                   table_select=(10, 10, 10), global_gain=185)
    data = B.build_stream(
        [B.build_frame([[gl, gr], [gl, gr]], mode=mode,
                       mode_ext=mode_ext)] * 3)
    mine, _ = decode_mp3_bytes(data)
    assert mine.shape[1] == 2
    assert _rel_diff(data) < 5e-6


# ---------------------------------------------------- framing features


@needs_oracle
def test_bit_reservoir():
    """Frame 2's main data lives entirely in frame 1's padding
    (main_data_begin > 0)."""
    rng = np.random.default_rng(6)
    g1 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), global_gain=190)
    g2 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(13, 13, 13), global_gain=185)
    sfb, _ = B._scalefac_bits(g2, B.SLEN)
    hb = B._encode_values(g2, 44100)
    bits = B.Bits()
    bits.put_str((sfb + hb) * 2)
    res = bits.tobytes()
    f1 = bytearray(B.build_frame([g1, g1]))
    f1[len(f1) - len(res):] = res           # reservoir at end of frame 1
    f2 = bytearray(B.build_frame([g2, g2], main_data_begin=len(res)))
    f2[4 + 17:] = bytes(len(f2) - 4 - 17)   # frame 2 inline area: empty
    f3 = B.build_frame([g1, g1])
    assert _rel_diff(B.build_stream([bytes(f1), bytes(f2), f3])) < 5e-6


@needs_oracle
@pytest.mark.parametrize("sr", [32000, 44100, 48000])
def test_sample_rates(sr):
    rng = np.random.default_rng(sr)
    sf = tuple(int(rng.integers(0, 8)) for _ in range(21))
    g = B.Granule(big_values=200, big_pairs=_pairs(rng, 200, 7),
                  table_select=(10, 10, 10), scalefac_compress=13,
                  scalefacs=sf, scalefac_scale=1, global_gain=205)
    data = B.build_stream([B.build_frame([g, g], sr=sr, bitrate=320)] * 3)
    mine, sr_out = decode_mp3_bytes(data)
    assert sr_out == sr
    # full-scale pathological content: float32 accumulation in the oracle
    assert _rel_diff(data) < 1e-5


@needs_oracle
def test_id3_and_garbage_resync():
    rng = np.random.default_rng(8)
    g = B.Granule(big_values=20, big_pairs=_pairs(rng, 20, 7),
                  table_select=(10, 10, 10), global_gain=190)
    frames = B.build_stream([B.build_frame([g, g])] * 3)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x14" + bytes(20)
    mine, sr = decode_mp3_bytes(id3 + frames)
    assert sr == 44100 and mine.shape == (3 * 1152, 1)
    # garbage prefix without valid sync
    mine2, _ = decode_mp3_bytes(b"\x12\x34\x56\x78" * 5 + frames)
    assert mine2.shape == (3 * 1152, 1)


def test_lone_headers_no_frame_raises():
    # valid LSF headers whose frame_bytes never lands on the next sync:
    # the resync scan must reject them all rather than decode garbage
    # (LSF itself is supported — see tests/test_mp3_lsf.py)
    hdr = bytes([0xFF, 0xF2, 0x90, 0x00]) + bytes(400)
    with pytest.raises(Mp3Error):
        decode_mp3_bytes(hdr * 3)


def test_no_frames_raises():
    with pytest.raises(Mp3Error):
        decode_mp3_bytes(bytes(1000))


# ------------------------------------------------------ native fast path


def _load_native():
    from audio_key_estimation_tpu.native.binding import load_library
    lib = load_library()
    return lib if lib is not None and hasattr(lib, "akx_decode_mp3") else None


def _native_decode(lib, data: bytes):
    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        h = lib.akx_decode_mp3(path.encode())
        try:
            n = lib.akx_num_samples(h)
            sr = lib.akx_sample_rate(h)
            err = (lib.akx_error(h) or b"").decode()
            if n == 0 or sr == 0:
                raise Mp3Error(err or "native decode failed")
            buf = np.ctypeslib.as_array(lib.akx_samples(h), shape=(n,)).copy()
            return buf, sr
        finally:
            lib.akx_free(h)
    finally:
        os.unlink(path)


def _format_surface_streams():
    """Representative streams across the format surface (seeded)."""
    rng = np.random.default_rng(42)
    out = {}
    for trial in range(4):  # random fuzz incl. escape values
        def rand_gr():
            tbl = int(rng.choice(_ALL_TABLES))
            mx = min(_table_max(tbl), 60)
            nb = int(rng.integers(0, 60))
            return B.Granule(
                big_values=nb, big_pairs=_pairs(rng, nb, mx),
                count1_quads=_quads(rng, int(rng.integers(0, 20))),
                table_select=(tbl, tbl, tbl),
                global_gain=int(rng.integers(140, 211)),
                count1table_select=int(rng.integers(0, 2)))
        out[f"fuzz{trial}"] = B.build_stream(
            [B.build_frame([rand_gr(), rand_gr()]) for _ in range(4)])
    s1, s2 = B.SLEN[10]
    sfs = tuple(int(rng.integers(0, 1 << s1)) for _ in range(18)) + \
        tuple(int(rng.integers(0, 1 << s2)) for _ in range(18))
    sho = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                    window_switching=True, block_type=2,
                    table_select=(10, 10, 10), scalefac_compress=10,
                    scalefacs=sfs, subblock_gain=(1, 0, 2), global_gain=195)
    sfm = tuple(int(rng.integers(0, 1 << s1)) for _ in range(17)) + \
        tuple(int(rng.integers(0, 1 << s2)) for _ in range(18))
    mix = B.Granule(big_values=40, big_pairs=_pairs(rng, 40, 7),
                    window_switching=True, block_type=2, mixed_block=True,
                    table_select=(10, 10, 10), scalefac_compress=10,
                    scalefacs=sfm, subblock_gain=(0, 1, 0), global_gain=195)
    out["short+mixed"] = B.build_stream(
        [B.build_frame([sho, sho]), B.build_frame([mix, mix])])
    gl = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(10, 10, 10), global_gain=185)
    gi = B.Granule(big_values=10, big_pairs=_pairs(rng, 10, 7),
                   table_select=(10, 10, 10), global_gain=185)
    for name, mode, ext, gr in (("stereo", "stereo", 0, gl),
                                ("ms", "joint", 2, gl),
                                ("intensity", "joint", 1, gi),
                                ("ms+int", "joint", 3, gi)):
        out[name] = B.build_stream(
            [B.build_frame([[gl, gr], [gl, gr]], mode=mode,
                           mode_ext=ext)] * 2)
    mk = lambda: B.Granule(  # noqa: E731
        big_values=60, big_pairs=_pairs(rng, 60, 7),
        table_select=(10, 10, 10), scalefac_compress=13,
        scalefacs=_sf_long(rng, 13), global_gain=195, preflag=1,
        scalefac_scale=1)
    out["scfsi"] = B.build_stream(
        [B.build_frame([mk(), mk()], scfsi=(0b1010,))] * 2)
    for sr in (32000, 48000):
        g = B.Granule(big_values=100, big_pairs=_pairs(rng, 100, 7),
                      table_select=(10, 10, 10), scalefac_compress=13,
                      scalefacs=_sf_long(rng, 13), global_gain=200)
        out[f"sr{sr}"] = B.build_stream(
            [B.build_frame([g, g], sr=sr, bitrate=320)] * 2)
    # bit reservoir
    g2 = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                   table_select=(13, 13, 13), global_gain=185)
    sfb, _ = B._scalefac_bits(g2, B.SLEN)
    hb = B._encode_values(g2, 44100)
    bits = B.Bits()
    bits.put_str((sfb + hb) * 2)
    res = bits.tobytes()
    f1 = bytearray(B.build_frame([gl, gl]))
    f1[len(f1) - len(res):] = res
    f2 = bytearray(B.build_frame([g2, g2], main_data_begin=len(res)))
    f2[4 + 17:] = bytes(len(f2) - 4 - 17)
    out["reservoir"] = B.build_stream(
        [bytes(f1), bytes(f2), B.build_frame([gl, gl])])
    return out


def test_native_bitexact_vs_python():
    """The C++ fast path (native/akx_mp3.cpp) must match data/mp3.py
    EXACTLY (both compute in double, same operation order) on streams
    spanning the whole format surface."""
    lib = _load_native()
    if lib is None:
        pytest.skip("native library unavailable")
    for name, data in _format_surface_streams().items():
        py_pcm, py_sr = decode_mp3_bytes(data)
        nat, nat_sr = _native_decode(lib, data)
        assert nat_sr == py_sr, name
        np.testing.assert_array_equal(
            nat, py_pcm[:, 0].astype(np.float32), err_msg=name)


def test_native_lone_headers_no_frame_raises():
    # same stream as test_lone_headers_no_frame_raises: valid LSF headers
    # whose frame_bytes never chain to the next sync — the native resync
    # scan must reject them too (LSF itself decodes natively now; see
    # tests/test_mp3_lsf.py::test_native_lsf_bitexact_vs_python)
    lib = _load_native()
    if lib is None:
        pytest.skip("native library unavailable")
    hdr = bytes([0xFF, 0xF2, 0x90, 0x00]) + bytes(400)
    with pytest.raises(Mp3Error, match="no Layer III"):
        _native_decode(lib, hdr * 3)


def test_decode_many_mixed_wav_mp3(tmp_path):
    """The C++ DecodePool dispatches wav AND mp3 by extension."""
    import struct

    from audio_key_estimation_tpu.data.audio_io import decode_many
    rng = np.random.default_rng(13)
    g = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                  table_select=(10, 10, 10), global_gain=190)
    mp3_path = tmp_path / "a.mp3"
    mp3_path.write_bytes(B.build_stream([B.build_frame([g, g])] * 3))
    pcm = (np.sin(np.linspace(0, 80, 2000)) * 20000).astype("<i2")
    wav_path = tmp_path / "b.wav"
    wav_path.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVEfmt " +
        struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16) +
        b"data" + struct.pack("<I", pcm.nbytes) + pcm.tobytes())
    outs = list(decode_many([str(mp3_path), str(wav_path), str(mp3_path)]))
    assert len(outs) == 3
    assert outs[0][1] == 44100 and outs[0][0].shape == (3 * 1152,)
    assert outs[1][0].shape == (2000,)
    np.testing.assert_array_equal(outs[0][0], outs[2][0])


# --------------------------------------------------------- integration


def test_decode_audio_mp3_no_external_tools(monkeypatch, tmp_path):
    """decode_audio('x.mp3') works with ffmpeg/mpg123 absent from PATH
    (VERDICT r3 item 5)."""
    import shutil

    from audio_key_estimation_tpu.data.audio_io import decode_audio
    monkeypatch.setattr(shutil, "which", lambda name: None)
    rng = np.random.default_rng(12)
    g = B.Granule(big_values=30, big_pairs=_pairs(rng, 30, 7),
                  table_select=(10, 10, 10), global_gain=190)
    p = tmp_path / "clip.mp3"
    p.write_bytes(B.build_stream([B.build_frame([g, g])] * 4))
    samples, sr = decode_audio(str(p))
    assert sr == 44100
    assert samples.shape == (4 * 1152,)
    assert samples.dtype == np.float32
    assert np.abs(samples).max() > 0
