"""Data layer: audio decode (native + numpy), loaders on synthetic corpora,
KeyDataset pipeline with cache and bucketed batching."""

import os

import numpy as np
import pytest

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.data import audio_io, loaders, synthetic
from audio_key_estimation_tpu.data.dataset import KeyDataset, cache_path
from audio_key_estimation_tpu.native.binding import native_available


CFG = Config(octaves=4, frames=5)


def test_wav_roundtrip_numpy(tmp_path, rng):
    x = rng.uniform(-0.8, 0.8, 4000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.write_wav(p, x, 22050)
    y, sr = audio_io._decode_wav_numpy(p)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1 / 16000)


def test_wav_native_matches_numpy(tmp_path, rng):
    if not native_available():
        pytest.skip("C++ toolchain unavailable")
    x = rng.uniform(-0.8, 0.8, 4000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.write_wav(p, x, 44100)
    yn, srn = audio_io._decode_wav_numpy(p)
    yc, src = audio_io._decode_wav_native(p)
    assert srn == src == 44100
    np.testing.assert_array_equal(yn, yc)


def test_native_decode_pool(tmp_path, rng):
    if not native_available():
        pytest.skip("C++ toolchain unavailable")
    from audio_key_estimation_tpu.native.binding import load_library
    lib = load_library()
    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.wav")
        audio_io.write_wav(p, rng.uniform(-0.5, 0.5, 1000 + i), 8000)
        paths.append(p)
    pool = lib.akx_pool_create(2)
    for i, p in enumerate(paths):
        lib.akx_pool_submit(pool, i, p.encode())
    got = {}
    import time
    deadline = time.time() + 10
    while len(got) < 4 and time.time() < deadline:
        r = lib.akx_pool_poll(pool)
        if not r:
            time.sleep(0.01)
            continue
        assert lib.akx_result_ok(r)
        got[lib.akx_result_id(r)] = lib.akx_result_num_samples(r)
        lib.akx_result_free(r)
    lib.akx_pool_destroy(pool)
    assert got == {i: 1000 + i for i in range(4)}


# ---------------------------------------------------------------------------
# loaders on synthetic corpora
# ---------------------------------------------------------------------------

def test_giantsteps_loader(tmp_path):
    root = synthetic.make_giantsteps_corpus(
        str(tmp_path / "gs"),
        [("a", 440, "C major", "techno"), ("b", 523, "A minor", "hip-hop")])
    ld = loaders.GiantStepsKeyLoader(root)
    files = ld.get_filenames()
    assert len(files) == 2
    assert ld.get_key_signature(files[0]) == "C major"
    g = ld.get_genre(files[0])           # techno -> Electronic (idx 5)
    assert g.argmax() == 5 and g.sum() == 1
    g = ld.get_genre(files[1])           # hip-hop -> Hip-Hop (idx 6)
    assert g.argmax() == 6


def test_winterreise_loader_global_and_local(tmp_path):
    root = synthetic.make_winterreise_corpus(
        str(tmp_path / "w"),
        [("HU33", "D911-01", 440, "D:min")],
        local_segments={"HU33_D911-01": [(0.0, 1.5, "D:min"),
                                         (1.5, 3.0, "A:maj")]})
    ld = loaders.SchubertWinterreiseLoader(root)
    files = ld.get_filenames()
    assert len(files) == 1
    assert ld.get_key_signature(files[0]) == "D:min"
    ld_local = loaders.SchubertWinterreiseLoader(root, local=True)
    segs = ld_local.get_key_signature(files[0])
    assert segs == [(0.0, 1.5, "D:min"), (1.5, 3.0, "A:maj")]
    assert ld.get_genre(files[0]).argmax() == 0


def test_gtzan_loader_filters_unlabeled(tmp_path):
    root = synthetic.make_gtzan_corpus(
        str(tmp_path / "g"),
        [("blues", "blues.00000", 440, "3"),
         ("rock", "rock.00001", 300, "-1")])
    ld = loaders.GTZANLoader(root)
    files = ld.get_filenames()
    assert len(files) == 1 and "blues" in files[0]
    assert ld.get_key_signature(files[0]) == "3"
    assert ld.get_genre(files[0]).argmax() == 8  # blues


def test_scraped_loader_threshold_and_size(tmp_path):
    root = synthetic.make_scraped_corpus(
        str(tmp_path / "kf"),
        [("good song", 0.9, "Am"), ("bad song", 0.3, "C")])
    ld = loaders.KeyFinderLoader(root)
    files = ld.get_filenames()
    assert len(files) == 1 and "good song" in files[0]
    assert ld.get_key_signature(files[0]) == "Am"


def test_guitarset_loader(tmp_path):
    root = synthetic.make_guitarset_corpus(
        str(tmp_path / "gset"), [("02_BN1-129-Eb_solo", 311, "Eb:major")])
    ld = loaders.GuitarSetLoader(root)
    files = ld.get_filenames()
    assert ld.get_key_signature(files[0]) == "Eb:major"


def test_isophonics_typo_preserved():
    ld = loaders.BeatlesLoader("/nonexistent")
    assert "Eb:mino" in ld.keys and "Eb:minor" not in ld.keys


# ---------------------------------------------------------------------------
# end-to-end dataset pipeline
# ---------------------------------------------------------------------------

def _corpus(tmp_path):
    return synthetic.make_giantsteps_corpus(
        str(tmp_path / "gs"),
        [("s1", 261.63, "C major", "techno"),
         ("s2", 440.0, "A minor", "hip-hop"),
         ("s3", 392.0, "G major", "techno")])


def test_dataset_import_and_batches(tmp_path):
    root = _corpus(tmp_path)
    ds = KeyDataset(genre=True, cfg=CFG, blacklist_path="")
    ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    assert len(ds) == 3
    it = ds[0]
    assert it["mel"].shape[0] == CFG.pitches
    assert it["key_labels"].shape == (12,)
    assert it["key_signature_id"].shape == (24,)
    batches = list(ds.batches(2))
    assert len(batches) == 2
    b = batches[0]
    assert b["mel"].shape[0] == 2 and b["mel"].shape[3] == 1
    assert b["mel"].shape[1] == CFG.pitches
    assert b["seq_length"].dtype == np.int32
    assert b["valid"].all()
    assert not batches[1]["valid"][1]  # repeat-padded final batch


def test_dataset_cache_roundtrip(tmp_path):
    root = _corpus(tmp_path)
    ds1 = KeyDataset(genre=False, cfg=CFG, blacklist_path="")
    ds1.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    cp = cache_path(ds1[0]["file"], CFG, CFG.bins_per_octave)
    assert os.path.exists(cp)
    ds2 = KeyDataset(genre=False, cfg=CFG, blacklist_path="")
    ds2.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    a = {it["file"]: it["mel"] for it in ds1.items}
    b = {it["file"]: it["mel"] for it in ds2.items}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)


def test_dataset_blacklist(tmp_path):
    root = _corpus(tmp_path)
    bl = tmp_path / "short_songs.txt"
    bl.write_text("s2.wav\n")
    ds = KeyDataset(genre=False, cfg=CFG, blacklist_path=str(bl))
    ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    assert len(ds) == 2
    assert all("s2" not in it["file"] for it in ds.items)


def test_dataset_local_mode_winterreise(tmp_path):
    root = synthetic.make_winterreise_corpus(
        str(tmp_path / "w"),
        [("HU33", "D911-01", 440, "D:min")],
        local_segments={"HU33_D911-01": [(0.0, 20.0, "D:min"),
                                         (20.0, 40.0, "A:maj")]},
        seconds=41.0)
    cfg = CFG.replace(local=True, frames=5, loc_window_size=2)
    ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="")
    ds.import_data(loaders.SchubertWinterreiseLoader(root, local=True),
                   progress=False)
    it = ds[0]
    assert it["key_labels"].ndim == 2
    assert it["mel"].shape[-1] == it["key_labels"].shape[0] + (2 * 5 - 1)


def test_custom_cqt_fixture_shape():
    mel = synthetic.custom_cqt(octaves=10)
    assert mel.shape == (360, 592)
    assert mel.max() == 20.0


def test_decode_many_preserves_order(tmp_path, rng):
    """decode_many (C++ DecodePool when built, thread fallback otherwise)
    yields results in input order, matching decode_audio exactly."""
    paths = []
    for i in range(6):
        p = str(tmp_path / f"dm{i}.wav")
        audio_io.write_wav(p, rng.uniform(-0.5, 0.5, 500 + 137 * i), 8000)
        paths.append(p)
    got = list(audio_io.decode_many(paths, workers=3))
    assert len(got) == 6
    for p, (y, sr) in zip(paths, got):
        ref_y, ref_sr = audio_io.decode_audio(p)
        assert sr == ref_sr == 8000
        np.testing.assert_array_equal(y, ref_y)


def test_ingest_batch_matches_decode_then_pack(tmp_path, rng):
    """The one-copy readinto path produces the identical batch to
    decode_many + pack_batch, with true lengths and rates."""
    paths = []
    for i in range(5):
        p = str(tmp_path / f"ib{i}.wav")
        audio_io.write_wav(p, rng.uniform(-0.5, 0.5, 700 + 211 * i), 8000)
        paths.append(p)
    pad = 700 + 211 * 4
    batch, lens, rates = audio_io.ingest_batch(paths, pad)
    decoded = list(audio_io.decode_many(paths, raw=True))
    ref = audio_io.pack_batch((w[:pad] for w, _ in decoded), pad)
    assert batch.dtype == np.int16
    np.testing.assert_array_equal(batch, ref)
    assert [int(x) for x in lens] == [700 + 211 * i for i in range(5)]
    assert rates == [8000] * 5


def test_ingest_batch_reused_out_buffer_and_trim(tmp_path, rng):
    """`out=` reuse: stale contents are fully overwritten (pad tails
    re-zeroed), long files trimmed to pad_len, extra rows zero."""
    paths = []
    for n in (300, 900):
        p = str(tmp_path / f"rb{n}.wav")
        audio_io.write_wav(p, rng.uniform(-0.5, 0.5, n), 8000)
        paths.append(p)
    pad = 600
    out = np.full((3, pad), 7, np.int16)          # stale garbage
    batch, lens, _ = audio_io.ingest_batch(paths, pad, n_rows=3, out=out)
    assert batch is out
    assert [int(x) for x in lens] == [300, 600]
    assert np.all(batch[0, 300:] == 0)
    assert np.all(batch[2] == 0)
    ref0, _ = audio_io.decode_audio(paths[0], raw=True)
    ref1, _ = audio_io.decode_audio(paths[1], raw=True)
    np.testing.assert_array_equal(batch[0, :300], ref0)
    np.testing.assert_array_equal(batch[1], ref1[:pad])
    with pytest.raises(ValueError):
        audio_io.ingest_batch(paths, pad, n_rows=3,
                              out=np.zeros((3, pad), np.float32))
    # fewer rows than files would write past the batch: loud error, never
    # an out-of-bounds row (guarded in Python AND in akx_ingest_batch)
    with pytest.raises(ValueError):
        audio_io.ingest_batch(paths, pad, n_rows=1)


def test_ingest_batch_native_matches_python_readinto(tmp_path, rng,
                                                     monkeypatch):
    """akx_ingest_batch (one C call: header walk + pread per file) must be
    byte-identical to the Python per-file readinto fallback, including
    short-row zero tails and unused padding rows."""
    from audio_key_estimation_tpu.native import binding
    if binding.load_library() is None:
        pytest.skip("native toolchain unavailable")
    paths = []
    for i in range(4):
        p = str(tmp_path / f"nv{i}.wav")
        audio_io.write_wav(p, rng.uniform(-0.9, 0.9, 500 + 137 * i), 8000)
        paths.append(p)
    pad = 800
    nat_b, nat_l, nat_r = audio_io.ingest_batch(paths, pad, n_rows=6)
    monkeypatch.setattr(audio_io, "load_library", lambda: None)
    py_b, py_l, py_r = audio_io.ingest_batch(paths, pad, n_rows=6)
    np.testing.assert_array_equal(nat_b, py_b)
    np.testing.assert_array_equal(nat_l, py_l)
    assert nat_r == py_r


def test_ingest_batch_fallback_non_pcm16(tmp_path, rng):
    """A non-mono/PCM16 member routes the whole batch through the decode
    fallback (float32 semantics preserved)."""
    mono = str(tmp_path / "m.wav")
    audio_io.write_wav(mono, rng.uniform(-0.5, 0.5, 400), 8000)
    stereo = str(tmp_path / "s.wav")
    import struct
    pcm = (rng.uniform(-0.4, 0.4, (200, 2)) * 32767).astype("<i2").tobytes()
    with open(stereo, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000,
                                      8000 * 4, 4, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
    batch, lens, rates = audio_io.ingest_batch([mono, stereo], 400)
    decoded = list(audio_io.decode_many([mono, stereo], raw=True))
    ref = audio_io.pack_batch((w[:400] for w, _ in decoded), 400)
    np.testing.assert_array_equal(batch, ref)
    assert [int(x) for x in lens] == [400, 200]
    assert rates == [8000, 8000]


def test_decode_many_raises_on_bad_file(tmp_path, rng):
    good = str(tmp_path / "ok.wav")
    audio_io.write_wav(good, rng.uniform(-0.5, 0.5, 400), 8000)
    bad = str(tmp_path / "nope.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(Exception):
        list(audio_io.decode_many([good, bad]))


def test_blacklist_default_is_packaged_reference_list():
    ds = KeyDataset(genre=False, cfg=CFG, use_cache=False)
    assert len(ds.blacklist) == 11  # reference short_songs.txt:1-11
    assert any("Luxury_Pool.mp3" in b for b in ds.blacklist)


def test_blacklist_missing_file_fails_loudly(tmp_path):
    with pytest.raises(FileNotFoundError):
        KeyDataset(genre=False, cfg=CFG,
                   blacklist_path=str(tmp_path / "gone.txt"))


def test_dataset_pallas_frontend_matches_xla(tmp_path):
    """Config.use_pallas_cqt switches the dataset preprocessing front-end
    (interpret-mode Pallas on CPU); features match the XLA path.

    Compared at float32 — the bf16 variants of the two paths quantize at
    different pipeline points (XLA: conv operands; Pallas: stored octave
    streams) so they agree only to bf16 epsilon, which the dedicated
    test_cqt_pallas suite covers."""
    root = _corpus(tmp_path)
    cfg_x = CFG.replace(cqt_conv_dtype="float32")
    ds_x = KeyDataset(genre=False, cfg=cfg_x, blacklist_path="",
                      use_cache=False)
    ds_x.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    cfg_p = cfg_x.replace(use_pallas_cqt=True)
    ds_p = KeyDataset(genre=False, cfg=cfg_p, blacklist_path="",
                      use_cache=False)
    ds_p.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    a = {it["file"]: it["mel"] for it in ds_x.items}
    b = {it["file"]: it["mel"] for it in ds_p.items}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# raw PCM16 ingestion (host I/O only; device normalizes — audio_io raw paths)
# ---------------------------------------------------------------------------

def test_decode_raw_matches_float_path(tmp_path, rng):
    x = rng.uniform(-0.8, 0.8, 5000).astype(np.float32)
    p = str(tmp_path / "raw.wav")
    audio_io.write_wav(p, x, 22050)
    y_raw, sr = audio_io.decode_audio(p, raw=True)
    assert sr == 22050 and y_raw.dtype == np.int16
    y_f, _ = audio_io.decode_audio(p)
    np.testing.assert_array_equal(y_raw.astype(np.float32) / 32768.0, y_f)


def test_decode_raw_stereo_channel0(tmp_path, rng):
    import struct
    left = (rng.uniform(-0.5, 0.5, 700) * 32767).astype("<i2")
    right = (rng.uniform(-0.5, 0.5, 700) * 32767).astype("<i2")
    pcm = np.stack([left, right], axis=1).tobytes()
    p = str(tmp_path / "st.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000,
                                      8000 * 4, 4, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
    y, sr = audio_io.decode_audio(p, raw=True)
    assert sr == 8000 and y.dtype == np.int16
    np.testing.assert_array_equal(y, left)


def test_decode_raw_falls_back_to_float_for_non_pcm16(tmp_path, rng):
    import struct
    x = rng.uniform(-0.5, 0.5, 300).astype("<f4")
    pcm = x.tobytes()
    p = str(tmp_path / "f32.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                      8000 * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
    y, sr = audio_io.decode_audio(p, raw=True)
    assert y.dtype == np.float32
    np.testing.assert_array_equal(y, x)


def test_decode_many_raw_order_and_errors(tmp_path, rng):
    paths = []
    for i in range(5):
        p = str(tmp_path / f"r{i}.wav")
        audio_io.write_wav(p, rng.uniform(-0.5, 0.5, 400 + 61 * i), 8000)
        paths.append(p)
    got = list(audio_io.decode_many(paths, workers=3, raw=True))
    for p, (y, sr) in zip(paths, got):
        ref, _ = audio_io.decode_audio(p, raw=True)
        assert y.dtype == np.int16
        np.testing.assert_array_equal(y, ref)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"nonsense")
    with pytest.raises(audio_io.AudioDecodeError):
        list(audio_io.decode_many([paths[0], bad], raw=True))


def test_pack_batch_int16_and_mixed(rng):
    a = (rng.uniform(-0.5, 0.5, 10) * 32767).astype(np.int16)
    b = (rng.uniform(-0.5, 0.5, 7) * 32767).astype(np.int16)
    batch = audio_io.pack_batch([a, b], 12)
    assert batch.dtype == np.int16 and batch.shape == (2, 12)
    np.testing.assert_array_equal(batch[0, :10], a)
    assert batch[1, 7:].sum() == 0
    # mixed: int16 rows are normalized into the float batch
    c = rng.uniform(-0.5, 0.5, 9).astype(np.float32)
    batch = audio_io.pack_batch([a, c], 12, n_rows=3)
    assert batch.dtype == np.float32 and batch.shape == (3, 12)
    np.testing.assert_allclose(batch[0, :10], a.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(batch[1, :9], c)


def test_scale_wav_diatonic_content(tmp_path):
    """scale_wav's notes stay inside the key's diatonic pitch-class set
    (checked by FFT peak per note), and different seeds give different
    walks."""
    import numpy.fft as fft
    p1 = str(tmp_path / "a.wav")
    p2 = str(tmp_path / "b.wav")
    synthetic.scale_wav(p1, 7, False, seconds=4.0, seed=3)   # G major
    synthetic.scale_wav(p2, 7, False, seconds=4.0, seed=4)
    y1, sr = audio_io.decode_audio(p1)
    y2, _ = audio_io.decode_audio(p2)
    assert not np.array_equal(y1, y2)
    g_major = {7, 9, 11, 0, 2, 4, 6}
    note = int(0.25 * sr)
    hits = 0
    for i in range(4 * 4):
        seg = y1[i * note: (i + 1) * note]
        if np.abs(seg).max() < 1e-3:
            continue
        spec = np.abs(fft.rfft(seg * np.hanning(len(seg))))
        f0 = np.argmax(spec) * sr / len(seg)
        if f0 < 20:
            continue
        pc = int(round(12 * np.log2(f0 / 440.0) + 9)) % 12
        assert pc in g_major, (i, f0, pc)
        hits += 1
    assert hits >= 10


def test_local_oracle_ceiling_analysis(tmp_path):
    """scripts/local_ceiling_analysis.py smoke: on a corpus with no
    modulations the oracle is perfect; with a mid-song modulation the
    ceiling drops below 1.0 but stays far above chance."""
    import importlib
    mod = importlib.import_module("scripts.local_ceiling_analysis")

    pure = str(tmp_path / "pure")
    songs = [("HU33", "D911-01", 220.0, "C:maj"),
             ("HU33", "D911-02", 220.0, "A:min")]
    synthetic.make_winterreise_corpus(pure, songs, seconds=40.0)
    agg = mod.main(pure)
    assert agg["mirex"] == pytest.approx(1.0)

    mixed = str(tmp_path / "mixed")
    segs = {"HU33_D911-01": [(0.0, 20.0, "C:maj"), (20.0, 40.0, "G:maj")],
            "HU33_D911-02": [(0.0, 25.0, "A:min"), (25.0, 40.0, "E:min")]}
    synthetic.make_winterreise_corpus(mixed, songs, local_segments=segs,
                                      seconds=40.0)
    agg = mod.main(mixed)
    assert 0.5 < agg["mirex"] < 1.0
