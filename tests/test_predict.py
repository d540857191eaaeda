"""Serving API: key naming and batched file prediction."""

import numpy as np
import pytest

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.predict import (KeyEstimator, Prediction,
                                              key_name)
from audio_key_estimation_tpu.utils.key_signatures import KEY_SIGNATURE_MAP
from audio_key_estimation_tpu.data.synthetic import sine_wav
from audio_key_estimation_tpu.train import checkpoints as ckpt_lib
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import create_train_state

import jax


def test_key_name_major_and_relative_minor():
    c_major = KEY_SIGNATURE_MAP[7]
    tonic_c = np.eye(12)[0]
    info = key_name(c_major, tonic_c)
    assert info["key"] == "C major" and info["signature_row"] == 7

    tonic_a = np.eye(12)[9]
    info = key_name(c_major, tonic_a)
    assert info["key"] == "A minor"

    tonic_d = np.eye(12)[2]  # disagreeing tonic
    info = key_name(c_major, tonic_d)
    assert "signature" in info["key"]


def test_key_name_all_rows_consistent():
    # enharmonic rows share identical vectors (Cb==B, Gb==F#, Db==C#), so the
    # matched row may be the first duplicate — the NAME must still be right
    # because the tonic disambiguates
    from audio_key_estimation_tpu.predict import NOTE_NAMES
    for row in range(15):
        sig = KEY_SIGNATURE_MAP[row]
        maj_tonic = (11 + 7 * row) % 12
        maj = key_name(sig, np.eye(12)[maj_tonic])
        assert maj["key"] == f"{NOTE_NAMES[maj_tonic]} major"
        rel_tonic = (maj_tonic + 9) % 12
        rel = key_name(sig, np.eye(12)[rel_tonic])
        assert rel["key"] == f"{NOTE_NAMES[rel_tonic]} minor"


def test_predict_files_end_to_end(tmp_path):
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1, genre=True)
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = str(tmp_path / "version_0")
    import os
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)

    paths = []
    for i, f in enumerate((261.6, 440.0)):
        p = str(tmp_path / f"s{i}.wav")
        sine_wav(p, f, seconds=3.0)
        paths.append(p)

    est = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(4,))
    preds = est.predict_files(paths, return_raw=True)
    assert len(preds) == 2
    for p in preds:
        assert isinstance(p, Prediction)
        assert p.key and p.tonic in [n for n in
                                     ("C C# D D# E F F# G G# A A# B".split())]
        assert p.genre is not None
        assert p.key_probs.shape == (12,)


def test_predict_multi_scale_round_trip(tmp_path):
    """A multi_scale checkpoint must serve through the two-scale ensemble
    (reference models.py:1118-1189 has eval-only support; serving must not
    silently build the single-scale model) and reject a config/params
    architecture mismatch loudly."""
    import os

    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1, multi_scale=True,
                 loc_window_size=1)
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = str(tmp_path / "version_0")
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)

    paths = []
    for i, f in enumerate((261.6, 440.0)):
        p = str(tmp_path / f"s{i}.wav")
        sine_wav(p, f, seconds=3.0)
        paths.append(p)

    est = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(4,))
    from audio_key_estimation_tpu.models import PitchClassNetMulti
    assert isinstance(est.model, PitchClassNetMulti)
    preds = est.predict_files(paths)
    assert len(preds) == 2
    for p in preds:
        assert p.key and p.tonic in "C C# D D# E F F# G G# A A# B".split()

    # local-mode serving through the ensemble
    local = est.predict_files_local(paths)
    assert len(local) == 2 and local[0].windows

    # mismatched config (single-scale) against ensemble params -> loud error
    with pytest.raises(ValueError, match="multi_scale"):
        KeyEstimator(cfg.replace(multi_scale=False),
                     {"params": state.params,
                      "batch_stats": state.batch_stats})


def test_predict_local_windows(tmp_path):
    """Local-mode serving: per-window key sequences with correct window
    timing (loc_window_size seconds every 1/frames seconds)."""
    import os
    from audio_key_estimation_tpu.predict import LocalPrediction
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1, frames=5, loc_window_size=2)
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = str(tmp_path / "version_0")
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)

    p = str(tmp_path / "s.wav")
    sine_wav(p, 330.0, seconds=5.0)

    est = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(6,))
    (pred,) = est.predict_files_local([p], return_raw=True)
    assert isinstance(pred, LocalPrediction)
    # 5 s at 5 fps -> seq = 1 + 5*5 = 26 frames; windows = 26 - 2*5 + 1 = 17
    assert len(pred.windows) == 17
    w0 = pred.windows[0]
    assert w0.start == 0.0 and w0.end == 2.0
    assert abs(pred.windows[1].start - 0.2) < 1e-9
    assert pred.key_probs.shape == (17, 12)
    assert all(w.key for w in pred.windows)


def test_predict_sharded_matches_single_device(tmp_path):
    """DP-sharded inference (mesh over 8 virtual devices): predictions are
    identical to the unsharded path, including with a clip count that does
    not divide the mesh (repeat/zero padding masked out)."""
    import os
    from audio_key_estimation_tpu.parallel.mesh import make_mesh
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1)
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = str(tmp_path / "version_0")
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)

    paths = []
    for i, f in enumerate((261.6, 440.0, 330.0)):   # 3 clips, mesh of 8
        p = str(tmp_path / f"s{i}.wav")
        sine_wav(p, f, seconds=3.0)
        paths.append(p)

    est1 = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(4,))
    est8 = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(4,),
                                        mesh=make_mesh((8,)))
    p1 = est1.predict_files(paths, return_raw=True)
    p8 = est8.predict_files(paths, return_raw=True)
    assert len(p8) == 3
    for a, b in zip(p1, p8):
        assert a.key == b.key and a.tonic == b.tonic
        np.testing.assert_allclose(a.key_probs, b.key_probs, rtol=2e-4,
                                   atol=2e-5)


def test_predict_cli(tmp_path, capsys):
    """CLI surface: global prediction and --local_windows timeline."""
    import os
    from audio_key_estimation_tpu.cli import predict as predict_cli
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1, frames=5, loc_window_size=2,
                 log_dir=str(tmp_path / "Model_logs"))
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = os.path.join(cfg.log_dir, "lightning_logs", "version_0")
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)
    wav = str(tmp_path / "song.wav")
    sine_wav(wav, 261.6, seconds=3.0)

    base = [wav, "--version", "0", "--log_dir", cfg.log_dir]
    res = predict_cli.main(base)
    assert wav in res and res[wav].key
    out = capsys.readouterr().out
    assert "conf" in out

    res = predict_cli.main(base + ["--local_windows"])
    assert len(res[wav].windows) > 0
    assert "s  " in capsys.readouterr().out


def test_predict_raw_pcm16_matches_float_waveforms(tmp_path):
    """predict_files (raw PCM16 ingestion, device-side normalization) gives
    the same probabilities as predict_waveforms on host-normalized floats."""
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1, genre=True)
    optimizer = make_optimizer(cfg, 1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    run_dir = str(tmp_path / "version_0")
    import os
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)

    p = str(tmp_path / "s.wav")
    sine_wav(p, 329.6, seconds=3.0)
    est = KeyEstimator.from_checkpoint(run_dir, bucket_seconds=(4,))
    from audio_key_estimation_tpu.data import audio_io
    y_raw, sr = audio_io.decode_audio(p, raw=True)
    assert y_raw.dtype == np.int16
    via_files = est.predict_files([p], return_raw=True)[0]
    via_floats = est.predict_waveforms(
        [y_raw.astype(np.float32) / 32768.0], sr, return_raw=True)[0]
    np.testing.assert_allclose(via_files.key_probs, via_floats.key_probs,
                               rtol=1e-4, atol=1e-5)
    assert via_files.key == via_floats.key
