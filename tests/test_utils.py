"""Config serialization, metrics logging, throughput meter."""

import csv
import os

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.utils.logging import (MetricsLogger,
                                                    write_tuning_results)
from audio_key_estimation_tpu.utils.profiling import ThroughputMeter


def test_config_json_roundtrip():
    cfg = Config(octaves=5, denseblock=True, bucket_sizes=(128, 256),
                 lr=1e-3, mesh_shape=(4,))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_derived_properties():
    assert Config(octaves=8).pitches == 288
    assert Config(octaves=8, only_semitones=True).pitches == 96
    assert Config().bins_per_octave == 36


def test_metrics_logger_csv(tmp_path):
    lg = MetricsLogger(str(tmp_path), tensorboard=False)
    lg({"epoch": 0, "train_loss": 1.5, "val_mirex": 0.2})
    lg({"epoch": 1, "train_loss": 1.0, "val_mirex": 0.4})
    lg.close()
    with open(tmp_path / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 and rows[1]["val_mirex"] == "0.4"


def test_write_tuning_results(tmp_path):
    path = str(tmp_path / "Tuning_results_Experiment_1.csv")
    row = write_tuning_results(path, Config(), {"mirex": 0.5, "loss": 1.0})
    assert os.path.exists(path)
    assert row["effective_batch_size"] == 64  # bs 8 x acc_grad 8


def test_throughput_meter():
    m = ThroughputMeter()
    m.start()
    m.stop(audio_seconds=60.0)
    assert m.audio_min_per_sec > 0
    assert m.per_chip(2) == m.audio_min_per_sec / 2
