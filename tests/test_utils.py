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


def test_prefetch_releases_producer_on_abandoned_consumer():
    """Breaking out of a prefetch loop must not leave the producer thread
    blocked on the bounded queue forever."""
    import threading
    import time as _time
    from audio_key_estimation_tpu.data.pipeline import prefetch

    started = threading.active_count()
    gen = prefetch(iter(range(100)), size=1)
    assert next(gen) == 0
    gen.close()   # consumer abandons mid-stream
    deadline = _time.time() + 5.0
    while threading.active_count() > started and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= started


def test_merge_eval_config_keeps_runtime_fields():
    from audio_key_estimation_tpu.config import Config, merge_eval_config
    saved = Config(octaves=4, n_filters=2, data_root="/old/corpus",
                   no_test=False, batch_size=8)
    cli = Config(octaves=8, n_filters=4, data_root="/new/corpus",
                 no_test=True, batch_size=2)
    merged = merge_eval_config(cli, saved)
    assert merged.octaves == 4 and merged.n_filters == 2   # checkpoint wins
    assert merged.data_root == "/new/corpus"               # runtime wins
    assert merged.no_test is True and merged.batch_size == 2
