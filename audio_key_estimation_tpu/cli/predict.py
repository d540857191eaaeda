"""Prediction CLI — the serving face of the framework.

    python -m audio_key_estimation_tpu.cli.predict song.wav ...        \\
        --version N [--log_dir Model_logs]
    python -m audio_key_estimation_tpu.cli.predict song.wav --torch_ckpt best_model.pt
    python -m audio_key_estimation_tpu.cli.predict song.wav --version N --local_windows

The reference has no inference entry point short of eval.py over a whole
corpus; this prints, per input file, the estimated key (and genre when the
model has a genre head), or the per-window key timeline with
--local_windows. Checkpoint config wins over CLI architecture flags.
"""

from __future__ import annotations

import argparse
import os

from ..config import add_config_args, config_from_args
from ..predict import KeyEstimator
from ..train import checkpoints as ckpt_lib


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Estimate musical key from audio files",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_config_args(parser)
    parser.add_argument("files", nargs="+", help="wav/mp3 files")
    parser.add_argument("--version", type=int, default=-1,
                        help="trained version number under --log_dir")
    parser.add_argument("--torch_ckpt", type=str, default="",
                        help="port a reference best_model.pt (architecture "
                             "flags must then match training)")
    parser.add_argument("--local_windows", action="store_true",
                        help="per-window key timeline (local mode)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    if args.torch_ckpt:
        est = KeyEstimator.from_torch_checkpoint(args.torch_ckpt, cfg)
    else:
        run_dir = ckpt_lib.version_dir(
            os.path.join(cfg.log_dir, "lightning_logs"), args.version)
        est = KeyEstimator.from_checkpoint(run_dir)

    results = {}
    if args.local_windows:
        for path, pred in zip(args.files,
                              est.predict_files_local(args.files)):
            print(path)
            for w in pred.windows:
                print(f"  {w.start:7.2f}-{w.end:7.2f}s  {w.key:24s} "
                      f"(conf {w.confidence:.3f})")
            results[path] = pred
    else:
        for path, pred in zip(args.files, est.predict_files(args.files)):
            genre = f"  genre={pred.genre}" if pred.genre else ""
            print(f"{path}: {pred.key}  (conf {pred.confidence:.3f}){genre}")
            results[path] = pred
    return results


if __name__ == "__main__":
    main()
