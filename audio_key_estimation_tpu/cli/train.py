"""Train CLI (reference train_model.py).

    python -m audio_key_estimation_tpu.cli.train --data_root ../Data [flags]

All flags come from the shared Config dataclass (no per-CLI drift); results
land under <log_dir>/version_N/ (orbax best_model + config.json +
metrics.csv) and a Tuning_results_Experiment_1.csv row is appended, matching
the reference's outputs (train_model.py:126-154).
"""

from __future__ import annotations

import argparse
import os

from ..config import add_config_args, config_from_args
from ..train import checkpoints as ckpt_lib
from ..train.trainer import Trainer, evaluate
from ..utils.logging import MetricsLogger, write_tuning_results
from .datasets import build_train_val


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native PitchClassNet training",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_config_args(parser)
    parser.add_argument("--resume_version", type=int, default=-1,
                        help="resume mid-training from this version dir")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    if cfg.debug:
        cfg = cfg.replace(batch_size=2, acc_grad=1)  # train_model.py:88-91

    train_data, val_data = build_train_val(cfg)
    if args.resume_version >= 0:
        run_dir = ckpt_lib.version_dir(
            os.path.join(cfg.log_dir, "lightning_logs"), args.resume_version)
    else:
        run_dir = ckpt_lib.next_version_dir(os.path.join(cfg.log_dir,
                                                         "lightning_logs"))
    logger = MetricsLogger(run_dir)
    trainer = Trainer(cfg, train_data, val_data, log_dir=run_dir)
    state, history = trainer.fit(seed=cfg.seed, metrics_writer=logger,
                                 resume=args.resume_version >= 0)

    # final validation with the best checkpoint (train_model.py:123-124)
    if not cfg.no_ckpt and os.path.exists(os.path.join(run_dir, "best_model")):
        best, _ = ckpt_lib.load(run_dir)
        model_state = state.replace(params=best["params"],
                                    batch_stats=best["batch_stats"])
    else:
        model_state = state
    val = evaluate(trainer.eval_step, model_state, val_data, cfg.batch_size)
    print({f"val_{k}": v for k, v in val.items()})
    write_tuning_results(os.path.join(os.getcwd(),
                                      "Tuning_results_Experiment_1.csv"),
                         cfg, val)
    logger.close()
    return val


if __name__ == "__main__":
    main()
