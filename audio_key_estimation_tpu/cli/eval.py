"""Eval CLI (reference eval.py).

    python -m audio_key_estimation_tpu.cli.eval --version N [--data_root ...]
    python -m audio_key_estimation_tpu.cli.eval --torch_ckpt best_model.pt

Loads the checkpoint AND its serialized Config (so architecture flags cannot
mismatch — fixes README.md:150's caveat), rebuilds the reference test sets
and prints the per-set MIREX breakdown. --torch_ckpt ports a reference
PyTorch state_dict through models/torch_port.py instead.
"""

from __future__ import annotations

import argparse
import os

import jax

from ..config import (Config, add_config_args, config_from_args,
                      merge_eval_config)
from ..models.torch_port import state_dict_to_variables
from ..train import checkpoints as ckpt_lib
from ..train.optim import make_optimizer
from ..train.trainer import create_train_state, evaluate, make_eval_step
from .datasets import build_test_sets, build_train_val


def load_state(cfg: Config, args):
    optimizer = make_optimizer(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    if args.torch_ckpt:
        sd = ckpt_lib.load_torch_state_dict(args.torch_ckpt)
        template = {"params": state.params, "batch_stats": state.batch_stats}
        variables = state_dict_to_variables(sd, template)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        return cfg, model, state
    run_dir = ckpt_lib.version_dir(
        os.path.join(cfg.log_dir, "lightning_logs"), args.version)
    tree, saved_cfg = ckpt_lib.load(run_dir)
    if saved_cfg is not None:
        # checkpoint wins for model-defining fields, the command line for
        # runtime fields (data_root, batch_size, no_test, ...)
        merged = merge_eval_config(cfg, saved_cfg)
        if merged != cfg:
            cfg = merged
            optimizer = make_optimizer(cfg, 1)
            model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                              optimizer)
    state = state.replace(params=tree["params"],
                          batch_stats=tree["batch_stats"])
    return cfg, model, state


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native PitchClassNet evaluation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_config_args(parser)
    parser.add_argument("--version", type=int, default=-1,
                        help="trained version number to evaluate")
    parser.add_argument("--torch_ckpt", type=str, default="",
                        help="port and evaluate a reference best_model.pt")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    cfg, model, state = load_state(cfg, args)
    eval_step = make_eval_step(model, cfg)

    _, val_data = build_train_val(cfg)
    print("Result of Validation set")
    print(evaluate(eval_step, state, val_data, max(cfg.batch_size, 1)))
    results = {}
    if not cfg.no_test and not cfg.debug:
        for name, ds in build_test_sets(cfg).items():
            print(f"Result of {name} set")
            results[name] = evaluate(eval_step, state, ds,
                                     max(cfg.batch_size, 1))
            print(results[name])
    return results


if __name__ == "__main__":
    main()
