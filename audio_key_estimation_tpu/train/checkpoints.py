"""Orbax checkpointing with the serialized Config embedded.

Replaces the reference's raw torch.save of a state_dict (models.py:991-993)
and its eval-time "architecture flags must match manually" caveat
(README.md:150): the Config is stored next to the weights and re-read at
load time, so eval can never run a mismatched architecture.

Directory scheme mirrors Lightning's auto-versioning
(Model_logs/lightning_logs/version_N — eval.py:132-136):
  <log_dir>/version_<N>/<name>/      orbax pytree (params/batch_stats/...)
  <log_dir>/version_<N>/config.json
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


def next_version_dir(log_dir: str) -> str:
    os.makedirs(log_dir, exist_ok=True)
    versions = []
    for d in glob.glob(os.path.join(log_dir, "version_*")):
        m = re.match(r".*version_(\d+)$", d)
        if m:
            versions.append(int(m.group(1)))
    v = max(versions) + 1 if versions else 0
    path = os.path.join(log_dir, f"version_{v}")
    os.makedirs(path, exist_ok=True)
    return path


def version_dir(log_dir: str, version: int) -> str:
    """Lightning-style run directory; version < 0 selects the latest one."""
    if version < 0:
        existing = sorted(
            (int(d.split("_", 1)[1]) for d in os.listdir(log_dir)
             if d.startswith("version_") and d.split("_", 1)[1].isdigit()),
        ) if os.path.isdir(log_dir) else []
        if not existing:
            raise FileNotFoundError(
                f"no version_N runs under {log_dir!r}; pass --version "
                "or train first")
        version = existing[-1]
    return os.path.join(log_dir, f"version_{version}")


def save(run_dir: str, state, cfg: Config, name: str = "best_model") -> str:
    """Save train state + config under run_dir/name."""
    path = os.path.abspath(os.path.join(run_dir, name))
    tree = {"params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "step": int(state.step)}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    return path


def load(run_dir: str, name: str = "best_model") -> Tuple[dict, Optional[Config]]:
    """Returns ({'params', 'batch_stats', 'step'}, Config or None)."""
    path = os.path.abspath(os.path.join(run_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    cfg = None
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = Config.from_json(f.read())
    return tree, cfg


def save_train_state(run_dir: str, state, cfg: Config, epoch: int,
                     extra: Optional[dict] = None,
                     name: str = "last_state.msgpack") -> str:
    """Full-fidelity training snapshot (params + batch_stats + opt_state +
    step) for mid-training resume — a capability the reference lacks
    entirely (its two checkpoint paths are save-only, SURVEY.md §5)."""
    from flax import serialization
    os.makedirs(run_dir, exist_ok=True)
    payload = {"state": jax.device_get(state), "epoch": epoch,
               "extra": extra or {}}
    path = os.path.join(run_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    return path


def load_train_state(run_dir: str, state_template,
                     name: str = "last_state.msgpack"):
    """Restore (state, epoch, extra) into the given TrainState template."""
    from flax import serialization
    path = os.path.join(run_dir, name)
    with open(path, "rb") as f:
        data = f.read()
    template = {"state": state_template, "epoch": 0, "extra": {}}
    payload = serialization.from_bytes(template, data)
    return payload["state"], payload["epoch"], payload["extra"]


def load_torch_state_dict(path: str) -> dict:
    """Read a reference best_model.pt (torch state_dict) into numpy arrays.

    Requires torch only at call time; the result feeds
    models.torch_port.state_dict_to_variables.
    """
    import torch
    sd = torch.load(path, map_location="cpu")
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}
