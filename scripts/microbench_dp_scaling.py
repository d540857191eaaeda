"""DP scaling sanity on the virtual 8-device CPU mesh (VERDICT r1 item 4).

Same GLOBAL batch through the flagship train step on a 1-device vs an
8-device ('data',) mesh. On this 1-core host all virtual devices share one
core, so wall-clock parity (ratio ~1.0) is the PASS signal: it proves the
SPMD partitioning adds no duplicated compute or pathological collectives —
the psum all-reduce is the only inter-device traffic. Real ICI scaling
needs real chips; this pins the program structure the driver's
MULTICHIP dryrun compiles.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/microbench_dp_scaling.py
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("_AKX_DP_CHILD") != "1":
    # sitecustomize registers the TPU plugin BEFORE this script body runs,
    # so env vars set here are too late — re-exec in a scrubbed CPU env
    # (same pattern as __graft_entry__.dryrun_multichip).
    env = os.environ.copy()
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["_AKX_DP_CHILD"] = "1"
    env.pop("JAX_PLATFORM_NAME", None)
    for k in list(env):
        if "AXON" in k or k.startswith(("TPU_", "LIBTPU")):
            env.pop(k)
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        env=env, cwd=REPO).returncode)

import jax
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import (create_train_state,
                                                    make_train_step)

GLOBAL_BS = 16
ACC = 2
T = 128  # bucketed time frames; small enough for repeated CPU steps


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(n_devices: int) -> float:
    cfg = Config(batch_size=GLOBAL_BS, acc_grad=ACC,
                 mesh_shape=(n_devices,))
    optimizer = make_optimizer(cfg, steps_per_epoch=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      optimizer, time_frames=T)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    state = replicate(state, mesh)
    step = make_train_step(model, cfg, optimizer)
    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.standard_normal(
            (ACC, GLOBAL_BS, cfg.pitches, T, 1)).astype(np.float32),
        "key_labels": (rng.random((ACC, GLOBAL_BS, 12)) < 0.5)
        .astype(np.float32),
        "tonic_labels": np.eye(12, dtype=np.float32)[
            rng.integers(0, 12, (ACC, GLOBAL_BS))],
        "seq_length": np.full((ACC, GLOBAL_BS), T, np.int32),
    }
    batch = shard_batch(batch, mesh, batch_dim=1)
    t0 = time.perf_counter()
    state, m = step(state, batch)
    float(m["loss"])
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    log(f"devices={n_devices}: {best * 1e3:8.1f} ms/step "
        f"(global bs {GLOBAL_BS} x{ACC} acc, compile {comp:.0f}s, "
        f"loss {float(m['loss']):.4f})")
    return best


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    t1 = run(1)
    t8 = run(8)
    ratio = t8 / t1
    log(f"8-device / 1-device wall ratio at fixed global batch: "
        f"{ratio:.2f} (1-core host: ~1.0 = SPMD adds no duplicated work)")
    print(f"{{\"dp_wall_ratio_8v1\": {ratio:.3f}}}")


if __name__ == "__main__":
    main()
