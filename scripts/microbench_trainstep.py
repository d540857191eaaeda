"""Training-step throughput at production batch sizes on the real chip.

Flagship geometry (octaves=8, 2 layers, conv_layers=3, n_filters=4, k=7,
T=601 = 2-minute songs at frames=5), synthetic features; the FULL
train_step (fwd + bwd + Adam + BatchNorm carry + grad-accum scan) with 3
stacked microbatches per dispatch, so the per-microbatch time is
amortized over the ~28 ms relay round trip. Run serially.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import (create_train_state,
                                                    make_train_step)

ACC = 3
T = 601


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = Config(dtype=os.environ.get("AKX_DTYPE", "float32"))
    dev = jax.devices()[0]
    log(f"train-step throughput on {dev.device_kind} ({dev.platform}), "
        f"compute dtype {cfg.dtype}")
    rng = np.random.default_rng(0)
    sizes = tuple(int(x) for x in
                  os.environ.get("AKX_BS", "8,32,64").split(","))
    for bs in sizes:
        optimizer = make_optimizer(cfg, steps_per_epoch=100)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          optimizer, time_frames=T)
        step = make_train_step(model, cfg, optimizer)
        batch = {
            "mel": jnp.asarray(rng.standard_normal(
                (ACC, bs, cfg.pitches, T, 1)).astype(np.float32)),
            "key_labels": jnp.asarray((rng.random((ACC, bs, 12)) < 0.5)
                                      .astype(np.float32)),
            "tonic_labels": jnp.asarray(np.eye(12, dtype=np.float32)[
                rng.integers(0, 12, (ACC, bs))]),
            "seq_length": jnp.full((ACC, bs), T, jnp.int32),
        }
        t0 = time.perf_counter()
        state2, m = step(state, batch)
        float(m["loss"])
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            st = state2
            t0 = time.perf_counter()
            st, m = step(st, batch)
            float(m["loss"])
            best = min(best, time.perf_counter() - t0)
            state2 = st
        per = best / ACC
        # training MFU: XLA-reported FLOPs of the compiled step over the
        # f32 MXU peak (49.2 TF/s on v5e; same convention as bench.py)
        try:
            ca = jax.jit(step).lower(state, batch).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception as e:
            log(f"cost_analysis unavailable: {e!r}")
            flops = 0.0
        mfu = flops / best / 49.2e12 if flops else float("nan")
        log(f"bs={bs:3d} (x{ACC} microbatches/dispatch): "
            f"{per * 1e3:7.1f} ms/microbatch -> {bs / per:6.1f} songs/s "
            f"({bs * 2 / per:7.1f} audio-min/s) full train step "
            f"(compile {comp:.0f}s, {flops / 1e9:.0f} GF/step, "
            f"train MFU {mfu * 100:.1f}% of f32 peak)")


if __name__ == "__main__":
    main()
