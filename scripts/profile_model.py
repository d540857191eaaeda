"""Model-side profiling: where do the ~170 ms/step (8 chunks) go?

Times PitchClassNet forward variants on the current device with on-device
scan amortization (the axon relay adds ~30 ms per dispatch), plus HLO size
stats to explain compile time (VERDICT r1 weak #5).
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
from audio_key_estimation_tpu.models import PitchClassNet

BATCH = 16
T = 601
INNER = 8
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / REPS / INNER
    log(f"{name:44s} {dt * 1e3:8.2f} ms/op  (compile {compile_s:.1f}s)")
    return dt


def amortized_model(cfg, variables, seq, dtype=jnp.float32):
    model = PitchClassNet(cfg, dtype=dtype)

    @jax.jit
    def run(mel):
        def body(acc, i):
            out = model.apply(variables, mel + i.astype(mel.dtype) * 1e-6,
                              seq, False)
            return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return acc
    return run


def hlo_stats(cfg, variables, mel, seq, dtype=jnp.float32):
    model = PitchClassNet(cfg, dtype=dtype)
    lowered = jax.jit(
        lambda m, s: model.apply(variables, m, s, False)).lower(mel, seq)
    txt = lowered.as_text()
    return len(txt.splitlines()), txt.count(" convolution"), txt.count(
        "reduce_window")


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"profiling on {dev.device_kind} ({dev.platform})")

    for name, kw, dtype in (
            ("default f32", {}, jnp.float32),
            ("default bf16 compute", {"dtype": "bfloat16"}, jnp.bfloat16),
            ("no-mask (seq=None) f32", {}, jnp.float32),
            ("remat f32", {"remat": True}, jnp.float32),
    ):
        cfg = Config(**kw)
        model = PitchClassNet(cfg, dtype=dtype)
        mel0 = jnp.zeros((1, cfg.pitches, T, 1), dtype)
        seq0 = jnp.full((1,), T, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), mel0, seq0, False)
        mel = jax.device_put(jnp.asarray(
            rng.normal(size=(BATCH, cfg.pitches, T, 1)).astype(np.float32),
            ).astype(dtype), dev)
        seq = (None if name.startswith("no-mask")
               else jax.device_put(jnp.full((BATCH,), T, jnp.int32), dev))
        fn = amortized_model(cfg, variables, seq, dtype)
        timed(f"model {name}", fn, mel)

    cfg = Config()
    model = PitchClassNet(cfg)
    mel0 = jnp.zeros((1, cfg.pitches, T, 1), jnp.float32)
    seq0 = jnp.full((1,), T, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), mel0, seq0, False)
    mel = jnp.zeros((BATCH, cfg.pitches, T, 1), jnp.float32)
    seq = jnp.full((BATCH,), T, jnp.int32)
    lines, convs, rws = hlo_stats(cfg, variables, mel, seq)
    log(f"HLO: {lines} lines, {convs} convolutions, {rws} reduce_windows")


if __name__ == "__main__":
    main()
