"""Round-3 microbenchmarks: HBM bandwidth ceiling + model dtype at B=256.

1. Raw HBM streaming bandwidth (x*1.001 over 1 GB) — establishes the wall
   the memory-bound front-end sits against on this (relay-attached) chip.
2. PitchClassNet forward at the bench geometry (B=256, T=601): f32 vs
   bf16 compute. At B=16 the convs are per-tile-overhead-bound and bf16
   is a wash (perflogs/profile_model3.log); at B=256 the tiles fill, so
   the bf16 MXU path (4x f32 peak) may finally pay.

Run serially (one TPU process at a time).
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

REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps=REPS, inner=1):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(o)
    dt = (time.perf_counter() - t0) / reps / inner
    log(f"{name:44s} {dt * 1e3:9.2f} ms/op  (compile {compile_s:.1f}s)")
    return dt


def bench_hbm():
    n = 256 * 1024 * 1024  # 1 GB f32
    x = jnp.ones((n,), jnp.float32)
    inner = 4

    @jax.jit
    def stream(x):
        def body(c, _):
            return c * 1.000001 + 1e-9, None
        out, _ = jax.lax.scan(body, x, None, length=inner)
        return out.reshape(-1, 4096)[::4096, :].sum()

    dt = timed("HBM stream 1GB (read+write)", stream, x, inner=inner)
    gb = n * 4 * 2 / 1e9
    log(f"  -> effective bandwidth {gb / dt:.0f} GB/s")


def bench_model():
    cfg = Config()
    B, T = 256, 601
    mel = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, cfg.pitches, T, 1)).astype(np.float32))
    seq = jnp.full((B,), T, jnp.int32)
    for name, dtype in (("f32", "float32"), ("bf16", "bfloat16")):
        c = cfg.replace(dtype=dtype)
        model = PitchClassNet(c, dtype=jnp.dtype(dtype))
        variables = model.init(jax.random.PRNGKey(0), mel[:1], seq[:1], False)
        fn = jax.jit(lambda m, s, v=variables, mo=model:
                     sum(jnp.sum(o.astype(jnp.float32))
                         for o in mo.apply(v, m, s, False)))
        timed(f"model B={B} T={T} {name}", fn, mel, seq)


if __name__ == "__main__":
    dev = jax.devices()[0]
    log(f"microbench on {dev.device_kind} ({dev.platform})")
    bench_hbm()
    bench_model()
