"""Frame-table (time-major) Pallas CQT vs the XLA strided-conv path at
bench geometry (B=256, 2-min int16 clips) — the round-2 VERDICT item-2
decider.

The XLA path's strided VALID convs read every padded stream in full
(~20 GB/step incl. cascade, 72 ms with bf16 operands); the kernel DMAs
only contiguous (win, B) frame windows of the time-major signal
(~0.6 GB/step). Measured on TPU v5e: pallas-bf16 81.3 ms vs xla-bf16
91.6 ms (+12.6%). Reports cqt-alone ms/step for:
  xla-f32, xla-bf16, pallas-f32, pallas-bf16 (product default on TPU).
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

from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
SECONDS = 120
B = int(os.environ.get("AKX_B", 256))
REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps=REPS):
    t0 = time.perf_counter()
    r0 = fn(*args)
    s0 = float(jnp.sum(r0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(jnp.sum(o))
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:24s} {dt * 1e3:9.2f} ms/step  (compile {compile_s:.1f}s, "
        f"checksum {s0:.6g})")
    return dt, s0


def main():
    dev = jax.devices()[0]
    log(f"pallas sparse vs xla on {dev.device_kind} ({dev.platform}), "
        f"B={B}")
    p = CQTParams(sr=SR, hop=4410, bins_per_octave=36, octaves=8)
    L = SR * SECONDS
    rng = np.random.default_rng(0)
    y16 = jax.device_put(jnp.asarray(
        (rng.uniform(-0.5, 0.5, (B, L)) * 32767).astype(np.int16)), dev)

    fns = {
        "xla-f32": jax.jit(lambda y: cqt(y, p, conv_dtype=jnp.float32)),
        "xla-bf16": jax.jit(lambda y: cqt(y, p, conv_dtype=jnp.bfloat16)),
        "pallas-f32": jax.jit(lambda y: cqt_pallas(y, p)),
        "pallas-bf16": jax.jit(
            lambda y: cqt_pallas(y, p, stream_dtype=jnp.bfloat16)),
    }
    results = {}
    ref = None
    for name, fn in fns.items():
        try:
            dt, _ = timed(name, fn, y16)
            results[name] = dt
            if name == "xla-f32":
                ref = np.asarray(fn(y16[:2]))
            elif ref is not None:
                got = np.asarray(fn(y16[:2]))
                err = np.max(np.abs(got - ref)) / max(np.max(ref), 1e-9)
                log(f"  {name} vs xla-f32 max rel err: {err:.2e}")
        except Exception as e:
            log(f"{name} FAILED: {e!r}")
    if "xla-bf16" in results and "pallas-bf16" in results:
        m = (results["xla-bf16"] / results["pallas-bf16"] - 1) * 100
        log(f"pallas-bf16 vs xla-bf16 margin: {m:+.1f}% "
            "(positive = pallas faster)")
    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
