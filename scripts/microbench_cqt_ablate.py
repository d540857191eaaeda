"""Ablate the XLA CQT front-end at bench geometry (B=256, 2-min clips).

Attributes the ~87 ms cqt-alone time to: downsample cascade, frame
staging, response einsums, magnitude+scale epilogue. Also measures an
int16 vs f32 input delta and a bf16-response variant.

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

from audio_key_estimation_tpu.ops.cqt import (CQTParams, cqt, downsample2,
                                              halfband_taps, kernel_bank,
                                              interleave_streams,
                                              octave_frames, stream_plan)

SR = 22050
SECONDS = 120
B = 256
REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps=REPS):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(o)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:46s} {dt * 1e3:9.2f} ms  (compile {compile_s:.1f}s)")
    return dt


def main():
    p = CQTParams(sr=SR, hop=4410, bins_per_octave=36, octaves=8)
    L = SR * SECONDS
    rng = np.random.default_rng(0)
    y16 = (rng.uniform(-0.5, 0.5, (B, L)) * 32767).astype(np.int16)
    y16 = jnp.asarray(y16)
    yf = (y16.astype(jnp.float32) / 32768.0)
    jax.block_until_ready(yf)
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]],
                                      axis=1))
    n_frames = 1 + L // p.hop
    taps = jnp.asarray(halfband_taps())

    @jax.jit
    def cascade_only(y):
        cur = y.astype(jnp.float32)
        acc = 0.0
        for o in range(p.octaves):
            if o > 0:
                cur = downsample2(cur, taps)
            acc += jnp.sum(cur[:, :8])
        return acc

    @jax.jit
    def cascade_frames(y):
        cur = y.astype(jnp.float32)
        acc = 0.0
        for o in range(p.octaves):
            if o > 0:
                cur = downsample2(cur, taps)
            plan = stream_plan(p.hop, o, n_fft, n_frames)
            fr = octave_frames(cur, plan, n_fft)
            acc += jnp.sum(fr[..., ::512])  # touch every frame row
        return acc

    def full(y, dtype):
        cur = y.astype(jnp.float32)
        octs = []
        for o in range(p.octaves):
            if o > 0:
                cur = downsample2(cur, taps)
            plan = stream_plan(p.hop, o, n_fft, n_frames)
            fr = octave_frames(cur, plan, n_fft).astype(dtype)
            r = jnp.einsum("bqtn,nk->bqtk", fr, kmat.astype(dtype),
                           preferred_element_type=jnp.float32)
            mag = jnp.sqrt(r[..., :36] ** 2 + r[..., 36:] ** 2)
            octs.append(interleave_streams(mag, plan, n_frames))
        return sum(jnp.sum(o) for o in octs)

    full_f32 = jax.jit(lambda y: full(y, jnp.float32))
    full_bf16 = jax.jit(lambda y: full(y, jnp.bfloat16))
    cqt_sum = jax.jit(lambda y: jnp.sum(cqt(y, p)))

    timed("cascade only (f32 in)", cascade_only, yf)
    timed("cascade only (int16 in)", cascade_only, y16)
    timed("cascade + frame staging", cascade_frames, y16)
    timed("cascade + frames + einsum + mag (f32)", full_f32, y16)
    timed("  same, bf16 response einsum", full_bf16, y16)
    timed("full cqt (incl. scale/log1p/concat/T)", cqt_sum, y16)


if __name__ == "__main__":
    dev = jax.devices()[0]
    log(f"ablation on {dev.device_kind} ({dev.platform})")
    main()
