"""Benchmark: batched CQT + PitchClassNet inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "audio_min_per_sec_per_chip", "value": N,
   "unit": "audio-min/s/chip", "vs_baseline": R}

Workload: GiantSteps-like batch — B two-minute clips at 22.05 kHz through
the full front-end (8-octave 36-bin log-CQT) and the flagship PitchClassNet
(reference train_model.py defaults), end-to-end jitted. `vs_baseline` is the
speedup over the same pipeline on one host CPU (the reference's librosa+torch
path is CPU-bound per file; BASELINE.json north_star targets >= 50x).

Timing note: under the axon relay backend, block_until_ready returns before
remote execution finishes — every timed repetition therefore reduces the
outputs to a scalar ON DEVICE and fetches it to host, which forces the full
round trip (dispatch + execute + scalar readback).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt, reference_hop
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
CLIP_SECONDS = 120
BATCH = 16
CHUNKS = 8   # batches processed per device round trip (lax.scan)
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pipeline(cfg: Config, params: CQTParams, variables, use_pallas: bool,
                   chunks: int = CHUNKS):
    model = PitchClassNet(cfg)
    front = cqt_pallas if use_pallas else cqt

    def one_batch(y, seq_length):
        mel = front(y, params)[:, :, :, None]
        key, tonic = model.apply(variables, mel, seq_length, False)
        return jnp.sum(key) + jnp.sum(tonic)

    @jax.jit
    def pipeline(y_chunks, seq_length):
        # y_chunks: (chunks, B, L) — scan amortizes the host<->device round
        # trip (the relay adds ~30 ms per fetch) over `chunks` real batches
        def body(acc, y):
            return acc + one_batch(y, seq_length), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), y_chunks)
        # scalar reduction: fetching this forces completion of the whole step
        return acc

    return pipeline


def time_pipeline(pipeline, ys, seq, reps=REPS):
    float(pipeline(ys[0], seq))  # compile + warm
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(reps):
        acc += float(pipeline(ys[i % len(ys)], seq))
    dt = (time.perf_counter() - t0) / reps
    return dt, acc


def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    params = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                       octaves=cfg.octaves)
    n_frames = 1 + (SR * CLIP_SECONDS) // hop

    rng = np.random.default_rng(0)
    y_host = rng.normal(size=(CHUNKS, BATCH, SR * CLIP_SECONDS)
                        ).astype(np.float32) * 0.1
    seq_host = np.full((BATCH,), n_frames, np.int32)

    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel0,
                           jnp.full((1,), n_frames, jnp.int32), False)

    audio_minutes = CHUNKS * BATCH * CLIP_SECONDS / 60.0
    dev = jax.devices()[0]
    log(f"benchmarking on {dev.device_kind} ({dev.platform})")
    ys = [jax.device_put(jnp.asarray(y_host), dev)]
    seq = jax.device_put(jnp.asarray(seq_host), dev)

    best_dt, best_kind = None, None
    for use_pallas in (True, False):
        if use_pallas and dev.platform != "tpu":
            continue
        try:
            t0 = time.perf_counter()
            pipe = build_pipeline(cfg, params, variables, use_pallas)
            dt, _ = time_pipeline(pipe, ys, seq)
            kind = "pallas" if use_pallas else "xla"
            log(f"{kind} front-end: compile {time.perf_counter() - t0 - dt * REPS:.0f}s, "
                f"{dt * 1e3:.1f} ms/batch -> {audio_minutes / dt:.1f} audio-min/s")
            if best_dt is None or dt < best_dt:
                best_dt, best_kind = dt, kind
        except Exception as e:
            log(f"{'pallas' if use_pallas else 'xla'} path failed: {e!r}")
    if best_dt is None:
        print(json.dumps({"metric": "audio_min_per_sec_per_chip", "value": 0.0,
                          "unit": "audio-min/s/chip", "vs_baseline": 0.0}))
        return
    tpu_throughput = audio_minutes / best_dt
    log(f"best: {best_kind} {tpu_throughput:.1f} audio-min/s/chip")

    # --- single-CPU baseline: identical pipeline, one clip ---
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            y1 = [jnp.asarray(y_host[0, :1][None])]   # (1, 1, L)
            s1 = jnp.asarray(seq_host[:1])
            pipe_cpu = build_pipeline(cfg, params, variables, False, chunks=1)
            dt_cpu, _ = time_pipeline(pipe_cpu, y1, s1, reps=2)
        cpu_throughput = (CLIP_SECONDS / 60.0) / dt_cpu
        log(f"cpu baseline: {dt_cpu * 1e3:.0f} ms/clip -> "
            f"{cpu_throughput:.2f} audio-min/s")
        ratio = tpu_throughput / cpu_throughput
    except Exception as e:
        log(f"cpu baseline failed: {e!r}")
        ratio = 0.0

    print(json.dumps({
        "metric": "audio_min_per_sec_per_chip",
        "value": round(tpu_throughput, 2),
        "unit": "audio-min/s/chip",
        "vs_baseline": round(ratio, 2),
    }))


if __name__ == "__main__":
    main()
