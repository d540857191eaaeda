"""Benchmark: batched CQT + PitchClassNet inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "audio_min_per_sec_per_chip", "value": N,
   "unit": "audio-min/s/chip", "vs_baseline": R}

Workload: GiantSteps-like batch — B two-minute clips at 22.05 kHz through
the full front-end (8-octave 36-bin log-CQT) and the flagship PitchClassNet
(reference train_model.py defaults), end-to-end jitted. `vs_baseline` is the
speedup over the same pipeline on one host CPU (the reference's librosa+torch
path is CPU-bound per file; BASELINE.json targets >= 50x single-CPU).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt, reference_hop
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
CLIP_SECONDS = 120
BATCH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pipeline(cfg: Config, params: CQTParams, variables, use_pallas: bool):
    model = PitchClassNet(cfg)
    front = cqt_pallas if use_pallas else cqt

    @jax.jit
    def pipeline(y, seq_length):
        mel = front(y, params) if not use_pallas else cqt_pallas(y, params)
        mel = mel[:, :, :, None]
        return model.apply(variables, mel, seq_length, False)

    return pipeline


def time_pipeline(pipeline, y, seq, reps=5):
    out = pipeline(y, seq)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pipeline(y, seq)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    params = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                       octaves=cfg.octaves)
    n_frames = 1 + (SR * CLIP_SECONDS) // hop

    rng = np.random.default_rng(0)
    y = rng.normal(size=(BATCH, SR * CLIP_SECONDS)).astype(np.float32) * 0.1
    seq = np.full((BATCH,), n_frames, np.int32)

    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel0,
                           jnp.full((1,), n_frames, jnp.int32), False)

    audio_minutes = BATCH * CLIP_SECONDS / 60.0

    # --- TPU (or default backend) ---
    dev = jax.devices()[0]
    log(f"benchmarking on {dev.device_kind} ({dev.platform})")
    yj = jax.device_put(jnp.asarray(y), dev)
    seqj = jax.device_put(jnp.asarray(seq), dev)
    best_dt, best_kind = None, None
    for use_pallas in (False, True):
        if use_pallas and dev.platform not in ("tpu",):
            continue
        try:
            pipe = build_pipeline(cfg, params, variables, use_pallas)
            dt = time_pipeline(pipe, yj, seqj)
            log(f"{'pallas' if use_pallas else 'xla'} front-end: {dt * 1e3:.1f} ms "
                f"-> {audio_minutes / dt:.1f} audio-min/s")
            if best_dt is None or dt < best_dt:
                best_dt, best_kind = dt, "pallas" if use_pallas else "xla"
        except Exception as e:
            log(f"{'pallas' if use_pallas else 'xla'} path failed: {e!r}")
    if best_dt is None:
        print(json.dumps({"metric": "audio_min_per_sec_per_chip", "value": 0.0,
                          "unit": "audio-min/s/chip", "vs_baseline": 0.0}))
        return
    tpu_throughput = audio_minutes / best_dt
    log(f"best: {best_kind} {tpu_throughput:.1f} audio-min/s/chip")

    # --- single-CPU baseline: same pipeline, one clip ---
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        y1 = jnp.asarray(y[:1])
        s1 = jnp.asarray(seq[:1])
        pipe_cpu = build_pipeline(cfg, params, variables, False)
        dt_cpu = time_pipeline(pipe_cpu, y1, s1, reps=2)
    cpu_throughput = (CLIP_SECONDS / 60.0) / dt_cpu
    log(f"cpu baseline: {dt_cpu * 1e3:.1f} ms/clip -> "
        f"{cpu_throughput:.2f} audio-min/s")

    print(json.dumps({
        "metric": "audio_min_per_sec_per_chip",
        "value": round(tpu_throughput, 2),
        "unit": "audio-min/s/chip",
        "vs_baseline": round(tpu_throughput / cpu_throughput, 2),
    }))


if __name__ == "__main__":
    main()
