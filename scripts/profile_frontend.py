"""Stage-by-stage timing of the bench pipeline on the current device.

Decomposes the round-1 bench workload (8 chunks x 16 two-minute clips)
into: full pipeline, CQT-only, model-only, frame-gather-only, downsample
cascade-only, and response-matmul-only timings, to locate where the
~471 ms/batch goes (VERDICT round 1, weak #2/#5/#8).

Writes PROFILE.json next to this script's repo root; diagnostics to stderr.
Run serially (one TPU process at a time).
"""

import json
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
from audio_key_estimation_tpu.ops.cqt import (CQTParams, cqt, downsample2,
                                              halfband_taps, kernel_bank,
                                              reference_hop)

SR = 22050
CLIP_SECONDS = 120
BATCH = 16
CHUNKS = 8
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps=REPS):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:28s} {dt * 1e3:9.1f} ms   (compile {compile_s:.1f}s)")
    return {"ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1)}


def scan_sum(fn):
    """Apply fn per chunk under lax.scan and reduce to one scalar."""
    @jax.jit
    def run(y_chunks, *rest):
        def body(acc, y):
            return acc + fn(y, *rest), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), y_chunks)
        return acc
    return run


def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    p = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                  octaves=cfg.octaves)
    n_frames = 1 + (SR * CLIP_SECONDS) // hop
    rng = np.random.default_rng(0)
    y_host = rng.normal(size=(CHUNKS, BATCH, SR * CLIP_SECONDS)
                        ).astype(np.float32) * 0.1
    seq_host = np.full((BATCH,), n_frames, np.int32)

    model = PitchClassNet(cfg)
    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel0,
                           jnp.full((1,), n_frames, jnp.int32), False)

    dev = jax.devices()[0]
    log(f"profiling on {dev.device_kind} ({dev.platform})")
    ys = jax.device_put(jnp.asarray(y_host), dev)
    seq = jax.device_put(jnp.asarray(seq_host), dev)

    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]], 1))
    taps = jnp.asarray(halfband_taps())
    log(f"n_fft={n_fft} n_frames={n_frames} hop={hop}")

    results = {}

    # 1. full pipeline (xla front-end)
    def full(y, seq):
        mel = cqt(y, p)[:, :, :, None]
        key, tonic = model.apply(variables, mel, seq, False)
        return jnp.sum(key) + jnp.sum(tonic)
    results["full_pipeline"] = timed("full pipeline", scan_sum(full), ys, seq)

    # 2. CQT only
    def cqt_only(y):
        return jnp.sum(cqt(y, p))
    results["cqt_only"] = timed("cqt only", scan_sum(cqt_only), ys)

    # 3. model only (fixed random mel input)
    mel_host = rng.normal(size=(CHUNKS, BATCH, cfg.pitches, n_frames, 1)
                          ).astype(np.float32)
    mels = jax.device_put(jnp.asarray(mel_host), dev)

    def model_only(mel, seq):
        key, tonic = model.apply(variables, mel, seq, False)
        return jnp.sum(key) + jnp.sum(tonic)
    results["model_only"] = timed("model only", scan_sum(model_only), mels, seq)

    # 4. downsample cascade only (7 halvings)
    def down_only(y):
        acc = jnp.float32(0)
        cur = y
        for _ in range(p.octaves - 1):
            cur = downsample2(cur, taps)
            acc = acc + jnp.sum(cur[:, :8])
        return acc
    results["downsample_only"] = timed("downsample cascade", scan_sum(down_only), ys)

    # 5. frame gather only, all 8 octaves (gather at progressively shorter
    #    signals but same (B, T, n_fft) output, as in cqt())
    t_idx = jnp.arange(n_frames, dtype=jnp.float32)

    def gather_only(y):
        acc = jnp.float32(0)
        cur = y
        half = n_fft // 2
        for o in range(p.octaves):
            if o > 0:
                cur = downsample2(cur, taps)
            centers = jnp.round(t_idx * (p.hop / 2 ** o)).astype(jnp.int32)
            ypad = jnp.pad(cur, ((0, 0), (half, half + 1)), mode="reflect")
            idx = centers[:, None] + jnp.arange(n_fft)[None, :]
            frames = ypad[:, idx]
            acc = acc + jnp.sum(frames[:, :, 0])
        return acc
    results["gather_plus_downsample"] = timed("gather+downsample", scan_sum(gather_only), ys)

    # 6. response matmul only (fixed frames tensor, one octave x8)
    frames_host = rng.normal(size=(BATCH, n_frames, n_fft)).astype(np.float32)
    frames_dev = jax.device_put(jnp.asarray(frames_host), dev)

    @jax.jit
    def matmul_only(frames):
        acc = jnp.float32(0)
        for _ in range(p.octaves):
            r = jnp.einsum("btn,nk->btk", frames, kmat,
                           preferred_element_type=jnp.float32)
            bpo = kmat.shape[1] // 2
            acc = acc + jnp.sum(jnp.sqrt(r[..., :bpo] ** 2 + r[..., bpo:] ** 2))
        return acc
    results["matmul_x8_one_chunk"] = timed("matmul x8 (1 chunk)", matmul_only,
                                           frames_dev)

    with open(os.path.join(REPO, "PROFILE.json"), "w") as f:
        json.dump(results, f, indent=2)
    log("wrote PROFILE.json")


if __name__ == "__main__":
    main()
