"""Is eval-mode BatchNorm (+dtype converts) separate HBM passes? (round-5)

The model stage at B=512 (96.5 ms) sits at ~19.5 GB HLO bytes / ~210
GB/s effective — memory-bound. Eval BN is a per-channel affine; if XLA
fuses it (and leaky-relu) into the conv's output stage, stripping BN
changes nothing. If stripping BN drops the wall materially, the
BN/convert chains are separate read+write passes over the 1.75-3.5 GB
activations, and an inference-time BN-fold (w' = w*gamma/sqrt(v+eps),
b' folded) is a real serving win. This measures model-alone at bench
geometry with BatchNorm monkeypatched to identity — NOT a numerics-
preserving transform; purely a traffic attribution probe.

Run (TPU, serial): timeout 3300 python scripts/microbench_model_nobn.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet, blocks
from audio_key_estimation_tpu.ops.cqt import reference_hop

SR, B, REPS = 22050, 512, 15


def wall(fn, *args):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / REPS * 1e3, compile_s


def run(label):
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    n_frames = 1 + SR * 120 // hop
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (B, cfg.pitches, n_frames, 1)).astype(np.float32) ** 2)
    seq = jnp.full((B,), n_frames, jnp.int32)
    model = PitchClassNet(cfg, dtype=jnp.float32)
    var = model.init(jax.random.PRNGKey(0), mel[:1], seq[:1], False)
    fn = jax.jit(lambda v, m, s: sum(
        o.astype(jnp.float32).sum() for o in model.apply(v, m, s, False)))
    # TPU-side byte count for the attribution
    ca = jax.jit(lambda v, m, s: model.apply(v, m, s, False)) \
        .lower(var, mel, seq).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    by = ca.get("bytes accessed", 0.0)
    ms, cs = wall(fn, var, mel, seq)
    print(f"{label}: {ms:7.2f} ms, HLO {by / 1e9:.1f} GB "
          f"-> {by / ms / 1e6:.0f} GB/s (compile {cs:.0f}s)", flush=True)
    return ms


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    base = run("baseline (BN active)")

    orig = blocks.BatchNorm.__call__
    blocks.BatchNorm.__call__ = lambda self, x, train=False: x
    try:
        nobn = run("BatchNorm -> identity")
    finally:
        blocks.BatchNorm.__call__ = orig
    print(f"delta: {base - nobn:+.2f} ms "
          f"({(base - nobn) / base * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
