"""In-model fused-vs-plain ConvStack A/B at bench geometry (round-5).

The chain harness (microbench_convstack_fused.py) measures the stack
alone in kernel layout; THIS measures what the serving pipeline sees:
full flagship PitchClassNet.apply at (B, 288, 601, 1), fused gate on
vs off. The first fused cut — time-major (T,H,C,B) — won the chain
A/B but was +0.2% in-model: its entry/exit H<->T transposes are real
physical copies. The shipped (H,T,C,B) layout matches XLA's physical
NHWC layout so those transposes are bitcasts.

Run (TPU, serial): timeout 3300 python scripts/microbench_model_fused.py
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
from audio_key_estimation_tpu.models import PitchClassNet

B, T = int(os.environ.get("AKX_BS", 512)), 601
REPS = 4


def time_fn(fn, *args, reps=REPS):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / reps, compile_s


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); B={B} T={T}",
          flush=True)
    cfg = Config()
    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal((B, cfg.pitches, T, 1)) * 0.5,
                       jnp.float32)
    seq = jnp.full((B,), T, jnp.int32)

    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mels[:1], seq[:1], False)

    for dtype in ("float32", "bfloat16"):
        for tag, fused in (("plain", False), ("fused", True)):
            m = PitchClassNet(cfg.replace(fused_convstack=fused,
                                          dtype=dtype))
            f = jax.jit(lambda a, s, _m=m: jnp.sum(_m.apply(
                variables, a, s, False)[0]))
            dt, cs = time_fn(f, mels, seq)
            print(f"[{tag} {dtype:8s}] model.apply: {dt * 1e3:7.1f} "
                  f"ms/step (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
