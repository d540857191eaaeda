"""Hardware parity for the fused ConvStack serving path (round-5).

Every fused-kernel parity test runs the Pallas INTERPRET mode on CPU;
this checks the Mosaic-compiled TPU kernel itself — the round-4 bug
class (a planning invariant silently violated only on the real grid)
motivates never shipping a kernel whose hardware path is only timed.

Runs the full flagship PitchClassNet fused vs plain at two geometries
(the bench's B=512 T=601 and a small B=128 T=64) and prints max
key-probability delta and tonic-logit relative error; PASS thresholds
are the bf16-stream bounds the CPU tests pin (3e-2).

Run (TPU, serial): timeout 3300 python scripts/check_fused_hw_parity.py
"""
import os
import sys

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

TOL = 3e-2


def check(B, T):
    cfg = Config(dtype="bfloat16")
    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal((B, cfg.pitches, T, 1)) * 0.5,
                       jnp.float32)
    seq = jnp.full((B,), T, jnp.int32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mels[:1], seq[:1], False)

    outs = {}
    for tag, fused in (("plain", False), ("fused", True)):
        m = PitchClassNet(cfg.replace(fused_convstack=fused))
        key, tonic = jax.jit(lambda a, s, _m=m: _m.apply(
            variables, a, s, False))(mels, seq)
        outs[tag] = (np.asarray(key), np.asarray(tonic))

    kd = np.abs(outs["fused"][0] - outs["plain"][0]).max()
    tp = outs["plain"][1]
    td = np.abs(outs["fused"][1] - tp).max() / max(np.abs(tp).max(), 1e-9)
    finite = all(np.isfinite(o).all() for pair in outs.values()
                 for o in pair)
    ok = finite and kd < TOL and td < TOL
    print(f"B={B} T={T}: key |delta|max={kd:.2e} tonic rel={td:.2e} "
          f"finite={finite} -> {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    if dev.platform != "tpu":
        print("not a TPU — this check targets the Mosaic-compiled kernel",
              flush=True)
        sys.exit(2)
    ok = check(128, 64)
    ok &= check(512, 601)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
