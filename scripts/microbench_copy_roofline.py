"""What does an XLA copy actually sustain, by shape/layout? (round-5)

The (512, 288, 601, 8) scale-copy measured 209 GB/s — suspiciously far
under the chip's HBM capability (the fused cascade kernel sustains
~580 GB/s effective on (rows, lanes) streams). If the slowness is the
channels-minor default layout, the model's ~93 ms memory floor is an
artifact of layout, not physics — and a Pallas conv-stack kernel that
streams (batch*channel)-lane tiles gets the full-rate floor.

Run (TPU, serial): timeout 3300 python scripts/microbench_copy_roofline.py
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

REPS = 10
N = 512 * 288 * 601 * 8  # the model activation element count


def wall(fn, *args):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / REPS * 1e3, compile_s


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)
    flat = rng.standard_normal(N).astype(np.float32)

    shapes = [
        ("model (B,H,T,C=8)", (512, 288, 601, 8)),
        ("flat 1-D", (N,)),
        ("lanes-major (H,T,B*C)", (288, 601, 512 * 8)),
        ("2-D (B*H, T*C)", (512 * 288, 601 * 8)),
    ]
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for name, shape in shapes:
            x = jnp.asarray(flat.reshape(shape), dt)
            nb = x.nbytes / 1e9
            ms, cs = wall(jax.jit(
                lambda a: (a * 1.0001).astype(jnp.float32).sum()), x)
            print(f"[{tag}] {name}: {ms:6.2f} ms = "
                  f"{2 * nb / ms * 1e3:5.0f} GB/s (compile {cs:.0f}s)",
                  flush=True)
            del x


if __name__ == "__main__":
    main()
