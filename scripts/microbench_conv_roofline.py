"""Roofline calibration for the dominant model conv shape (round-5).

microbench_conv_pack.py showed every re-expression of the (7,7)x8->8
conv at (512, 288, 601) plateaus at ~29 ms — not lanes (r=16 packing
executes 7x the FLOPs in the same wall), not dtype. 29 ms for 7 GB of
unavoidable in+out traffic is 240 GB/s effective vs the chip's ~819.
This calibrates what the memory pipeline actually sustains on the same
tensors: (a) pure copy (scale by 2), (b) 7-row H-shift add (the conv's
read pattern with perfect reuse, no MXU), (c) the real 3-conv
ConvStack region (conv+BN+relu x3) as the model runs it, f32 and with
bf16 streams. The gap between (a/b) and 29 ms is the Pallas headroom.

Run (TPU, serial): timeout 3300 python scripts/microbench_conv_roofline.py
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

B, H, T, C, K = 512, 288, 601, 8, 7
REPS = 10


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
    gb = B * H * T * C * 4 / 1e9

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.standard_normal((B, H, T, C)), dt)
        nb = x.nbytes / 1e9

        ms, cs = wall(jax.jit(
            lambda a: (a * 1.0001).astype(jnp.float32).sum()), x)
        print(f"[{tag}] scale copy ({2 * nb:.1f} GB): {ms:6.2f} ms "
              f"= {2 * nb / ms * 1e3:5.0f} GB/s (compile {cs:.0f}s)",
              flush=True)

        def shift_add(a):
            acc = a * 0.1
            for dh in range(1, K):          # 7-row stencil over H
                acc = acc + jnp.roll(a, dh, axis=1) * (0.1 + 0.01 * dh)
            return acc.astype(jnp.float32).sum()

        ms, cs = wall(jax.jit(shift_add), x)
        print(f"[{tag}] 7-row H-stencil (ideal reuse {2 * nb:.1f} GB): "
              f"{ms:6.2f} ms = {2 * nb / ms * 1e3:5.0f} GB/s "
              f"(compile {cs:.0f}s)", flush=True)

    # (c) the real ConvStack region: 3x (circular conv + BN + leaky relu)
    from audio_key_estimation_tpu.config import Config
    from audio_key_estimation_tpu.models import blocks

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        cfg = Config()
        stack = blocks.ConvStack(C, C, cfg.kernel_size, cfg.conv_layers,
                                 equivariant=False, dtype=dt)
        x = jnp.asarray(rng.standard_normal((B, H, T, C)), dt)
        var = stack.init(jax.random.PRNGKey(0), x[:1], False)

        fn = jax.jit(lambda v, a: stack.apply(v, a, False)
                     .astype(jnp.float32).sum())
        ms, cs = wall(fn, var, x)
        print(f"[{tag}] ConvStack x3 (+BN+relu) at model shape: {ms:6.2f} ms "
              f"(compile {cs:.0f}s)", flush=True)
    print(f"reference: conv one-pass floor {2 * gb:.1f} GB -> "
          f"{2 * gb / 819:.1f} ms/conv at 819 GB/s", flush=True)


if __name__ == "__main__":
    main()
