"""Conv packing A/B, take 2: carry-chained scan timing (round-5).

Take 1 (microbench_conv_pack.py) forced execution with `.sum()` over the
3.5 GB conv output — a fused read+reduce pass of roughly the same cost
as the conv itself, which flattened every variant to ~29 ms and nearly
led to a wrong "plateau" conclusion. This version times a
carry-dependent lax.scan chain of the op (y_{i+1} = op(y_i)) — LICM
cannot hoist a carry-dependent body, no reduction is involved, and the
only fetch is a 4-byte element, so per-iteration cost is the op alone
with dispatch amortized. The scale-copy chain calibrates streaming
bandwidth the same way.

Run (TPU, serial): timeout 3300 python scripts/microbench_conv_pack2.py
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

from microbench_conv_pack import baseline, pack_kernel, packed  # noqa: E402

B, H, T, C, K = 512, 288, 601, 8, 7
CHAIN = 16   # scan iterations inside one dispatch
REPS = 4     # timed dispatches


def chain_wall(body, x):
    """ms per body() application, dispatch-amortized."""

    @jax.jit
    def run(x0):
        y, _ = jax.lax.scan(lambda c, _: (body(c), None), x0, None,
                            length=CHAIN)
        return y.reshape(-1)[0]

    t0 = time.time()
    float(run(x))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    outs = [run(x) for _ in range(REPS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / REPS / CHAIN * 1e3, compile_s


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); chain={CHAIN}",
          flush=True)
    rng = np.random.default_rng(0)
    flops = 2 * B * H * T * K * K * C * C

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.standard_normal((B, H, T, C)) * 0.1, dt)
        nb = x.nbytes / 1e9

        ms, cs = chain_wall(lambda a: a * 1.0001, x)
        print(f"[{tag}] scale copy: {ms:6.2f} ms = "
              f"{2 * nb / ms * 1e3:5.0f} GB/s (compile {cs:.0f}s)",
              flush=True)

        # decay weights keep the chained activations bounded
        w = jnp.asarray(
            rng.standard_normal((K, K, C, C)) * (0.15 / (K * np.sqrt(C))),
            dt)
        ms, cs = chain_wall(lambda a: baseline(a, w), x)
        print(f"[{tag}] baseline (7,7)x8->8: {ms:6.2f} ms "
              f"{flops / ms / 1e9:6.1f} TF/s (compile {cs:.0f}s)",
              flush=True)

        for r in (4, 8, 16):
            wp = jnp.asarray(
                pack_kernel(np.asarray(w, np.float32), r), dt)
            ms, cs = chain_wall(lambda a, _wp=wp, _r=r: packed(a, _wp, _r),
                                x)
            eff = flops * 3 * (r * C) / (K * C)  # dense block FLOPs
            print(f"[{tag}] packed r={r:2d}: {ms:6.2f} ms "
                  f"(true {flops / ms / 1e9:6.1f} TF/s, "
                  f"mxu {eff / ms / 1e9:6.1f} TF/s; compile {cs:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
