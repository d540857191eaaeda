"""Fused Pallas ConvStack vs XLA flax ConvStack on TPU (round-5).

A/B at bench geometry (B=512, H=288, T=601): the XLA model stage is at
a ~210 GB/s effective-bandwidth wall (PERFNOTES round-10), three (7,7)
circular convs ~= 29.8 ms each. The fused kernel
(ops/convstack_pallas.py) streams each layer once in the (H, T, C, B)
layout with double-buffered slab DMAs and one full-grid MXU matmul per
4x4 output block; traffic model says ~5.1 GB/layer at the cascade
kernel's ~580 GB/s = ~9 ms/layer vs XLA's ~29.8.

Timing: carry-chained lax.scan (body applied CHAIN times with data
dependence) so the per-application cost is dispatch-amortized and LICM
can't hoist — the harness lesson from microbench_conv_pack2. The chain
runs ci=8 layers (a stack output feeds the next stack) so both
variants chain the identical op.

Run (TPU, serial): timeout 3300 python scripts/microbench_convstack_fused.py
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

from audio_key_estimation_tpu.models import blocks  # noqa: E402
from audio_key_estimation_tpu.ops import convstack_pallas as CP  # noqa: E402

B, H, T, C = int(os.environ.get("AKX_B", 512)), 288, 601, 8
CHAIN = 8
REPS = 3
FLOPS_STACK = 3 * 2 * B * H * T * 8 * 49 * C   # true conv flops


def chain_wall(body, x):
    """ms per body() application, dispatch-amortized; returns (ms, compile_s)."""

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
    print(f"device: {dev.device_kind} ({dev.platform}); "
          f"geom B={B} H={H} T={T} C={C} chain={CHAIN}", flush=True)
    rng = np.random.default_rng(0)

    # shared folded layers, small weights to keep chains bounded
    layers = []
    for _ in range(3):
        w = rng.standard_normal((7, 7, C, 8)).astype(np.float32) \
            * (0.12 / np.sqrt(49 * C))
        b = rng.standard_normal(8).astype(np.float32) * 0.01
        s = np.ones(8, np.float32)
        t = np.zeros(8, np.float32)
        layers.append((w, b, s, t))

    skip_xla = bool(os.environ.get("AKX_SKIP_XLA"))
    # ---------------- XLA flax stack (eval mode, f32: the product path)
    stack = blocks.ConvStack(C, 8, 7, 3, equivariant=False)
    var = stack.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, H, 8, C)), False)
    params = var["params"]
    bstats = var["batch_stats"]
    for i, (w, b, s, t) in enumerate(layers):
        params[f"seq_{3 * i}"]["kernel"] = jnp.asarray(w)
        params[f"seq_{3 * i}"]["bias"] = jnp.asarray(b)
        params[f"seq_{3 * i + 1}"]["bn"]["scale"] = jnp.ones(8)
        params[f"seq_{3 * i + 1}"]["bn"]["bias"] = jnp.zeros(8)
        bstats[f"seq_{3 * i + 1}"]["bn"]["mean"] = jnp.zeros(8)
        bstats[f"seq_{3 * i + 1}"]["bn"]["var"] = jnp.ones(8) - 1e-5

    variables = {"params": params, "batch_stats": bstats}

    def xla_body(a):
        return stack.apply(variables, a, False)

    if not skip_xla:
        x = jnp.asarray(rng.standard_normal((B, H, T, C)) * 0.1,
                        jnp.float32)
        ms, cs = chain_wall(xla_body, x)
        print(f"[xla f32 ] stack: {ms:7.2f} ms  "
              f"{FLOPS_STACK / ms / 1e9:6.1f} TF/s (compile {cs:.0f}s)",
              flush=True)

        xb = x.astype(jnp.bfloat16)
        ms, cs = chain_wall(lambda a: xla_body(a).astype(jnp.bfloat16), xb)
        print(f"[xla bf16] stack: {ms:7.2f} ms  (compile {cs:.0f}s)",
              flush=True)

    # ---------------- fused Pallas stack, chained in (H, T, C, B) layout
    packed = []
    for (w, b, s, t) in layers:
        wd, b128 = CP.pack_dense_w(w, b, s, t)
        packed.append((jnp.asarray(wd, jnp.bfloat16), jnp.asarray(b128)))

    for chunk in (CP.pick_chunk(T, B), 40):
        t_pad = -(-T // chunk) * chunk

        def fused_body(a, _chunk=chunk, _t_pad=t_pad):
            # a: (H, T, C, B) bf16; apply 3 fused layers, slice to T
            y = a
            for wd, b128 in packed:
                yp = CP._circ_pad_ht(y[:, :T], _t_pad)
                y = CP._conv7_layer(yp, wd, b128, chunk=_chunk)
            return y[:, :T]

        xt = jnp.asarray(
            rng.standard_normal((H, T, C, B)) * 0.1, jnp.bfloat16)
        ms, cs = chain_wall(fused_body, xt)
        print(f"[pallas bf16 chunk={chunk:3d}] stack: {ms:7.2f} ms  "
              f"{FLOPS_STACK / ms / 1e9:6.1f} TF/s true (compile {cs:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
