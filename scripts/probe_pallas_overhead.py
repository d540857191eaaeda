"""Disambiguate the flat ~28 ms Pallas cost (VERDICT r3 #3, stage 3).

probe_dma_rate.py measured grid-only (empty body) = 29 ms == dma1 ==
dma3 == the production octave kernel: the cost is FLAT in kernel work.
Three candidate explanations, separated by a (grid steps x input bytes)
matrix over a trivial kernel with an untouched ANY-memspace input:

  per grid step   -> time scales with grid N at fixed input
  per pallas_call -> time flat in both axes
  per input byte  -> time scales with input size at fixed grid

MEASURED (TPU v5e via the axon relay, 2026-08): flat ~23-26 ms across
the whole (grid x bytes) matrix, AND the same for a trivial pure-XLA
program, AND the same for two pallas_calls in one jit -> the cost is
the relay's per-top-level-dispatch floor (one HTTP round trip per
executed program; dispatches in a Python loop do NOT pipeline). Every
single-dispatch wall in PERFNOTES reads as max(device_time, ~26 ms);
only multi-dispatch pipelines (bench.py's step loop) amortize it.

Run on TPU:  python scripts/probe_pallas_overhead.py
"""
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(os.environ.get("AKX_REPS", 4))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(grid_n):
    def kernel(in_ref, out_ref):
        out_ref[...] = jnp.full_like(out_ref, 1.0)

    return pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid_n, 8, 128), jnp.float32))


def timeit(g, x):
    t0 = time.perf_counter()
    float(g(x))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [g(x) for _ in range(REPS)]
        for o in outs:
            float(o)
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3, comp


def main():
    dev = jax.devices()[0]
    log(f"pallas overhead probe on {dev.device_kind}")
    rows = {}
    for gb, rows_in in (("0.01 GB", 1 << 12), ("1.35 GB", 1_323_008),
                        ("5.42 GB", 5_292_032)):
        x = jax.jit(lambda r=rows_in: jnp.zeros((r, 512), jnp.int16))()
        x.block_until_ready()
        for grid_n in (1, 25, 201):
            f = build(grid_n)
            ms, comp = timeit(jax.jit(lambda y, f=f: jnp.sum(f(y))), x)
            rows[(gb, grid_n)] = ms
            log(f"  input {gb:8s} grid={grid_n:4d}: "
                f"{ms:7.2f} ms (compile {comp:.0f}s)")
        del x

    # pallas-specific or ANY dispatch? pure-XLA programs and a 2x-pallas
    # single-jit program cost the same flat wall -> the cost is the
    # relay's per-TOP-LEVEL-DISPATCH floor, not a pallas property and
    # not per pallas_call (measured 2026-08: 22.9 / 23.0 / 23.2 / 22.6)
    x = jax.jit(lambda: jnp.zeros((1 << 12, 512), jnp.int16))()
    x.block_until_ready()
    ms, c = timeit(jax.jit(
        lambda y: jnp.sum(y[:8, :8].astype(jnp.float32))), x)
    log(f"  xla trivial       : {ms:7.2f} ms (compile {c:.0f}s)")
    ms, c = timeit(jax.jit(lambda y: jnp.sum(jnp.tanh(
        y[:128, :128].astype(jnp.float32) @ jnp.ones((128, 128))))), x)
    log(f"  xla matmul chain  : {ms:7.2f} ms (compile {c:.0f}s)")
    f1 = build(1)
    ms, c = timeit(jax.jit(lambda y: jnp.sum(f1(y)) + jnp.sum(f1(y * 2))), x)
    log(f"  pallas x2 one jit : {ms:7.2f} ms (compile {c:.0f}s)")


if __name__ == "__main__":
    main()
