"""Isolate the Pallas window-DMA wall (VERDICT r3 #3, stage 2).

probe_cqt_kernel_stages.py showed the dma-only variant costs the full
28 ms (23 GB/s effective): compute is NOT the wall, the HBM->VMEM window
copies are. This measures WHICH property of the DMA chain binds:

  grid     : empty body (per-grid-step overhead alone)
  dma1     : 1 window copy/step            (per-DMA latency)
  dma3     : 3 window copies/step          (the production chain)
  dma3_db  : 3 copies/step, double-buffered across steps (start next
             step's copies before waiting on this step's)
  dma3_big : one contiguous copy of 3*win rows/step (same bytes, 1 DMA)
  dma3_static: 3 copies/step at offsets computed from program_id alone
             (no SMEM table read on the address path)

All variants move (or skip) the same (win, B) int16 windows from an HBM
(ANY) ref into VMEM scratch and write a tiny slice to the out block so
nothing is DCE'd. Timing = bench.py-style dispatch loop.

Run on TPU:  AKX_B=512 python scripts/probe_dma_rate.py
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_key_estimation_tpu.ops import cqt_pallas as cp
from audio_key_estimation_tpu.ops.cqt import CQTParams, kernel_bank

SR = 44100
CLIP_SECONDS = int(os.environ.get("AKX_CLIP", 120))
B = int(os.environ.get("AKX_B", 512))
REPS = int(os.environ.get("AKX_REPS", 4))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(variant, *, n_fft, t_pad, tile_t, Bc, Lpad):
    win = n_fft + cp._ALIGN_TM
    grid_n = t_pad // tile_t

    def kernel(st_ref, ypad_ref, out_ref, frames, sems):
        ti = pl.program_id(0)

        def mk(j, slot, step):
            if variant == "dma3_static":
                off_al = pl.multiple_of(
                    (step * tile_t + j) * 8816 // cp._ALIGN_TM
                    * cp._ALIGN_TM, cp._ALIGN_TM)
            else:
                off = st_ref[step * tile_t + j]
                off_al = pl.multiple_of(
                    off // cp._ALIGN_TM * cp._ALIGN_TM, cp._ALIGN_TM)
            return pltpu.make_async_copy(
                ypad_ref.at[pl.ds(off_al, win)], frames.at[slot],
                sems.at[slot])

        if variant == "grid":
            out_ref[...] = jnp.full_like(out_ref, 1.0)
            return
        if variant == "dma1":
            c = mk(0, 0, ti)
            c.start()
            c.wait()
            out_ref[...] = frames[0, :tile_t, :1].astype(jnp.float32)[None]
            return
        if variant == "dma3_big":
            off = st_ref[ti * tile_t]
            # clamp: the big span can run past the padded end at the
            # last steps — this probes DMA rate, not addressing fidelity
            off = jnp.minimum(off, Lpad - tile_t * win - cp._ALIGN_TM)
            off_al = pl.multiple_of(off // cp._ALIGN_TM * cp._ALIGN_TM,
                                    cp._ALIGN_TM)
            c = pltpu.make_async_copy(
                ypad_ref.at[pl.ds(off_al, tile_t * win)],
                frames.at[0], sems.at[0])
            c.start()
            c.wait()
            out_ref[...] = frames[0, :tile_t, :1].astype(jnp.float32)[None]
            return
        if variant == "dma3_db":
            # warm-up step 0 handled by starting this step's copies only
            # on step 0; afterwards copies for step ti were started at
            # ti-1 and we start ti+1's before waiting
            slot = ti % 2

            @pl.when(ti == 0)
            def _():
                for j in range(tile_t):
                    mk(j, slot * tile_t + j, ti).start()

            @pl.when(ti + 1 < grid_n)
            def _():
                for j in range(tile_t):
                    mk(j, (1 - slot) * tile_t + j, ti + 1).start()
            for j in range(tile_t):
                pltpu.make_async_copy(
                    ypad_ref.at[pl.ds(0, win)],
                    frames.at[slot * tile_t + j],
                    sems.at[slot * tile_t + j]).wait()
            out_ref[...] = frames[slot * tile_t, :tile_t, :1].astype(
                jnp.float32)[None]
            return
        # dma3 / dma3_static
        cs = [mk(j, j, ti) for j in range(tile_t)]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()
        out_ref[...] = frames[0, :tile_t, :1].astype(jnp.float32)[None]

    if variant == "dma3_big":
        scratch = pltpu.VMEM((1, tile_t * win, Bc), jnp.int16)
        n_slots = 1
    else:
        n_slots = 2 * tile_t if variant == "dma3_db" else max(tile_t, 1)
        scratch = pltpu.VMEM((n_slots, win, Bc), jnp.int16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_t, 1), lambda t, s: (t, 0, 0)),
        scratch_shapes=[scratch,
                        pltpu.SemaphoreType.DMA((n_slots,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid_n, tile_t, 1), jnp.float32))


def main():
    dev = jax.devices()[0]
    p = CQTParams(sr=SR, hop=round(SR / 5))
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // p.hop
    win = n_fft + cp._ALIGN_TM
    tile_t, _ = cp._response_plan(n_fft, B, 2)
    t_pad = -(-n_frames // tile_t) * tile_t
    starts = cp._frame_starts(p.hop, 0, n_frames)
    starts = starts + [starts[-1]] * (t_pad - n_frames)
    log(f"dma-rate probe on {dev.device_kind}: B={B}, win={win}, "
        f"tile_t={tile_t}, grid={t_pad//tile_t}, "
        f"window bytes {win*B*2/1e6:.2f} MB")

    curT = jax.jit(lambda: jnp.transpose(
        (jax.random.normal(jax.random.PRNGKey(0), (B, L)) * 8000)
        .astype(jnp.int16)))()
    ypadT = jax.jit(lambda c: cp._pad_signal_for_starts(
        c, starts, n_fft))(curT)
    ypadT.block_until_ready()
    del curT
    Lpad = ypadT.shape[0]
    starts_dev = jnp.asarray(starts, jnp.int32)

    chain_bytes = t_pad * win * B * 2

    for variant in ("grid", "dma1", "dma3", "dma3_static", "dma3_big",
                    "dma3_db"):
        f = build(variant, n_fft=n_fft, t_pad=t_pad, tile_t=tile_t,
                  Bc=B, Lpad=Lpad)
        g = jax.jit(lambda yp, f=f: jnp.sum(f(starts_dev, yp)))
        try:
            t0 = time.perf_counter()
            float(g(ypadT))
            comp = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            log(f"  {variant:12s}: FAILED {type(e).__name__}: {e}")
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [g(ypadT) for _ in range(REPS)]
            for o in outs:
                float(o)
            best = min(best, time.perf_counter() - t0)
        ms = best / REPS * 1e3
        moved = {"grid": 0, "dma1": chain_bytes // tile_t}.get(
            variant, chain_bytes)
        rate = moved / (best / REPS) / 1e9 if moved else 0.0
        log(f"  {variant:12s}: {ms:7.1f} ms  {rate:6.0f} GB/s  "
            f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
