"""In-kernel stage split of the Pallas CQT response kernel (VERDICT r3 #3).

profile_cqt_pallas.py showed octave 0 runs at ~104 GB/s effective — far
below both HBM rate and the MXU — so the kernel is bound by something
INSIDE the grid step. This compiles stage-truncated variants of
_octave_response_frames (same grid, same DMAs) and walls each:

  dma     : window DMAs only; epilogue writes a slice of the raw frame
  rotate  : dma + the per-frame f32 convert + pltpu.roll sublane rotate
  matmul  : dma + convert + MXU filterbank matmul (NO rotate)
  full    : the production kernel (rotate + matmul + mag/scale/log1p)

(full - matmul) isolates the rotate; (matmul - dma) isolates convert+MXU;
(dma) vs the byte budget tells whether the DMA chain itself serializes.

Run on TPU:  AKX_B=512 AKX_OCTAVE=0 python scripts/probe_cqt_kernel_stages.py
"""
import functools
import math
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_key_estimation_tpu.ops import cqt_pallas as cp
from audio_key_estimation_tpu.ops.cqt import (CQTParams, halfband_taps,
                                              kernel_bank)

SR = 44100
CLIP_SECONDS = int(os.environ.get("AKX_CLIP", 120))
B = int(os.environ.get("AKX_B", 512))
REPS = int(os.environ.get("AKX_REPS", 4))
OCTAVE = int(os.environ.get("AKX_OCTAVE", 0))
STREAM_DTYPE = os.environ.get("AKX_STREAM_DTYPE", "bfloat16")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def variant_kernel(variant, *, n_fft, t_pad, tile_t, Bc, bpo, in_dtype):
    win = n_fft + cp._ALIGN_TM

    def kernel(st_ref, lane_ref, ypad_ref, kmat_ref, scales_ref, out_ref,
               frames, sems):
        ti = pl.program_id(0)
        copies = []
        rems = []
        for j in range(tile_t):
            off = st_ref[ti * tile_t + j]
            off_al = pl.multiple_of(off // cp._ALIGN_TM * cp._ALIGN_TM,
                                    cp._ALIGN_TM)
            rems.append(off - off_al)
            copies.append(pltpu.make_async_copy(
                ypad_ref.at[pl.ds(off_al, win)], frames.at[j], sems.at[j]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        if variant == "dma":
            for j in range(tile_t):
                out_ref[j] = frames[j][:bpo].astype(jnp.float32)
            return
        if variant == "rotate":
            for j in range(tile_t):
                buf = frames[j].astype(jnp.float32)
                rot = pltpu.roll(buf, win - rems[j], 0)
                out_ref[j] = rot[:bpo]
            return
        cols = []
        for j in range(tile_t):
            buf = frames[j].astype(jnp.float32)
            if variant == "full":
                cols.append(pltpu.roll(buf, win - rems[j], 0)[:n_fft])
            else:  # matmul: no rotate
                cols.append(buf[:n_fft])
        fr = jnp.concatenate(cols, axis=1)
        r = jnp.dot(kmat_ref[:], fr, preferred_element_type=jnp.float32)
        if variant == "matmul":
            for j in range(tile_t):
                out_ref[j] = r[:bpo, j * Bc:(j + 1) * Bc]
            return
        cc = r[:bpo]
        ss = r[bpo:]
        mag = jnp.sqrt(cc * cc + ss * ss) * scales_ref[:]
        lg = jnp.log1p(mag)
        for j in range(tile_t):
            out_ref[j] = lg[:, j * Bc:(j + 1) * Bc]

    return kernel


def run_variant(variant, ypadT, starts_dev, lane0, kmat_t, scales, *,
                n_fft, t_pad, tile_t):
    Lpad, Bc = ypadT.shape
    bpo = kmat_t.shape[0] // 2
    win = n_fft + cp._ALIGN_TM
    kern = variant_kernel(variant, n_fft=n_fft, t_pad=t_pad, tile_t=tile_t,
                          Bc=Bc, bpo=bpo, in_dtype=ypadT.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tile_t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_t, bpo, Bc), lambda t, s, l: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((tile_t, win, Bc), ypadT.dtype),
                        pltpu.SemaphoreType.DMA((tile_t,))],
    )
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, bpo, Bc), jnp.float32))

    # dispatch-loop timing (bench.py::time_fn) — a scan of an invariant
    # body gets its pallas_call hoisted by XLA LICM and runs once
    g = jax.jit(lambda yp: jnp.sum(
        f(starts_dev, lane0, yp, kmat_t, scales)[0, :, 0]))
    t0 = time.perf_counter()
    float(g(ypadT))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [g(ypadT) for _ in range(REPS)]
        for o in outs:
            float(o)
        best = min(best, time.perf_counter() - t0)
    return best / REPS, comp


def main():
    dev = jax.devices()[0]
    p = CQTParams(sr=SR, hop=round(SR / 5))
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // p.hop
    sd = jnp.dtype(STREAM_DTYPE)
    o = OCTAVE
    log(f"kernel stage probe on {dev.device_kind}: B={B}, octave={o}, "
        f"n_fft={n_fft}, T={n_frames}, stream_dtype={sd.name}")

    taps = halfband_taps()
    curT = jax.jit(lambda: jnp.transpose(
        (jax.random.normal(jax.random.PRNGKey(0), (B, L)) * 8000)
        .astype(jnp.int16)))()
    curT.block_until_ready()

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def ds_step(c, scale):
        out = cp.downsample2_tm(c, taps, out_scale=scale)
        return out.astype(sd) if sd != jnp.float32 else out

    for oo in range(1, o + 1):
        curT = ds_step(curT, (1 / 32768.0) if oo == 1 else 1.0)
        curT.block_until_ready()

    item = jnp.dtype(curT.dtype).itemsize
    starts = cp._frame_starts(p.hop, o, n_frames)
    tile_t, b_chunk = cp._response_plan(n_fft, B, item)
    t_pad = -(-n_frames // tile_t) * tile_t
    starts = starts + [starts[-1]] * (t_pad - n_frames)
    ypadT = jax.jit(lambda c: cp._pad_signal_for_starts(
        c, starts, n_fft))(curT)
    ypadT.block_until_ready()
    del curT
    scale = (1 / 32768.0 if o == 0 else 1.0) * 2.0 ** (o / 2)
    scales = jnp.asarray(bank["scales"] * scale, jnp.float32)[:, None]
    starts_dev = jnp.asarray(starts, jnp.int32)
    lane0 = jnp.asarray([0], jnp.int32)
    kmat_t = jnp.asarray(np.ascontiguousarray(
        np.concatenate([bank["k_cos"], bank["k_sin"]], axis=1).T))

    win = n_fft + cp._ALIGN_TM
    dma_gb = t_pad * win * B * item / 1e9
    log(f"geometry: tile_t={tile_t}, t_pad={t_pad}, grid={t_pad//tile_t}, "
        f"dtype={curT_dtype(item)}, window DMA {dma_gb:.2f} GB "
        f"-> {dma_gb/0.819:.2f} ms floor at 819 GB/s")

    results = {}
    for variant in ("dma", "rotate", "matmul", "full"):
        ms, comp = run_variant(variant, ypadT, starts_dev, lane0, kmat_t,
                               scales, n_fft=n_fft, t_pad=t_pad,
                               tile_t=tile_t)
        results[variant] = ms
        log(f"  {variant:7s}: {ms*1e3:7.1f} ms  (compile {comp:.0f}s)")
    log(f"deltas: rotate-only {1e3*(results['rotate']-results['dma']):.1f} "
        f"ms, convert+mxu {1e3*(results['matmul']-results['dma']):.1f} ms, "
        f"rotate-in-full {1e3*(results['full']-results['matmul']):.1f} ms, "
        f"epilogue+rest {1e3*(results['full']-results['rotate']-(results['matmul']-results['dma'])):.1f} ms")


def curT_dtype(item):
    return {2: "i2/bf16", 4: "f32"}[item]


if __name__ == "__main__":
    main()
