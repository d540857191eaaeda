"""Per-stage wall + traffic budget of the Pallas CQT front-end (VERDICT r3 #3).

cqt-alone measures 55-99 ms at bench geometry against PERFNOTES' claimed
~0.9 GB/step DMA diet. This measures where the time actually goes:

  stage 1: input transpose (B, L) int16 -> (L, B)
  stage 2: halfband cascade (7 x downsample2_tm)
  stage 3: per-octave response kernels (window DMA + rotate + MXU + epilogue)

and computes each stage's EXACT byte budget from the plan (host
arithmetic), so each wall implies an effective GB/s to compare against
the chip's HBM (819 GB/s on v5e). The binding resource falls out:
bandwidth-bound stages run near HBM rate; latency/occupancy-bound stages
run far below it.

Run serially on TPU:  AKX_B=512 python scripts/profile_cqt_pallas.py
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

from audio_key_estimation_tpu.ops import cqt_pallas as cp
from audio_key_estimation_tpu.ops.cqt import (CQTParams, halfband_taps,
                                              kernel_bank)

SR = 44100
CLIP_SECONDS = int(os.environ.get("AKX_CLIP", 120))
B = int(os.environ.get("AKX_B", 512))
REPS = int(os.environ.get("AKX_REPS", 4))
STREAM_DTYPE = os.environ.get("AKX_STREAM_DTYPE", "bfloat16")
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args):
    """Dispatch-loop timing like bench.py::time_fn — REPS separate
    dispatches queued then fetched. A lax.scan of an input-invariant body
    is NOT usable here: XLA's loop-invariant code motion hoists the
    pallas_call/fusion out of the loop and the scan runs it ONCE, so the
    early r4 numbers measured with the scan trick were REPS x too low
    (PERFNOTES 'scan-hoisting artifact'). Dispatch overhead through the
    relay measures 0.02 ms — negligible against >1 ms stages."""
    t0 = time.perf_counter()
    float(fn(*args))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(REPS)]
        for o in outs:
            float(o)
        best = min(best, time.perf_counter() - t0)
    return best / REPS, comp


def scan_reps(body):
    def run(*args):
        return body(*args, jnp.float32(0.0))
    return jax.jit(run)


def main():
    dev = jax.devices()[0]
    p = CQTParams(sr=SR, hop=round(SR / 5))
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // p.hop
    sd = jnp.dtype(STREAM_DTYPE)
    log(f"pallas-cqt stage profile on {dev.device_kind}: B={B}, "
        f"clip={CLIP_SECONDS}s (L={L}), n_fft={n_fft}, hop={p.hop}, "
        f"T={n_frames}, stream_dtype={sd.name}, REPS={REPS}")

    # generated ON DEVICE: a host->device copy of (B, L) int16 through the
    # relay tunnel (~22 MB/s) would take minutes (PERFNOTES "relay H2D wall")
    y16 = jax.jit(lambda: (jax.random.normal(
        jax.random.PRNGKey(0), (B, L)) * 8000).astype(jnp.int16))()
    y16.block_until_ready()

    # ---- stage budgets (exact bytes from the plan) ----
    win = n_fft + cp._ALIGN_TM
    casc_bytes = 0
    resp_bytes = 0
    lens = [L]
    for o in range(1, p.octaves):
        lens.append((lens[-1] - 1) // 2 + 1)
    for o in range(p.octaves):
        item = 2 if (o == 0 or sd.itemsize == 2) else 4
        if o > 0:
            in_item = 2 if o == 1 else sd.itemsize
            casc_bytes += lens[o - 1] * B * in_item   # read
            casc_bytes += lens[o] * B * sd.itemsize   # write
        tile_t, b_chunk = cp._response_plan(n_fft, B, item)
        t_pad = -(-n_frames // tile_t) * tile_t
        resp_bytes += t_pad * win * B * item          # window DMAs
        resp_bytes += t_pad * p.bins_per_octave * B * 4  # kernel output
    out_bytes = n_frames * p.bins_per_octave * p.octaves * B * 4
    in_bytes = L * B * 2
    log(f"budget: input {in_bytes/1e9:.2f} GB, cascade {casc_bytes/1e9:.2f} "
        f"GB, response {resp_bytes/1e9:.2f} GB, final out+transpose "
        f"~{2*out_bytes/1e9:.2f} GB")
    log(f"  total ~{(in_bytes*2 + casc_bytes + resp_bytes + 2*out_bytes)/1e9:.2f}"
        f" GB -> floor {(in_bytes*2 + casc_bytes + resp_bytes + 2*out_bytes)/HBM_GBPS/1e6:.1f} ms at {HBM_GBPS:.0f} GB/s")

    # ---- stage 1+2: transpose + cascade ----
    taps = halfband_taps()

    def cascade(y, c):
        curT = jnp.transpose(y * (1 + c.astype(jnp.int16) * 0))
        acc = jnp.float32(0.0)
        streams = []
        for o in range(p.octaves):
            if o > 0:
                curT = cp.downsample2_tm(curT, taps,
                                         out_scale=(1 / 32768.0) if o == 1
                                         else 1.0)
                if sd != jnp.float32:
                    curT = curT.astype(sd)
            streams.append(curT)
            acc = acc + jnp.sum(curT[0].astype(jnp.float32))
        return acc

    ms, comp = timeit(scan_reps(cascade), y16)
    log(f"stage transpose+cascade: {ms*1e3:8.1f} ms  "
        f"(~{(in_bytes*2 + casc_bytes)/ms/1e9:6.0f} GB/s implied; "
        f"compile {comp:.0f}s)")

    # ---- stage 3: response kernels, octave streams built incrementally ----
    # natural dtype chain (int16 top octave -> stream_dtype below), one
    # stream live at a time: three simultaneous (L, B) buffers (y16 +
    # curT + ypadT) would exceed the 16 GB HBM at B=512
    curT = jax.jit(jnp.transpose)(y16)      # (L, B) int16, like cqt_pallas
    curT.block_until_ready()
    del y16

    # jitted (intermediates fused, not materialized — the eager path's
    # f32 window concat alone is ~11 GB at B=512) with the input donated
    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def ds_step(c, scale):
        out = cp.downsample2_tm(c, taps, out_scale=scale)
        return out.astype(sd) if sd != jnp.float32 else out

    kmat_t = jnp.asarray(np.ascontiguousarray(
        np.concatenate([bank["k_cos"], bank["k_sin"]], axis=1).T))
    total_resp = 0.0
    for o in range(p.octaves):
        if o > 0:
            nxt = ds_step(curT, (1 / 32768.0) if o == 1 else 1.0)
            nxt.block_until_ready()
            curT = nxt
        item = jnp.dtype(curT.dtype).itemsize
        starts = cp._frame_starts(p.hop, o, n_frames)
        tile_t, b_chunk = cp._response_plan(n_fft, B, item)
        t_pad = -(-n_frames // tile_t) * tile_t
        starts = starts + [starts[-1]] * (t_pad - n_frames)
        ypadT = jax.jit(
            lambda c, s=tuple(starts): cp._pad_signal_for_starts(
                c, list(s), n_fft))(curT)
        ypadT.block_until_ready()
        scale = (1 / 32768.0 if o == 0 else 1.0) * 2.0 ** (o / 2)
        scales = jnp.asarray(bank["scales"] * scale, jnp.float32)[:, None]
        starts_dev = jnp.asarray(starts, jnp.int32)
        lane0 = jnp.asarray([0], jnp.int32)

        def resp(yp, st, l0, km, sc, c):
            out = cp._octave_response_frames(
                yp, st, l0, km, sc, n_fft=n_fft, t_pad=t_pad,
                tile_t=tile_t, b_chunk=(b_chunk if b_chunk < B else 0))
            return jnp.sum(out[0, :, 0]) + c * 0

        ms, comp = timeit(scan_reps(resp), ypadT, starts_dev, lane0,
                          kmat_t, scales)
        del ypadT
        o_bytes = t_pad * win * B * item + t_pad * p.bins_per_octave * B * 4
        flops = 2 * B * t_pad * n_fft * 2 * p.bins_per_octave
        total_resp += ms
        log(f"  octave {o}: {ms*1e3:7.1f} ms  tile_t={tile_t} "
            f"t_pad={t_pad} dtype={curT.dtype.str[1:]} "
            f"DMA {o_bytes/1e9:5.2f} GB -> {o_bytes/ms/1e9:6.0f} GB/s  "
            f"MXU {flops/ms/49.2e12*100:5.1f}% (compile {comp:.0f}s)")
    log(f"stage response total:    {total_resp*1e3:8.1f} ms")
    del curT

    # ---- whole front-end ----
    y16 = jax.jit(lambda: (jax.random.normal(
        jax.random.PRNGKey(0), (B, L)) * 8000).astype(jnp.int16))()
    y16.block_until_ready()
    def full(y, c):
        out = cp.cqt_pallas(y * (1 + c.astype(jnp.int16) * 0), p,
                            stream_dtype=sd)
        return jnp.sum(out[0, :, 0])

    ms, comp = timeit(scan_reps(full), y16)
    log(f"cqt_pallas end-to-end:   {ms*1e3:8.1f} ms  (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
