"""Span-mode response kernel on/off A-B at the bench geometries (VERDICT
r4 item 3).

PERFNOTES round-7 parked the response stage at 2.5x over its 40.5 ms
traffic floor, bound by per-window DMA issue on deep octaves (spacing =
hop/2**o < n_fft => overlapping windows re-read the stream and pay the
~5 us issue cost thousands of times per batch). _octave_response_span
coalesces K consecutive frames into ONE DMA; this measures cqt_pallas
end-to-end with the span dispatch enabled vs forced off (off = the
round-3 per-window frames kernel on every octave), at both flagship
geometries, int16 input + bf16 streams (the product path).

Run on TPU:  python scripts/microbench_span.py
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

from audio_key_estimation_tpu.ops import cqt_pallas as cp
from audio_key_estimation_tpu.ops.cqt import CQTParams

B = int(os.environ.get("AKX_B", 512))
REPS = int(os.environ.get("AKX_REPS", 4))
CLIP_SECONDS = int(os.environ.get("AKX_CLIP", 120))


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args):
    """Dispatch-loop timing like bench.py::time_fn: the relay's
    block_until_ready does NOT block on remote execution, so each rep's
    output is reduced to a scalar ON DEVICE and fetched — queue all REPS
    dispatches first so the ~30 ms relay round trip overlaps compute."""
    red = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(red(*args))
    t0 = time.perf_counter()
    outs = [red(*args) for _ in range(REPS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform}), B={B}, "
        f"clips {CLIP_SECONDS}s, REPS={REPS}")
    rng = np.random.default_rng(0)
    orig_plan = cp._span_plan
    geoms = {"22050": ((22050, 4410),), "44100": ((44100, 8820),),
             "both": ((22050, 4410), (44100, 8820))}
    for sr, hop in geoms[os.environ.get("AKX_SR", "both")]:
        p = CQTParams(sr=sr, hop=hop, bins_per_octave=36, octaves=8)
        y = rng.integers(-20000, 20000,
                         size=(B, sr * CLIP_SECONDS)).astype(np.int16)
        yd = jax.device_put(jnp.asarray(y))
        n_fft = cp.kernel_bank(p)["n_fft"]
        engaged = [
            (o, orig_plan(n_fft, -(-B // 128) * 128,
                          jnp.dtype(jnp.bfloat16).itemsize if o else 2,
                          hop / 2 ** o))
            for o in range(p.octaves)]
        log(f"SR {sr}: span plans per octave: "
            + ", ".join(f"o{o}:{pl and pl[0]}" for o, pl in engaged))
        walls = {}
        for mode in ("off", "on"):
            cp._span_plan = (lambda *a: None) if mode == "off" else orig_plan
            fn = jax.jit(lambda x, _p=p: cp.cqt_pallas(
                x, _p, stream_dtype=jnp.bfloat16))
            walls[mode] = timeit(fn, yd)
            log(f"  span {mode:>3}: {walls[mode]:8.1f} ms")
        cp._span_plan = orig_plan
        d = (walls["off"] - walls["on"]) / walls["off"] * 100
        log(f"  SR {sr}: span saves {d:+.1f}% "
            f"({walls['off']:.1f} -> {walls['on']:.1f} ms)")


if __name__ == "__main__":
    main()
