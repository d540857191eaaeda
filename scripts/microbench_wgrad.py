"""Microbenchmark of the train step's dominant backward op: the weight
gradient of the 288-row 7x7 pitch-stream convs (VERDICT r3 item 2).

profile_bwd_convs.py attributed ~45 of the 88 ms backward wall to the
three wgrad convolutions lhs=(128,294,607,8) x rhs=(128,288,601,8) ->
(8,7,7,8)/(5,...): a 139 GF contraction with a 3k-element output, whose
N=8 output width can use at most 8/128 MXU lanes per pass unless the
compiler splits the contraction into lane-filling partials. This measures
the achievable rate across dtypes and an explicit K-split formulation, to
decide whether the wall is shape-fundamental or compiler-addressable.

Run serially on TPU: python scripts/microbench_wgrad.py
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax import lax

N, P, T, CI, CO = 128, 288, 601, 8, 8
K = 7
REPS = 8
F32_PEAK = 49.2e12
BF16_PEAK = 196.8e12
FLOPS = 2.0 * N * P * T * K * K * CI * CO


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS, comp


def scan8(body):
    def run(a, d):
        def step(c, _):
            pert = (a * (1 + c * 1e-12).astype(a.dtype))
            return c + jnp.sum(body(pert, d)).astype(jnp.float32), None
        return lax.scan(step, jnp.float32(0.0), None, length=REPS)[0]
    return jax.jit(run)


def wgrad_conv(act, dy):
    """wgrad as XLA emits it: activations as lhs, dy as rhs kernel."""
    return lax.conv_general_dilated(
        act, dy, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("fb01", "io01", "01bf"),
        preferred_element_type=jnp.float32)


def wgrad_vjp(act, dy):
    """wgrad through jax.vjp of the forward conv (what autodiff builds)."""
    def fwd(w):
        return lax.conv_general_dilated(
            act, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w0 = jnp.zeros((K, K, CI, CO), act.dtype)
    _, vjp = jax.vjp(fwd, w0)
    (dw,) = vjp(dy)
    return dw


def main():
    dev = jax.devices()[0]
    log(f"wgrad microbench on {dev.device_kind}; shape act=(128,294,607,8) "
        f"dy=(128,288,601,8) -> dw=(7,7,8,8); {FLOPS/1e9:.1f} GF")
    rng = np.random.default_rng(0)
    act32 = jnp.asarray(rng.standard_normal(
        (N, P + K - 1, T + K - 1, CI)).astype(np.float32))
    dy32 = jnp.asarray(rng.standard_normal(
        (N, P, T, CO)).astype(np.float32))

    for tag, dt, peak in (("f32", jnp.float32, F32_PEAK),
                          ("bf16", jnp.bfloat16, BF16_PEAK)):
        act = act32.astype(dt)
        dy = dy32.astype(dt)
        for name, fn in (("vjp-of-fwd-conv", wgrad_vjp),):
            try:
                f = scan8(fn)
                dt_s, comp = timeit(f, act, dy)
                log(f"  {tag:4s} {name:18s} {dt_s*1e3:7.2f} ms  "
                    f"MFU(f32-peak) {FLOPS/dt_s/F32_PEAK*100:5.1f}%  "
                    f"of-{tag}-peak {FLOPS/dt_s/peak*100:5.1f}%  "
                    f"(compile {comp:.0f}s)")
            except Exception as e:
                log(f"  {tag} {name} FAILED: {e!r}")


if __name__ == "__main__":
    main()
