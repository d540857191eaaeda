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


def wgrad_grouped3(act3, dy3):
    """The train step's three identical-shape pitch-conv wgrads as ONE
    grouped conv (feature_group_count=3): output co = 24 lanes instead of
    three co=8 ops — tests whether the wall is output-lane packing."""
    def fwd(w):
        return lax.conv_general_dilated(
            act3, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)
    w0 = jnp.zeros((K, K, CI, 3 * CO), act3.dtype)
    _, vjp = jax.vjp(fwd, w0)
    (dw,) = vjp(dy3)
    return dw


def wgrad_wide(act, dy24):
    """Same contraction with co=24 in one UNGROUPED conv (3x the FLOPs of
    one true wgrad): isolates pure lane-packing scaling."""
    def fwd(w):
        return lax.conv_general_dilated(
            act, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w0 = jnp.zeros((K, K, CI, 3 * CO), act.dtype)
    _, vjp = jax.vjp(fwd, w0)
    (dw,) = vjp(dy24)
    return dw


def wgrad_cross24(act24, dy24):
    """act ci=24 x dy co=24 ungrouped: ONE conv computing all 9 cross
    blocks (9x FLOPs); the train step needs only the 3 diagonal blocks.
    If its wall stays near the single wgrad's, the three pitch-conv wgrads
    fuse into this one op + a free diagonal slice."""
    def fwd(w):
        return lax.conv_general_dilated(
            act24, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w0 = jnp.zeros((K, K, 3 * CI, 3 * CO), act24.dtype)
    _, vjp = jax.vjp(fwd, w0)
    (dw,) = vjp(dy24)
    return dw[:, :, :CI, :CO] + dw[:, :, CI:2 * CI, CO:2 * CO] \
        + dw[:, :, 2 * CI:, 2 * CO:]


def main():
    dev = jax.devices()[0]
    log(f"wgrad microbench on {dev.device_kind}; shape act=(128,294,607,8) "
        f"dy=(128,288,601,8) -> dw=(7,7,8,8); {FLOPS/1e9:.1f} GF")
    rng = np.random.default_rng(0)
    act32 = jnp.asarray(rng.standard_normal(
        (N, P + K - 1, T + K - 1, CI)).astype(np.float32))
    dy32 = jnp.asarray(rng.standard_normal(
        (N, P, T, CO)).astype(np.float32))

    act3_32 = jnp.concatenate([act32, act32 * 0.5, act32 * 0.25], axis=3)
    dy3_32 = jnp.concatenate([dy32, dy32 * 0.5, dy32 * 0.25], axis=3)

    for tag, dt, peak in (("f32", jnp.float32, F32_PEAK),
                          ("bf16", jnp.bfloat16, BF16_PEAK)):
        act = act32.astype(dt)
        dy = dy32.astype(dt)
        act3 = act3_32.astype(dt)
        dy3 = dy3_32.astype(dt)
        cases = (("vjp-of-fwd-conv", wgrad_vjp, (act, dy), 1.0),
                 ("grouped-x3", wgrad_grouped3, (act3, dy3), 3.0),
                 ("wide-co24", wgrad_wide, (act, dy3), 3.0),
                 ("cross-24x24", wgrad_cross24, (act3, dy3), 9.0))
        for name, fn, args, nf in cases:
            fl = FLOPS * nf
            try:
                f = scan8(fn)
                dt_s, comp = timeit(f, *args)
                log(f"  {tag:4s} {name:18s} {dt_s*1e3:7.2f} ms "
                    f"({fl/1e9:5.0f} GF = {nf:.0f}x wgrad)  "
                    f"MFU(f32-peak) {fl/dt_s/F32_PEAK*100:5.1f}%  "
                    f"of-{tag}-peak {fl/dt_s/peak*100:5.1f}%  "
                    f"(compile {comp:.0f}s)")
            except Exception as e:
                log(f"  {tag} {name} FAILED: {e!r}")


if __name__ == "__main__":
    main()
