"""Lowering variants for the hot p2p circular conv stack.

Shape under test (layer >= 1 pitch stream, bench geometry):
  x (16, 288, 601, 5) -> conv7x7 -> 8ch -> conv7x7 -> 8 -> conv7x7 -> 8
Tiny channel counts leave the MXU lane-starved; this measures which
lowering gets closest to the lane-bound roofline on v5e.
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

import jax.numpy as jnp
import numpy as np
from jax import lax

B, P, T = 16, 288, 601
K = 7
CH = [5, 8, 8, 8]
INNER = 8
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / REPS / INNER
    gf = flops_total() / 1e9
    log(f"{name:44s} {dt * 1e3:8.2f} ms/op  {gf / dt / 1e3:6.2f} TF/s "
        f"(compile {comp:.1f}s)")
    return dt


def flops_total():
    f = 0
    for i in range(3):
        f += B * P * T * K * K * CH[i] * CH[i + 1] * 2
    return f


def amortize(op):
    @jax.jit
    def run(x, ws):
        def body(acc, i):
            return acc + jnp.sum(op(x + i.astype(x.dtype) * 1e-6, ws)
                                 .astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return acc
    return run


def circ_pad(x, ph, pw):
    if ph:
        x = jnp.concatenate([x[:, -ph:], x, x[:, :ph]], axis=1)
    if pw:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    return x


def stack_nhwc(x, ws, prec=None, dtype=None):
    for w in ws:
        xi = circ_pad(x, K // 2, K // 2)
        if dtype is not None:
            xi, w = xi.astype(dtype), w.astype(dtype)
        x = lax.conv_general_dilated(
            xi, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec, preferred_element_type=jnp.float32)
        x = jnp.maximum(x, 0.01 * x)
    return x


def stack_nchw(x, ws):
    x = x.transpose(0, 3, 1, 2)
    for w in ws:
        xp = jnp.concatenate([x[:, :, -3:], x, x[:, :, :3]], axis=2)
        xp = jnp.concatenate([xp[:, :, :, -3:], xp, xp[:, :, :, :3]], axis=3)
        x = lax.conv_general_dilated(
            xp, w.transpose(3, 2, 0, 1), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(x, 0.01 * x)
    return x.transpose(0, 2, 3, 1)


def stack_im2col_pitch(x, ws, dtype=None):
    """im2col over the pitch taps (7 shifted copies -> channels), then a
    time-only conv with K = 7*7*Cin in the contraction."""
    for w in ws:
        cin, cout = w.shape[2], w.shape[3]
        xp = circ_pad(x, K // 2, 0)
        cols = jnp.concatenate([xp[:, dp:dp + P] for dp in range(K)], axis=-1)
        # W2[0, dt, dp*cin+ci, co] = w[dp, dt, ci, co]
        wk = w.transpose(1, 0, 2, 3).reshape(K, K * cin, cout)[None]
        ci = circ_pad(cols, 0, K // 2)
        if dtype is not None:
            ci, wk = ci.astype(dtype), wk.astype(dtype)
        x = lax.conv_general_dilated(
            ci, wk, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(x, 0.01 * x)
    return x


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform}); "
        f"stack flops {flops_total() / 1e9:.1f} GF")
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(B, P, T, CH[0])).astype(np.float32)), dev)
    ws = [jnp.asarray(rng.normal(size=(K, K, CH[i], CH[i + 1]))
                      .astype(np.float32) * 0.1) for i in range(3)]

    # correctness of the im2col variant vs baseline (host, small)
    xs = x[:1, :, :50]
    a = np.asarray(stack_nhwc(xs, ws))
    c = np.asarray(stack_im2col_pitch(xs, ws))
    np.testing.assert_allclose(a, c, rtol=2e-2, atol=1e-2)
    log("im2col variant matches")

    timed("nhwc f32 (current)", amortize(lambda v, w: stack_nhwc(v, w)), x, ws)
    timed("nhwc bf16 in/out", amortize(
        lambda v, w: stack_nhwc(v, w, dtype=jnp.bfloat16)), x, ws)
    timed("nhwc f32 precision=HIGHEST", amortize(
        lambda v, w: stack_nhwc(v, w, prec=lax.Precision.HIGHEST)), x, ws)
    timed("nhwc f32 precision=DEFAULT", amortize(
        lambda v, w: stack_nhwc(v, w, prec=lax.Precision.DEFAULT)), x, ws)
    timed("nchw f32", amortize(lambda v, w: stack_nchw(v, w)), x, ws)
    timed("im2col-pitch f32", amortize(
        lambda v, w: stack_im2col_pitch(v, w)), x, ws)
    timed("im2col-pitch bf16", amortize(
        lambda v, w: stack_im2col_pitch(v, w, dtype=jnp.bfloat16)), x, ws)


def _pallas_extra():
    """Appended: packed (K=kw*cin, N=kh*cout) lowering timings."""
    from audio_key_estimation_tpu.ops.conv_pallas import circular_conv2d_packed
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(B, P, T, CH[0])).astype(np.float32)), dev)
    ws = [jnp.asarray(rng.normal(size=(K, K, CH[i], CH[i + 1]))
                      .astype(np.float32) * 0.1) for i in range(3)]
    bs = [jnp.zeros((CH[i + 1],), jnp.float32) for i in range(3)]

    def stack_packed(use_pallas):
        def run(v, _ws):
            for w, bb in zip(_ws, bs):
                v = circular_conv2d_packed(v, w, bb, use_pallas)
                v = jnp.maximum(v, 0.01 * v)
            return v
        return run
    timed("packed xla einsum", amortize(stack_packed(False)), x, ws)
    timed("packed pallas fused", amortize(stack_packed(True)), x, ws)


if __name__ == "__main__":
    main()
    _pallas_extra()
