"""Space-to-depth packing A/B for the dominant model convs (round-5).

The model wall decomposition (PERFNOTES round-10): the layer-1 p2p
ConvStack — three (7,7) circular convs at (512, 288, 601, 5/8/8 -> 8) —
carries ~95% of the model's 2.32 TFLOP, but its 8 output channels fill
8/128 MXU lanes. Space-to-depth on the pitch axis (H 288 -> 288/r,
C -> r*C) with a zero-stuffed transformed kernel (kh 7 -> 3 block rows)
trades a 3.4x FLOP inflation (r=8) for an 8x lane fill. This measures
whether the trade wins on the real chip, f32 and bf16, r in {4, 8, 16},
and verifies the transform is EXACT (same math, reassociated).

Run (TPU, serial): timeout 3300 python scripts/microbench_conv_pack.py
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

B, H, T, K = 512, 288, 601, 7
REPS = 10


def pack_kernel(w: np.ndarray, r: int) -> np.ndarray:
    """(kh, kw, ci, co) -> (3, kw, r*ci, r*co) zero-stuffed block kernel.

    out row r*p'+j = sum_dp in[r*p'+j+dp] w[dp+kh//2]; input row
    r*p'+j+dp lands in block p'+b, sub-row u with b*r+u = j+dp.
    """
    kh, kw, ci, co = w.shape
    half = kh // 2
    wp = np.zeros((3, kw, r * ci, r * co), w.dtype)
    for j in range(r):          # output sub-row
        for dp in range(-half, half + 1):
            s = j + dp
            b = s // r          # -1, 0, 1
            u = s - b * r
            wp[b + 1, :, u * ci:(u + 1) * ci, j * co:(j + 1) * co] = \
                w[dp + half]
    return wp


def circ_pad(x, ph, pw):
    x = jnp.concatenate([x[:, -ph:], x, x[:, :ph]], axis=1)
    return jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def baseline(x, w):
    return conv(circ_pad(x, K // 2, K // 2), w)


def packed(x, wp, r):
    """wp: pre-packed (3, kw, r*ci, r*co) kernel from pack_kernel."""
    xp = circ_pad(x, r, K // 2)             # one block halo in pitch
    n, h, t, c = xp.shape
    xp = xp.reshape(n, h // r, r, t, c).transpose(0, 1, 3, 2, 4) \
           .reshape(n, h // r, t, r * c)
    y = conv(xp, wp)
    n, hb, t, rc = y.shape
    return y.reshape(n, hb, t, r, rc // r).transpose(0, 1, 3, 2, 4) \
            .reshape(n, hb * r, t, rc // r)


def wall(fn, *args):
    """fn must return a SCALAR — keeping full conv outputs (3.5 GB each
    at B=512 f32) in flight across REPS dispatches OOMs the 16 GB HBM."""
    t0 = time.time()
    out = fn(*args)
    float(out)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / REPS * 1e3, compile_s


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)
    # NOTE: the exactness gate runs on CPU (tests/test_conv_pack.py);
    # eager TPU ops through the relay each remote-compile — do not add an
    # un-jitted parity phase here.

    for dt in (jnp.float32, jnp.bfloat16):
        name = dt.__name__
        x = jnp.asarray(rng.standard_normal((B, H, T, 8)), dt)
        w = jnp.asarray(rng.standard_normal((K, K, 8, 8)) * 0.05, dt)
        flops = 2 * B * H * T * K * K * 8 * 8
        ms, cs = wall(
            jax.jit(lambda a, b: baseline(a, b).astype(jnp.float32).sum()),
            x, w)
        print(f"[{name}] baseline (7,7)x8->8: {ms:7.2f} ms "
              f"{flops / ms / 1e9:6.1f} TF/s (compile {cs:.0f}s)", flush=True)
        for r in (4, 8, 16):
            wp = jnp.asarray(pack_kernel(np.asarray(w, np.float32), r), dt)
            fn = jax.jit(lambda a, b, _r=r:
                         packed(a, b, _r).astype(jnp.float32).sum())
            ms, cs = wall(fn, x, wp)
            eff_flops = 2 * B * (H // r) * T * 3 * K * (r * 8) * (r * 8)
            print(f"[{name}] packed r={r:2d}: {ms:7.2f} ms "
                  f"(true {flops / ms / 1e9:6.1f} TF/s, "
                  f"mxu {eff_flops / ms / 1e9:6.1f} TF/s; compile {cs:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
