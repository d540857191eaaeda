"""Microbenchmarks for MXU-friendly CQT front-end building blocks.

Variants measured on the current device (run serially):
  downsample: current 1-channel FIR conv  vs  polyphase block matmul
  octave response: gather+einsum (current) vs direct strided conv
                   vs conv_general_dilated_patches + matmul
Prints ms per op over the bench-shaped workload; correctness asserted
against the current implementations first at small size on host.
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

from audio_key_estimation_tpu.ops.cqt import (CQTParams, downsample2,
                                              halfband_taps, kernel_bank)

SR = 22050
CLIP_SECONDS = 120
BATCH = 16
REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


INNER = 8  # on-device repetitions per dispatch — amortizes the ~30 ms
           # relay round trip so sub-30ms ops are measurable


def timed(name, fn, *args, reps=REPS):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / reps / INNER
    log(f"{name:40s} {dt * 1e3:9.2f} ms/op  (compile {compile_s:.1f}s, "
        f"{INNER}x amortized)")
    return dt


def amortize(op):
    """jit a fn(y)->scalar that runs `op` INNER times on perturbed inputs."""
    @jax.jit
    def run(y):
        def body(acc, i):
            return acc + op(y + i.astype(y.dtype) * 1e-6), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return acc
    return run


# ---------------------------------------------------------------------------
# polyphase block-matmul downsample
# ---------------------------------------------------------------------------

def downsample2_mxu_factory(taps_np, block=256, dtype=np.float32):
    n_taps = len(taps_np)
    pad = n_taps // 2
    out_block = block // 2
    width = block + 2 * pad
    w = np.zeros((width, out_block), np.float32)
    for m in range(out_block):
        w[2 * m: 2 * m + n_taps, m] = taps_np
    w = jnp.asarray(w.astype(dtype))

    def down(y):
        b, L = y.shape
        nb = -(-L // block)
        out_len = (L - 1) // 2 + 1
        yp = jnp.pad(y, ((0, 0), (pad, nb * block + block + 2 * pad - L - pad)))
        a = yp[:, : nb * block].reshape(b, nb, block)
        tail = yp[:, block: block + nb * block].reshape(b, nb, block)[..., : 2 * pad]
        window = jnp.concatenate([a, tail], axis=-1).astype(w.dtype)
        out = jnp.einsum("bnw,wm->bnm", window, w,
                         preferred_element_type=jnp.float32)
        return out.reshape(b, nb * out_block)[:, :out_len]

    return down


# ---------------------------------------------------------------------------
# octave response variants: (B, L) signal -> (B, T, 2*bpo) responses
# at integer stride s (stream-decomposed case), kernel (n_fft, 2*bpo)
# ---------------------------------------------------------------------------

def response_gather(y, kmat, s, T):
    n_fft = kmat.shape[0]
    half = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    idx = (jnp.arange(T) * s)[:, None] + jnp.arange(n_fft)[None, :]
    frames = ypad[:, idx]
    return jnp.einsum("btn,nk->btk", frames, kmat,
                      preferred_element_type=jnp.float32)


def response_conv(y, kmat, s, T):
    n_fft = kmat.shape[0]
    half = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    need = (T - 1) * s + n_fft
    ypad = ypad[:, :need]
    lhs = ypad[:, :, None]                                   # (B, L, C=1)
    rhs = kmat[:, None, :]                                   # (K, 1, 2bpo)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(s,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32)
    return out


def response_patches(y, kmat, s, T):
    n_fft = kmat.shape[0]
    half = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
    need = (T - 1) * s + n_fft
    ypad = ypad[:, :need]
    patches = jax.lax.conv_general_dilated_patches(
        ypad[:, :, None], filter_shape=(n_fft,), window_strides=(s,),
        padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    return jnp.einsum("btn,nk->btk", patches, kmat,
                      preferred_element_type=jnp.float32)


def main():
    p = CQTParams(sr=SR, hop=round(SR / 5), bins_per_octave=36, octaves=8)
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]], 1))
    taps_np = np.asarray(halfband_taps())
    taps = jnp.asarray(taps_np)

    # correctness at small size (host/device agnostic)
    rng = np.random.default_rng(0)
    y_small = jnp.asarray(rng.normal(size=(2, 5000)).astype(np.float32))
    ref = downsample2(y_small, taps)
    got = downsample2_mxu_factory(taps_np)(y_small)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-6)
    log("downsample2_mxu matches downsample2")
    T_small, s_small = 9, 500
    r0 = response_gather(y_small, kmat, s_small, T_small)
    r1 = response_conv(y_small, kmat, s_small, T_small)
    r2 = response_patches(y_small, kmat, s_small, T_small)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r2), rtol=2e-4,
                               atol=2e-4)
    log("response variants agree")

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    L = SR * CLIP_SECONDS
    y = jax.device_put(jnp.asarray(
        rng.normal(size=(BATCH, L)).astype(np.float32) * 0.1), dev)

    # --- downsample cascade: 7 halvings, summed tail to force execution ---
    def cascade(down_fn):
        def op(y):
            acc = jnp.float32(0)
            cur = y
            for _ in range(p.octaves - 1):
                cur = down_fn(cur)
                acc = acc + jnp.sum(cur[:, :8])
            return acc
        return amortize(op)

    timed("cascade: conv downsample2 (current)",
          cascade(lambda c: downsample2(c, taps)), y)
    timed("cascade: polyphase block matmul",
          cascade(downsample2_mxu_factory(taps_np)), y)

    # --- octave response at full rate, stride hop (o=0 case) ---
    T = 1 + L // p.hop

    def wrap(fn, s, T):
        return amortize(lambda y: jnp.sum(fn(y, kmat, s, T)))

    for name, fn in (("gather+einsum", response_gather),
                     ("strided conv", response_conv),
                     ("patches+einsum", response_patches)):
        timed(f"response o=0 s={p.hop}: {name}", wrap(fn, p.hop, T), y)

    # --- stream-decomposed lower octave: o=5 -> q=16 streams, stride 2205
    # at rate sr/32; emulate with the q-stacked batch shape (B*q, L5)
    o = 5
    q = 2 ** (o - 1)
    L5 = L // 2 ** o
    Tq = -(-T // q)
    yq = jax.device_put(jnp.asarray(
        rng.normal(size=(BATCH * q, L5)).astype(np.float32)), dev)
    for name, fn in (("gather+einsum", response_gather),
                     ("strided conv", response_conv),
                     ("patches+einsum", response_patches)):
        timed(f"response o=5 q=16 s={p.hop // 2}: {name}",
              wrap(fn, p.hop // 2, Tq), yq)

    # --- bf16 variants of the winners ---
    kmat_bf = kmat.astype(jnp.bfloat16)

    def response_conv_bf16(y, _km, s, T):
        n_fft = kmat_bf.shape[0]
        half = n_fft // 2
        ypad = jnp.pad(y, ((0, 0), (half, half + 1)), mode="reflect")
        need = (T - 1) * s + n_fft
        lhs = ypad[:, :need, None].astype(jnp.bfloat16)
        rhs = kmat_bf[:, None, :]
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(s,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)

    timed(f"response o=0 s={p.hop}: strided conv bf16",
          wrap(response_conv_bf16, p.hop, T), y)
    timed(f"response o=5 q=16: strided conv bf16",
          wrap(response_conv_bf16, p.hop // 2, Tq), yq)

    def down_bf(c):
        return downsample2(c, taps.astype(jnp.bfloat16)) \
            if False else downsample2(c.astype(jnp.bfloat16),
                                      taps.astype(jnp.bfloat16)).astype(jnp.float32)
    timed("cascade: conv downsample2 bf16", cascade(down_bf), y)

    mxu_down_bf = downsample2_mxu_factory(taps_np, dtype=jnp.bfloat16)
    timed("cascade: polyphase matmul bf16",
          cascade(lambda c: mxu_down_bf(c)), y)


if __name__ == "__main__":
    main()
