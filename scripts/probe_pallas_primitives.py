"""Probe Mosaic support for the primitives a chunked in-VMEM cascade
kernel needs, on the real TPU:

  P1: value reshape (n, 128) -> (n//2, 256)        [stage re-blocking]
  P2: strided sublane slice x[0::2, :]             [alternative re-blocking]
  P3: int16 block load + convert to f32            [raw PCM ingestion]
  P4: manual HBM->VMEM DMA at dynamic offset       [chunk fetch]
  P5: static lane-slice concat (window assembly)   [polyphase windows]

Each probe prints OK/FAIL with the error; failures are expected findings,
not bugs. Run serially on TPU.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        fn()
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
        print(f"{name}: FAIL — {msg}", flush=True)


def p1_reshape():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(4, 256)

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((4, 256), jnp.float32),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.arange(8 * 128,
                                  dtype=np.float32).reshape(4, 256))


def p2_strided():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.concatenate([v[0::2, :], v[1::2, :]], axis=1)

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((4, 256), jnp.float32),
    )(x)
    ref = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    np.testing.assert_array_equal(
        np.asarray(out), np.concatenate([ref[0::2], ref[1::2]], axis=1))


def p3_int16():
    x = (np.arange(8 * 128) % 3001 - 1500).astype(np.int16).reshape(8, 128)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32) * (1.0 / 32768.0)

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x.astype(np.float32) / 32768,
                               rtol=1e-6)


def p4_dma():
    L = 4096
    x = np.arange(4 * L, dtype=np.float32).reshape(4, L)

    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)
        start = i * 128 + 64  # dynamic, not a block multiple
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(start, 256)], buf.at[:], sem)
        dma.start()
        dma.wait()
        o_ref[0, :] = buf[:] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(x))
    ref = np.stack([x[i, i * 128 + 64: i * 128 + 64 + 256] * 2
                    for i in range(4)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def p4b_dma_2d():
    """2-D dest: rows of a (B, L) HBM array fetched as a (rows, width)
    tile at a dynamic row offset (the response-kernel fetch pattern)."""
    L, W = 64, 256
    x = np.arange(L * W, dtype=np.float32).reshape(L, W)

    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * 8 + 3, 16), :], buf.at[:], sem)
        dma.start()
        dma.wait()
        o_ref[0] = buf[:] + 1.0

    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 16, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 16, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(x))
    ref = np.stack([x[i * 8 + 3: i * 8 + 19] + 1 for i in range(4)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def p5_window():
    x = jnp.arange(9 * 256, dtype=jnp.float32).reshape(9, 256)

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.concatenate([v[:8, :], v[1:9, :48]], axis=1)

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 304), jnp.float32),
    )(x)
    ref = np.arange(9 * 256, dtype=np.float32).reshape(9, 256)
    np.testing.assert_array_equal(
        np.asarray(out), np.concatenate([ref[:8], ref[1:9, :48]], axis=1))


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"probing on {dev.device_kind} ({dev.platform})", flush=True)
    probe("P1 reshape (n,128)->(n/2,256)", p1_reshape)
    probe("P2 strided sublane slice [0::2]", p2_strided)
    probe("P3 int16 load+convert", p3_int16)
    probe("P4 dynamic-offset 1D DMA", p4_dma)
    probe("P4b dynamic-row 2D DMA", p4b_dma_2d)
    probe("P5 window concat (lane slices)", p5_window)
