"""Input-transpose Pallas kernel experiment — measured NO-WIN, not wired.

The pallas CQT path flips the (B, L) int16 batch to time-major (L, B)
once per step. Measured in isolation that transpose looked like the
dominant front-end cost (43 ms for 2.7 GB of traffic, 4x off the
~273 GB/s stream floor, because every output tile gathers 256 thin row
segments). This kernel was built to beat it:

  * grid over L panels; each step DMAs a FAT (B, 4096) column panel
    (one ~8 KB segment per batch row) with manual double buffering;
  * transposes the panel on the MXU against a BxB identity — value rides
    as a bf16 hi/lo pair (hi bf16-exact, lo <= 128 and integer for int16
    input) so the two-pass sum is EXACT for PCM despite the MXU's
    default bf16 operand rounding;
  * composes librosa's reflect pad and the zero extension into the
    output from small precomputed boundary inputs, so the pad costs no
    extra pass.

Results (TPU v5e, B=256, 2-min int16, same process):

  isolated:   kernel 64.3 ms vs jnp.transpose 180.0 ms (identical sum
              epilogues) — looks like a large win;
  in-situ:    cqt_pallas full path 86.7 ms (kernel) vs 84.4 ms (XLA
              transpose) — a 2.3 ms LOSS, and the kernel costs 97 s of
              cold compile.

Conclusion (PERFNOTES.md "input-transpose kernel"): XLA already fuses
the input transpose into its consumers — the cascade einsum reads its
operand through the transpose and the pallas-operand pad writes it — so
there is no standalone 43 ms pass to delete; the isolated measurement
was an artifact of forcing materialization. Kept here (self-contained,
with the A/B harness) as perf archaeology and as the starting point if
the front-end is ever restructured so the transpose really does
materialize.

Run serially (one TPU process at a time):  python scripts/experiment_transpose_kernel.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN_TM = 16
_TP_SUP = 4096   # padded output rows per grid step (int16; halved for f32)
_TP_SUB = 1024   # transpose sub-tile (bounds the VMEM f32 temp)


def _tp_plan(L: int, half: int, need: int, sup: int):
    """Static block layout: pure-top / mixed-top / interior / mixed-tail /
    pure-tail regions of the padded output, all boundaries 128-aligned."""
    C = (L // 128) * 128          # interior cols served by panel DMAs
    tb_abs = half + C
    # the padded signal must cover both the last aligned window (need) and
    # the whole interior+tail layout (need alone can fall short when the
    # last frame start sits well before L)
    lfull = -(-max(need, tb_abs + 1) // sup) * sup
    hbi, top_off = divmod(half, sup)
    tbi, rem = divmod(tb_abs, sup)
    ok = (half >= 128 and half % 128 == 0 and C >= sup and tbi >= hbi + 1)
    return ok, C, lfull, tb_abs, hbi, top_off, tbi, rem


@functools.partial(
    jax.jit, static_argnames=("half", "L", "sup", "interpret"))
def _transpose_pad_call(y, top, tail, eye, *, half: int, L: int, sup: int,
                        interpret: bool = False):
    B = y.shape[0]
    dtype = y.dtype
    lfull = tail.shape[0] + half + (L // 128) * 128
    ok, C, lfull2, tb_abs, hbi, top_off, tbi, rem = _tp_plan(
        L, half, lfull, sup)
    assert ok and lfull2 == lfull
    nblk = lfull // sup
    dlo = hbi                       # first block needing a panel DMA
    dhi = tbi if rem > 0 else tbi - 1
    int_lo = hbi + 1 if top_off > 0 else hbi

    def kernel(y_ref, top_ref, tail_ref, eye_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        def start(j, slot):
            s = jnp.clip(j * sup - half, 0, C - sup)
            s = pl.multiple_of(s, 128)
            pltpu.make_async_copy(
                y_ref.at[:, pl.ds(s, sup)], scratch.at[slot],
                sems.at[slot]).start()

        def wait(slot):
            pltpu.make_async_copy(
                y_ref.at[:, pl.ds(0, sup)], scratch.at[slot],
                sems.at[slot]).wait()

        @pl.when(i == dlo)
        def _():
            start(dlo, dlo % 2)

        @pl.when((i >= dlo) & (i < dhi))
        def _():
            start(i + 1, (i + 1) % 2)

        @pl.when((i >= dlo) & (i <= dhi))
        def _():
            wait(jax.lax.rem(i, jnp.int32(2)))

        def buf():
            # current panel: dynamic double-buffer slot on the untiled dim
            return scratch[pl.ds(jax.lax.rem(i, jnp.int32(2)), 1)][0]

        def tr_write(x, off, w):
            # (B, w) panel slice -> (w, B) rows at out_ref[off:off+w],
            # transposed on the MXU in _TP_SUB column strips. The MXU's
            # default precision rounds f32 operands to bf16 (8-bit
            # mantissa — would corrupt int16 samples > 256), so the value
            # rides as a bf16 hi/lo pair, making the two-pass sum EXACT
            # for PCM (and ~2^-17 relative for float input).
            for j0 in range(0, w, _TP_SUB):
                wseg = min(_TP_SUB, w - j0)
                seg = x[:, j0:j0 + wseg].astype(jnp.float32)
                hi = seg.astype(jnp.bfloat16).astype(jnp.float32)
                lo = seg - hi
                dims = (((0,), (0,)), ((), ()))
                r = (jax.lax.dot_general(
                        hi, eye_ref[:], dims,
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        lo, eye_ref[:], dims,
                        preferred_element_type=jnp.float32))
                out_ref[pl.ds(off + j0, wseg)] = r.astype(dtype)

        if hbi > 0:
            @pl.when(i < hbi)
            def _():
                out_ref[...] = top_ref[pl.ds(i * sup, sup)]

        if top_off > 0:
            @pl.when(i == hbi)
            def _():
                out_ref[pl.ds(0, top_off)] = top_ref[
                    pl.ds(hbi * sup, top_off)]
                tr_write(buf(), top_off, sup - top_off)

        @pl.when((i >= int_lo) & (i < tbi))
        def _():
            tr_write(buf(), 0, sup)

        if rem > 0:
            @pl.when(i == tbi)
            def _():
                tr_write(buf()[:, sup - rem:], 0, rem)
                out_ref[pl.ds(rem, sup - rem)] = tail_ref[
                    pl.ds(0, sup - rem)]

        # full-block tail copies only exist when the tail spans past the
        # mixed block (guard statically: the slice would otherwise trace a
        # sup-row read of a shorter tail input)
        if (nblk > tbi + 1) if rem > 0 else (nblk > tbi):
            @pl.when(i > tbi if rem > 0 else i >= tbi)
            def _():
                out_ref[...] = tail_ref[pl.ds(i * sup - tb_abs, sup)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # y (B, L) stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top (half, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tail (tail_len, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # eye (B, B) f32
        ],
        out_specs=pl.BlockSpec((sup, B), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, sup), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((lfull, B), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * B * B,
            bytes_accessed=(C + lfull) * B * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, top, tail, eye)


def transpose_pad_tm(y: jax.Array, last_start: int, n_fft: int, *,
                     interpret: bool = False):
    """Fused (B, L) -> (lfull, B) transpose + reflect pad + zero extension.

    Output rows [0, half) are the librosa reflect head, [half, half+L) the
    transposed signal, then the half+1 reflect tail and zeros out to a
    block multiple >= last_start + n_fft + _ALIGN_TM. Returns None when
    the geometry cannot use the kernel."""
    B, L = y.shape
    half = n_fft // 2
    need = last_start + n_fft + _ALIGN_TM
    sup = _TP_SUP if y.dtype.itemsize == 2 else _TP_SUP // 2
    ok, C, lfull, tb_abs, hbi, top_off, tbi, rem = _tp_plan(
        L, half, need, sup)
    if not ok or L < half + 2:
        return None
    top = jnp.transpose(jnp.flip(y[:, 1:half + 1], axis=1))
    tail_len = lfull - tb_abs
    refl = jnp.flip(y[:, L - half - 2:L - 1], axis=1)   # y[L-2]..y[L-half-2]
    tail_bm = jnp.concatenate([y[:, C:], refl], axis=1)
    if tail_bm.shape[1] < tail_len:
        tail_bm = jnp.pad(tail_bm, ((0, 0), (0, tail_len - tail_bm.shape[1])))
    else:
        tail_bm = tail_bm[:, :tail_len]
    tail = jnp.transpose(tail_bm)
    eye = jnp.eye(B, dtype=jnp.float32)
    return _transpose_pad_call(y, top, tail, eye, half=half, L=L, sup=sup,
                               interpret=interpret)


def main():
    SR = 22050
    B = 256
    L = SR * 120
    reps = 5
    dev = jax.devices()[0]
    print(f"transpose kernel experiment on {dev.device_kind}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        (rng.uniform(-0.5, 0.5, (B, L)) * 32767).astype(np.int16)), dev)
    last_start = (L // 4410) * 4410

    # correctness (interpret on CPU would be slow at this size; check a
    # small odd-L case instead)
    ys = np.asarray(y[:128, :30001])
    got = transpose_pad_tm(jnp.asarray(ys), (30001 // 4410) * 4410, 512,
                           interpret=dev.platform != "tpu")
    ref = np.pad(ys.T, ((256, 257), (0, 0)), mode="reflect")
    lf = got.shape[0]
    ref = np.pad(ref, ((0, max(0, lf - ref.shape[0])), (0, 0)))[:lf]
    np.testing.assert_array_equal(np.asarray(got), ref)
    print("correctness: exact", file=sys.stderr)

    def timed(name, fn):
        t0 = time.perf_counter()
        r0 = fn(y)
        float(jnp.sum(r0[::1024].astype(jnp.float32)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(y) for _ in range(reps)]
        for o in outs:
            float(jnp.sum(o[::1024].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:12s} {dt * 1e3:9.2f} ms/step (compile {comp:.1f}s)",
              file=sys.stderr)

    timed("tp-kernel", jax.jit(
        lambda v: transpose_pad_tm(v, last_start, 512)))
    timed("tp-xla", jax.jit(lambda v: jnp.transpose(v)))


if __name__ == "__main__":
    main()
