"""Fused Pallas serving path for the Pitch2Pitch ConvStack (round-5).

Motivation (PERFNOTES round-10): at serving batch the model stage is
memory-pipeline-bound, and its FLOPs live almost entirely in the
layer-1 p2p ConvStack — three (7,7) circular convs at
(B=512, H=288, T=601, C<=8) whose 8 output channels leave the MXU grid
nearly idle under any XLA formulation. This kernel computes one
conv + folded-BatchNorm affine + leaky-relu layer per pallas_call in
the TRANSPOSED (H, T, C, B) layout — the PHYSICAL order XLA already
assigns the model's NHWC activations on TPU (minor-to-major {0,3,2,1}:
batch fills the lane dim, channels the 8 sublanes), so the logical
entry/exit transposes are layout bitcasts, not copies. A time-major
(T, H, C, B) variant whose patch window slices the leading dim (free
VMEM reinterpretation) measured IDENTICAL kernel time (57.7 vs 57.9
ms/stack: the kernel is MXU-dot-shape-bound, not layout-bound) but
LOST ~30 ms in-model to real H<->T transposes at the stack boundary —
in-model fused vs plain was +0.2% (bench model-delta cell), which is
what picked this layout.

 * the (7,7) x ci -> 8 conv becomes, per (4-row, 4-col) output block,
   ONE MXU matmul (128, K') @ (K', B): M = 4*4*8 = 128 output rows,
   K' = 10*10*ci input window — a 2-D block-Toeplitz zero-stuffed
   weight (`pack_dense_w`). FLOP inflation (10*10)/(7*7) = 2.04x buys
   a FULL MXU grid (vs 8/128 rows direct).
 * the input slab (10 h-rows x (chunk+6) t-cols x ci x ALL B lanes) is
   one double-buffered DMA per grid step; contiguous ~100s-of-KB HBM
   runs per row.
 * eval-mode BatchNorm folds into the weights host-side
   (`fold_convstack_params`); leaky-relu runs in the f32 epilogue.

Parity: tests/test_convstack_pallas.py pins the fused path against
blocks.ConvStack (flax, eval mode) in interpret mode. The reference has
no counterpart (torch Sequential of Conv2d/BN, reference models.py:
205-243); this is the TPU-native serving formulation of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.01          # blocks.LEAKY_SLOPE
_H2, _T2 = 4, 4             # output block (rows, cols) per matmul
_CO = 8                     # supported output channels (flagship stacks)
_LANES = 128


def fold_bn_affine(gamma, beta, mean, var, eps=1e-5):
    """Eval BatchNorm as per-channel (scale, shift)."""
    s = gamma / np.sqrt(var + eps)
    return s, beta - mean * s


def pack_dense_w(w, bias, scale=None, shift=None):
    """(7,7,ci,8) conv kernel (+bias, + optional BN affine) -> the
    (128, 100*ci) block-Toeplitz dense weight + (128, 1) bias.

    Row m = (ih*_T2 + jt)*_CO + co computes output (h0+ih, t0+jt, co);
    column p = ((ih+dh)*10 + (jt+dt))*ci + c reads slab h-row ih+dh,
    t-col jt+dt, channel c of the (10, 10, ci) input window.
    """
    kh, kw, ci, co = w.shape
    if (kh, kw, co) != (7, 7, _CO):
        raise ValueError(f"unsupported kernel {w.shape}")
    w = np.asarray(w, np.float32)
    bias = np.asarray(bias, np.float32)
    if scale is not None:
        w = w * np.asarray(scale, np.float32)
        bias = bias * np.asarray(scale, np.float32) \
            + np.asarray(shift, np.float32)
    hh, tt = _H2 + kh - 1, _T2 + kw - 1                  # 10, 10
    out = np.zeros((_H2 * _T2 * _CO, hh * tt * ci), np.float32)
    for ih in range(_H2):
        for jt in range(_T2):
            for dh in range(kh):
                for dt in range(kw):
                    r0 = (ih * _T2 + jt) * _CO
                    p0 = ((ih + dh) * tt + (jt + dt)) * ci
                    out[r0:r0 + _CO, p0:p0 + ci] = w[dh, dt].T
    b128 = np.repeat(bias[None, :], _H2 * _T2, 0).reshape(-1, 1)
    return out, b128.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret"))
def _conv7_layer(xp, w_dense, b128, *, chunk: int, interpret: bool = False):
    """One folded conv+affine+leaky layer.

    xp      : (Hp, Tp, 8, B) bf16 — circularly PRE-PADDED by 3 on both
              spatial dims, right-padded so (Tp - 6) % chunk == 0 and
              (Hp - 6) % _H2 == 0, channels zero-padded to 8 (full
              sublane tiles for the slab DMA).
    w_dense : (128, 100*ci_true) bf16 packed at the layer's TRUE input
              width — the kernel slices the slab's zero channels off
              before the patch fold, so ci_true < 8 contracts less.
    b128    : (128, 1) f32
    returns : (Hp-6, Tp-6, 8, B) bf16 (right-pad t-cols included).

    The slab holds (_H2+6) h-rows x (chunk+6) t-cols x 8 x ALL B
    lanes; per fixed h the (t, c, B) body is one contiguous HBM run.
    """
    Hp, Tp, ci, B = xp.shape
    H, T = Hp - 6, Tp - 6
    ci_true = w_dense.shape[1] // ((_H2 + 6) * (_T2 + 6))
    if H % _H2 or T % chunk or chunk % _T2 or B % _LANES or ci_true > ci:
        raise ValueError(f"geometry {xp.shape} chunk={chunk} "
                         f"K'={w_dense.shape[1]}")
    nh, nc = H // _H2, T // chunk
    nj = chunk // _T2
    kdt = xp.dtype
    slab_t = chunk + 6

    total = nh * nc

    def kernel(xp_ref, w_ref, b_ref, out_ref, slab, sems):
        i, c = pl.program_id(0), pl.program_id(1)
        step = i * nc + c                     # c is the innermost grid dim

        def copy(ii, ci_, slot):
            return pltpu.make_async_copy(
                xp_ref.at[pl.ds(ii * _H2, _H2 + 6),
                          pl.ds(ci_ * chunk, slab_t), :, :],
                slab.at[slot], sems.at[slot])

        @pl.when(step == 0)
        def _first():
            copy(i, c, 0).start()

        # double buffer: issue step+1's slab while computing this one
        nxt = step + 1

        @pl.when(nxt < total)
        def _issue():
            copy(nxt // nc, nxt % nc, nxt % 2).start()

        copy(i, c, step % 2).wait()
        w = w_ref[:]
        bias = b_ref[:]
        for j in range(nj):
            # one full-width dot: N = B lanes (B//128 lane-tiles)
            patch = slab[step % 2, :, j * _T2:j * _T2 + _T2 + 6]
            if ci_true < ci:
                patch = patch[:, :, :ci_true]
            patch = patch.reshape((_H2 + 6) * (_T2 + 6) * ci_true, B)
            acc = jnp.dot(w, patch, preferred_element_type=jnp.float32)
            acc = acc + bias
            acc = jnp.where(acc >= 0, acc, LEAKY_SLOPE * acc)
            out_ref[:, j * _T2:j * _T2 + _T2] = \
                acc.astype(kdt).reshape(_H2, _T2, _CO, B)

    out = pl.pallas_call(
        kernel,
        grid=(nh, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # xp stays in HBM
            pl.BlockSpec((_H2 * _T2 * _CO, (_H2 + 6) * (_T2 + 6) * ci_true),
                         lambda i, c: (0, 0)),
            pl.BlockSpec((_H2 * _T2 * _CO, 1), lambda i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (_H2, chunk, _CO, B), lambda i, c: (i, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, T, _CO, B), kdt),
        scratch_shapes=[
            pltpu.VMEM((2, _H2 + 6, slab_t, ci, B), kdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * H * T * B * _CO * 100 * ci_true,
            bytes_accessed=int(xp.size * 2.6 * kdt.itemsize
                               + H * T * _CO * B * kdt.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_dense, b128)
    return out


def pack_dense_w_jax(w, bias, scale=None, shift=None):
    """Traceable `pack_dense_w`: same (128, 100*ci) block-Toeplitz dense
    weight + (128, 1) bias, built from jnp ops so it can run INSIDE a
    jitted model apply (the flax serving gate folds live checkpoint
    params; see blocks.ConvStack). Row/col layout identical to
    `pack_dense_w` (pinned exactly by tests/test_convstack_pallas.py).
    """
    kh, kw, ci, co = w.shape
    if (kh, kw, co) != (7, 7, _CO):
        raise ValueError(f"unsupported kernel {w.shape}")
    w = jnp.asarray(w, jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)
    if scale is not None:
        scale = jnp.asarray(scale, jnp.float32)
        w = w * scale
        bias = bias * scale + jnp.asarray(shift, jnp.float32)
    hh, tt = _H2 + kh - 1, _T2 + kw - 1                  # 10, 10
    wp = jnp.pad(w, ((0, hh - kh), (0, tt - kw), (0, 0), (0, 0)))
    dh = jnp.arange(hh)[None, :] - jnp.arange(_H2)[:, None]   # (4, 10)
    dt = jnp.arange(tt)[None, :] - jnp.arange(_T2)[:, None]   # (4, 10)
    vh = (dh >= 0) & (dh < kh)
    vt = (dt >= 0) & (dt < kw)
    # g[ih, ph, jt, pt, c, co] = wp[ph - ih, pt - jt, c, co] (masked)
    g = wp[dh.clip(0, hh - 1)][:, :, dt.clip(0, tt - 1)]
    g = g * (vh[:, :, None, None, None, None]
             & vt[None, None, :, :, None, None])
    # rows ordered (ih, jt, co); cols ordered (ph, pt, c)
    out = g.transpose(0, 2, 5, 1, 3, 4).reshape(_H2 * _T2 * _CO,
                                                hh * tt * ci)
    b128 = jnp.tile(bias, _H2 * _T2)[:, None]
    return out, b128


def fold_bn_affine_jax(gamma, beta, mean, var, eps=1e-5):
    """Traceable `fold_bn_affine`."""
    s = jnp.asarray(gamma, jnp.float32) \
        / jnp.sqrt(jnp.asarray(var, jnp.float32) + eps)
    return s, jnp.asarray(beta, jnp.float32) \
        - jnp.asarray(mean, jnp.float32) * s


def _circ_pad_ht(x, t_target):
    """(H, T, C, B) -> (H+6, t_target+6, C, B): circular 3-pad on H and
    T, then zero right-pad T to t_target (junk t-cols past T are read
    only by the last chunks' windows, producing junk OUTPUT t-cols >= T
    which the caller slices off)."""
    H, T, C, B = x.shape
    x = jnp.concatenate([x[-3:], x, x[:3]], axis=0)
    x = jnp.concatenate([x[:, -3:], x, x[:, :3]], axis=1)
    pad = t_target - T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x


_VMEM_BUDGET = 14 * 2 ** 20   # scoped-vmem limit is 16 MiB (measured:
                              # a 16.86M plan was rejected); leave margin


def pick_chunk(T: int, B: int, itemsize: int = 2, cap: int = 152) -> int:
    """Largest multiple-of-_T2 time chunk that (a) fits the VMEM budget —
    double-buffered full-lane slab + double-buffered output block —
    and (b) minimizes right-pad waste (t_pad = ceil(T/chunk)*chunk);
    ties go to the largest chunk (fewest grid steps)."""
    per_c = ((_H2 + 6) * 2 + _H2 * 2) * _CO * B * itemsize    # slab+out per col
    fixed = (_H2 + 6) * 2 * 6 * _CO * B * itemsize            # slab halo cols
    cmax = (_VMEM_BUDGET - fixed) // per_c // _T2 * _T2
    cmax = min(cap, max(_T2, cmax))
    if T <= cmax:
        return -(-T // _T2) * _T2
    best, cost = cmax, None
    for c in range(cmax, _T2 - 1, -_T2):
        t_pad = -(-T // c) * c
        # traffic objective: pad waste AND the 6-column slab halo
        # amplification (a waste-only objective picks c=4, whose halo
        # re-reads 2.5x the columns — measured 79.7 vs 60.9 ms)
        k = t_pad * (c + 6) / c
        if cost is None or k < cost:
            best, cost = c, k
    return best


def supported_geometry(shape, conv_layers_cins) -> bool:
    """True when (B, H, T, Cin) + the stack's input widths fit the fused
    kernel's static contract (B lanes full, H row blocks full, <= 8
    channels throughout, 8 output channels)."""
    B, H, T, Cin = shape
    return (B % _LANES == 0 and H % _H2 == 0 and T >= 1
            and all(ci <= _CO for ci in conv_layers_cins)
            and Cin == conv_layers_cins[0])


def fused_convstack(x, layers, *, chunk: int = None,
                    interpret: bool = False):
    """Serving-path ConvStack: x (B, H, T, Cin) -> (B, H, T, 8).

    layers: [(w (7,7,ci,8), bias (8,), bn_scale (8,), bn_shift (8,)),...]
    with ci == Cin for layer 0 and 8 after. Equivalent to
    blocks.ConvStack(equivariant=False, resblock=False, denseblock=False)
    in eval mode. B must be a multiple of 128 and H of 4. Fully
    traceable: layer params may be live jnp tracers (the flax serving
    gate calls this inside a jitted apply).
    """
    B, H, T, Cin = x.shape
    if chunk is None:
        chunk = pick_chunk(T, B)
    t_pad = -(-T // chunk) * chunk
    # logical (H, T, C, B) == XLA's physical NHWC layout on TPU
    # (minor-to-major {0,3,2,1}) -> this transpose is a layout bitcast
    xt = x.transpose(1, 2, 3, 0).astype(jnp.bfloat16)
    if Cin < _CO:
        # the slab DMA needs full 8-sublane tiles (Mosaic rejects
        # ci=5 memref slices); zero channels are exact
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, _CO - Cin), (0, 0)))
    elif Cin != _CO:
        raise ValueError(f"Cin={Cin} unsupported (<= {_CO})")
    # The dense weight packs at NATIVE ci: layer 1 (ci=5 flagship)
    # contracts K'=500 instead of a channel-padded 800 — 37% less work
    # on the kernel's binding resource (the MXU dot). The kernel slices
    # the zero channels off the slab value before the patch fold.
    for li, (w, bias, s, t) in enumerate(layers):
        w = jnp.asarray(w)
        wd, b128 = pack_dense_w_jax(w, bias, s, t)
        xp = _circ_pad_ht(xt[:, :T] if li else xt, t_pad)
        xt = _conv7_layer(xp, wd.astype(jnp.bfloat16),
                          b128, chunk=chunk,
                          interpret=interpret)
    return xt[:, :T].transpose(3, 0, 1, 2)


def fold_convstack_params(params, batch_stats, conv_layers: int):
    """Extract [(w, bias, scale, shift)] from a flax ConvStack's
    variables (plain path: conv seq_{3i} + BatchNorm seq_{3i+1})."""
    out = []
    for i in range(conv_layers):
        conv = params[f"seq_{3 * i}"]
        bn = params[f"seq_{3 * i + 1}"]["bn"]
        st = batch_stats[f"seq_{3 * i + 1}"]["bn"]
        s, t = fold_bn_affine(np.asarray(bn["scale"]),
                              np.asarray(bn["bias"]),
                              np.asarray(st["mean"]),
                              np.asarray(st["var"]))
        out.append((np.asarray(conv["kernel"]),
                    np.asarray(conv["bias"]), s, t))
    return out
