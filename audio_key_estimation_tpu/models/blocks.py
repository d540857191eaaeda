"""Flax building blocks for PitchClassNet.

Thin flax wrappers over the pure ops in `ops/`, with parameter layouts and
submodule names chosen so `torch_port.py` can map reference checkpoints
(state_dict keys like ``model.0.pc2pc.layer.3.conv2d.weight``) mechanically.

BatchNorm semantics match torch (momentum 0.1 -> flax 0.9, eps 1e-5);
LeakyReLU slope is torch's default 0.01.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import equivariant as eqv
from ..ops import pooling


LEAKY_SLOPE = 0.01


def _init_conv(key, shape, dtype):
    """Kaiming-uniform fan-in init, matching torch Conv2d default.

    torch's ``reset_parameters`` calls ``kaiming_uniform_(w, a=sqrt(5))``:
    gain = sqrt(2/(1+a^2)) = sqrt(1/3), std = gain/sqrt(fan_in), and the
    uniform bound is sqrt(3)*std = 1/sqrt(fan_in).  (Round-2 shipped
    sqrt(3)/sqrt(fan_in) — 3x the variance; fixed in round 3 and pinned
    against real torch in tests/test_torch_port.py.)
    """
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0] * shape[1]
    bound = 1.0 / fan_in ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _init_bias_for(fan_in):
    def init(key, shape, dtype):
        bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class EquivariantConv(nn.Module):
    """EquivariantPitchClassConvolutionSimple (reference models.py:22-51)."""
    in_ch: int
    out_ch: int
    kernel_depth: int
    same_depth_padding: bool = False
    pitch_classes: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.pitch_classes, self.kernel_depth, self.in_ch, self.out_ch)
        w = self.param("kernel", _init_conv, shape, jnp.float32)
        b = self.param("bias", _init_bias_for(self.pitch_classes * self.kernel_depth * self.in_ch),
                       (self.out_ch,), jnp.float32)
        return eqv.equivariant_pc_conv(x, w, b,
                                       same_depth_padding=self.same_depth_padding)


class CircularConv(nn.Module):
    """Conv2d with torch circular padding (Pitch2Pitch/ResBlock/pool_semi)."""
    in_ch: int
    out_ch: int
    kernel: tuple            # (kh, kw)
    strides: tuple = (1, 1)
    circular_pad: tuple = None  # default (kh//2, kw//2)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        shape = (kh, kw, self.in_ch, self.out_ch)
        w = self.param("kernel", _init_conv, shape, jnp.float32)
        b = (self.param("bias", _init_bias_for(kh * kw * self.in_ch),
                        (self.out_ch,), jnp.float32) if self.use_bias else None)
        return eqv.circular_conv2d(x, w, b, strides=self.strides,
                                   circular_pad=self.circular_pad)


class ZeroPadConv(nn.Module):
    """Plain Conv2d with zero padding (dense-layer convs, genre head)."""
    in_ch: int
    out_ch: int
    kernel: tuple
    padding: tuple = (0, 0)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        shape = (kh, kw, self.in_ch, self.out_ch)
        w = self.param("kernel", _init_conv, shape, jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=[self.padding[0:1] * 2, self.padding[1:2] * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", _init_bias_for(kh * kw * self.in_ch),
                           (self.out_ch,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class ThirdUpsample(nn.Module):
    """ConvTranspose2d((3,1),(3,1)) semitone->third (models.py:325)."""
    in_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", _init_conv, (3, self.in_ch, self.out_ch), jnp.float32)
        b = self.param("bias", _init_bias_for(3 * self.in_ch), (self.out_ch,), jnp.float32)
        return eqv.third_upsample(x, w, b)


class BatchNorm(nn.Module):
    """torch BatchNorm2d semantics over NHWC channels."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


# ---------------------------------------------------------------------------
# residual / dense blocks
# ---------------------------------------------------------------------------

class ResBlock(nn.Module):
    """2-conv residual block, circular padding (models.py:402-427)."""
    kernel_size: int
    num_filters: int
    equivariant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        k, f = self.kernel_size, self.num_filters
        if self.equivariant:
            conv1 = EquivariantConv(f, 2 * f, k, same_depth_padding=True,
                                    dtype=self.dtype, name="conv1")
            conv2 = EquivariantConv(2 * f, f, k, same_depth_padding=True,
                                    dtype=self.dtype, name="conv2")
        else:
            conv1 = CircularConv(f, 2 * f, (k, k), dtype=self.dtype, name="conv1")
            conv2 = CircularConv(2 * f, f, (k, k), dtype=self.dtype, name="conv2")
        r = conv1(x)
        r = BatchNorm(2 * f, dtype=self.dtype, name="b1")(r, train)
        r = leaky_relu(r)
        r = conv2(r)
        r = BatchNorm(f, dtype=self.dtype, name="b2")(r, train)
        return leaky_relu(x + r)


class DenseLayer(nn.Module):
    """DenseNet bottleneck layer (models.py:456-582).

    norm1 -> LeakyReLU -> 1x1 conv -> norm2 -> ReLU -> kxk conv.
    Non-equivariant convs are bias-free with zero padding (torchvision
    heritage); equivariant convs carry biases (the reference's equivariant
    conv always has one). The reference checkpoints the bottleneck
    (models.py:485-489); jax.checkpoint is applied by the caller via remat.
    """
    in_ch: int
    growth: int
    bn_size: int
    kernel_size: int
    equivariant: bool
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.bn_size * self.growth
        y = BatchNorm(self.in_ch, dtype=self.dtype, name="norm1")(x, train)
        y = leaky_relu(y)
        if self.equivariant:
            y = EquivariantConv(self.in_ch, mid, 1, dtype=self.dtype, name="conv1")(y)
        else:
            y = ZeroPadConv(self.in_ch, mid, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(mid, dtype=self.dtype, name="norm2")(y, train)
        y = nn.relu(y)
        k = self.kernel_size
        if self.equivariant:
            y = EquivariantConv(mid, self.growth, k, same_depth_padding=True,
                                dtype=self.dtype, name="conv2")(y)
        else:
            y = ZeroPadConv(mid, self.growth, (k, k), padding=(k // 2, k // 2),
                            use_bias=False, dtype=self.dtype, name="conv2")(y)
        if self.drop_rate > 0:
            # F.dropout on the new features (models.py:516-517), training-only
            y = nn.Dropout(rate=self.drop_rate)(y, deterministic=not train)
        return y


class DenseBlock(nn.Module):
    """Densely-connected block (models.py:584-648)."""
    num_layers: int
    in_ch: int
    bn_size: int
    growth: int
    kernel_size: int
    equivariant: bool
    multi_path: bool = False
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        features = [x]
        for i in range(self.num_layers):
            k = (2 * i + 3) if self.multi_path else self.kernel_size
            inp = jnp.concatenate(features, axis=-1)
            new = DenseLayer(self.in_ch + i * self.growth, self.growth,
                             self.bn_size, k, self.equivariant,
                             drop_rate=self.drop_rate,
                             dtype=self.dtype, name=f"denselayer{i + 1}")(inp, train)
            features.append(new)
        return jnp.concatenate(features, axis=-1)


# ---------------------------------------------------------------------------
# conv stacks (PitchClass2PitchClass / Pitch2Pitch, models.py:168-243)
# ---------------------------------------------------------------------------

class ConvStack(nn.Module):
    """Stack of convs (+BN+LeakyReLU) or res/dense blocks.

    `equivariant=True` gives PitchClass2PitchClass (circular pitch-class
    convs, models.py:168-203); False gives Pitch2Pitch (circular Conv2d,
    models.py:205-243). Submodule names seq_{i} mirror the torch Sequential
    indices for checkpoint porting.
    """
    in_ch: int
    out_ch: int
    kernel_size: int
    conv_layers: int
    equivariant: bool
    resblock: bool = False
    denseblock: bool = False
    multi_path: bool = False
    drop_rate: float = 0.0
    fused_serving: bool = False
    dtype: Any = jnp.float32

    def _conv(self, i, cin, cout):
        k = self.kernel_size
        if self.equivariant:
            return EquivariantConv(cin, cout, k, same_depth_padding=True,
                                   dtype=self.dtype, name=f"seq_{i}")
        return CircularConv(cin, cout, (k, k), dtype=self.dtype, name=f"seq_{i}")

    @nn.compact
    def __call__(self, x, train: bool):
        if self.resblock:
            x = self._conv(0, self.in_ch, self.out_ch)(x)
            x = BatchNorm(self.out_ch, dtype=self.dtype, name="seq_1")(x, train)
            x = leaky_relu(x)
            for i in range(self.conv_layers):
                x = ResBlock(self.kernel_size, self.out_ch,
                             equivariant=self.equivariant, dtype=self.dtype,
                             name=f"seq_{3 + i}")(x, train)
            return x
        if self.denseblock:
            bn_size = self.in_ch // 2 if self.in_ch > 1 else 1
            return DenseBlock(self.conv_layers, self.in_ch, bn_size,
                              self.out_ch, self.kernel_size, self.equivariant,
                              multi_path=self.multi_path,
                              drop_rate=self.drop_rate, dtype=self.dtype,
                              name="seq_0")(x, train)
        if self._use_fused(x.shape, train):
            return self._fused_apply(x)
        idx = 0
        for i in range(self.conv_layers):
            cin = self.in_ch if i == 0 else self.out_ch
            x = self._conv(idx, cin, self.out_ch)(x)
            x = BatchNorm(self.out_ch, dtype=self.dtype,
                          name=f"seq_{idx + 1}")(x, train)
            x = leaky_relu(x)
            idx += 3
        return x

    # ---- fused Pallas serving path (ops/convstack_pallas.py) ----

    def _use_fused(self, shape, train: bool) -> bool:
        """Eval-only dispatch to the fused serving kernel: plain
        (non-equivariant, kernel-7, 8-out) stacks at MXU-friendly
        geometry (B%128==0, H%4==0, all widths <= 8). During init the
        plain path runs so every checkpoint param is still created."""
        if (not self.fused_serving or train or self.is_initializing()
                or self.equivariant or self.resblock or self.denseblock
                or self.kernel_size != 7 or self.out_ch != 8):
            return False
        from ..ops import convstack_pallas as CP
        cins = [self.in_ch] + [self.out_ch] * (self.conv_layers - 1)
        return CP.supported_geometry(shape, cins)

    def _fused_apply(self, x):
        """Fold each conv+BN pair from this stack's own (possibly traced)
        checkpoint params and run the fused kernel. Off-TPU backends run
        the kernel in interpret mode (tests; explicit opt-in only)."""
        from ..ops import convstack_pallas as CP
        layers = []
        for i in range(self.conv_layers):
            conv = self.get_variable("params", f"seq_{3 * i}")
            bn = self.get_variable("params", f"seq_{3 * i + 1}")["bn"]
            st = self.get_variable("batch_stats", f"seq_{3 * i + 1}")["bn"]
            s, t = CP.fold_bn_affine_jax(bn["scale"], bn["bias"],
                                         st["mean"], st["var"])
            layers.append((conv["kernel"], conv["bias"], s, t))
        interpret = jax.default_backend() != "tpu"
        y = CP.fused_convstack(x, layers, interpret=interpret)
        return y.astype(self.dtype)


class OctaveConvPool(nn.Module):
    """Learned octave folding, flag --p2pc_conv (models.py:108-133)."""
    in_ch: int
    pitches_in: int
    kernel_depth: int = 1
    pitch_classes: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        ksize = -(-self.pitches_in // self.pitch_classes)
        shape = (ksize, self.kernel_depth, self.in_ch, self.in_ch)
        w = self.param("kernel", _init_conv, shape, jnp.float32)
        b = self.param("bias", _init_bias_for(ksize * self.kernel_depth * self.in_ch),
                       (self.in_ch,), jnp.float32)
        y = pooling.octave_dilated_conv(x, w, b, pitch_classes=self.pitch_classes,
                                        pitches_in=self.pitches_in)
        y = BatchNorm(self.in_ch, dtype=self.dtype, name="bn")(y, train)
        return leaky_relu(y)
