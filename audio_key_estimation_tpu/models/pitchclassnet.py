"""PitchClassNet — transposition-equivariant key/tonic/genre network in flax.

TPU-first redesign of the reference network (models.py:246-817): NHWC layout,
static shapes, vectorized masked temporal pooling (no per-sample Python
loops), jit/pjit-compatible throughout. The channel schedule, op semantics
and head construction replicate the reference exactly so torch checkpoints
port losslessly (see schedule.py and torch_port.py).

Documented intentional divergences from reference behavior (all latent bugs
in the reference; our implementation follows the *intended* semantics):
 * only_semitones / multi-scale geometry: the reference folds octaves with
   ``pitches_in = pitches // 3`` even when the input is already at semitone
   resolution, which mis-shapes the pitch-class stream (models.py:317-319);
   we fold over the actual semitone row count.
 * local-mode output layout: the reference `reshape`s (N,1,12,T)->(N,T,12),
   scrambling pitch/time (models.py:806-810); we transpose.
 * max_pool head reduction applies to every batch element (models.py:766-783
   only max-pools element 0).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..config import Config
from ..ops import equivariant as eqv
from ..ops import pooling
from ..ops.masked_pool import actual_output_length, masked_time_reduce
from . import blocks
from .blocks import BatchNorm, leaky_relu
from .schedule import head_in_channels, layer_channels


class PitchClassNetLayer(nn.Module):
    """One dual-stream (pitch-level, pitch-class-level) stage (models.py:246-399)."""
    cfg: Config
    layer_num: int
    dtype: Any = jnp.float32

    @property
    def _semitone_rows(self) -> int:
        c = self.cfg
        return c.pitches if c.only_semitones else c.pitches // 3

    @property
    def _p_rows(self) -> int:
        """Height of the pitch stream entering layers >= 1."""
        c = self.cfg
        return self._semitone_rows if c.stay_sixth else c.pitches

    def _octave_pool(self, x, train):
        if self.cfg.p2pc_conv:
            return blocks.OctaveConvPool(x.shape[-1], x.shape[1],
                                         dtype=self.dtype, name="pool")(x, train)
        return pooling.octave_max_pool(x)

    @nn.compact
    def __call__(self, streams, train: bool = False):
        c = self.cfg
        ch = layer_channels(self.layer_num, c.n_filters, c.conv_layers, c.denseblock)
        p, pc = streams

        if self.layer_num == 0:
            if not c.only_semitones:
                p_semi = blocks.CircularConv(1, 1, (3, 3), strides=(3, 1),
                                             circular_pad=(0, 1),
                                             dtype=self.dtype, name="pool_semi")(p)
                p_semi = BatchNorm(1, dtype=self.dtype, name="pool_semi_b")(p_semi, train)
                p_semi = leaky_relu(p_semi)
            else:
                p_semi = p
            if c.stay_sixth:
                p = p_semi
            pc = self._octave_pool(p_semi, train)
            pc = blocks.ConvStack(1, c.n_filters, c.kernel_size, c.conv_layers,
                                  equivariant=True, resblock=c.resblock,
                                  denseblock=c.denseblock, drop_rate=c.drop,
                                  dtype=self.dtype,
                                  name="pc2pc")(pc, train)
            return p, pc

        # ---- layers >= 1 (models.py:321-399) ----
        third_res = (not c.stay_sixth) and (not c.only_semitones)
        p2 = None
        if third_res:
            p_sixth = blocks.ThirdUpsample(ch.prev_pc, ch.prev_pc,
                                           dtype=self.dtype, name="up_sixth")(pc)
            p_sixth = BatchNorm(ch.prev_pc, dtype=self.dtype,
                                name="up_sixth_b")(p_sixth, train)
            p_sixth = leaky_relu(p_sixth)
            if c.pc2p_mem:
                p = eqv.pc_to_pitch_memory_add(p, p_sixth, p_sixth.shape[1])
            else:
                p2 = eqv.pc_to_pitch_tile(p_sixth, self._p_rows)
        else:
            # Reference quirk preserved (models.py:380-383): with
            # stay_sixth/only_semitones AND pc2p_mem the reference's
            # forward takes NO action in this branch — the pc stream is
            # never merged back into the pitch stream (its p2p is sized
            # `all_previous_channels_p` alone, models.py:335). Not a bug
            # here: checkpoint parity requires reproducing it.
            if not c.pc2p_mem:
                p2 = eqv.pc_to_pitch_tile(pc, self._p_rows)
        if not c.pc2p_mem:
            p = jnp.concatenate([p, p2], axis=-1)

        p2p_in = ch.prev_p if c.pc2p_mem else ch.prev_pc + ch.prev_p
        p2p_out = ch.growth if c.denseblock else ch.out_p
        p = blocks.ConvStack(p2p_in, p2p_out, c.kernel_size, c.conv_layers,
                             equivariant=False, resblock=c.resblock,
                             denseblock=c.denseblock, drop_rate=c.drop,
                             fused_serving=c.fused_convstack,
                             dtype=self.dtype,
                             name="p2p")(p, train)
        p_ch = p.shape[-1]

        if third_res:
            pc2 = blocks.CircularConv(p_ch, p_ch, (3, 3), strides=(3, 1),
                                      circular_pad=(0, 1), dtype=self.dtype,
                                      name="pool_semi")(p)
            pc2 = BatchNorm(p_ch, dtype=self.dtype, name="pool_semi_b")(pc2, train)
            pc2 = leaky_relu(pc2)
            pc2 = self._octave_pool(pc2, train)
        else:
            pc2 = self._octave_pool(p, train)

        pc = jnp.concatenate([pc, pc2], axis=-1)
        pc2pc_in = p_ch + ch.prev_pc
        pc2pc_out = ch.growth if c.denseblock else ch.out_pc
        pc = blocks.ConvStack(pc2pc_in, pc2pc_out, c.kernel_size, c.conv_layers,
                              equivariant=True, resblock=c.resblock,
                              denseblock=c.denseblock, drop_rate=c.drop,
                              dtype=self.dtype,
                              name="pc2pc")(pc, train)

        if not c.local:
            p = pooling.time_max_pool(p, c.time_pool_size)
            pc = pooling.time_max_pool(pc, c.time_pool_size)
        return p, pc


class Head(nn.Module):
    """Classifier head (models.py:713-742). kind: 'key' | 'tonic' | 'genre'."""
    cfg: Config
    in_ch: int
    kind: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pc, train: bool = False):
        c = self.cfg
        k = c.kernel_size
        ch = self.in_ch
        x = pc
        for i in range(c.head_layers):
            idx = 3 * i
            last = i == c.head_layers - 1
            if last:
                if self.kind == "genre":
                    x = blocks.ZeroPadConv(ch, 1, (2, k), dtype=self.dtype,
                                           name=f"seq_{idx}")(x)
                else:
                    x = blocks.EquivariantConv(ch, 1, k, dtype=self.dtype,
                                               name=f"seq_{idx}")(x)
                    if c.local:
                        # sliding max over each local window (models.py:721-722)
                        win = c.frames * c.loc_window_size - c.head_layers * (k - 1)
                        x = lax.reduce_window(
                            x, -jnp.inf, lax.max,
                            window_dimensions=(1, 1, win, 1),
                            window_strides=(1, 1, 1, 1), padding="VALID")
            else:
                out = 2 * ch if i == 0 else ch
                if self.kind == "genre":
                    x = blocks.ZeroPadConv(ch, out, (1, k), dtype=self.dtype,
                                           name=f"seq_{idx}")(x)
                else:
                    x = blocks.EquivariantConv(ch, out, k, dtype=self.dtype,
                                               name=f"seq_{idx}")(x)
                x = BatchNorm(out, dtype=self.dtype, name=f"seq_{idx + 1}")(x, train)
                x = leaky_relu(x)
                if i == 0:
                    ch = 2 * ch
        return x


class PitchClassNet(nn.Module):
    """Full network: trunk layers + key/tonic(/genre) heads (models.py:651-817).

    __call__(mel, seq_length, train) with
      mel        : (N, pitches, T, 1) log-CQT, NHWC
      seq_length : (N,) true frame counts, or None
    returns (key[ N,12 sigmoid ], tonic[ N,12 logits ], genre[ N,11 logits ]?)
    in global mode; in local mode time-major sequences (N, T', 12/11).
    """
    cfg: Config
    # None (default) resolves to cfg.dtype — constructing PitchClassNet(cfg)
    # honors the config's compute dtype. Pass an explicit dtype to override
    # (init_model/trainer do, keeping their call sites unchanged).
    dtype: Any = None

    @nn.compact
    def __call__(self, mel, seq_length=None, train: bool = False):
        c = self.cfg
        # params are stored float32; compute runs in dt (bfloat16
        # halves HBM traffic and doubles MXU rate when selected)
        dt = jnp.dtype(c.dtype) if self.dtype is None else self.dtype
        p, pc = mel.astype(dt), None
        layer_cls = PitchClassNetLayer
        if c.remat:
            # trade FLOPs for memory like the reference's dense-block
            # torch.utils.checkpoint (models.py:485-489), but whole-stage
            layer_cls = nn.remat(PitchClassNetLayer, static_argnums=(2,))
        for i in range(c.num_layers):
            p, pc = layer_cls(c, i, dtype=dt,
                              name=f"model_{i}")((p, pc), train)

        final_ch = head_in_channels(c.num_layers, c.n_filters, c.conv_layers,
                                    c.denseblock)
        tonic = Head(c, final_ch, "tonic", dtype=dt,
                     name="tonic_classifier")(pc, train).astype(jnp.float32)
        key = Head(c, final_ch, "key", dtype=dt,
                   name="key_classifier")(pc, train).astype(jnp.float32)
        genre = None
        if c.genre:
            genre = Head(c, final_ch, "genre", dtype=dt,
                         name="genre_classifier")(pc, train).astype(jnp.float32)

        if c.local:
            # time-major per-window outputs (intended semantics of
            # models.py:806-810; reference reshape scrambles axes)
            key_out = jax.nn.sigmoid(key[:, :, :, 0].transpose(0, 2, 1))
            tonic_out = tonic[:, :, :, 0].transpose(0, 2, 1)
            if c.genre:
                genre_out = genre[:, :, :, 0].transpose(0, 2, 1)
                return key_out, tonic_out, genre_out
            return key_out, tonic_out

        lengths = None
        if seq_length is not None:
            lengths = actual_output_length(
                seq_length, num_layers=c.num_layers,
                time_pool_size=c.time_pool_size, kernel_size=c.kernel_size,
                head_layers=c.head_layers)
            lengths = jnp.maximum(lengths, 1)
        tonic_out = masked_time_reduce(tonic[:, :, :, 0], lengths,
                                       use_max=c.max_pool)
        key_out = jax.nn.sigmoid(
            masked_time_reduce(key[:, :, :, 0], lengths, use_max=c.max_pool))
        if c.genre:
            genre_out = masked_time_reduce(genre[:, :, :, 0], lengths,
                                           use_max=c.max_pool)
            return key_out, tonic_out, genre_out
        return key_out, tonic_out


def init_model(cfg: Config, rng_key, time_frames: int = 64):
    """Initialize a PitchClassNet; returns (model, variables)."""
    model = PitchClassNet(cfg, dtype=jnp.dtype(cfg.dtype))
    mel = jnp.zeros((1, cfg.pitches, time_frames, 1), jnp.dtype(cfg.dtype))
    variables = model.init(rng_key, mel, None, False)
    return model, variables
