"""Two-scale PitchClassNet ensemble (reference PitchClassNet_Multi,
models.py:1118-1189).

model1 consumes the 36-bins/octave CQT, model2 the 12-bins/octave CQT
(`mel2`); outputs merge by averaging or a learned per-class linear
regression (--linear_reg_multi, models.py:1148-1182).

Intended-behavior divergences from the reference (latent bugs there):
 * model2 is built as a true semitone model (only_semitones=True with
   pitches = octaves*12); the reference constructs it with third-of-semitone
   geometry and a dead `no_semitones` attribute (models.py:1143-1146), which
   cannot run on 12-bin input.
 * genre regression weights are 11-dim (the genre head emits 11 logits); the
   reference allocates 12 (models.py:1154-1155) which cannot broadcast.
 * the reference's local-mode loss references an undefined `mel`
   (models.py:1230); our harness uses the batch's features.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .pitchclassnet import PitchClassNet


class PitchClassNetMulti(nn.Module):
    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel1, mel2, seq_length=None, train: bool = False):
        c = self.cfg
        cfg2 = c.replace(only_semitones=True, multi_scale=False)
        cfg1 = c.replace(multi_scale=False)
        out1 = PitchClassNet(cfg1, dtype=self.dtype, name="model1")(
            mel1, seq_length, train)
        out2 = PitchClassNet(cfg2, dtype=self.dtype, name="model2")(
            mel2, seq_length, train)

        if c.genre:
            key1, tonic1, genre1 = out1
            key2, tonic2, genre2 = out2
        else:
            key1, tonic1 = out1
            key2, tonic2 = out2
            genre1 = genre2 = None

        if c.linear_reg_multi:
            wk = self.param("wk", nn.initializers.normal(1.0), (2, 12), self.dtype)
            bk = self.param("bk", nn.initializers.normal(1.0), (12,), self.dtype)
            wt = self.param("wt", nn.initializers.normal(1.0), (2, 12), self.dtype)
            bt = self.param("bt", nn.initializers.normal(1.0), (12,), self.dtype)
            key = jax.nn.sigmoid(wk[0] * key1 + wk[1] * key2 + bk)
            tonic = wt[0] * tonic1 + wt[1] * tonic2 + bt
            if c.genre:
                wg = self.param("wg", nn.initializers.normal(1.0), (2, 11), self.dtype)
                bg = self.param("bg", nn.initializers.normal(1.0), (11,), self.dtype)
                genre = wg[0] * genre1 + wg[1] * genre2 + bg
        else:
            key = (key1 + key2) / 2
            tonic = (tonic1 + tonic2) / 2
            if c.genre:
                genre = (genre1 + genre2) / 2

        if c.genre:
            return key, tonic, genre
        return key, tonic


def init_multi_model(cfg: Config, rng_key, time_frames: int = 64):
    model = PitchClassNetMulti(cfg, dtype=jnp.dtype(cfg.dtype))
    mel1 = jnp.zeros((1, cfg.octaves * 36, time_frames, 1), jnp.dtype(cfg.dtype))
    mel2 = jnp.zeros((1, cfg.octaves * 12, time_frames, 1), jnp.dtype(cfg.dtype))
    variables = model.init(rng_key, mel1, mel2, None, False)
    return model, variables
