"""Bisect the model's TPU compile time (VERDICT r1 weak #5).

profile_model2.py showed layer-0 alone costs ~90 s of remote compile.
Compile (never execute) each candidate sub-graph and report wall time.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# NOTE: no compilation cache — we are measuring compile time.

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import blocks
from audio_key_estimation_tpu.models.pitchclassnet import PitchClassNetLayer
from audio_key_estimation_tpu.ops import pooling

B, T = 16, 601


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def compile_time(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    log(f"{name:46s} compile {time.perf_counter() - t0:7.1f}s")


def main():
    cfg = Config()
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device {dev.device_kind}")
    x1 = jnp.asarray(rng.normal(size=(B, 288, T, 1)).astype(np.float32))
    x96 = jnp.asarray(rng.normal(size=(B, 96, T, 1)).astype(np.float32))
    x12 = jnp.asarray(rng.normal(size=(B, 12, T, 1)).astype(np.float32))

    # 1. pool_semi: CircularConv (3,3) stride (3,1)
    m1 = blocks.CircularConv(1, 1, (3, 3), strides=(3, 1),
                             circular_pad=(0, 1))
    v1 = m1.init(jax.random.PRNGKey(0), x1)
    compile_time("pool_semi conv s=(3,1)",
                 lambda v: jnp.sum(m1.apply(v1, v)), x1)

    # 2. octave max pool (96 -> 12 rows)
    compile_time("octave_max_pool", lambda v: jnp.sum(
        pooling.octave_max_pool(v)), x96)

    # 3. pc2pc equivariant stack on 12 rows
    m3 = blocks.ConvStack(1, cfg.n_filters, cfg.kernel_size, cfg.conv_layers,
                          equivariant=True)
    v3 = m3.init(jax.random.PRNGKey(0), x12, False)
    compile_time("pc2pc ConvStack(12 rows)",
                 lambda v: jnp.sum(m3.apply(v3, v, False)), x12)

    # 4. full layer 0
    m4 = PitchClassNetLayer(cfg, 0)
    v4 = m4.init(jax.random.PRNGKey(0), (x1, None), False)
    compile_time("full layer 0",
                 lambda v: jnp.sum(m4.apply(v4, (v, None), False)[1]), x1)

    # 5. layer 0 without the octave pool+stack (pool_semi + BN + lrelu)
    class SemiOnly(nn.Module):
        @nn.compact
        def __call__(self, v):
            y = blocks.CircularConv(1, 1, (3, 3), strides=(3, 1),
                                    circular_pad=(0, 1), name="pool_semi")(v)
            y = blocks.BatchNorm(1, name="pool_semi_b")(y, False)
            return blocks.leaky_relu(y)
    m5 = SemiOnly()
    v5 = m5.init(jax.random.PRNGKey(0), x1)
    compile_time("pool_semi + BN + lrelu",
                 lambda v: jnp.sum(m5.apply(v5, v)), x1)


if __name__ == "__main__":
    main()
