"""Locate the fixed ~21.6 ms in the model forward: scaling + ablations."""

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
from flax import linen as nn

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.models.pitchclassnet import (Head,
                                                           PitchClassNetLayer)

INNER = 8
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / REPS / INNER
    log(f"{name:46s} {dt * 1e3:8.2f} ms/op  (compile {compile_s:.1f}s)")
    return dt


def amortize(apply_fn):
    @jax.jit
    def run(x):
        def body(acc, i):
            out = apply_fn(x + i.astype(x.dtype) * 1e-6)
            return acc + jnp.sum(out).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return acc
    return run


class TrunkOnly(nn.Module):
    cfg: Config
    n: int

    @nn.compact
    def __call__(self, mel):
        p, pc = mel, None
        for i in range(self.n):
            p, pc = PitchClassNetLayer(self.cfg, i, name=f"model_{i}")(
                (p, pc), False)
        return pc


class HeadsOnly(nn.Module):
    cfg: Config
    in_ch: int

    @nn.compact
    def __call__(self, pc):
        a = Head(self.cfg, self.in_ch, "tonic", name="t")(pc, False)
        b = Head(self.cfg, self.in_ch, "key", name="k")(pc, False)
        return jnp.sum(a) + jnp.sum(b)


def bench_module(name, mod, x):
    variables = mod.init(jax.random.PRNGKey(0), x)
    timed(name, amortize(lambda v: mod.apply(variables, v)), x)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"profiling on {dev.device_kind} ({dev.platform})")
    cfg = Config()

    def mel_of(b, t):
        return jnp.asarray(rng.normal(size=(b, cfg.pitches, t, 1))
                           .astype(np.float32))

    # scaling of the full model
    for b, t in ((16, 601), (4, 601), (16, 150), (1, 601)):
        model = PitchClassNet(cfg)
        x = mel_of(b, t)
        seq = jnp.full((b,), t, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x[:1], seq[:1], False)
        timed(f"full model B={b} T={t}",
              amortize(lambda v: sum(jnp.sum(o) for o in model.apply(
                  variables, v, seq, False))), x)

    # trunk ablation
    x = mel_of(16, 601)
    bench_module("layer0 only", TrunkOnly(cfg, 1), x)
    bench_module("layers 0+1 (full trunk)", TrunkOnly(cfg, 2), x)

    # heads on trunk-shaped input (12 rows, T/2, 16 ch)
    from audio_key_estimation_tpu.models.schedule import head_in_channels
    ch = head_in_channels(cfg.num_layers, cfg.n_filters, cfg.conv_layers,
                          cfg.denseblock)
    pc = jnp.asarray(rng.normal(size=(16, 12, 300, ch)).astype(np.float32))
    bench_module(f"heads only (ch={ch})", HeadsOnly(cfg, ch), pc)


if __name__ == "__main__":
    main()
