"""Model-forward dtype A/B at BENCH geometry (round-5 perf push).

Why this exists: profile_model.py's earlier "bf16 compute is a wash"
verdict (18.98 vs 19.02 ms) was measured at batch 1 — latency-bound at
the ~26 ms relay dispatch floor, not the serving regime. The bench's
model stage at B=512 runs 96.5 ms against an 82 ms HBM-traffic floor
(cost_analysis: 2.30 TFLOP, 67 GB accessed, arithmetic intensity 34 —
traffic-bound, 12% of bf16 MXU peak), so halving activation bytes with
bf16 compute should cut the dominant pipeline stage nearly in half.
NOTE: bench.py:310 constructed `PitchClassNet(cfg)` WITHOUT the dtype
argument, so its model stage always ran f32 regardless of config.

Measures model-alone ms/step at B in {256, 512} for f32 vs bf16 compute
(params stay f32), dispatch-loop timing (PERFNOTES round-7: single
dispatches read the relay floor; back-to-back dispatches overlap device
compute), plus logits delta and top-1 key agreement on real-shaped
random mel input as the serving-quality gate.

Run: cd /root/repo && timeout 3300 python scripts/microbench_model_bf16.py
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

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import reference_hop

SR, CLIP_SECONDS = 22050, 120
REPS = 20


def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    n_frames = 1 + SR * CLIP_SECONDS // hop
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); "
          f"n_frames={n_frames}", flush=True)

    rng = np.random.default_rng(0)
    mel_np = rng.standard_normal((512, cfg.pitches, n_frames, 1),
                                 np.float32) ** 2  # CQT-ish nonneg
    model_f32 = PitchClassNet(cfg, dtype=jnp.float32)
    variables = model_f32.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32),
        jnp.full((1,), n_frames, jnp.int32), False)

    outs = {}
    for B in (512, 256):
        seq = jax.device_put(jnp.full((B,), n_frames, jnp.int32), dev)
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = PitchClassNet(cfg, dtype=dt)
            mel = jax.device_put(jnp.asarray(mel_np[:B], dt), dev)

            @jax.jit
            def fwd(v, m, s, _model=model):
                tonic, key = _model.apply(v, m, s, False)[:2]
                # scalar reduce: forces full execution under the relay
                return key.astype(jnp.float32), tonic.astype(jnp.float32)

            t0 = time.time()
            key, tonic = fwd(variables, mel, seq)
            jax.block_until_ready((key, tonic))
            float(key.sum())
            compile_s = time.time() - t0
            # dispatch-loop timing
            t0 = time.perf_counter()
            accs = [fwd(variables, mel, seq)[0] for _ in range(REPS)]
            for a in accs:
                float(a.sum())
            ms = (time.perf_counter() - t0) / REPS * 1e3
            outs[(B, name)] = (ms, np.asarray(key))
            print(f"B={B} {name}: {ms:7.2f} ms/step (compile {compile_s:.1f}s)",
                  flush=True)
        # quality gate: logits delta + top-1 agreement
        kf = outs[(B, "f32")][1]
        kb = outs[(B, "bf16")][1]
        rel = np.abs(kf - kb).max() / max(np.abs(kf).max(), 1e-9)
        agree = float((kf.argmax(-1) == kb.argmax(-1)).mean())
        print(f"B={B}: logits max rel delta {rel:.3e}, "
              f"top-1 key agreement {agree:.4f}", flush=True)

    f, b = outs[(512, "f32")][0], outs[(512, "bf16")][0]
    print(f"\nB=512 model stage: f32 {f:.1f} ms -> bf16 {b:.1f} ms "
          f"({f / b:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
