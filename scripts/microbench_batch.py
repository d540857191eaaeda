"""Does a bigger batch amortize the skinny-op overhead? Full pipeline at
B=16/64/128 (constant total audio = 256 min per step)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt, reference_hop

SR, SECS, REPS = 22050, 120, 3
TOTAL_CLIPS = 128

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    p = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave, octaves=cfg.octaves)
    n_frames = 1 + (SR*SECS)//hop
    rng = np.random.default_rng(0)
    model = PitchClassNet(cfg)
    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel0, jnp.full((1,), n_frames, jnp.int32), False)
    dev = jax.devices()[0]
    log(f"device {dev.device_kind}; audio per step = {TOTAL_CLIPS*SECS/60:.0f} min")
    for B in (16, 64, 128):
        chunks = TOTAL_CLIPS // B
        y = jax.device_put(jnp.asarray(rng.normal(size=(chunks, B, SR*SECS)).astype(np.float32)*0.1), dev)
        seq = jax.device_put(jnp.full((B,), n_frames, jnp.int32), dev)
        @jax.jit
        def pipe(yc, seq):
            def body(acc, yy):
                mel = cqt(yy, p)[:, :, :, None]
                k, t = model.apply(variables, mel, seq, False)
                return acc + jnp.sum(k) + jnp.sum(t), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), yc)
            return acc
        t0=time.perf_counter(); float(pipe(y, seq)); comp=time.perf_counter()-t0
        t0=time.perf_counter()
        for _ in range(REPS): float(pipe(y, seq))
        dt=(time.perf_counter()-t0)/REPS
        log(f"B={B:4d} chunks={chunks}: {dt*1e3:7.1f} ms/step -> {TOTAL_CLIPS*SECS/60/dt:7.1f} audio-min/s (compile {comp:.0f}s)")

main()
