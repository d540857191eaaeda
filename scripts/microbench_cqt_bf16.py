"""Does bf16 frame/downsample storage speed up the CQT at B=256?"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from audio_key_estimation_tpu.ops import cqt as C

SR, SECS, B, REPS = 22050, 120, 256, 3

def log(*a): print(*a, file=sys.stderr, flush=True)

def cqt_bf16_frames(y, p):
    """cqt() with frames+kernel cast to bf16 for the response matmul
    (f32 accumulation) and bf16 downsample storage."""
    bank = C.kernel_bank(p)
    kmat = jnp.asarray(np.concatenate([bank["k_cos"], bank["k_sin"]], 1), jnp.bfloat16)
    scales = jnp.asarray(bank["scales"]); n_fft = bank["n_fft"]
    bpo = p.bins_per_octave
    taps = jnp.asarray(C.halfband_taps())
    n_frames = 1 + y.shape[1] // p.hop
    octs = []
    cur = y.astype(jnp.float32)
    for o in range(p.octaves):
        if o > 0:
            cur = C.downsample2(cur, taps)
        plan = C.stream_plan(p.hop, o, n_fft, n_frames)
        frames = C.octave_frames(cur, plan, n_fft).astype(jnp.bfloat16)
        r = jnp.einsum("bqtn,nk->bqtk", frames, kmat, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(r[..., :bpo]**2 + r[..., bpo:]**2)
        resp = C.interleave_streams(mag, plan, n_frames)
        octs.append(resp * scales[None, None, :] * (2.0 ** (o / 2)))
    out = jnp.concatenate(list(reversed(octs)), axis=-1)
    return jnp.log1p(jnp.transpose(out, (0, 2, 1)))

def timed(name, fn, y):
    t0=time.perf_counter(); float(fn(y)); comp=time.perf_counter()-t0
    t0=time.perf_counter()
    outs=[fn(y) for _ in range(REPS)]
    for o in outs: float(o)
    dt=(time.perf_counter()-t0)/REPS
    log(f"{name:28s} {dt*1e3:8.1f} ms (compile {comp:.0f}s)")

def main():
    p = C.CQTParams(sr=SR, hop=C.reference_hop(SR, 5), bins_per_octave=36, octaves=8)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device {dev.device_kind}, B={B}")
    y = jax.device_put(jnp.asarray(rng.normal(size=(B, SR*SECS)).astype(np.float32)*0.1), dev)
    # accuracy check at small size vs f32
    ys = y[:2, :SR*8]
    a = np.asarray(jax.jit(lambda v: C.cqt(v, p))(ys))
    b = np.asarray(jax.jit(lambda v: cqt_bf16_frames(v, p))(ys))
    rel = np.abs(a-b).max() / a.max()
    log(f"bf16-frames max rel err vs f32: {rel:.5f}")
    timed("cqt f32 (current)", jax.jit(lambda v: jnp.sum(C.cqt(v, p))), y)
    timed("cqt bf16 frames", jax.jit(lambda v: jnp.sum(cqt_bf16_frames(v, p))), y)

main()
