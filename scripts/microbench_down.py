"""Polyphase block-size sweep for downsample2 at bench scale (B=256)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from audio_key_estimation_tpu.ops.cqt import halfband_taps

B, L, REPS = 256, 22050*120, 3

def log(*a): print(*a, file=sys.stderr, flush=True)

def make_down(block):
    taps = halfband_taps()
    n_taps = len(taps); pad = n_taps//2; out_block = block//2
    w = np.zeros((block + 2*pad, out_block), np.float32)
    for m in range(out_block):
        w[2*m:2*m+n_taps, m] = taps
    wj = jnp.asarray(w)
    def down(y):
        b, Ly = y.shape
        nb = -(-Ly // block)
        out_len = (Ly - 1)//2 + 1
        yp = jnp.pad(y, ((0,0),(pad, nb*block + block + pad - Ly)))
        a = yp[:, :nb*block].reshape(b, nb, block)
        tail = yp[:, block:block+nb*block].reshape(b, nb, block)[..., :2*pad]
        window = jnp.concatenate([a, tail], axis=-1)
        out = jnp.einsum("bnw,wm->bnm", window, wj, preferred_element_type=jnp.float32)
        return out.reshape(b, nb*out_block)[:, :out_len]
    return down

def cascade(down):
    @jax.jit
    def run(y):
        acc = jnp.float32(0); cur = y
        for _ in range(7):
            cur = down(cur)
            acc = acc + jnp.sum(cur[:, :8])
        return acc
    return run

def sweep():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device {dev.device_kind} B={B}")
    y = jax.device_put(jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)*0.1), dev)
    for block in (256, 512, 1024):
        fn = cascade(make_down(block))
        t0=time.perf_counter(); float(fn(y)); comp=time.perf_counter()-t0
        t0=time.perf_counter()
        outs=[fn(y) for _ in range(REPS)]
        for o in outs: float(o)
        dt=(time.perf_counter()-t0)/REPS
        log(f"block={block:5d} (N={block//2} lanes): {dt*1e3:7.1f} ms  (compile {comp:.0f}s)")


def make_down_split(block, pad_tail):
    taps = halfband_taps()
    n_taps = len(taps); pad = n_taps//2; out_block = block//2
    w = np.zeros((block + 2*pad, out_block), np.float32)
    for m in range(out_block):
        w[2*m:2*m+n_taps, m] = taps
    w_main = jnp.asarray(w[:block])
    if pad_tail:
        wt = np.zeros((block, out_block), np.float32)
        wt[:2*pad] = w[block:]
        w_tail = jnp.asarray(wt)
    else:
        w_tail = jnp.asarray(w[block:])
    def down(y):
        b, Ly = y.shape
        nb = -(-Ly // block)
        out_len = (Ly - 1)//2 + 1
        yp = jnp.pad(y, ((0,0),(pad, nb*block + block + pad - Ly)))
        a = yp[:, :nb*block].reshape(b, nb, block)
        bview = yp[:, block:block+nb*block].reshape(b, nb, block)
        out = jnp.einsum("bnw,wm->bnm", a, w_main, preferred_element_type=jnp.float32)
        if pad_tail:
            out = out + jnp.einsum("bnw,wm->bnm", bview, w_tail, preferred_element_type=jnp.float32)
        else:
            out = out + jnp.einsum("bnw,wm->bnm", bview[..., :w_tail.shape[0]], w_tail, preferred_element_type=jnp.float32)
        return out.reshape(b, nb*out_block)[:, :out_len]
    return down


def _extra():
    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)*0.1), jax.devices()[0])
    # correctness
    ys = y[:2, :5000]
    ref = np.asarray(make_down(256)(ys))
    for pt in (False, True):
        got = np.asarray(make_down_split(256, pt)(ys))
        assert np.abs(ref-got).max() < 1e-5, np.abs(ref-got).max()
    log("split variants match")
    for name, fn in (("split sliced tail", make_down_split(256, False)),
                     ("split padded Wtail", make_down_split(256, True)),
                     ("split padded Wtail blk512", make_down_split(512, True))):
        c = cascade(fn)
        t0=time.perf_counter(); float(c(y)); comp=time.perf_counter()-t0
        t0=time.perf_counter()
        outs=[c(y) for _ in range(REPS)]
        for o in outs: float(o)
        dt=(time.perf_counter()-t0)/REPS
        log(f"{name:28s}: {dt*1e3:7.1f} ms  (compile {comp:.0f}s)")


if __name__ == '__main__':
    sweep()
    _extra()
