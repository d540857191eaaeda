"""Compare pc-conv formulations at model-realistic shapes on TPU."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from jax import lax
_DN = ("NHWC", "HWIO", "NHWC")

def conv_form(x, kernel):
    pc, kd, cin, cout = kernel.shape
    n, _, t, _ = x.shape
    wexp = jnp.stack([jnp.roll(kernel, p, axis=0) for p in range(pc)], axis=1)
    xf = x.transpose(0, 2, 1, 3).reshape(n, 1, t, pc * cin)
    wf = wexp.transpose(2, 0, 3, 1, 4).reshape(1, kd, pc * cin, pc * cout)
    y = lax.conv_general_dilated(xf, wf.astype(x.dtype), (1, 1), "VALID",
                                 dimension_numbers=_DN)
    return y.reshape(n, t - kd + 1, pc, cout).transpose(0, 2, 1, 3)

def dot_form(x, kernel):
    pc, kd, cin, cout = kernel.shape
    n, _, t, _ = x.shape
    tp = t - kd + 1
    wexp = jnp.stack([jnp.roll(kernel, p, axis=0) for p in range(pc)], axis=1)
    wf = wexp.transpose(2, 0, 3, 1, 4).reshape(kd, pc * cin, pc * cout)
    xf = x.transpose(0, 2, 1, 3).reshape(n, t, pc * cin)
    y = jnp.zeros((n, tp, pc * cout), x.dtype)
    for dt in range(kd):
        y = y + xf[:, dt: dt + tp] @ wf[dt].astype(x.dtype)
    return y.reshape(n, tp, pc, cout).transpose(0, 2, 1, 3)

def im2col_form(x, kernel):
    pc, kd, cin, cout = kernel.shape
    t_out = x.shape[2] - kd + 1
    cols = jnp.concatenate([x[:, :, dt: dt + t_out] for dt in range(kd)], axis=-1)
    wexp = jnp.stack([jnp.roll(kernel, p, axis=0) for p in range(pc)], axis=1)
    wexp = wexp.reshape(pc, pc, kd * cin, cout).astype(x.dtype)
    return jnp.einsum("nqtk,qpko->npto", cols, wexp)

rng = np.random.default_rng(0)
# model-realistic: layer0 pc-convs Cin/Cout up to 16ch, T=601; 3-conv stack
shapes = [(256, 601, 8, 16, 7), (256, 300, 16, 16, 7)]
for name, fn in [("conv", conv_form), ("dot", dot_form), ("im2col", im2col_form)]:
    tot = 0.0; comp = 0.0
    for (B, T, ci, co, kd) in shapes:
        x = jnp.asarray(rng.standard_normal((B, 12, T, ci)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((12, kd, ci, co)).astype(np.float32))
        f = jax.jit(lambda x, k, fn=fn: fn(jnp.pad(x, ((0,0),(0,0),(kd//2,kd//2),(0,0))), k).sum())
        t0 = time.perf_counter(); float(f(x, k)); comp += time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(x, k) for _ in range(5)]
        for o in outs: float(o)
        tot += (time.perf_counter() - t0) / 5
    print(f"{name:8s} total {tot*1e3:7.2f} ms  (compile {comp:.1f}s)", flush=True)
# cross-check correctness
x = jnp.asarray(rng.standard_normal((2, 12, 50, 3)).astype(np.float32))
k = jnp.asarray(rng.standard_normal((12, 7, 3, 5)).astype(np.float32))
a, b, c = conv_form(x, k), dot_form(x, k), im2col_form(x, k)
print("max|conv-dot|", float(jnp.abs(a-b).max()), "max|conv-im2col|", float(jnp.abs(a-c).max()))
