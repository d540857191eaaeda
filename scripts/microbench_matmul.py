"""Pure matmul roofline check on the current device."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np

INNER, REPS = 8, 3

def timed(name, fn, flops, *args):
    t0=time.perf_counter(); float(fn(*args)); comp=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(REPS): float(fn(*args))
    dt=(time.perf_counter()-t0)/REPS/INNER
    print(f"{name:40s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TF/s (compile {comp:.1f}s)", file=sys.stderr, flush=True)

def amortize(op):
    @jax.jit
    def run(a, b):
        def body(acc, i):
            return acc + jnp.sum(op(a + i.astype(a.dtype)*1e-6, b)).astype(jnp.float32), None
        acc,_ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return acc
    return run

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device {dev.device_kind}", file=sys.stderr, flush=True)
for (m,k,n,dt_) in ((4096,4096,4096,'f32'),(4096,4096,4096,'bf16'),
                    (2764800//4,64,64,'f32'),(2764800//4,64,64,'bf16'),
                    (2764800//4,64,512,'bf16'),(8192,8192,8192,'bf16')):
    dtype = jnp.float32 if dt_=='f32' else jnp.bfloat16
    a = jax.device_put(jnp.asarray(rng.normal(size=(m,k)).astype(np.float32)).astype(dtype), dev)
    b = jax.device_put(jnp.asarray(rng.normal(size=(k,n)).astype(np.float32)).astype(dtype), dev)
    fl = 2*m*k*n
    timed(f"({m}x{k})@({k}x{n}) {dt_}", amortize(lambda x,y: jnp.dot(x,y,preferred_element_type=jnp.float32)), fl, a, b)
