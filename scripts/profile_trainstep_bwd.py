"""Backward-pass cost breakdown of the flagship train step (VERDICT r2 #6).

The forward skinny-conv wall is documented (PERFNOTES.md); the train step
is ~3x the forward cost with no breakdown. jax.profiler hangs through the
relay, so this decomposes by MEASURED WALL DELTAS of nested jitted stages,
each with its XLA cost_analysis (flops + bytes accessed) for a roofline
read (v5e: 49.2 TF/s f32 MXU, ~819 GB/s HBM):

  fwd        loss-only forward (model.apply + compute_loss)
  fwd+bwd    jax.value_and_grad of the same          -> bwd = this - fwd
  step       full production train_step (grad + Adam + BN carry + scan)

swept over micro-batch sizes (AKX_BS, default 64,128) x compute dtype
(f32, bf16) x remat on/off — the training-side sweep the forward path
already has. Timing fetches a device scalar per rep (relay
block_until_ready caveat); reps amortize the ~28 ms dispatch round trip
via ACC stacked microbatches exactly like microbench_trainstep.py.

Usage (serially, one TPU process):
    python scripts/profile_trainstep_bwd.py
Appends a summary block to stderr; paste into PERFNOTES.md once verified.

AKX_COMPILE_ONLY=1 skips execution and prints only the XLA cost analysis
(flops / bytes accessed) of each stage — usable on CPU while the relay is
down: FLOP counts are HLO-level and carry over to the TPU lowering, so the
fwd-vs-bwd FLOP split and traffic ratios can be derived ahead of the wall
measurements.
"""
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.train.loss import compute_loss
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import (create_train_state,
                                                    make_train_step)

ACC = 3
T = int(os.environ.get("AKX_T", 601))
F32_PEAK = 49.2e12
HBM_BW = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def timeit(fn, *args, reps=3):
    t0 = time.perf_counter()
    float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best, comp


def run_variant(cfg, bs, rng, tag):
    optimizer = make_optimizer(cfg, steps_per_epoch=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      optimizer, time_frames=T)
    step = make_train_step(model, cfg, optimizer)
    mb = {
        "mel": jnp.asarray(rng.standard_normal(
            (bs, cfg.pitches, T, 1)).astype(np.float32)),
        "key_labels": jnp.asarray((rng.random((bs, 12)) < 0.5)
                                  .astype(np.float32)),
        "tonic_labels": jnp.asarray(np.eye(12, dtype=np.float32)[
            rng.integers(0, 12, bs)]),
        "seq_length": jnp.full((bs,), T, jnp.int32),
    }
    batch = {k: jnp.stack([v] * ACC) for k, v in mb.items()}

    def loss_fn(params, m):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            m["mel"], m["seq_length"], True, mutable=["batch_stats"])
        loss, _ = compute_loss(cfg, out, m)
        return loss

    # ACC-scan each stage so per-microbatch wall amortizes relay dispatch
    def scan_of(f):
        def run(params, b):
            return jax.lax.scan(lambda c, m: (c + f(params, m), None),
                                0.0, b)[0]
        return jax.jit(run)

    def loss_and_gradsum(p, m):
        # fold every grad leaf into the carry: grads discarded from the
        # scan would let XLA dead-code-eliminate the whole backward pass
        # (verified on CPU: fwd+bwd wall == fwd wall without this)
        loss, grads = jax.value_and_grad(loss_fn)(p, m)
        return loss + jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g), grads, jnp.float32(0.0))

    fwd = scan_of(loss_fn)
    fwdbwd = scan_of(loss_and_gradsum)

    compile_only = bool(os.environ.get("AKX_COMPILE_ONLY"))
    rows = {}
    for name, fn, args in (
            ("fwd", fwd, (state.params, batch)),
            ("fwd+bwd", fwdbwd, (state.params, batch)),
            ("step", jax.jit(step), (state, batch))):
        if compile_only:
            fl, by = cost(jax.jit(fn).lower(*args).compile())
            rows[name] = (float("nan"), fl / ACC, by / ACC)
            log(f"  [{tag} bs={bs}] {name:8s} (compile-only)  "
                f"{fl / ACC / 1e9:7.1f} GF  {by / ACC / 1e9:7.2f} GB "
                f"per microbatch")
            continue
        # timeit FIRST: cost()'s .compile() would populate the persistent
        # compile cache and turn the logged compile figure into a
        # cache-deserialize time
        best, comp = timeit(fn, *args)
        fl, by = cost(jax.jit(fn).lower(*args).compile())
        per = best / ACC
        rows[name] = (per, fl / ACC, by / ACC)
        log(f"  [{tag} bs={bs}] {name:8s} {per * 1e3:8.2f} ms/microbatch  "
            f"{fl / ACC / 1e9:7.1f} GF  {by / ACC / 1e9:7.2f} GB  "
            f"MFU {fl / ACC / per / F32_PEAK * 100:5.1f}%  "
            f"HBM {by / ACC / per / HBM_BW * 100:5.1f}% of peak "
            f"(compile {comp:.0f}s)")
    f_t, f_fl, f_by = rows["fwd"]
    b_t, b_fl, b_by = rows["fwd+bwd"]
    s_t, s_fl, s_by = rows["step"]
    if compile_only:
        log(f"  [{tag} bs={bs}] bwd-only delta: "
            f"{(b_fl - f_fl) / 1e9:7.1f} GF ({(b_fl / max(f_fl, 1.0)):.2f}x "
            f"fwd), {(b_by - f_by) / 1e9:7.2f} GB "
            f"({(b_by / max(f_by, 1.0)):.2f}x fwd); optimizer+carry "
            f"{(s_by - b_by) / 1e9:+7.2f} GB")
        return rows
    log(f"  [{tag} bs={bs}] bwd-only delta: {(b_t - f_t) * 1e3:8.2f} ms, "
        f"{(b_fl - f_fl) / 1e9:7.1f} GF, {(b_by - f_by) / 1e9:7.2f} GB -> "
        f"MFU {(b_fl - f_fl) / max(b_t - f_t, 1e-9) / F32_PEAK * 100:5.1f}%"
        f", HBM {(b_by - f_by) / max(b_t - f_t, 1e-9) / HBM_BW * 100:5.1f}%")
    log(f"  [{tag} bs={bs}] optimizer+carry delta: "
        f"{(s_t - b_t) * 1e3:8.2f} ms, {(s_by - b_by) / 1e9:7.2f} GB")
    return rows


def main():
    dev = jax.devices()[0]
    log(f"train-step backward profile on {dev.device_kind} "
        f"({dev.platform}), T={T}, ACC={ACC}")
    rng = np.random.default_rng(0)
    sizes = tuple(int(x) for x in
                  os.environ.get("AKX_BS", "64,128").split(","))
    variants = [
        ("f32", dict()),
        ("bf16", dict(dtype="bfloat16")),
        ("f32+remat", dict(remat=True)),
        ("bf16+remat", dict(dtype="bfloat16", remat=True)),
    ]
    only = os.environ.get("AKX_VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for bs in sizes:
        for tag, over in variants:
            try:
                run_variant(Config(**over), bs, rng, tag)
            except Exception as e:
                log(f"  [{tag} bs={bs}] FAILED: {e!r}")


if __name__ == "__main__":
    main()
