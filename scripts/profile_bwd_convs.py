"""Per-convolution wall attribution of the flagship train step (VERDICT r3 #2).

The train step runs at ~10% MFU vs a 29.7% HBM-roofline ceiling and the
HLO-level split (PERFNOTES round-5) localizes the gap to the backward conv
lowerings — but not to WHICH convs. jax.profiler hangs through the relay,
so this extracts every `convolution` instruction from the optimized HLO of
the fwd+bwd graph (dgrad/wgrad appear as first-class convolutions there),
re-materializes each one as a standalone lax.conv_general_dilated with the
exact operand shapes / window / dilation / reversal / group counts, and
wall-times them individually on the chip (lax.scan amortizes the ~28 ms
relay dispatch; REPS_INNER iterations per dispatch).

The sum of standalone times upper-bounds the in-graph cost (standalone
convs pay their own HBM round trips that fusion may hide), but the RANKING
identifies the wall: which shape class burns the backward 88 ms.

Usage (serially, one TPU process):
    AKX_BS=128 python scripts/profile_bwd_convs.py
"""
import os
import re
import sys
import time
from collections import defaultdict

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
from jax import lax

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.train.loss import compute_loss
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import create_train_state

T = int(os.environ.get("AKX_T", 601))
BS = int(os.environ.get("AKX_BS", 128))
REPS_INNER = int(os.environ.get("AKX_REPS", 8))
F32_PEAK = 49.2e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- HLO parse
_DEF = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = (f32|bf16|f16|s32|pred|u32)"
                  r"\[([\d,]*)\]")
_CONVLINE = re.compile(
    r"^\s*(?:ROOT )?%?([\w.-]+) = (f32|bf16)\[([\d,]+)\][^=]*? convolution\("
    r"%?([\w.-]+), %?([\w.-]+)\), window={(.*?)}, dim_labels=(\S+?)(?:[,\s]|$)")


def _dims(s):
    return tuple(int(x) for x in s.split(",") if x)


def _win_attr(window, key, n, default):
    m = re.search(rf"{key}=([\dx_]+)", window)
    if not m:
        return (default,) * n
    return tuple(int(p.split("_")[0]) for p in m.group(1).split("x"))


def _pads(window, n):
    m = re.search(r"pad=([\dx_]+)", window)
    if not m:
        return ((0, 0),) * n
    out = []
    for p in m.group(1).split("x"):
        lo, hi = (p.split("_") + [p])[:2] if "_" in p else (p, p)
        out.append((int(lo), int(hi)))
    return tuple(out)


def extract_convs(hlo_text):
    """Yield dicts describing every convolution instruction."""
    shapes = {}
    for line in hlo_text.splitlines():
        d = _DEF.match(line)
        if d:
            shapes[d.group(1)] = _dims(d.group(3))
    convs = []
    for line in hlo_text.splitlines():
        if " convolution(" not in line:
            continue
        m = _CONVLINE.match(line)
        if not m:
            log(f"  [unparsed conv line] {line.strip()[:160]}")
            continue
        name, odt, oshape, lname, rname, window, dim_labels = m.groups()
        if lname not in shapes or rname not in shapes:
            log(f"  [operand shape missing] {name}: {lname}, {rname}")
            continue
        lshape = ",".join(str(x) for x in shapes[lname])
        rshape = ",".join(str(x) for x in shapes[rname])
        nsp = len(_dims(oshape)) - 2
        fg = re.search(r"feature_group_count=(\d+)", line)
        bg = re.search(r"batch_group_count=(\d+)", line)
        convs.append(dict(
            name=name, dtype=odt,
            out=_dims(oshape), lhs=_dims(lshape), rhs=_dims(rshape),
            strides=_win_attr(window, "stride", nsp, 1),
            pads=_pads(window, nsp),
            lhs_dilation=_win_attr(window, "lhs_dilate", nsp, 1),
            rhs_dilation=_win_attr(window, "rhs_dilate", nsp, 1),
            dim_labels=dim_labels.split("->")[0] + "->"
            + dim_labels.split("->")[1],
            feature_groups=int(fg.group(1)) if fg else 1,
            batch_groups=int(bg.group(1)) if bg else 1,
        ))
    return convs


def _parse_dim_labels(dim_labels):
    lhs, rest = dim_labels.split("_", 1)
    rhs, out = rest.split("->")
    return lhs.upper().replace("B", "N").replace("F", "C"), rhs, out


def run_conv(c):
    """Standalone scan-amortized wall time of one HLO convolution."""
    lhs_spec, rhs_spec, out_spec = c["dim_labels"].split("_")[0], None, None
    # jax dimension_numbers accepts the HLO dim_labels strings directly
    # (e.g. b01f_01io->b01f) via lax.conv_dimension_numbers translation:
    lhs_str, rest = c["dim_labels"].split("_", 1)
    rhs_str, out_str = rest.split("->")
    dn = lax.conv_dimension_numbers(
        c["lhs"], c["rhs"],
        (lhs_str.upper().replace("B", "N").replace("F", "C"),
         rhs_str.upper(),
         out_str.upper().replace("B", "N").replace("F", "C")))
    dt = jnp.bfloat16 if c["dtype"] == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(c["lhs"]).astype(np.float32), dt)
    w = jnp.asarray(rng.standard_normal(c["rhs"]).astype(np.float32), dt)

    def body(carry, _, x, w):
        y = lax.conv_general_dilated(
            x * (1.0 + carry * 1e-9), w, c["strides"], list(c["pads"]),
            lhs_dilation=c["lhs_dilation"], rhs_dilation=c["rhs_dilation"],
            dimension_numbers=dn, feature_group_count=c["feature_groups"],
            batch_group_count=c["batch_groups"])
        return jnp.float32(jnp.sum(y)), None

    # operands are ARGUMENTS, not closures: closed-over arrays bake into
    # the HLO as constants and blow past the remote-compile body limit
    f = jax.jit(lambda x, w: lax.scan(
        lambda cr, _: body(cr, _, x, w), jnp.float32(0.0),
        None, length=REPS_INNER)[0])
    t0 = time.perf_counter()
    float(f(x, w))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / REPS_INNER, compile_s


def conv_flops(c):
    # out elements x (2 * reduce window) ; reduce = prod(rhs spatial) * Cin
    rhs = c["rhs"]
    out = c["out"]
    red = 1
    for d in rhs[:-1]:
        red *= d
    return 2.0 * np.prod(out) * red / c["feature_groups"]


def main():
    dev = jax.devices()[0]
    log(f"per-conv bwd attribution on {dev.device_kind} ({dev.platform}), "
        f"bs={BS}, T={T}")
    cfg = Config()
    optimizer = make_optimizer(cfg, 100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      optimizer, time_frames=T)
    rng = np.random.default_rng(0)
    mb = {
        "mel": jnp.asarray(rng.standard_normal(
            (BS, cfg.pitches, T, 1)).astype(np.float32)),
        "key_labels": jnp.asarray((rng.random((BS, 12)) < 0.5)
                                  .astype(np.float32)),
        "tonic_labels": jnp.asarray(np.eye(12, dtype=np.float32)[
            rng.integers(0, 12, BS)]),
        "seq_length": jnp.full((BS,), T, jnp.int32),
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            mb["mel"], mb["seq_length"], True, mutable=["batch_stats"])
        loss, _ = compute_loss(cfg, out, mb)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    hlo = grad_fn.lower(state.params).compile().as_text()
    convs = extract_convs(hlo)
    log(f"{len(convs)} convolution instructions in the optimized fwd+bwd "
        "HLO")

    rows = []
    for c in convs:
        try:
            ms, comp = run_conv(c)
        except Exception as e:
            log(f"  {c['name']}: FAILED {e!r}")
            continue
        fl = conv_flops(c)
        rows.append((ms, fl, c))
        log(f"  {c['name']:28s} lhs={c['lhs']} rhs={c['rhs']} "
            f"out={c['out']} fg={c['feature_groups']} "
            f"bg={c['batch_groups']} lhs_dil={c['lhs_dilation']} "
            f"-> {ms * 1e3:7.2f} ms  {fl / 1e9:6.1f} GF  "
            f"MFU {fl / ms / F32_PEAK * 100:5.1f}% (compile {comp:.0f}s)")
    rows.sort(key=lambda r: -r[0])
    tot = sum(r[0] for r in rows)
    log(f"\nTOTAL standalone conv wall: {tot * 1e3:.1f} ms "
        f"(fwd+bwd graph wall was ~124 ms at bs=128 — standalone sum "
        "overcounts fused boundaries; use the RANKING)")
    log("top-5:")
    for ms, fl, c in rows[:5]:
        log(f"  {ms * 1e3:7.2f} ms  {fl / 1e9:6.1f} GF  "
            f"MFU {fl / ms / F32_PEAK * 100:5.1f}%  {c['name']} "
            f"lhs={c['lhs']} rhs={c['rhs']} fg={c['feature_groups']} "
            f"bg={c['batch_groups']}")


if __name__ == "__main__":
    main()
