"""Benchmark: decode -> batched CQT -> PitchClassNet throughput on TPU.

Prints ONE JSON line:
  {"metric": "audio_min_per_sec_per_chip", "value": N,
   "unit": "audio-min/s/chip", "vs_baseline": R, "mfu": F, "stages": {...}}

Workload: 16 two-minute 22.05 kHz songs (deterministic tones+noise) written
as REAL WAV FILES and decoded through the production path
(audio_io.decode_many(raw=True) -> raw PCM16, host does I/O only; the
/32768 normalization runs inside the CQT graph), replicated with
deterministic on-device gain/noise variation to ONE monolithic 512-clip
int16 batch through the jitted 8-octave 36-bin log-CQT + flagship
PitchClassNet (reference train_model.py defaults). The monolithic batch
matters: v5e throughput on this model is per-tile-overhead-bound at small
batch (PERFNOTES.md) — 256 clips at once is 3.5x faster than 8 scanned
chunks of 16. The bench SWEEPS batch size in-run (B=512 and B=256;
AKX_BENCH_REPLICAS=N pins B=16*N) across BOTH front-ends — the XLA
strided-conv path and the time-major frame-table Pallas kernel
(cqt_pallas.py: contiguous (win, B) window DMAs + fused filterbank
matmul/magnitude/log1p in VMEM) — and the headline takes the best cell;
AKX_BENCH_NO_PALLAS=1 skips the kernel. Every (front, batch) cell's
pipeline ms / compile s / throughput is embedded in the output JSON under
"fronts", and the report line is re-emitted after every measurement so a
killed run still carries its best-so-far result and the diagnostics to
tell environment slowness from a code regression (VERDICT r3 item 1).
Stage times (decode / cqt / model / fused pipeline) are reported per
audio-minute at the winning geometry.

`value` is the fused device pipeline (CQT+model) on the best front-end —
the driver-tracked headline. `vs_baseline` divides by the SAME JAX pipeline
run one clip at a time on one host-CPU device (not the reference's
librosa+torch path, which this environment cannot run; per-file librosa would
be slower, making the ratio conservative). `mfu` is analytic front-end FLOPs
plus XLA-reported model FLOPs over the f32 MXU peak (v5e: ~49 TFLOP/s).

Timing note: under the axon relay backend, block_until_ready returns before
remote execution finishes — every timed repetition reduces to a scalar ON
DEVICE and fetches it, forcing the full round trip. Diagnostics go to
stderr; stdout carries only the JSON line.
"""

import json
import math
import os
import signal
import subprocess
import sys
import tempfile
import time


def _supervise():
    """Bounded retry harness around the real bench (VERDICT r2 item 1).

    The round-2 driver bench failed rc=1 with a stack trace because the
    axon TPU relay was down at capture time. Two facts make an in-process
    retry wrong: (a) one backend-init attempt blocks ~7 minutes in
    jaxlib's connect-retry loop, and (b) jax caches a failed backend init
    for the life of the process. So the retry lives OUT of process: run
    the real bench as a subprocess (AKX_BENCH_INNER=1) with a per-attempt
    timeout, retry with backoff while budget remains, and on persistent
    failure print the driver-parseable JSON line with value 0.0 and an
    "error" field instead of a traceback. Exit code is always 0.
    """
    budget_s = float(os.environ.get("AKX_BENCH_RETRY_BUDGET_S", 2400))
    attempt_timeout_s = float(os.environ.get("AKX_BENCH_ATTEMPT_TIMEOUT_S",
                                             1200))
    max_attempts = int(os.environ.get("AKX_BENCH_MAX_ATTEMPTS", 4))
    backoff_s = float(os.environ.get("AKX_BENCH_BACKOFF_S", 30))
    t_start = time.monotonic()
    env = dict(os.environ, AKX_BENCH_INNER="1")
    # test hook: run `python -c <code>` instead of the real bench so the
    # retry/JSON-on-failure contract is unit-testable without a device
    test_child = os.environ.get("AKX_BENCH_TEST_CHILD")
    cmd = ([sys.executable, "-c", test_child] if test_child
           else [sys.executable, os.path.abspath(__file__)])
    last_err = "no attempts ran"

    best_partial = None

    def _keep_partial(raw):
        # the inner bench emits a full-shape JSON line after EVERY
        # measurement (flush=True), so a timed-out attempt still leaves a
        # salvageable best-so-far result in its captured stdout
        nonlocal best_partial
        for ln in reversed(raw.decode("utf-8", "replace").splitlines()):
            if ln.startswith("{"):
                try:
                    p = json.loads(ln)
                except ValueError:
                    continue
                v = p.get("value")
                if (isinstance(v, (int, float)) and v > 0
                        and (best_partial is None
                             or v > best_partial.get("value", 0))):
                    best_partial = p
                return
    for attempt in range(1, max_attempts + 1):
        remaining = budget_s - (time.monotonic() - t_start)
        if remaining <= 0:
            last_err += " (retry budget exhausted)"
            break
        print(f"bench attempt {attempt}/{max_attempts} "
              f"(timeout {min(attempt_timeout_s, remaining):.0f}s)",
              file=sys.stderr, flush=True)
        # stderr inherits (live diagnostics); stdout is captured so the
        # supervisor's stdout carries exactly one JSON line. The child gets
        # its own session so a timeout kills the WHOLE process group — the
        # inner bench spawns helpers (binding.py's `make`), and an orphaned
        # helper holding the build lock would poison every later attempt.
        proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                start_new_session=True)
        try:
            out, _ = proc.communicate(
                timeout=min(attempt_timeout_s, remaining))
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            out, _ = proc.communicate()
            if out:
                _keep_partial(out)
            last_err = (f"attempt {attempt} timed out after "
                        f"{min(attempt_timeout_s, remaining):.0f}s "
                        f"(TPU relay hang?)")
            print(last_err, file=sys.stderr, flush=True)
            continue
        out = out.decode("utf-8", "replace").strip()
        line = out.splitlines()[-1] if out else ""
        parsed = None
        if proc.returncode == 0 and line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                parsed = None
        value = parsed.get("value") if parsed is not None else None
        if isinstance(value, (int, float)) and value > 0:
            print(line, flush=True)
            return
        if parsed is not None:
            # the inner bench emitted its own zero-value failure JSON (e.g.
            # every front-end raised mid-run), or a malformed non-numeric
            # value: either way a failed attempt to RETRY, not a result to
            # pass through — the relay-outage class this supervisor exists
            # for is transient
            last_err = (f"attempt {attempt} returned value {value!r}: "
                        f"{str(parsed.get('error', 'no front-end result'))}")
        else:
            last_err = (f"attempt {attempt} rc={proc.returncode}; "
                        f"stdout tail: {line[-300:] or '(empty)'}")
        print(last_err, file=sys.stderr, flush=True)
        if attempt < max_attempts:
            time.sleep(min(backoff_s * attempt,
                           max(0.0, budget_s - (time.monotonic() - t_start))))
    if best_partial is not None:
        # every attempt timed out / failed AFTER producing measurements:
        # a partial best-so-far beats a zero (it is flagged as partial)
        best_partial["partial"] = True
        best_partial["error"] = last_err[:500]
        print(json.dumps(best_partial), flush=True)
        return
    print(json.dumps({"metric": "audio_min_per_sec_per_chip", "value": 0.0,
                      "unit": "audio-min/s/chip", "vs_baseline": 0.0,
                      "error": last_err[:500]}), flush=True)


if __name__ == "__main__" and not os.environ.get("AKX_BENCH_INNER"):
    _supervise()
    sys.exit(0)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.data import audio_io
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import (CQTParams, cqt, kernel_bank,
                                              reference_hop, stream_plan)
from audio_key_estimation_tpu.ops.cqt_pallas import cqt_pallas

SR = 22050
CLIP_SECONDS = 120
BATCH = 16   # decoded source clips
# gain/noise variants -> device batch = REPLICAS*16 clips, one launch.
# The bench SWEEPS the batch size in-run (VERDICT r3 items 1+8): B=256 was
# the XLA-path saturation point and the r1 driver record's geometry; the
# Pallas front-end keeps scaling through B=512 to B=1024 on the
# builder's chip (round-5: 7657 vs 7449 vs 6701 audio-min/s) — so ALL
# are measured and the headline takes the best, with the whole sweep
# embedded in the output JSON. AKX_BENCH_REPLICAS pins one value. The
# XLA front-end only runs at B <= XLA_MAX_CLIPS: its B=1024 program
# fails TPU compilation (scoped-vmem OOM in the strided-conv cascade),
# and a known-failing 3-minute compile attempt per run buys nothing.
_REP_ENV = os.environ.get("AKX_BENCH_REPLICAS")
REPLICAS_SWEEP = [int(_REP_ENV)] if _REP_ENV else [64, 32, 16]
XLA_MAX_CLIPS = 512
REPS = 3
F32_PEAK_FLOPS = 49.2e12  # v5e MXU, float32 path (bf16 peak / 4)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(tmpdir, n=BATCH):
    """Deterministic 2-minute songs written as PCM16 WAV files."""
    rng = np.random.default_rng(0)
    t = np.arange(SR * CLIP_SECONDS) / SR
    paths = []
    for i in range(n):
        f0 = 110.0 * 2 ** (i / 5)
        y = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.2 * np.sin(2 * np.pi * f0 * 1.5 * t)
             + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
        p = os.path.join(tmpdir, f"bench_{i}.wav")
        audio_io.write_wav(p, y * 0.5, SR)
        paths.append(p)
    return paths


def frontend_flops(p: CQTParams, L: int, batch: int) -> float:
    """Analytic FLOPs of the v2 front-end (polyphase cascade + responses)."""
    bank = kernel_bank(p)
    n_fft = bank["n_fft"]
    n_frames = 1 + L // p.hop
    fl = 0.0
    cur = L
    for o in range(p.octaves):
        if o > 0:
            fl += batch * math.ceil(cur / 256) * 304 * 128 * 2  # downsample
            cur = (cur - 1) // 2 + 1
        plan = stream_plan(p.hop, o, n_fft, n_frames)
        q, _, _, tq = plan if plan else (1, 0, 0, n_frames)
        fl += batch * q * tq * n_fft * (2 * p.bins_per_octave) * 2
    return fl


def _reduce(outputs):
    return sum(jnp.sum(o) for o in outputs)


def time_fn(fn, *args, reps=REPS):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    # dispatch all reps before fetching: jax queues the launches, so the
    # relay's ~30 ms dispatch round trip overlaps device compute — this
    # measures steady-state THROUGHPUT (back-to-back steps), the serving
    # regime, not single-step latency
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / reps, compile_s


def main():
    cfg = Config()
    # fused Pallas serving kernel for the layer-1 p2p ConvStack (eval-only
    # dispatch, ops/convstack_pallas.py): default-on where it can run —
    # real TPU at lane-multiple batch. AKX_BENCH_NO_FUSED=1 pins the
    # plain XLA model path; either way the model delta is measured below.
    use_fused = (not os.environ.get("AKX_BENCH_NO_FUSED")
                 and jax.devices()[0].platform == "tpu")
    # serving compute dtype: bfloat16 on TPU (the documented production
    # recipe — a measured no-op for the XLA conv path, and it removes the
    # f32<->bf16 boundary casts around the fused Pallas stack, which were
    # most of its in-model overhead). AKX_BENCH_DTYPE=float32 pins f32.
    dtype = os.environ.get("AKX_BENCH_DTYPE") or (
        "bfloat16" if jax.devices()[0].platform == "tpu" else "float32")
    cfg = cfg.replace(fused_convstack=use_fused, dtype=dtype)
    hop = reference_hop(SR, cfg.frames)
    params = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                       octaves=cfg.octaves)
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // hop
    max_rep = max(REPLICAS_SWEEP)
    n_clips_max = max_rep * BATCH

    # one JSON report object, re-emitted (flush=True) after EVERY
    # measurement: the supervisor takes the LAST stdout line, so a
    # timed-out run still surfaces its best-so-far result + diagnostics
    # instead of an undiagnosable zero (VERDICT r3 item 1)
    report = {"metric": "audio_min_per_sec_per_chip", "value": 0.0,
              "unit": "audio-min/s/chip", "vs_baseline": 0.0,
              "stages": {}, "fronts": {},
              "sweep_batch_clips": [r * BATCH for r in REPLICAS_SWEEP]}
    stages = report["stages"]

    def emit():
        print(json.dumps(report), flush=True)

    # --- stage 0: host decode through the production path ---
    with tempfile.TemporaryDirectory() as td:
        paths = make_corpus(td)
        # host ingest: one-copy readinto straight into a reused int16
        # batch buffer (audio_io.ingest_batch) — the steady-state serving
        # regime, where the batch allocation is amortized across steps
        ingest_buf = np.empty((BATCH, L), np.int16)
        audio_io.ingest_batch(paths, L, out=ingest_buf)  # warm page cache
        best_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y0, _, _ = audio_io.ingest_batch(paths, L, out=ingest_buf)
            best_s = min(best_s, time.perf_counter() - t0)
        decode_s = best_s
        decode_min = BATCH * CLIP_SECONDS / 60.0
        stages["decode_ms_per_audio_min"] = round(decode_s / decode_min * 1e3, 2)
        decode_tp = decode_min / decode_s
        log(f"host ingest (raw PCM16 readinto batch): {len(paths)} "
            f"wavs in {decode_s:.3f}s ({decode_tp:.1f} audio-min/s host)")

    seq_host = np.full((n_clips_max,), n_frames, np.int32)

    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel0,
                           jnp.full((1,), n_frames, jnp.int32), False)

    dev = jax.devices()[0]
    report["device"] = f"{dev.device_kind} ({dev.platform})"
    # cache diagnostics (VERDICT r4 item 2): entry count at start tells a
    # cold capture from a warm one; per-cell compile_s then pinpoints any
    # cell that missed (cached hits re-load in < ~5 s, cold fused-cascade
    # compiles run minutes through the remote-compile relay)
    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    report["cache"] = {
        "dir": cache_dir,
        "entries_at_start": (len(os.listdir(cache_dir))
                             if os.path.isdir(cache_dir) else 0)}
    log(f"benchmarking on {report['device']}; compile cache "
        f"{report['cache']['entries_at_start']} entries at {cache_dir}")

    # one monolithic int16 batch at the LARGEST sweep size, assembled ON
    # DEVICE (untimed): decoded audio + deterministic gain/noise variations
    # so every clip is distinct real-shaped audio arriving in the
    # production input dtype (raw PCM16). Smaller sweep points slice it.
    def _expand(y0j, key):
        outs = []
        for c in range(max_rep):
            key, k = jax.random.split(key)
            v = (y0j.astype(jnp.float32) * (0.6 + 0.05 * c)
                 + jax.random.normal(k, y0j.shape, jnp.float32)
                 * (0.01 * 32768.0))
            outs.append(jnp.clip(jnp.round(v), -32768, 32767)
                        .astype(jnp.int16))
        return jnp.concatenate(outs)

    ys = jax.jit(_expand)(jax.device_put(jnp.asarray(y0), dev),
                          jax.random.PRNGKey(1))
    jax.block_until_ready(ys)
    seq = jax.device_put(jnp.asarray(seq_host), dev)

    conv_dtype = jnp.dtype(cfg.cqt_conv_dtype)
    fronts = [("xla", lambda y, p: cqt(y, p, conv_dtype=conv_dtype))]
    if not os.environ.get("AKX_BENCH_NO_PALLAS") and dev.platform == "tpu":
        fronts.insert(0, ("pallas",
                          lambda y, p: cqt_pallas(y, p,
                                                  stream_dtype=conv_dtype)))

    # --- sweep: every front-end at every batch size; headline = best ---
    best = None   # (throughput, kind, batch_clips, dt_s, front_fn)
    for kind, front in fronts:
        fr = report["fronts"].setdefault(kind, {})
        pipeline = jax.jit(
            lambda y, s, _f=front: _reduce(model.apply(
                variables, _f(y, params)[:, :, :, None], s, False)))
        for rep in REPLICAS_SWEEP:
            b = rep * BATCH
            if kind == "xla" and b > XLA_MAX_CLIPS:
                fr[f"b{b}"] = {"skipped": "scoped-vmem compile OOM"}
                continue
            am = b * CLIP_SECONDS / 60.0
            try:
                dt, comp = time_fn(pipeline, ys[:b], seq[:b])
            except Exception as e:
                fr[f"b{b}"] = {"error": repr(e)[:300]}
                log(f"{kind} B={b} failed: {e!r}")
                emit()
                continue
            tp = am / dt
            fr[f"b{b}"] = {"pipeline_ms": round(dt * 1e3, 1),
                           "compile_s": round(comp, 1),
                           "audio_min_per_s": round(tp, 1)}
            log(f"{kind:6s} B={b}: compile {comp:.0f}s, pipeline "
                f"{dt * 1e3:.1f} ms/step -> {tp:.1f} audio-min/s")
            if best is None or tp > best[0]:
                best = (tp, kind, b, dt, front)
                report["value"] = round(tp, 2)
                report["front_end"] = kind
                report["batch_clips"] = b
            emit()
    if best is None:
        report["error"] = "every front-end/batch combination failed"
        emit()
        return
    tpu_throughput, best_kind, n_clips, dt, best_front = best
    audio_minutes = n_clips * CLIP_SECONDS / 60.0

    xla_at_b = report["fronts"].get("xla", {}).get(f"b{n_clips}", {})
    pal_at_b = report["fronts"].get("pallas", {}).get(f"b{n_clips}", {})
    if "pipeline_ms" in xla_at_b and "pipeline_ms" in pal_at_b:
        margin = (xla_at_b["pipeline_ms"] / pal_at_b["pipeline_ms"] - 1) * 100
        report["pallas_vs_xla_margin_pct"] = round(margin, 1)
        log(f"pallas vs xla margin at B={n_clips}: {margin:+.1f}% "
            f"(positive = pallas faster); best: {best_kind}")

    # --- stage split at the headline geometry ---
    cqt_only = jax.jit(lambda y, _f=best_front: jnp.sum(_f(y, params)))
    dt_cqt, _ = time_fn(cqt_only, ys[:n_clips])
    stages["cqt_ms_per_audio_min"] = round(dt_cqt / audio_minutes * 1e3, 3)
    log(f"cqt alone ({best_kind}): {dt_cqt * 1e3:.1f} ms/step")
    emit()

    mel_host = np.asarray(cqt(ys[:BATCH], params))[:, :, :, None]
    mels = jax.device_put(jnp.asarray(np.concatenate(
        [mel_host] * (n_clips // BATCH))), dev)
    model_only = jax.jit(lambda m, s: _reduce(model.apply(
        variables, m, s, False)))
    dt_model, _ = time_fn(model_only, mels, seq[:n_clips])

    stages["model_ms_per_audio_min"] = round(dt_model / audio_minutes * 1e3, 3)
    stages["pipeline_ms_per_audio_min"] = round(dt / audio_minutes * 1e3, 3)
    log(f"model alone (fused_convstack={cfg.fused_convstack}): "
        f"{dt_model * 1e3:.1f} ms/step")
    report["fused_convstack"] = cfg.fused_convstack
    if cfg.fused_convstack:
        # plain-XLA model at the same geometry: the fused kernel's margin,
        # embedded so a regression in EITHER path is visible in the JSON
        try:
            plain = PitchClassNet(cfg.replace(fused_convstack=False))
            plain_only = jax.jit(lambda m, s: _reduce(plain.apply(
                variables, m, s, False)))
            dt_plain, _ = time_fn(plain_only, mels, seq[:n_clips])
            stages["model_plain_ms_per_audio_min"] = round(
                dt_plain / audio_minutes * 1e3, 3)
            log(f"model alone (plain XLA): {dt_plain * 1e3:.1f} ms/step "
                f"({(dt_plain / dt_model - 1) * 100:+.1f}% vs fused)")
        except Exception as e:
            log(f"plain-model delta failed: {e!r}")

    end_to_end = min(decode_tp, tpu_throughput)
    stages["end_to_end_audio_min_per_s"] = round(end_to_end, 1)
    log(f"best: {best_kind} B={n_clips} {tpu_throughput:.1f} "
        f"audio-min/s/chip; end-to-end (decode overlapped) {end_to_end:.1f}")
    emit()

    # --- MFU: analytic front-end FLOPs + XLA-reported model FLOPs ---
    fe_flops = frontend_flops(params, L, n_clips)
    model_flops = 0.0
    try:
        # USEFUL flops: always lower the plain-XLA model — the fused
        # Pallas stack's CostEstimate counts its 2.04x block-Toeplitz
        # FLOP inflation, which would overstate MFU by ~60%
        mfu_model = PitchClassNet(cfg.replace(fused_convstack=False))
        comp = jax.jit(lambda m, s: mfu_model.apply(variables, m, s, False)
                       ).lower(jnp.zeros((n_clips, cfg.pitches, n_frames, 1),
                                         jnp.float32),
                               jnp.full((n_clips,), n_frames, jnp.int32)
                               ).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        model_flops = float(ca.get("flops", 0.0))
    except Exception as e:
        log(f"model cost_analysis unavailable: {e!r}")
    mfu = (fe_flops + model_flops) / dt / F32_PEAK_FLOPS
    report["mfu"] = round(mfu, 4)
    log(f"flops/step: front-end {fe_flops / 1e9:.1f}G + model "
        f"{model_flops / 1e9:.1f}G -> MFU {mfu * 100:.2f}% of f32 peak")
    emit()

    # --- single-CPU baseline: identical JAX pipeline, one clip/batch ---
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            # f32 conv operands on CPU: native dtype there, so this is the
            # baseline's BEST case (conservative for the reported ratio);
            # plain f32 model regardless of the TPU serving dtype/path
            cpu_model = PitchClassNet(cfg.replace(
                fused_convstack=False, dtype="float32"))
            pipe_cpu = jax.jit(lambda y, s: _reduce(cpu_model.apply(
                variables, cqt(y, params, conv_dtype=jnp.float32)
                [:, :, :, None], s, False)))
            y1 = jnp.asarray(y0[:1])  # int16, like the TPU pipeline input
            s1 = jnp.asarray(seq_host[:1])
            dt_cpu, _ = time_fn(pipe_cpu, y1, s1, reps=2)
        cpu_tp = (CLIP_SECONDS / 60.0) / dt_cpu
        log(f"cpu baseline (same JAX pipeline, f32, 1 clip, 1 host CPU): "
            f"{dt_cpu * 1e3:.0f} ms/clip -> {cpu_tp:.2f} audio-min/s")
        report["vs_baseline"] = round(tpu_throughput / cpu_tp, 2)
    except Exception as e:
        log(f"cpu baseline failed: {e!r}")

    emit()


if __name__ == "__main__":
    main()
