"""Benchmark: decode -> batched CQT -> PitchClassNet throughput on TPU.

Prints ONE JSON line:
  {"metric": "audio_min_per_sec_per_chip", "value": N,
   "unit": "audio-min/s/chip", "vs_baseline": R, "mfu": F, "stages": {...}}

Workload: 16 two-minute 22.05 kHz songs (deterministic tones+noise) written
as REAL WAV FILES and decoded through the production path
(audio_io.decode_many(raw=True) -> raw PCM16, host does I/O only; the
/32768 normalization runs inside the CQT graph), replicated with
deterministic on-device gain/noise variation to ONE monolithic 512-clip
int16 batch (REPLICAS=32; AKX_BENCH_REPLICAS sweeps) through the jitted
8-octave 36-bin log-CQT + flagship PitchClassNet (reference
train_model.py defaults). The monolithic batch matters: v5e throughput on
this model is per-tile-overhead-bound at small batch (PERFNOTES.md) — 256
clips at once is 3.5x faster than 8 scanned chunks of 16, and the Pallas
front-end keeps scaling to 512. Stage times (decode / cqt / model / fused pipeline) are
reported per audio-minute. Both front-ends are timed on TPU — the XLA
strided-conv path and the time-major frame-table Pallas kernel
(cqt_pallas.py: contiguous (win, B) window DMAs + fused filterbank
matmul/magnitude/log1p in VMEM) — and the headline uses whichever wins;
AKX_BENCH_NO_PALLAS=1 skips the kernel.

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
            proc.communicate()
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
# 16 (B=256) was the XLA-path saturation point; the Pallas front-end
# keeps scaling to B=512 (5378 vs 5165 audio-min/s; B=768 is flat at
# 5402 — PERFNOTES), so 32 is the default. Env knob for sweeps.
REPLICAS = int(os.environ.get("AKX_BENCH_REPLICAS", 32))
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


def build(cfg, params, variables, front):
    model = PitchClassNet(cfg)
    pipeline = jax.jit(lambda y, seq: _reduce(model.apply(
        variables, front(y, params)[:, :, :, None], seq, False)))
    cqt_only = jax.jit(lambda y: jnp.sum(front(y, params)))
    model_only = jax.jit(lambda mel, seq: _reduce(model.apply(
        variables, mel, seq, False)))
    return pipeline, cqt_only, model_only


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
    hop = reference_hop(SR, cfg.frames)
    params = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                       octaves=cfg.octaves)
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // hop
    n_clips = REPLICAS * BATCH
    audio_minutes = n_clips * CLIP_SECONDS / 60.0

    # --- stage 0: host decode through the production path ---
    stages = {}
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

    seq_host = np.full((n_clips,), n_frames, np.int32)

    mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
    model = PitchClassNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel0,
                           jnp.full((1,), n_frames, jnp.int32), False)

    dev = jax.devices()[0]
    log(f"benchmarking on {dev.device_kind} ({dev.platform})")

    # one monolithic int16 batch, assembled ON DEVICE (untimed): decoded
    # audio + deterministic gain/noise variations so every clip is distinct
    # real-shaped audio arriving in the production input dtype (raw PCM16)
    def _expand(y0j, key):
        outs = []
        for c in range(REPLICAS):
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

    results = {}
    conv_dtype = jnp.dtype(cfg.cqt_conv_dtype)
    fronts = [("xla", lambda y, p: cqt(y, p, conv_dtype=conv_dtype))]
    if not os.environ.get("AKX_BENCH_NO_PALLAS"):
        fronts.insert(0, ("pallas",
                          lambda y, p: cqt_pallas(y, p,
                                                  stream_dtype=conv_dtype)))
    for kind, front in fronts:
        if kind == "pallas" and dev.platform != "tpu":
            continue
        try:
            pipeline, cqt_only, model_only = build(cfg, params, variables,
                                                   front)
            dt, comp = time_fn(pipeline, ys, seq)
            dt_cqt, _ = time_fn(cqt_only, ys)
            results[kind] = {"pipeline_s": dt, "cqt_s": dt_cqt,
                             "compile_s": comp}
            log(f"{kind:6s} front-end: compile {comp:.0f}s, pipeline "
                f"{dt * 1e3:.1f} ms/step -> {audio_minutes / dt:.1f} "
                f"audio-min/s; cqt alone {dt_cqt * 1e3:.1f} ms")
        except Exception as e:
            log(f"{kind} path failed: {e!r}")
    if not results:
        print(json.dumps({"metric": "audio_min_per_sec_per_chip",
                          "value": 0.0, "unit": "audio-min/s/chip",
                          "vs_baseline": 0.0}))
        return

    best = min(results, key=lambda k: results[k]["pipeline_s"])
    dt = results[best]["pipeline_s"]
    if len(results) == 2:
        margin = (results["xla"]["pipeline_s"]
                  / results["pallas"]["pipeline_s"] - 1) * 100
        log(f"pallas vs xla margin: {margin:+.1f}% "
            f"(positive = pallas faster); best: {best}")

    # model-only stage on precomputed features
    mel_host = np.asarray(cqt(ys[:BATCH], params))[:, :, :, None]
    mels = jax.device_put(jnp.asarray(np.concatenate(
        [mel_host] * REPLICAS)), dev)
    _, _, model_only = build(cfg, params, variables, cqt)
    dt_model, _ = time_fn(model_only, mels, seq)

    stages["cqt_ms_per_audio_min"] = round(
        results[best]["cqt_s"] / audio_minutes * 1e3, 3)
    stages["model_ms_per_audio_min"] = round(dt_model / audio_minutes * 1e3, 3)
    stages["pipeline_ms_per_audio_min"] = round(dt / audio_minutes * 1e3, 3)
    log(f"model alone: {dt_model * 1e3:.1f} ms/step")

    tpu_throughput = audio_minutes / dt
    end_to_end = min(decode_tp, tpu_throughput)
    stages["end_to_end_audio_min_per_s"] = round(end_to_end, 1)
    log(f"best: {best} {tpu_throughput:.1f} audio-min/s/chip; end-to-end "
        f"(decode overlapped) {end_to_end:.1f}")

    # --- MFU: analytic front-end FLOPs + XLA-reported model FLOPs ---
    fe_flops = frontend_flops(params, L, n_clips)
    model_flops = 0.0
    try:
        comp = jax.jit(lambda m, s: model.apply(variables, m, s, False)
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
    log(f"flops/step: front-end {fe_flops / 1e9:.1f}G + model "
        f"{model_flops / 1e9:.1f}G -> MFU {mfu * 100:.2f}% of f32 peak")

    # --- single-CPU baseline: identical JAX pipeline, one clip/batch ---
    ratio = 0.0
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            # f32 conv operands on CPU: native dtype there, so this is the
            # baseline's BEST case (conservative for the reported ratio)
            pipe_cpu, _, _ = build(cfg, params, variables, cqt)
            y1 = jnp.asarray(y0[:1])  # int16, like the TPU pipeline input
            s1 = jnp.asarray(seq_host[:1])
            dt_cpu, _ = time_fn(pipe_cpu, y1, s1, reps=2)
        cpu_tp = (CLIP_SECONDS / 60.0) / dt_cpu
        log(f"cpu baseline (same JAX pipeline, f32, 1 clip, 1 host CPU): "
            f"{dt_cpu * 1e3:.0f} ms/clip -> {cpu_tp:.2f} audio-min/s")
        ratio = tpu_throughput / cpu_tp
    except Exception as e:
        log(f"cpu baseline failed: {e!r}")

    print(json.dumps({
        "metric": "audio_min_per_sec_per_chip",
        "value": round(tpu_throughput, 2),
        "unit": "audio-min/s/chip",
        "vs_baseline": round(ratio, 2),
        "mfu": round(mfu, 4),
        "stages": stages,
        "front_end": best,
    }))


if __name__ == "__main__":
    main()
