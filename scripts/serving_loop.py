"""Measured end-to-end serving throughput: host ingest OVERLAPPED with the
device pipeline, not derived from min(host, device).

A producer thread ingests 16-wav batches into alternating reused buffers
(audio_io.ingest_batch) while the device runs the fused CQT+model pipeline
on the previous batch; sustained audio-min/s over N steps is reported.
Each device step consumes ONE ingested 16-clip batch (no replication), so
this measures the true host-fed regime. Run serially on TPU.

MEASURED RESULT ON THIS ENVIRONMENT (PERFNOTES.md round-3): 8.2
audio-min/s — entirely the RELAY's fault, not the pipeline's: the
dev-tunnel ships each 85 MB int16 batch to the remote chip over HTTP at
~22 MB/s (3.9 s/step vs the pipeline's ~35 ms of device work). On
co-located serving hardware the same transfer is ~8 ms of PCIe/DMA, and
the end-to-end rate returns to min(host ingest, device pipeline) — which
is what bench.py reports. This script exists to keep that claim honest:
it measures the real loop, and on this rig it measures the tunnel.
"""
import os
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.data import audio_io
from audio_key_estimation_tpu.models import PitchClassNet
from audio_key_estimation_tpu.ops.cqt import CQTParams, cqt, reference_hop

SR = 22050
CLIP_SECONDS = 120
BATCH = 16
STEPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = Config()
    hop = reference_hop(SR, cfg.frames)
    params = CQTParams(sr=SR, hop=hop, bins_per_octave=cfg.bins_per_octave,
                       octaves=cfg.octaves)
    L = SR * CLIP_SECONDS
    n_frames = 1 + L // hop
    conv_dtype = jnp.dtype(cfg.cqt_conv_dtype)

    with tempfile.TemporaryDirectory() as td:
        rng = np.random.default_rng(0)
        t = np.arange(L) / SR
        paths = []
        for i in range(BATCH):
            y = (0.4 * np.sin(2 * np.pi * 110 * 2 ** (i / 5) * t)
                 + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
            p = os.path.join(td, f"s{i}.wav")
            audio_io.write_wav(p, y * 0.5, SR)
            paths.append(p)

        model = PitchClassNet(cfg)
        mel0 = jnp.zeros((1, cfg.pitches, n_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), mel0,
                               jnp.full((1,), n_frames, jnp.int32), False)
        seq = jnp.full((BATCH,), n_frames, jnp.int32)
        pipeline = jax.jit(lambda y, s: sum(
            jnp.sum(o) for o in model.apply(
                variables, cqt(y, params, conv_dtype=conv_dtype)
                [:, :, :, None], s, False)))

        bufs = [np.empty((BATCH, L), np.int16) for _ in range(2)]
        ready = [threading.Semaphore(0), threading.Semaphore(0)]
        free = [threading.Semaphore(1), threading.Semaphore(1)]

        def producer():
            for i in range(STEPS):
                k = i % 2
                free[k].acquire()
                batch, _, _ = audio_io.ingest_batch(paths, L, out=bufs[k])
                # the decode fallback (non-mono-PCM16 input) ignores out=
                # and would leave bufs[k] stale — fail loudly, not wrongly
                assert batch is bufs[k], "ingest fell back off the raw path"
                ready[k].release()

        # warm: compile + first ingest
        audio_io.ingest_batch(paths, L, out=bufs[0])
        float(pipeline(jnp.asarray(bufs[0]), seq))

        th = threading.Thread(target=producer, daemon=True)
        t0 = time.perf_counter()
        th.start()
        acc = 0.0
        for i in range(STEPS):
            k = i % 2
            ready[k].acquire()
            out = pipeline(jnp.asarray(bufs[k]), seq)
            acc += float(out)       # fetch forces the full round trip
            # release only after the fetch fences the step: jnp.asarray's
            # H2D staging may still read the host buffer before then, and
            # the producer would race a rewrite. Double buffering keeps
            # the OTHER buffer's ingest overlapped with this compute.
            free[k].release()
        wall = time.perf_counter() - t0
        th.join()
        mins = STEPS * BATCH * CLIP_SECONDS / 60.0
        log(f"serving loop: {STEPS} steps x {BATCH} clips in {wall:.2f}s "
            f"-> {mins / wall:.1f} audio-min/s end-to-end (measured, "
            f"ingest overlapped)")


if __name__ == "__main__":
    main()
