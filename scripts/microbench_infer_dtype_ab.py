"""Serving-dtype quality gate: f32-trained weights, f32 vs bf16 inference.

The round-5 perf push makes bf16 the model-forward serving dtype (the
stage is HBM-traffic-bound at B=512 — see microbench_model_bf16.py).
This script answers the quality half: train the flagship global phase in
f32 on the hard benchmark corpus (240/48 songs, disjoint timbres), then
evaluate the SAME trained state under f32 and bf16 compute and compare
val MIREX + the full category breakdown. Pass bar: identical MIREX to 4
decimals (argmax-stable logits), with the max logits delta reported.

Run (TPU, serial): timeout 3300 python scripts/microbench_infer_dtype_ab.py
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

from dataclasses import replace

sys.path.insert(0, os.path.join(REPO, "scripts"))
from train_converge_hard_tpu import build_global_corpus  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from audio_key_estimation_tpu.config import Config  # noqa: E402
from audio_key_estimation_tpu.data import loaders  # noqa: E402
from audio_key_estimation_tpu.data.dataset import KeyDataset  # noqa: E402
from audio_key_estimation_tpu.models import PitchClassNet  # noqa: E402
from audio_key_estimation_tpu.train.trainer import (  # noqa: E402
    Trainer, evaluate, make_eval_step)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    cfg = Config(epochs=10, frames=5, bucket_sizes=(512,), no_ckpt=True,
                 batch_size=16, acc_grad=1, early_stop_patience=10,
                 lr=3e-4, genre=False, dtype="float32")
    tr_root, va_root = build_global_corpus(pilot=False)
    tr = KeyDataset(genre=False, cfg=cfg, blacklist_path="", use_cache=True)
    tr.import_data(loaders.GiantStepsKeyLoader(tr_root), progress=False)
    va = KeyDataset(genre=False, cfg=cfg, blacklist_path="", use_cache=True)
    va.import_data(loaders.GiantStepsKeyLoader(va_root), progress=False)
    print(f"corpus ready: {len(tr)}+{len(va)} songs", flush=True)

    trainer = Trainer(cfg, tr, va, use_mesh=False)
    t0 = time.time()
    state, history = trainer.fit(seed=0, eval_at_start=False)
    best = max(h.get("val_mirex", 0.0) for h in history)
    print(f"f32 fit {time.time() - t0:.0f}s, best val MIREX {best:.4f}",
          flush=True)

    results = {}
    for dt in ("float32", "bfloat16"):
        cfg_i = replace(cfg, dtype=dt)
        model = PitchClassNet(cfg_i, dtype=jnp.dtype(dt))
        step = make_eval_step(model, cfg_i)
        t0 = time.time()
        m = evaluate(step, state, va, batch_size=cfg.batch_size)
        results[dt] = m
        print(f"eval[{dt}] ({time.time() - t0:.0f}s): "
              + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                         if isinstance(v, float)), flush=True)

    d = abs(results["float32"]["mirex"] - results["bfloat16"]["mirex"])
    verdict = "PASS" if d < 5e-4 else "FAIL"
    print(f"\nMIREX f32 {results['float32']['mirex']:.4f} vs "
          f"bf16 {results['bfloat16']['mirex']:.4f} "
          f"(|delta| {d:.2e}) -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
