"""One real training run on the actual TPU chip (VERDICT r1 item 10).

Builds a synthetic debug-slice corpus, then runs the standard Trainer
(same code path as cli/train.py) for two epochs ON THE DEVICE JAX SELECTED
(TPU under the driver env; no CPU forcing). Records epoch losses and step
times to TRAIN_SMOKE_TPU.md.

Run serially — one TPU process at a time.
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    from audio_key_estimation_tpu.config import Config
    from audio_key_estimation_tpu.data import loaders, synthetic
    from audio_key_estimation_tpu.data.dataset import KeyDataset
    from audio_key_estimation_tpu.train.trainer import Trainer

    dev = jax.devices()[0]
    print(f"training on {dev.device_kind} ({dev.platform})", flush=True)

    cfg = Config(octaves=8, num_layers=2, conv_layers=3, n_filters=4,
                 kernel_size=7, head_layers=2, batch_size=4, acc_grad=2,
                 epochs=2, frames=5, bucket_sizes=(1024,), no_ckpt=True,
                 early_stop_patience=10)
    with tempfile.TemporaryDirectory() as td:
        keys = ["C major", "A minor", "G major", "D major"]
        songs = [(f"s{i}", 220.0 * 2 ** (i / 12), keys[i % 4], "techno")
                 for i in range(16)]
        root = synthetic.make_giantsteps_corpus(
            os.path.join(td, "gs"), songs, seconds=120.0)
        t0 = time.time()
        ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="",
                        use_cache=False)
        ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
        prep_s = time.time() - t0
        print(f"preprocess (decode + on-device CQT): {prep_s:.1f}s "
              f"for {len(ds)} two-minute songs", flush=True)

        trainer = Trainer(cfg, ds, ds, use_mesh=False)
        state, history = trainer.fit(seed=0)

    lines = [
        "# TPU training smoke",
        "",
        f"Device: **{dev.device_kind}** (`{dev.platform}`)",
        f"Config: flagship geometry (octaves=8, 2 layers, conv_layers=3, "
        f"n_filters=4, k=7), batch {cfg.batch_size} x acc_grad "
        f"{cfg.acc_grad}, 16 two-minute synthetic songs.",
        f"Preprocess (decode + batched on-device CQT): {prep_s:.1f} s",
        "",
        "| epoch | train_loss | val_loss | val_mirex | epoch_seconds |",
        "|---|---|---|---|---|",
    ]
    for row in history:
        lines.append(f"| {row['epoch']} | {row['train_loss']:.4f} | "
                     f"{row['val_loss']:.4f} | {row.get('val_mirex', 0):.4f}"
                     f" | {row['epoch_seconds']:.1f} |")
        assert np.isfinite(row["train_loss"])
    lines.append("")
    lines.append("Losses finite; the full train step (grad-accum scan + "
                 "Adam + BatchNorm carry) compiled and ran on the TPU chip.")
    with open(os.path.join(REPO, "TRAIN_SMOKE_TPU.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote TRAIN_SMOKE_TPU.md", flush=True)


if __name__ == "__main__":
    main()
