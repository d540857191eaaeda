"""Oracle ceiling for the local (per-window) convergence benchmark.

The local run (CONVERGE_LOCAL.md) plateaus at val MIREX ~0.82 on modulating
songs. This script quantifies how much of the remaining gap is *structural*:
each prediction window spans loc_window_size seconds of audio, and windows
that straddle a modulation boundary contain TWO keys but carry ONE label
(the reference's half-window majority-overlap rule, KeyDataset.py:379-412 —
reproduced in utils/labels.py::local_segment_repeats). An acoustically
perfect model can only predict the key that dominates the window's actual
content; wherever that disagrees with the assigned label, even the oracle
scores the MIREX partial credit, not 1.0.

Oracle definition: for every valid window j (spanning trimmed-mel frames
[j, j+W), i.e. absolute frames [start_cut+j, start_cut+j+W)), predict the
annotation segment key with maximum frame overlap, then score that
prediction with the real metric (train/metrics.py::mirex_categories) against
the window's assigned label — exactly how validation scores the model
(per-song mean over valid windows, then mean over songs, trainer.py).

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/local_ceiling_analysis.py [corpus_root]

Defaults to the convergence run's val corpus /tmp/akx_hard_corpus/local_va
(regenerate with scripts/train_converge_hard_tpu.py local if absent).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from audio_key_estimation_tpu.data.loaders import SchubertWinterreiseLoader
from audio_key_estimation_tpu.train.metrics import mirex_categories
from audio_key_estimation_tpu.utils import labels as L

FRAMES = 5
# seconds — the convergence runs' config; AKX_LOC_WINDOW overrides to
# recompute the ceiling for the window-context experiments (VERDICT r4
# item 5): the straddle fraction grows with the window, so each window
# size has its OWN oracle ceiling
LOC_WINDOW_SIZE = int(os.environ.get("AKX_LOC_WINDOW", 10))


def song_oracle(segments, loader):
    """Per-window oracle categories for one song. Returns (cats, n_mixed,
    n_mismatch, n_windows) where mixed = window spans >1 segment and
    mismatch = oracle majority key != assigned label key."""
    W = FRAMES * LOC_WINDOW_SIZE
    key_rows, sig_rows, tonic_rows, start_cut, _ = L.local_labels(
        segments, loader.keys, loader.signature, FRAMES, LOC_WINDOW_SIZE)
    n_windows = key_rows.shape[0]

    # acoustic segment spans in frame units
    spans = [(int(s * FRAMES), int(e * FRAMES), k) for s, e, k in segments]
    seg_labels = [L.global_labels(k, loader.keys, loader.signature)
                  for _, _, k in spans]

    oracle_key = np.zeros((n_windows, 12), np.float32)
    oracle_tonic = np.zeros((n_windows, 12), np.float32)
    n_mixed = n_mismatch = 0
    for j in range(n_windows):
        lo, hi = start_cut + j, start_cut + j + W
        overlaps = [max(0, min(hi, e) - max(lo, s)) for s, e, _ in spans]
        best = int(np.argmax(overlaps))
        if sum(o > 0 for o in overlaps) > 1:
            n_mixed += 1
        k, _, t = seg_labels[best]
        oracle_key[j], oracle_tonic[j] = k, t
        if not np.array_equal(k, key_rows[j]):
            n_mismatch += 1

    cats = mirex_categories(key_rows.astype(np.float32), oracle_key,
                            tonic_rows.astype(np.float32), oracle_tonic,
                            sig_rows.astype(np.float32))
    cats = {k: float(np.mean(np.asarray(v))) for k, v in cats.items()}
    return cats, n_mixed, n_mismatch, n_windows


def main(root):
    loader = SchubertWinterreiseLoader(root, local=True)
    files = loader.get_filenames()
    if not files:
        raise SystemExit(f"no songs under {root} — regenerate with "
                         "scripts/train_converge_hard_tpu.py local")
    per_song, tot_mixed = [], [0, 0, 0]
    for fn in files:
        cats, n_mixed, n_mismatch, n_win = song_oracle(
            loader.get_key_signature(fn), loader)
        per_song.append(cats)
        tot_mixed[0] += n_mixed
        tot_mixed[1] += n_mismatch
        tot_mixed[2] += n_win
    agg = {k: float(np.mean([c[k] for c in per_song])) for k in per_song[0]}
    n_mixed, n_mismatch, n_win = tot_mixed
    print(f"corpus: {root}  ({len(files)} songs, {n_win} windows, "
          f"W={LOC_WINDOW_SIZE}s)")
    print(f"mixed windows (span >1 key): {n_mixed}/{n_win} "
          f"= {n_mixed / n_win:.3f}")
    print(f"oracle-vs-label mismatch   : {n_mismatch}/{n_win} "
          f"= {n_mismatch / n_win:.3f}")
    print("oracle ceiling (song-mean, as validation aggregates):")
    for k in ("mirex", "correct", "fifths", "relative", "parallel", "other"):
        print(f"  {k:9s} {agg[k]:.4f}")
    return agg


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/akx_hard_corpus/local_va")
