"""Equivariance test CLI (reference equivariance_test.py).

    python -m audio_key_estimation_tpu.cli.equivariance [--custom_cqt]
        [--wav path.wav] [--save out.npy] [--heatmap out.png]

Runs an UNtrained PitchClassNet on a CQT shifted by -12..+12 semitones
(3 rows each at 36 bins/octave) with a ±1-octave zero guard band
(equivariance_test.py:174-205), stacks the 25x12 key outputs, and — unlike
the reference's eyeball-a-heatmap procedure — asserts exact circular-shift
equivariance programmatically. Heatmaps remain available for inspection.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..config import add_config_args, config_from_args
from ..data.synthetic import custom_cqt
from ..models import PitchClassNet
from ..ops.cqt import CQTParams, cqt, reference_hop


def shift_rows(mel: np.ndarray, semitones: int) -> np.ndarray:
    """Shift CQT rows up by `semitones` (3 rows each), zero-filling — the
    intent of mel_shifting_up/down (equivariance_test.py:122-146)."""
    steps = 3 * semitones
    out = np.zeros_like(mel)
    if steps > 0:
        out[steps:] = mel[:-steps]
    elif steps < 0:
        out[:steps] = mel[-steps:]
    else:
        out = mel.copy()
    return out


def shift_and_stack(cfg, mel: np.ndarray, seed: int = 0) -> np.ndarray:
    """25 x 12 key outputs for shifts +0..+12 then -1..-12 stacked in the
    reference's row order (+12 at top, -12 at bottom;
    equivariance_test.py:179-205)."""
    # pad one octave of zeros top+bottom (the guard band)
    guard = np.zeros((36, mel.shape[1]), mel.dtype)
    mel = np.concatenate([guard, mel, guard], axis=0)
    cfg = cfg.replace(octaves=mel.shape[0] // 36)
    model = PitchClassNet(cfg)
    x0 = jnp.asarray(mel[None, :, :, None])
    variables = model.init(jax.random.PRNGKey(seed), x0, None, False)

    rows = []
    for s in list(range(12, 0, -1)) + [0] + list(range(-1, -13, -1)):
        shifted = jnp.asarray(shift_rows(mel, s)[None, :, :, None])
        key = model.apply(variables, shifted, None, False)[0]
        rows.append(np.asarray(key)[0])
    return np.stack(rows)  # (25, 12), row 0 = +12 ... row 24 = -12


def check_equivariance(stack: np.ndarray, atol: float = 1e-4) -> float:
    """Max deviation after reverse-rotating row for shift s by s."""
    base = stack[12]  # shift 0
    worst = 0.0
    for i, s in enumerate(list(range(12, -13, -1))):
        aligned = np.roll(stack[i], -s)
        worst = max(worst, float(np.abs(aligned - base).max()))
    return worst


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PitchClassNet transposition-equivariance check",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_config_args(parser)
    parser.add_argument("--custom_cqt", action="store_true",
                        help="synthetic blob CQT instead of audio")
    parser.add_argument("--cqt_with_border", action="store_true")
    parser.add_argument("--wav", type=str, default="")
    parser.add_argument("--save", type=str, default="Equivariance_Test.npy")
    parser.add_argument("--heatmap", type=str, default="")
    parser.add_argument("--atol", type=float, default=1e-4)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    if args.wav:
        from ..data.audio_io import decode_audio
        samples, sr = decode_audio(args.wav)
        p = CQTParams(sr=sr, hop=reference_hop(sr, cfg.frames, cfg.window_size,
                                               len(samples)),
                      bins_per_octave=36, octaves=cfg.octaves - 2)
        mel = np.asarray(cqt(jnp.asarray(samples), p))[0]
    else:
        mel = custom_cqt(cfg.octaves - 2, with_border=args.cqt_with_border)

    stack = shift_and_stack(cfg, mel, seed=cfg.seed)
    if args.save:
        np.save(args.save, stack)
    worst = check_equivariance(stack, args.atol)
    print(f"max equivariance deviation over ±12 semitone shifts: {worst:.3e}")
    if args.heatmap:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, 2, figsize=(22, 10))
            axes[0].imshow(stack, aspect="auto")
            axes[0].set_title("raw key outputs per shift")
            adj = np.stack([np.roll(stack[i], -s) for i, s in
                            enumerate(range(12, -13, -1))])
            axes[1].imshow(adj, aspect="auto")
            axes[1].set_title("rotation-corrected (rows must be identical)")
            for ax in axes:
                ax.set_xlabel("pitch class")
                ax.set_ylabel("semitone shift (12 .. -12)")
            fig.savefig(args.heatmap, dpi=100)
            print(f"heatmap -> {args.heatmap}")
        except ImportError:
            print("matplotlib unavailable; skipped heatmap")
    ok = worst < args.atol
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
