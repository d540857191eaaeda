"""Solve the Layer III synthesis-filterbank window (ISO table B.3 "D")
against the reference decoder.

The polyphase synthesis stage is linear: every PCM sample of output
column j is a fixed 16-tap combination of the V-vector history, with the
taps being the 512 window coefficients. Feeding frames of known spectral
content through the in-tree decode pipeline up to the subband samples
(data/mp3.py, everything before synthesis), computing the V vectors, and
decoding the same frames with the bundled libavcodec gives an exactly
determined least-squares system per output column (32 independent
16-unknown solves). The solved window IS the reference decoder's
effective synthesis window — the standard's D table up to the float
output convention.

Residual and grid diagnostics are printed: the ISO table's entries are
integer multiples of 2^-16 up to the decoder's float scale; a huge
residual means the IMDCT/window/overlap conventions upstream are wrong
(this doubles as the integration test of those stages).

Writes audio_key_estimation_tpu/data/_mp3_synth.py (SYNTH_D).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

from av_oracle import get_oracle
from mp3_builder import Granule, build_frame

from audio_key_estimation_tpu.data import mp3 as M

GG = 180


def make_frames(rng, n_frames=6):
    """Mono frames with dense, varied spectra via code table 1 (values
    ±1 over many lines, all three regions table 1)."""
    frames = []
    for _ in range(n_frames):
        grs = []
        for _gr in range(2):
            n_pairs = 180
            pairs = [(int(rng.integers(0, 2)) * (1, -1)[rng.integers(0, 2)],
                      int(rng.integers(0, 2)) * (1, -1)[rng.integers(0, 2)])
                     for _ in range(n_pairs)]
            grs.append(Granule(global_gain=GG, table_select=(1, 1, 1),
                               big_pairs=tuple(pairs)))
        frames.append(build_frame(grs))
    return frames


class _Recorder:
    """Duck-typed stand-in for mp3._Synth capturing subband samples."""

    def __init__(self):
        self.sbs = []

    def run(self, sb):
        self.sbs.append(sb.copy())
        return np.zeros(sb.shape[0] * 32)


def main():
    oracle = get_oracle()
    if oracle is None:
        raise SystemExit("bundled libavcodec unavailable")
    rng = np.random.default_rng(7)
    frames = make_frames(rng)
    stream = b"".join(frames)

    pcm, _ = oracle.decode(stream)
    pcm = pcm[:, 0].astype(np.float64)

    dec = M.Mp3Decoder(1)
    rec = _Recorder()
    dec.synth = [rec]
    out_frames = 0
    off = 0
    while off + 4 <= len(stream):
        hdr = M._Header(stream, off)
        dec.decode_frame(hdr, stream[off:off + hdr.frame_bytes])
        off += hdr.frame_bytes
        out_frames += 1
    sb = np.concatenate(rec.sbs, axis=0)          # (T, 32)
    T = sb.shape[0]
    n_pcm = min(len(pcm), T * 32)
    T = n_pcm // 32
    print(f"{out_frames} frames, {T} subband time steps", file=sys.stderr)

    # V vectors (zero history before t=0, matching both decoders' start)
    V = sb @ M._N64.T                              # (T, 64)

    D = np.zeros(512)
    worst = 0.0
    for j in range(32):
        # unknowns: u[i]   = D[64 i + j]      (tap on V_{t-2i}[j])
        #           u[8+i] = D[64 i + 32 + j] (tap on V_{t-2i-1}[32+j])
        A = np.zeros((T, 16))
        for i in range(8):
            col = V[:, j]
            A[2 * i:, i] = col[:T - 2 * i]
            col2 = V[:, 32 + j]
            A[2 * i + 1:, 8 + i] = col2[:T - 2 * i - 1]
        b = pcm[j:T * 32:32]
        u, res, *_ = np.linalg.lstsq(A, b, rcond=None)
        recon = A @ u
        r = np.max(np.abs(recon - b))
        worst = max(worst, r)
        for i in range(8):
            D[64 * i + j] = u[i]
            D[64 * i + 32 + j] = u[8 + i]
    scale = np.max(np.abs(D))
    print(f"solved D: max|residual| {worst:.3e} vs pcm max "
          f"{np.max(np.abs(pcm)):.3e}; max|D| {scale:.6f}",
          file=sys.stderr)
    if worst > 1e-4 * max(1.0, np.max(np.abs(pcm))):
        raise SystemExit("residual too large: synthesis/IMDCT conventions "
                         "upstream do not match the reference")

    # grid diagnostic: ISO B.3 entries are k/65536 times the decoder's
    # output scale; try to normalize by the center coefficient family
    grid = D * 65536.0
    snapped = np.round(grid)
    frac = np.max(np.abs(grid - snapped))
    print(f"2^-16 grid deviation (x65536): {frac:.4f} "
          f"({'snapping' if frac < 0.05 else 'NOT on grid; keeping floats'})",
          file=sys.stderr)
    if frac < 0.05:
        D = snapped / 65536.0

    dest = os.path.join(REPO, "audio_key_estimation_tpu", "data",
                        "_mp3_synth.py")
    with open(dest, "w") as f:
        f.write('"""Layer III synthesis window (ISO 11172-3 table B.3).\n\n'
                "GENERATED by scripts/extract_mp3_synth.py - solved by\n"
                "least squares against the reference decoder (see that\n"
                "script's docstring); a standard-defined constant table.\n"
                '"""\n\n# fmt: off\nSYNTH_D = (\n')
        for i in range(0, 512, 4):
            row = ", ".join(repr(float(v)) for v in D[i:i + 4])
            f.write(f"    {row},\n")
        f.write(")\n")
    print(f"wrote {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
