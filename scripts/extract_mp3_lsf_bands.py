"""Behaviorally reconstruct the MPEG-2/2.5 (LSF) Layer III scalefactor
band tables from an independent reference decoder.

Protocol (same provenance approach as scripts/extract_mp3_tables.py):
for every spectral line L of every LSF sample rate, build two one-line
LSF frames — identical except that one carries a per-band scalefactor
LADDER (sf[b] = b mod 6 under slens (4,4,3,3), scalefac_compress 399)
and the other carries all-zero scalefactors (scalefac_compress 0) —
decode both through libavcodec (tests/av_oracle.py), and read line L's
scalefactor off the amplitude ratio (requantize is exactly linear per
line: ratio = 2^(-0.5 * sf)). Walking L and matching the inferred sf
sequence against the expected ladder (b mod 6 for the 21 long / 36 short
transmitted bands, then 0 for the tail band) yields every band boundary
AND self-checks the partition arithmetic: a wrong NR_OF_SFB row or slen
quadruple desynchronizes the scalefactor bits and no consistent
segmentation exists.

Writes data/_mp3_bands_lsf.py. Run: python scripts/extract_mp3_lsf_bands.py
"""
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

from av_oracle import get_oracle
from mp3_builder import Granule, build_frame_lsf

LADDER_SFC = 399          # slens (4,4,3,3); blocknumber 0
RATES = (22050, 24000, 16000, 11025, 12000, 8000)


def one_line_granule(line: int, sfc: int, scalefacs, short: bool):
    pairs = tuple([(0, 0)] * (line // 2)
                  + [(1, 0) if line % 2 == 0 else (0, 1)])
    return Granule(global_gain=210, scalefac_compress=sfc,
                   window_switching=short, block_type=2 if short else 0,
                   table_select=(1, 1, 1), region0_count=15,
                   region1_count=7, scalefacs=tuple(scalefacs),
                   big_pairs=pairs)


def probe_sf(oracle, sr: int, line: int, n_sf: int, short: bool) -> int:
    """Inferred scalefactor of `line` under the ladder, via one decode."""
    ladder = [i % 6 for i in range(n_sf)]
    g1 = one_line_granule(line, LADDER_SFC, ladder, short)
    g0 = one_line_granule(line, 0, [], short)
    sil = Granule()
    stream = b"".join(build_frame_lsf(g, sr=sr, bitrate=64)
                      for g in (g1, sil, g0, sil))
    pcm, _ = oracle.decode(stream)
    if pcm.shape[0] < 4 * 576:
        raise RuntimeError(f"oracle decoded {pcm.shape[0]} samples")
    a = np.max(np.abs(pcm[:2 * 576]))
    b = np.max(np.abs(pcm[2 * 576:4 * 576]))
    if b <= 0:
        raise RuntimeError(f"silent reference at sr={sr} line={line}")
    sf = -2.0 * math.log2(a / b)
    r = round(sf)
    if abs(sf - r) > 0.1 or not (0 <= r <= 5):
        raise RuntimeError(f"ambiguous sf {sf:.3f} at sr={sr} line={line} "
                           f"short={short}")
    return r


def extract_bounds(sfs, n_bands: int, per_band: int = 1):
    """Boundaries from the inferred per-line sf sequence: band k (of the
    n_bands carrying scalefactors, each spanning `per_band` consecutive
    scalefactor slots... for short blocks slots advance per window) plus
    the scalefactor-less tail. Returns the boundary list in LINES."""
    bounds = [0]
    slot = 0                      # index into the ladder
    total_slots = n_bands
    for line, sf in enumerate(sfs):
        expect = slot % 6 if slot < total_slots else 0
        if sf != expect:
            slot += 1
            expect = slot % 6 if slot < total_slots else 0
            bounds.append(line)
            if sf != expect:
                raise RuntimeError(
                    f"sf {sf} at line {line} matches neither slot "
                    f"{slot - 1} nor {slot}")
    if slot != total_slots:
        raise RuntimeError(f"ended at slot {slot}, expected {total_slots}")
    bounds.append(len(sfs))
    return bounds


def probe_rate(oracle, sr: int):
    sfs_long = [probe_sf(oracle, sr, L, 21, False) for L in range(576)]
    lb = extract_bounds(sfs_long, 21)
    sfs_short = [probe_sf(oracle, sr, L, 36, True) for L in range(576)]
    sb_lines = extract_bounds(sfs_short, 36)
    # short boundaries arrive per (sfb, window) group of equal width; fold
    # the 3 windows back into per-sfb widths and check they agree
    widths = [sb_lines[i + 1] - sb_lines[i] for i in range(len(sb_lines) - 1)]
    if len(widths) != 37:
        raise RuntimeError(f"short probe found {len(widths)} groups, "
                           "expected 36 + tail")
    sfb_w = []
    for k in range(12):
        w3 = widths[3 * k: 3 * k + 3]
        if len(set(w3)) != 1:
            raise RuntimeError(f"short sfb {k} windows differ: {w3}")
        sfb_w.append(w3[0])
    sb = [0]
    for w in sfb_w:
        sb.append(sb[-1] + w)
    tail_lines = widths[36]
    if tail_lines % 3:
        raise RuntimeError(f"short tail {tail_lines} not divisible by 3")
    sb.append(sb[-1] + tail_lines // 3)
    if sb[-1] != 192:
        raise RuntimeError(f"short table ends at {sb[-1]}, expected 192")
    if lb[-1] != 576:
        raise RuntimeError(f"long table ends at {lb[-1]}, expected 576")
    if len(lb) != 23:
        raise RuntimeError(f"long table has {len(lb)} bounds, expected 23")
    print(f"sr {sr}: long {tuple(lb)}", flush=True)
    print(f"sr {sr}: short {tuple(sb)}", flush=True)
    return tuple(lb), tuple(sb)


def main():
    oracle = get_oracle()
    if oracle is None:
        print("no oracle available", file=sys.stderr)
        sys.exit(1)
    longs, shorts = {}, {}
    for sr in RATES:
        longs[sr], shorts[sr] = probe_rate(oracle, sr)
    out = os.path.join(REPO, "audio_key_estimation_tpu", "data",
                       "_mp3_bands_lsf.py")
    with open(out, "w") as f:
        f.write('"""MPEG-2/2.5 (LSF) Layer III scalefactor band tables '
                '(ISO/IEC 13818-3\nannex B).\n\n'
                "GENERATED by scripts/extract_mp3_lsf_bands.py — do not "
                "edit by hand.\n\nReconstructed BEHAVIORALLY: every "
                "boundary was read off libavcodec's\ndecoded amplitudes "
                "of single-line probe frames under per-band\nscalefactor "
                "ladders (see the extractor's docstring). These are\n"
                "standard-defined constants, identical in every "
                'conforming decoder —\nno third-party source code was '
                'copied.\n"""\n\n')
        f.write("SFB_LONG_LSF = {\n")
        for sr in RATES:
            f.write(f"    {sr}: {longs[sr]},\n")
        f.write("}\n\nSFB_SHORT_LSF = {\n")
        for sr in RATES:
            f.write(f"    {sr}: {shorts[sr]},\n")
        f.write("}\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
