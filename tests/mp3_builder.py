"""MPEG-1 Layer III frame builder (tests only).

Constructs syntactically valid MP3 frames with fully specified side info
and main data, either from raw Huffman bit strings (used by
scripts/extract_mp3_tables.py to probe the libavcodec oracle) or from
spectral values encoded with the extracted code tables. This is NOT an
encoder — no MDCT analysis or psychoacoustics; spectral content is chosen
directly. Its purpose is generating test streams whose exact decoded
output an independent decoder (tests/av_oracle.py) can witness, so the
in-tree from-spec decoder (native/akx_mp3.cpp) can be validated across
the format surface: every Huffman table, long/short/mixed blocks, MS
stereo, scalefactors, preflag, subblock gain, the bit reservoir.

Bitstream layout follows ISO/IEC 11172-3 §2.4 (frame header, Layer III
side info, scalefactors, Huffman data). The reference consumes mp3 via
torchaudio (reference KeyDataset.py:341); this builder exists so the
replacement native decoder can be proven equivalent without shipping
licensed audio.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

SAMPLE_RATES = {44100: 0, 48000: 1, 32000: 2}
# MPEG-1 Layer III bitrate table (kbit/s), index 1..14
BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320]


class Bits:
    def __init__(self):
        self.bits = []

    def put(self, value: int, n: int):
        if n < 0 or (n < 64 and value >= (1 << n)) or value < 0:
            raise ValueError(f"value {value} does not fit in {n} bits")
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_str(self, s: str):
        for ch in s:
            if ch not in "01":
                raise ValueError(f"bad bit char {ch!r}")
            self.bits.append(int(ch))

    def __len__(self):
        return len(self.bits)

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            if len(out) > pad_to:
                raise ValueError(f"{len(out)} bytes exceed frame size {pad_to}")
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


@dataclass
class Granule:
    """One granule-channel's side info + main data.

    `huffman_bits`: raw bit string for the Huffman section (probing mode).
    `big_pairs`/`count1_quads`: signed spectral values, encoded with the
    extracted tables (encoding mode; requires _mp3_tables).
    """
    big_values: int = 0                  # count of big-region VALUES (2/pair)
    global_gain: int = 210
    scalefac_compress: int = 0
    window_switching: bool = False
    block_type: int = 0                  # 0 long; 1 start; 2 short; 3 stop
    mixed_block: bool = False
    table_select: tuple = (1, 1, 1)      # 2 entries used when switching
    subblock_gain: tuple = (0, 0, 0)
    region0_count: int = 15
    region1_count: int = 7
    preflag: int = 0
    scalefac_scale: int = 0
    count1table_select: int = 0
    scalefacs: tuple = ()                # long: 21 values; short: 12x3
    huffman_bits: str = ""
    big_pairs: tuple = ()                # ((x, y) signed ints) per pair
    count1_quads: tuple = ()             # ((v, w, x, y) in {-1,0,1}) per quad


def _scalefac_bits(g: Granule, slen, scfsi: int = 0,
                   gr: int = 0) -> "tuple[str, int]":
    """Scalefactor field bits for granule-channel g (MPEG-1).

    scfsi (4 bits, band groups sfb 0-5 / 6-10 / 11-15 / 16-20): groups
    whose bit is set are NOT retransmitted in granule 1 (long blocks only).
    """
    s1, s2 = slen[g.scalefac_compress]
    bits = Bits()
    if g.window_switching and g.block_type == 2:
        if g.mixed_block:
            ns1, ns2 = 8 + 3 * 3, 6 * 3    # 8 long sfb + sfb 3..5 short x3
        else:
            ns1, ns2 = 6 * 3, 6 * 3        # short sfb 0..5 x3, 6..11 x3
    else:
        ns1, ns2 = 11, 10                  # long sfb 0..10, 11..20
    sf = list(g.scalefacs) or [0] * (ns1 + ns2)
    if len(sf) != ns1 + ns2:
        raise ValueError(f"need {ns1 + ns2} scalefacs, got {len(sf)}")
    if scfsi and (g.window_switching and g.block_type == 2):
        raise ValueError("scfsi is long-block only")
    groups = ((0, 6), (6, 11), (11, 16), (16, 21))
    for i, v in enumerate(sf):
        if gr == 1 and scfsi:
            grp = next(k for k, (lo, hi) in enumerate(groups)
                       if lo <= i < hi)
            if (scfsi >> (3 - grp)) & 1:
                continue                   # shared with granule 0
        bits.put(v, s1 if i < ns1 else s2)
    return "".join(str(b) for b in bits.bits), len(bits)


def _encode_values(g: Granule, sr: int):
    """Huffman-encode big_pairs + count1_quads with the extracted tables."""
    from audio_key_estimation_tpu.data import _mp3_tables as T
    bits = Bits()
    n_pairs = len(g.big_pairs)
    regions = _region_pair_ranges(g, sr, n_pairs)
    for r, (lo, hi) in enumerate(regions):
        tab = g.table_select[r]
        if hi > lo and tab in (0, 4, 14):
            if any(x or y for x, y in g.big_pairs[lo:hi]):
                raise ValueError(f"table {tab} cannot encode nonzeros")
            continue
        linbits = T.LINBITS.get(tab, 0)
        codes = T.HUFF[T.PAIR_TABLE.get(tab, tab)] if hi > lo else None
        for x, y in g.big_pairs[lo:hi]:
            ax, ay = abs(x), abs(y)
            cx, cy = min(ax, 15), min(ay, 15)
            hlen, hcod = codes[(cx, cy)]
            bits.put(hcod, hlen)
            if cx == 15 and linbits:
                bits.put(ax - 15, linbits)
            if ax:
                bits.put(1 if x < 0 else 0, 1)
            if cy == 15 and linbits:
                bits.put(ay - 15, linbits)
            if ay:
                bits.put(1 if y < 0 else 0, 1)
    c1 = T.COUNT1B if g.count1table_select else T.COUNT1A
    for quad in g.count1_quads:
        key = tuple(1 if v else 0 for v in quad)
        hlen, hcod = c1[key]
        bits.put(hcod, hlen)
        for v in quad:
            if v:
                bits.put(1 if v < 0 else 0, 1)
    return "".join(str(b) for b in bits.bits)


def _region_pair_ranges(g: Granule, sr: int, n_pairs: int):
    """[(lo_pair, hi_pair)] x3 for the big-values regions."""
    if len(set(g.table_select)) == 1:
        # uniform table: boundaries cannot change the bitstream — also the
        # LSF probing path, which runs before the LSF band tables exist
        return [(0, n_pairs), (n_pairs, n_pairs), (n_pairs, n_pairs)]
    if g.window_switching:
        # switched blocks: region0 = 3 short bands (x3 windows) for pure
        # short blocks, else 8 long bands — the classic 36 lines at every
        # MPEG-1 rate; differs at LSF rates (ISO 2.4.2.7 / 13818-3). Must
        # mirror data/mp3.py::_region_boundaries exactly.
        from audio_key_estimation_tpu.data.mp3 import _region_boundaries
        b0 = min(_region_boundaries(g, sr)[0] // 2, n_pairs)
        return [(0, b0), (b0, n_pairs), (n_pairs, n_pairs)]
    from audio_key_estimation_tpu.data import _mp3_tables as T
    if sr not in T.SFB_LONG:
        from audio_key_estimation_tpu.data import _mp3_tables_lsf as TL
        band = TL.SFB_LONG_LSF[sr]
        l0 = band[min(g.region0_count + 1, len(band) - 1)]
        l1 = band[min(g.region0_count + 1 + g.region1_count + 1,
                      len(band) - 1)]
        return [(0, min(l0 // 2, n_pairs)),
                (min(l0 // 2, n_pairs), min(l1 // 2, n_pairs)),
                (min(l1 // 2, n_pairs), n_pairs)]
    band = T.SFB_LONG[sr]
    l0 = band[min(g.region0_count + 1, len(band) - 1)]
    l1 = band[min(g.region0_count + 1 + g.region1_count + 1, len(band) - 1)]
    b0 = min(l0 // 2, n_pairs)
    b1 = min(l1 // 2, n_pairs)
    return [(0, b0), (b0, b1), (b1, n_pairs)]


# MPEG-1 slen pairs (scalefac_compress -> (slen1, slen2)), ISO table B.6
SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]


def build_frame(granules, sr: int = 44100, bitrate: int = 160,
                mode: str = "mono", mode_ext: int = 0,
                main_data_begin: int = 0, pad_main: bytes = b"",
                frames_of_padding: int = 0, scfsi: tuple = ()) -> bytes:
    """One MPEG-1 Layer III frame.

    granules: [gr0, gr1] for mono, [[gr0_ch0, gr0_ch1], [gr1_ch0,
    gr1_ch1]] for stereo. mode: mono | stereo | joint. mode_ext (joint
    only): 2 = MS stereo on, 1 = intensity on, 3 = both. scfsi: per-channel
    4-bit scalefactor-share masks (granule 1 reuses granule 0's
    scalefactors for set band groups; its `scalefacs` entries for those
    groups are ignored).
    """
    nch = 1 if mode == "mono" else 2
    grs = []
    for g in granules:
        grs.append([g] if isinstance(g, Granule) else list(g))
        if len(grs[-1]) != nch:
            raise ValueError(f"{nch} channels expected")

    frame_len = 144 * bitrate * 1000 // sr
    hdr = Bits()
    hdr.put(0x7FF, 11)
    hdr.put(0b11, 2)                 # MPEG-1
    hdr.put(0b01, 2)                 # Layer III
    hdr.put(1, 1)                    # no CRC
    hdr.put(BITRATES.index(bitrate), 4)
    hdr.put(SAMPLE_RATES[sr], 2)
    hdr.put(0, 1)                    # padding
    hdr.put(0, 1)                    # private
    hdr.put({"stereo": 0, "joint": 1, "mono": 3}[mode], 2)
    hdr.put(mode_ext, 2)
    hdr.put(0, 1)                    # copyright
    hdr.put(1, 1)                    # original
    hdr.put(0, 2)                    # emphasis

    scfsi = tuple(scfsi) or (0,) * nch
    if len(scfsi) != nch:
        raise ValueError(f"{nch} scfsi masks expected")

    # ---- main data (scalefactors + huffman) per granule/channel ----
    main = ""
    p23 = [[0] * nch for _ in range(2)]
    for gi in range(2):
        for ch in range(nch):
            g = grs[gi][ch]
            sf_bits, n_sf = _scalefac_bits(g, SLEN, scfsi[ch], gi)
            if g.huffman_bits and (g.big_pairs or g.count1_quads):
                raise ValueError("give huffman_bits OR values, not both")
            hb = g.huffman_bits or (
                _encode_values(g, sr)
                if (g.big_pairs or g.count1_quads) else "")
            if not g.huffman_bits and g.big_pairs:
                # the side-info field counts PAIRS (<= 288)
                g = replace(g, big_values=len(g.big_pairs))
                grs[gi][ch] = g
            main += sf_bits + hb
            p23[gi][ch] = n_sf + len(hb)

    side = Bits()
    side.put(main_data_begin, 9)
    side.put(0, 5 if nch == 1 else 3)        # private bits
    for ch in range(nch):
        side.put(scfsi[ch], 4)
    for gi in range(2):
        for ch in range(nch):
            g = grs[gi][ch]
            side.put(p23[gi][ch], 12)
            side.put(g.big_values, 9)
            side.put(g.global_gain, 8)
            side.put(g.scalefac_compress, 4)
            side.put(1 if g.window_switching else 0, 1)
            if g.window_switching:
                side.put(g.block_type, 2)
                side.put(1 if g.mixed_block else 0, 1)
                for r in range(2):
                    side.put(g.table_select[r], 5)
                for w in range(3):
                    side.put(g.subblock_gain[w], 3)
            else:
                for r in range(3):
                    side.put(g.table_select[r], 5)
                side.put(g.region0_count, 4)
                side.put(g.region1_count, 3)
            side.put(g.preflag, 1)
            side.put(g.scalefac_scale, 1)
            side.put(g.count1table_select, 1)

    body = Bits()
    body.bits = hdr.bits + side.bits
    assert len(body) == 32 + (136 if nch == 1 else 256)
    body.put_str(main)
    if len(body) % 8 == 0 and pad_main:
        pass
    frame = bytearray(body.tobytes(pad_to=frame_len))
    if pad_main:
        off = (len(body) + 7) // 8
        frame[off:off + len(pad_main)] = pad_main[:frame_len - off]
    return bytes(frame)


def silence_granule() -> Granule:
    return Granule()


def build_stream(frames, lead_in: int = 0) -> bytes:
    """Concatenate frames into a raw mp3 stream."""
    return b"".join(frames)


# --------------------------------------------------------------- LSF frames

SAMPLE_RATES_V2 = {22050: 0, 24000: 1, 16000: 2}
SAMPLE_RATES_V25 = {11025: 0, 12000: 1, 8000: 2}
# MPEG-2/2.5 Layer III bitrate table (kbit/s), index 1..14
BITRATES_LSF = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                96, 112, 128, 144, 160]


def _scalefac_bits_lsf(g: Granule, is_intensity_ch: bool) -> "tuple[str, int]":
    """LSF scalefactor field bits (ISO 13818-3 2.4.3.4: slen quadruple +
    nr_of_sfb partitions derived from the 9-bit scalefac_compress)."""
    from audio_key_estimation_tpu.data import _mp3_tables_lsf as TL
    slens, nsfb, _pre = TL.lsf_scalefactor_layout(
        g.scalefac_compress, is_intensity_ch,
        g.window_switching and g.block_type == 2, g.mixed_block)
    total = sum(nsfb)
    sf = list(g.scalefacs) or [0] * total
    if len(sf) != total:
        raise ValueError(f"need {total} scalefacs, got {len(sf)}")
    bits = Bits()
    i = 0
    for n, sl in zip(nsfb, slens):
        for _ in range(n):
            if sf[i] >= (1 << sl) and sl == 0:
                raise ValueError("nonzero scalefac in slen-0 partition")
            bits.put(sf[i], sl)
            i += 1
    return "".join(str(b) for b in bits.bits), len(bits)


def build_frame_lsf(granules, sr: int = 22050, bitrate: int = 64,
                    mode: str = "mono", mode_ext: int = 0,
                    main_data_begin: int = 0, pad_main: bytes = b"") -> bytes:
    """One MPEG-2 / MPEG-2.5 (LSF) Layer III frame: 576 samples, ONE
    granule, 8-bit main_data_begin, no scfsi, 9-bit scalefac_compress,
    no preflag bit (ISO 13818-3 2.4.1.7).

    granules: one Granule for mono, [ch0, ch1] for stereo/joint.
    """
    if sr in SAMPLE_RATES_V2:
        ver_bits, sr_idx = 0b10, SAMPLE_RATES_V2[sr]
    elif sr in SAMPLE_RATES_V25:
        ver_bits, sr_idx = 0b00, SAMPLE_RATES_V25[sr]
    else:
        raise ValueError(f"not an LSF sample rate: {sr}")
    nch = 1 if mode == "mono" else 2
    grs = [granules] if isinstance(granules, Granule) else list(granules)
    if len(grs) != nch:
        raise ValueError(f"{nch} channels expected")

    frame_len = 72 * bitrate * 1000 // sr
    hdr = Bits()
    hdr.put(0x7FF, 11)
    hdr.put(ver_bits, 2)
    hdr.put(0b01, 2)                 # Layer III
    hdr.put(1, 1)                    # no CRC
    hdr.put(BITRATES_LSF.index(bitrate), 4)
    hdr.put(sr_idx, 2)
    hdr.put(0, 1)                    # padding
    hdr.put(0, 1)                    # private
    hdr.put({"stereo": 0, "joint": 1, "mono": 3}[mode], 2)
    hdr.put(mode_ext, 2)
    hdr.put(0, 1)                    # copyright
    hdr.put(1, 1)                    # original
    hdr.put(0, 2)                    # emphasis

    main = ""
    p23 = [0] * nch
    for ch in range(nch):
        g = grs[ch]
        intensity_ch = mode == "joint" and (mode_ext & 1) and ch == 1
        sf_bits, n_sf = _scalefac_bits_lsf(g, bool(intensity_ch))
        if g.huffman_bits and (g.big_pairs or g.count1_quads):
            raise ValueError("give huffman_bits OR values, not both")
        hb = g.huffman_bits or (
            _encode_values(g, sr)
            if (g.big_pairs or g.count1_quads) else "")
        if not g.huffman_bits and g.big_pairs:
            g = replace(g, big_values=len(g.big_pairs))
            grs[ch] = g
        main += sf_bits + hb
        p23[ch] = n_sf + len(hb)

    side = Bits()
    side.put(main_data_begin, 8)
    side.put(0, 1 if nch == 1 else 2)        # private bits
    for ch in range(nch):
        g = grs[ch]
        side.put(p23[ch], 12)
        side.put(g.big_values, 9)
        side.put(g.global_gain, 8)
        side.put(g.scalefac_compress, 9)
        side.put(1 if g.window_switching else 0, 1)
        if g.window_switching:
            side.put(g.block_type, 2)
            side.put(1 if g.mixed_block else 0, 1)
            for r in range(2):
                side.put(g.table_select[r], 5)
            for w in range(3):
                side.put(g.subblock_gain[w], 3)
        else:
            for r in range(3):
                side.put(g.table_select[r], 5)
            side.put(g.region0_count, 4)
            side.put(g.region1_count, 3)
        side.put(g.scalefac_scale, 1)
        side.put(g.count1table_select, 1)

    body = Bits()
    body.bits = hdr.bits + side.bits
    assert len(body) == 32 + (72 if nch == 1 else 136)
    body.put_str(main)
    frame = bytearray(body.tobytes(pad_to=frame_len))
    if pad_main:
        off = (len(body) + 7) // 8
        frame[off:off + len(pad_main)] = pad_main[:frame_len - off]
    return bytes(frame)
