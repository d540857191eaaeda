"""Audio decode: native C++ fast path with a pure-numpy fallback.

Replaces the reference's torchaudio.load C++ boundary (KeyDataset.py:341).
Returns (samples_float32_channel0, sample_rate) — the reference consumes
channel 0 only (KeyDataset.py:481).

MP3 decodes in-tree (data/mp3.py): MPEG-1 Layer III on the native C++
fast path (native/akx_mp3.cpp — covers the scraped corpora, which are
44.1 kHz MPEG-1) and MPEG-2/2.5 (LSF) in the numpy decoder; no external
binary needed for any conforming Layer III file. Damaged streams fall
back to an `ffmpeg`/`mpg123` transcode when one exists on PATH,
otherwise a clear error points at pre-converting the corpus.
"""

from __future__ import annotations

import concurrent.futures as futures
import ctypes
import mmap
import os
import shutil
import struct
import subprocess
import sys
import tempfile
import time
from contextlib import nullcontext

import numpy as np

from ..native.binding import load_library


class AudioDecodeError(RuntimeError):
    pass


def _decode_wav_native(path: str):
    lib = load_library()
    if lib is None:
        return None
    h = lib.akx_decode_wav(path.encode())
    try:
        n = lib.akx_num_samples(h)
        sr = lib.akx_sample_rate(h)
        if n == 0 or sr == 0:
            err = lib.akx_error(h).decode() or "decode failed"
            raise AudioDecodeError(f"{path}: {err}")
        buf = np.ctypeslib.as_array(lib.akx_samples(h), shape=(n,))
        return buf.copy(), sr
    finally:
        lib.akx_free(h)


def _decode_wav_numpy(path: str):
    """Minimal RIFF/WAVE parser (PCM u8/s16/s24/s32, float32/64), channel 0."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise AudioDecodeError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = channels = bits = rate = 0
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        clen = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8: pos + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt == 0xFFFE and clen >= 40:
                fmt = struct.unpack_from("<H", body, 24)[0]
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if data is None or channels == 0:
        raise AudioDecodeError(f"{path}: missing fmt/data chunk")
    if fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif fmt == 1 and bits == 8:
        x = (np.frombuffer(data, "u1").astype(np.float32) - 128.0) / 128.0
    elif fmt == 1 and bits == 24:
        raw = np.frombuffer(data, "u1")
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.uint32)
        v = (raw[:, 0] << 8 | raw[:, 1] << 16 | raw[:, 2] << 24).astype(np.int32) >> 8
        x = v.astype(np.float32) / 8388608.0
    elif fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    elif fmt == 3 and bits == 64:
        x = np.frombuffer(data, "<f8").astype(np.float32)
    else:
        raise AudioDecodeError(f"{path}: unsupported encoding fmt={fmt} bits={bits}")
    x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    return np.ascontiguousarray(x[:, 0]), rate


def _decode_mp3_native(path: str):
    """C++ fast path (native/akx_mp3.cpp, ~40x the numpy decoder). Returns
    None when the library is unavailable or the stream needs a fallback
    (the numpy decoder re-derives the precise error)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "akx_decode_mp3"):
        return None
    h = lib.akx_decode_mp3(path.encode())
    try:
        n = lib.akx_num_samples(h)
        sr = lib.akx_sample_rate(h)
        if n == 0 or sr == 0:
            return None
        buf = np.ctypeslib.as_array(lib.akx_samples(h), shape=(n,))
        return buf.copy(), sr
    finally:
        lib.akx_free(h)


def _transcode_to_wav(path: str) -> str:
    for tool, args in (("ffmpeg", ["-y", "-i", path, "-ac", "1"]),
                       ("mpg123", ["-w"])):
        exe = shutil.which(tool)
        if exe:
            tmp = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
            tmp.close()
            if tool == "ffmpeg":
                cmd = [exe] + args + [tmp.name]
            else:
                cmd = [exe, "-w", tmp.name, path]
            r = subprocess.run(cmd, capture_output=True)
            if r.returncode == 0:
                return tmp.name
            os.unlink(tmp.name)
    raise AudioDecodeError(
        f"{path}: no mp3 decoder available (install ffmpeg or pre-convert "
        "the corpus to wav)")


def _wav_layout(path: str):
    """RIFF chunk walk using reads+seeks only (no data-chunk I/O).

    Returns (fmt, channels, bits, rate, data_off, data_len) or raises
    AudioDecodeError for a non-RIFF file / missing chunks.
    """
    with open(path, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise AudioDecodeError(f"{path}: not a RIFF/WAVE file")
        size = os.fstat(f.fileno()).st_size
        fmt = channels = bits = rate = 0
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid = hdr[:4]
            clen = struct.unpack("<I", hdr[4:])[0]
            pos = f.tell()
            if cid == b"fmt " and clen >= 16:
                body = f.read(min(clen, 64))
                fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if fmt == 0xFFFE and clen >= 40:
                    fmt = struct.unpack_from("<H", body, 24)[0]
            elif cid == b"data":
                data = (pos, min(clen, size - pos))
            f.seek(pos + clen + (clen & 1))
        if data is None or channels == 0:
            raise AudioDecodeError(f"{path}: missing fmt/data chunk")
        return fmt, channels, bits, rate, data[0], data[1]


def _decode_wav_raw(path: str):
    """PCM16 fast path: (int16 channel-0 samples, sr) with NO sample
    conversion — header parse + (for mono) a zero-copy buffer view.

    The /32768 normalization runs ON DEVICE inside the CQT graph
    (ops/cqt.py handles integer inputs), so on a decode-bound host this
    path is pure I/O: ~6x the bytes/s of float conversion, and the H2D
    transfer ships half the bytes. Returns None for non-PCM16 encodings
    (callers fall back to the float32 decoders).

    The file is memory-mapped, not read: a mono PCM16 result is a zero-copy
    view over the mapping, so the samples are paged in only when a consumer
    (pack_batch / jnp.asarray) streams them into the batch array — one pass
    over the bytes total instead of two (read-into-bytes + pack); see the
    ingest study in PERFNOTES.md. Batch consumers that know the padded
    length up front should prefer `ingest_batch`, which skips the mapping
    entirely and reads each data chunk straight into the batch row. The
    mapping stays valid after the fd closes; numpy keeps it alive via the
    buffer protocol.
    """
    fmt, channels, bits, rate, off, dlen = _wav_layout(path)
    if fmt != 1 or bits != 16:
        return None
    with open(path, "rb") as f:
        try:
            buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):   # empty or unmappable file
            buf = f.read()
    x = np.frombuffer(buf, "<i2", count=(dlen // (2 * channels)) * channels,
                      offset=off)
    if channels > 1:
        x = np.ascontiguousarray(x[::channels])
    return x, rate


def decode_audio(path: str, raw: bool = False):
    """(samples of channel 0, sample_rate). wav native; mp3 gated.

    raw=False: samples are normalized float32 (torchaudio.load semantics,
    KeyDataset.py:341). raw=True: PCM16 files return int16 samples with the
    normalization deferred to the device (ops/cqt.py); other encodings
    still return float32.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mp3":
        out = _decode_mp3_native(path)
        if out is not None:
            return out
        from .mp3 import Mp3Error, decode_mp3_file
        try:
            pcm, sr = decode_mp3_file(path)
            return np.ascontiguousarray(pcm[:, 0]), sr
        except Mp3Error:
            # damaged/non-conforming stream: external transcode fallback
            tmp = _transcode_to_wav(path)
            try:
                return decode_audio(tmp, raw=raw)
            finally:
                os.unlink(tmp)
    if raw:
        out = _decode_wav_raw(path)
        if out is not None:
            return out
    out = _decode_wav_native(path)
    if out is None:
        out = _decode_wav_numpy(path)
    return out


def decode_many(paths, workers: int = 8, raw: bool = False):
    """Decode files concurrently, yielding (samples, sr) in input order.

    WAV files run through the native C++ DecodePool (akx_native.cpp worker
    threads — parallel decode with no GIL); other formats (mp3 transcode)
    and the no-toolchain case fall back to a Python thread pool. This is the
    host side of the async input pipeline replacing the reference's
    ThreadPoolExecutor CQT loop (KeyDataset.py:127-136).

    raw=True skips sample conversion for PCM16 files (int16 results; see
    decode_audio) — those are pure I/O, so they bypass the C++ pool and run
    on the Python pool (file reads release the GIL).
    """
    paths = list(paths)
    if raw:
        with futures.ThreadPoolExecutor(
                max_workers=max(1, min(workers, len(paths) or 1))) as tp:
            futs = [tp.submit(decode_audio, p, raw=True) for p in paths]
            for f in futs:
                yield f.result()
        return
    lib = load_library()
    results: dict = {}
    native_paths: dict = {}
    has_mp3 = (lib is not None and hasattr(lib, "akx_decode_mp3"))
    pool = lib.akx_pool_create(workers) if lib is not None else None
    native_exts = (".wav", ".mp3") if has_mp3 else (".wav",)
    py_jobs: dict = {}
    # mp3 may bounce back from the native pool (damaged/non-conforming
    # streams fall through to the numpy decoder / external transcode), so
    # a Python pool is kept warm whenever mp3 is in the batch
    needs_py = [p for p in paths
                if not pool
                or os.path.splitext(p)[1].lower() not in native_exts
                or os.path.splitext(p)[1].lower() == ".mp3"]
    # no Python thread pool unless some file might need it — idle
    # threads compete with the C++ workers for cores on small hosts
    with futures.ThreadPoolExecutor(
            max_workers=max(1, min(workers, len(needs_py)))) \
            if needs_py else nullcontext() as tpool:
        try:
            for i, p in enumerate(paths):
                if pool and os.path.splitext(p)[1].lower() in native_exts:
                    lib.akx_pool_submit(pool, i, p.encode())
                    native_paths[i] = p
                else:
                    py_jobs[i] = tpool.submit(decode_audio, p)
            pending_native = set(native_paths)
            next_i = 0
            while next_i < len(paths):
                progressed = False
                while pending_native:
                    r = lib.akx_pool_poll(pool)
                    if not r:
                        break
                    progressed = True
                    rid = lib.akx_result_id(r)
                    try:
                        if lib.akx_result_ok(r):
                            m = lib.akx_result_num_samples(r)
                            sr = lib.akx_result_sample_rate(r)
                            buf = np.ctypeslib.as_array(
                                lib.akx_result_samples(r), shape=(m,)).copy()
                            results[rid] = (buf, sr)
                        elif native_paths[rid].lower().endswith(".mp3"):
                            # damaged mp3: decode_audio re-derives the
                            # error and runs the transcode fallback chain
                            py_jobs[rid] = tpool.submit(
                                decode_audio, native_paths[rid])
                        else:
                            msg = (lib.akx_result_error(r) or b"").decode()
                            results[rid] = AudioDecodeError(
                                f"{native_paths[rid]}: {msg or 'decode failed'}")
                    finally:
                        lib.akx_result_free(r)
                    pending_native.discard(rid)
                for i, fut in list(py_jobs.items()):
                    if fut.done():
                        progressed = True
                        try:
                            results[i] = fut.result()
                        except Exception as e:  # re-raised in input order
                            results[i] = e
                        del py_jobs[i]
                while next_i < len(paths) and next_i in results:
                    progressed = True
                    out = results.pop(next_i)
                    next_i += 1
                    if isinstance(out, Exception):
                        raise out
                    yield out
                if not progressed:
                    time.sleep(0.002)
        finally:
            if pool:
                lib.akx_pool_destroy(pool)


def pack_batch(waves, pad_len: int, n_rows: int | None = None) -> np.ndarray:
    """Zero-padded (n_rows, pad_len) signal batch for the device front-end.

    Stays int16 when every waveform is raw PCM16 (half the H2D bytes; the
    CQT graph normalizes on device), otherwise normalized float32 with any
    int16 members converted host-side.
    """
    waves = list(waves)
    n = n_rows if n_rows is not None else len(waves)
    if all(w.dtype == np.int16 for w in waves):
        batch = np.zeros((n, pad_len), np.int16)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = w
        return batch
    batch = np.zeros((n, pad_len), np.float32)
    for i, w in enumerate(waves):
        if w.dtype == np.int16:
            batch[i, :len(w)] = w.astype(np.float32) / 32768.0
        else:
            batch[i, :len(w)] = w
    return batch


def ingest_batch(paths, pad_len: int, workers: int = 8,
                 n_rows: int | None = None, out: np.ndarray | None = None):
    """Decode a batch of audio files STRAIGHT into a zero-padded batch.

    The one-copy host ingest path: when every file is a mono PCM16 WAV
    (the raw ingestion format), each file's data chunk is ``readinto``-ed
    directly into its row of the int16 batch — a single page-cache-to-
    batch kernel copy per file, with the GIL released. On multi-core
    hosts the copies run on a thread pool; on a single core the pool is
    pure scheduling overhead, so the loop runs inline. Compared with
    decode-then-pack (two passes over the bytes, the pack pass serialized
    on the GIL) this is ~3x at bench geometry on the 1-core bench host
    (16 x 2-min clips: ~18 ms vs ~54 ms with a reused `out` buffer).

    Pass ``out`` (shape (n_rows, pad_len) int16, C-contiguous) to reuse a
    batch buffer across calls — steady-state serving amortizes the ~85 MB
    allocation + first-touch page zeroing, which otherwise costs more
    than the copies themselves. Rows are fully overwritten up to
    ``lengths[i]`` and zero-tail-filled after it.

    Any other input (stereo, non-PCM16, mp3, big-endian hosts) falls back
    to decode_many + pack_batch, which preserves full decode semantics
    (float32 batch; ``out`` is ignored).

    Returns (batch, lengths, rates): batch is (n_rows, pad_len) int16 on
    the fast path, lengths[i] the unpadded sample count of row i (trimmed
    to pad_len), rates[i] its sample rate.
    """
    paths = list(paths)
    all_wav = all(os.path.splitext(p)[1].lower() == ".wav" for p in paths)

    # Native fast path: ONE C call (akx_ingest_batch) header-parses and
    # preads every file's PCM16 data chunk into the batch rows — no
    # per-file Python at all (the round-1 host-decode residual). Falls
    # through to the Python probe/readinto path (and from there to full
    # decode) unless every file ingests clean.
    if n_rows is not None and n_rows < len(paths):
        raise ValueError(
            f"n_rows={n_rows} < {len(paths)} files: the batch cannot hold "
            "every file (rows are per-file)")
    if all_wav and paths and sys.byteorder == "little":
        lib = load_library()
        if lib is not None:
            n = n_rows if n_rows is not None else len(paths)
            if out is not None:
                if (out.shape != (n, pad_len) or out.dtype != np.int16
                        or not out.flags.c_contiguous):
                    raise ValueError(
                        f"out must be C-contiguous int16 {(n, pad_len)}, "
                        f"got {out.dtype} {out.shape}")
                batch = out
            else:
                batch = np.empty((n, pad_len), np.int16)
            arr = (ctypes.c_char_p * len(paths))(
                *[os.fsencode(p) for p in paths])
            lengths = np.empty(len(paths), np.int64)
            rates = np.empty(len(paths), np.int32)
            ok = np.empty(len(paths), np.uint8)
            n_ok = lib.akx_ingest_batch(
                arr, len(paths),
                batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                # mirror the Python path's single-core gate: pthreads
                # contending for one core are pure scheduling overhead
                n, pad_len, workers if (os.cpu_count() or 1) > 1 else 1,
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if n_ok == len(paths):
                return batch, lengths, [int(r) for r in rates]

    layouts = []
    for p in paths:
        if os.path.splitext(p)[1].lower() != ".wav":
            layouts = None
            break
        try:
            lay = _wav_layout(p)
        except (AudioDecodeError, OSError):
            layouts = None
            break
        if lay[0] != 1 or lay[1] != 1 or lay[2] != 16:
            layouts = None
            break
        layouts.append(lay)
    if layouts is None or sys.byteorder != "little":
        decoded = list(decode_many(paths, workers=workers, raw=True))
        batch = pack_batch((w[:pad_len] for w, _ in decoded), pad_len,
                           n_rows=n_rows)
        lengths = np.array([min(len(w), pad_len) for w, _ in decoded],
                           np.int64)
        rates = [sr for _, sr in decoded]
        return batch, lengths, rates

    n = n_rows if n_rows is not None else len(paths)
    if out is not None:
        if (out.shape != (n, pad_len) or out.dtype != np.int16
                or not out.flags.c_contiguous):
            raise ValueError(
                f"out must be C-contiguous int16 {(n, pad_len)}, got "
                f"{out.dtype} {out.shape}")
        batch = out
    else:
        batch = np.empty((n, pad_len), np.int16)
    for i in range(len(paths), n):
        batch[i] = 0                    # unused padding rows stay zero
    lengths = np.array([min(lay[5] // 2, pad_len) for lay in layouts],
                       np.int64)

    def _fill(i: int) -> None:
        off = layouts[i][4]
        m = int(lengths[i])
        done = 0
        if m > 0:
            with open(paths[i], "rb", buffering=0) as f:
                f.seek(off)
                view = memoryview(batch[i, :m]).cast("B")
                # raw readinto may legally return short; loop to EOF
                while done < 2 * m:
                    got = f.readinto(view[done:])
                    if not got:
                        break
                    done += got
        if done // 2 < pad_len:         # short read and/or the pad tail
            batch[i, done // 2:] = 0

    if (os.cpu_count() or 1) > 1 and workers > 1 and len(paths) > 1:
        with futures.ThreadPoolExecutor(
                max_workers=min(workers, len(paths))) as tp:
            list(tp.map(_fill, range(len(paths))))
    else:
        for i in range(len(paths)):
            _fill(i)
    return batch, lengths, [lay[3] for lay in layouts]


def write_wav(path: str, samples: np.ndarray, sr: int) -> None:
    """Write mono PCM16 (test fixtures / transcode output)."""
    x = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
