"""libavcodec MP3 decode oracle (tests only — never imported by product).

The environment ships no mp3 tooling (no ffmpeg binary, torchaudio,
librosa, soundfile...), but the opencv wheel bundles ffmpeg's shared
libraries. This module drives the bundled libavcodec through ctypes to
decode MP3 bytes into float PCM, providing an INDEPENDENT reference
implementation to validate the in-tree from-spec decoder
(native/akx_mp3.cpp) and the test-fixture bitstream builder
(tests/mp3_builder.py) against. It plays the same role for mp3 that
ops/librosa_ref.py plays for the CQT: a declared third-party oracle, used
only inside tests.

The AVPacket/AVFrame field offsets below match ffmpeg 8.x (libavcodec 62,
what opencv 4.x bundles). They are verified at runtime: av_new_packet's
size must read back, and a decode of a known-good frame must yield
nb_samples 1152 / planar-float format — get_oracle() returns None (tests
skip) if the ABI does not line up.
"""

from __future__ import annotations

import ctypes
import glob
import os

import numpy as np

AV_CODEC_ID_MP3 = 0x15001
AV_SAMPLE_FMT_FLT = 3
AV_SAMPLE_FMT_FLTP = 8
AV_NOPTS_VALUE = -(2 ** 63)

_LIB_DIR = "/opt/venv/lib/python3.12/site-packages/opencv_python.libs"


class _Oracle:
    def __init__(self, avc):
        self.avc = avc
        avc.avcodec_find_decoder.restype = ctypes.c_void_p
        avc.avcodec_alloc_context3.restype = ctypes.c_void_p
        avc.avcodec_alloc_context3.argtypes = [ctypes.c_void_p]
        avc.avcodec_open2.restype = ctypes.c_int
        avc.avcodec_open2.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p]
        avc.av_parser_init.restype = ctypes.c_void_p
        avc.av_parser_init.argtypes = [ctypes.c_int]
        avc.av_parser_parse2.restype = ctypes.c_int
        avc.av_parser_parse2.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        avc.av_packet_alloc.restype = ctypes.c_void_p
        avc.av_new_packet.restype = ctypes.c_int
        avc.av_new_packet.argtypes = [ctypes.c_void_p, ctypes.c_int]
        avc.av_packet_free.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        avc.av_frame_alloc.restype = ctypes.c_void_p
        avc.av_frame_free.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        avc.avcodec_send_packet.restype = ctypes.c_int
        avc.avcodec_send_packet.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        avc.avcodec_receive_frame.restype = ctypes.c_int
        avc.avcodec_receive_frame.argtypes = [ctypes.c_void_p,
                                              ctypes.c_void_p]
        avc.avcodec_flush_buffers.argtypes = [ctypes.c_void_p]
        avc.avcodec_free_context.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        avc.av_parser_close.argtypes = [ctypes.c_void_p]

    # ---- AVPacket field access (ffmpeg 8.x layout) ----
    # struct AVPacket { AVBufferRef *buf; int64 pts; int64 dts;
    #                   uint8_t *data; int size; ... }
    _PKT_DATA_OFF = 24
    _PKT_SIZE_OFF = 32

    def _pkt_data(self, pkt):
        return ctypes.cast(ctypes.c_void_p(pkt + self._PKT_DATA_OFF),
                           ctypes.POINTER(ctypes.c_void_p)).contents.value

    def _pkt_size(self, pkt, val=None):
        p = ctypes.cast(ctypes.c_void_p(pkt + self._PKT_SIZE_OFF),
                        ctypes.POINTER(ctypes.c_int))
        if val is not None:
            p.contents.value = val
        return p.contents.value

    # ---- AVFrame field access ----
    # struct AVFrame { uint8_t *data[8]; int linesize[8];
    #                  uint8_t **extended_data; int width; int height;
    #                  int nb_samples; int format; ... }
    _FRM_DATA_OFF = 0
    _FRM_EXT_OFF = 96
    _FRM_NBS_OFF = 112
    _FRM_FMT_OFF = 116

    def _frame_int(self, frm, off):
        return ctypes.cast(ctypes.c_void_p(frm + off),
                           ctypes.POINTER(ctypes.c_int)).contents.value

    def _frame_chan(self, frm, ch, n):
        ext = ctypes.cast(ctypes.c_void_p(frm + self._FRM_EXT_OFF),
                          ctypes.POINTER(ctypes.POINTER(
                              ctypes.c_void_p))).contents
        ptr = ext[ch]
        if not ptr:
            return None
        return np.ctypeslib.as_array(
            ctypes.cast(ctypes.c_void_p(ptr),
                        ctypes.POINTER(ctypes.c_float)), shape=(n,)).copy()

    def decode(self, mp3_bytes: bytes, max_channels: int = 2):
        """Decode an mp3 byte stream -> (pcm (n, ch) float32, sample_rate).

        Returns every decoded frame concatenated, INCLUDING the decoder
        delay samples libavcodec emits (no gapless trimming: raw frame
        output, which is what a from-spec frame decoder produces too).
        Sample rate is parsed from the first frame header by the caller;
        this returns 0 there if unknown.
        """
        avc = self.avc
        codec = avc.avcodec_find_decoder(AV_CODEC_ID_MP3)
        if not codec:
            raise RuntimeError("no mp3 decoder in bundled libavcodec")
        ctx = avc.avcodec_alloc_context3(ctypes.c_void_p(codec))
        if avc.avcodec_open2(ctypes.c_void_p(ctx),
                             ctypes.c_void_p(codec), None) < 0:
            raise RuntimeError("avcodec_open2 failed")
        parser = avc.av_parser_init(AV_CODEC_ID_MP3)
        pkt = avc.av_packet_alloc()
        frm = avc.av_frame_alloc()
        chunks = []
        nch = [0]

        def _drain():
            while True:
                r = avc.avcodec_receive_frame(ctypes.c_void_p(ctx),
                                              ctypes.c_void_p(frm))
                if r < 0:
                    return
                n = self._frame_int(frm, self._FRM_NBS_OFF)
                fmt = self._frame_int(frm, self._FRM_FMT_OFF)
                if fmt not in (AV_SAMPLE_FMT_FLT, AV_SAMPLE_FMT_FLTP):
                    raise RuntimeError(f"unexpected sample format {fmt}")
                cols = []
                for ch in range(max_channels):
                    col = self._frame_chan(frm, ch, n)
                    if col is None:
                        break
                    cols.append(col)
                nch[0] = max(nch[0], len(cols))
                chunks.append(np.stack(cols, axis=1))

        buf = ctypes.create_string_buffer(bytes(mp3_bytes),
                                          len(mp3_bytes) + 64)
        pos = 0
        out_data = ctypes.c_void_p()
        out_size = ctypes.c_int()
        try:
            while pos < len(mp3_bytes):
                used = avc.av_parser_parse2(
                    ctypes.c_void_p(parser), ctypes.c_void_p(ctx),
                    ctypes.byref(out_data), ctypes.byref(out_size),
                    ctypes.byref(buf, pos), len(mp3_bytes) - pos,
                    AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0)
                if used < 0:
                    break
                pos += used
                if out_size.value > 0:
                    # hand the parsed frame to the decoder via the packet
                    ctypes.cast(
                        ctypes.c_void_p(pkt + self._PKT_DATA_OFF),
                        ctypes.POINTER(ctypes.c_void_p)
                    ).contents.value = out_data.value
                    self._pkt_size(pkt, out_size.value)
                    if avc.avcodec_send_packet(ctypes.c_void_p(ctx),
                                               ctypes.c_void_p(pkt)) == 0:
                        _drain()
                if used == 0 and out_size.value == 0:
                    break
            # flush the parser (emit any buffered last frame)
            used = avc.av_parser_parse2(
                ctypes.c_void_p(parser), ctypes.c_void_p(ctx),
                ctypes.byref(out_data), ctypes.byref(out_size),
                None, 0, AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0)
            if out_size.value > 0:
                ctypes.cast(ctypes.c_void_p(pkt + self._PKT_DATA_OFF),
                            ctypes.POINTER(ctypes.c_void_p)
                            ).contents.value = out_data.value
                self._pkt_size(pkt, out_size.value)
                if avc.avcodec_send_packet(ctypes.c_void_p(ctx),
                                           ctypes.c_void_p(pkt)) == 0:
                    _drain()
            # flush the decoder
            self._pkt_size(pkt, 0)
            ctypes.cast(ctypes.c_void_p(pkt + self._PKT_DATA_OFF),
                        ctypes.POINTER(ctypes.c_void_p)).contents.value = None
            avc.avcodec_send_packet(ctypes.c_void_p(ctx), None)
            _drain()
        finally:
            p = ctypes.c_void_p(pkt)
            avc.av_packet_free(ctypes.byref(p))
            f = ctypes.c_void_p(frm)
            avc.av_frame_free(ctypes.byref(f))
            avc.av_parser_close(ctypes.c_void_p(parser))
            c = ctypes.c_void_p(ctx)
            avc.avcodec_free_context(ctypes.byref(c))
        if not chunks:
            return np.zeros((0, 1), np.float32), 0
        width = max(c.shape[1] for c in chunks)
        chunks = [c if c.shape[1] == width
                  else np.repeat(c, width, axis=1) for c in chunks]
        return np.concatenate(chunks, axis=0), 0


_cached = None
_failed = False


def get_oracle():
    """The libavcodec oracle, or None when unavailable (tests skip)."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    try:
        if not os.path.isdir(_LIB_DIR):
            raise OSError("no bundled ffmpeg libs")
        for dep in ("libavutil", "libswresample"):
            for p in sorted(glob.glob(os.path.join(_LIB_DIR, dep + "*.so*"))):
                ctypes.CDLL(p, mode=ctypes.RTLD_GLOBAL)
        (avc_path,) = glob.glob(os.path.join(_LIB_DIR, "libavcodec*.so*"))
        avc = ctypes.CDLL(avc_path, mode=ctypes.RTLD_GLOBAL)
        try:  # silence per-frame overread warnings during probe sweeps
            avu = ctypes.CDLL(glob.glob(os.path.join(
                _LIB_DIR, "libavutil*.so*"))[0], mode=ctypes.RTLD_GLOBAL)
            avu.av_log_set_level(-8)  # AV_LOG_QUIET
        except (OSError, IndexError, AttributeError):
            pass
        orc = _Oracle(avc)
        # ABI check: av_new_packet size must read back through our offset
        pkt = avc.av_packet_alloc()
        try:
            avc.av_new_packet(ctypes.c_void_p(pkt), 417)
            if orc._pkt_size(pkt) != 417:
                raise OSError("AVPacket ABI mismatch")
        finally:
            p = ctypes.c_void_p(pkt)
            avc.av_packet_free(ctypes.byref(p))
        _cached = orc
        return _cached
    except OSError:
        _failed = True
        return None
