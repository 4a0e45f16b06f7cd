"""ctypes bridge to the native arithmetic coder (csrc/coder.cpp).

The shared library is built on demand with g++ (no pip deps). API mirrors the
reference `coder.coder` object (coder/python.cpp:63-73): start_encoder /
encodes / end_encoder / start_decoder / decodes, with numpy int32 buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc",
                    "coder.cpp")
_LIB = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc",
                    "libpcoder.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC])
    lib = ctypes.CDLL(_LIB)
    lib.pcoder_create.restype = ctypes.c_void_p
    lib.pcoder_create.argtypes = [ctypes.c_char_p]
    lib.pcoder_destroy.argtypes = [ctypes.c_void_p]
    lib.pcoder_start_encoder.argtypes = [ctypes.c_void_p]
    lib.pcoder_encodes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.pcoder_encode_ranges.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.pcoder_encode_packed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.c_int32]
    lib.pcoder_end_encoder.restype = ctypes.c_long
    lib.pcoder_end_encoder.argtypes = [ctypes.c_void_p]
    lib.pcoder_end_encoder_buf.restype = ctypes.c_long
    lib.pcoder_end_encoder_buf.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.pcoder_start_decoder_buf.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.pcoder_encode_lanes.restype = ctypes.c_long
    lib.pcoder_encode_lanes.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int32)]
    lib.pcoder_start_decoder.argtypes = [ctypes.c_void_p]
    lib.pcoder_decodes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def encode_lanes(packed: np.ndarray, lane_offsets: np.ndarray,
                 total: int = 65536):
    """Encode L independent arithmetic-coder lanes in one native call.

    packed: lane-concatenated (low | (high-1) << 16) uint32 words;
    lane_offsets: (L+1,) int64 prefix offsets into packed.
    Returns (payload bytes with lane blocks back to back, lane_nbytes (L,)).
    """
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    offs = np.ascontiguousarray(lane_offsets, dtype=np.int64)
    nlanes = offs.shape[0] - 1
    lane_nbytes = np.zeros(nlanes, np.int32)
    cap = int(packed.shape[0]) * 4 + 16 * nlanes + 64
    while True:
        out = np.zeros(cap, np.uint8)
        n = int(lib.pcoder_encode_lanes(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nlanes, total,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            lane_nbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))
        if n >= 0:
            return out[:n].tobytes(), lane_nbytes
        cap = -n


class Coder:
    """File-backed arithmetic coding session."""

    def __init__(self, fname: str):
        self._lib = _load()
        self._h = self._lib.pcoder_create(fname.encode())
        self.fname = fname

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pcoder_destroy(self._h)
            self._h = None

    def start_encoder(self):
        self._lib.pcoder_start_encoder(self._h)

    def encodes(self, tables: np.ndarray, ncode: int, symbols: np.ndarray,
                n: int):
        """tables: (n, ncode+1) int32 CDF rows; symbols: (n,) int32."""
        if n == 0:
            return
        tables = np.ascontiguousarray(tables, dtype=np.int32)
        symbols = np.ascontiguousarray(symbols, dtype=np.int32)
        assert tables.shape[0] >= n and tables.shape[1] == ncode + 1
        self._lib.pcoder_encodes(self._h, _i32ptr(tables), ncode,
                                 _i32ptr(symbols), n)

    def encode_ranges(self, ranges: np.ndarray):
        """ranges: (n, 3) int32 rows (sym_low, sym_high, total)."""
        n = ranges.shape[0]
        if n == 0:
            return
        ranges = np.ascontiguousarray(ranges, dtype=np.int32)
        assert ranges.shape[1] == 3
        self._lib.pcoder_encode_ranges(self._h, _i32ptr(ranges), n)

    def encode_packed(self, packed: np.ndarray, total: int = 65536):
        """packed: (n,) uint32, v = low | ((high-1) << 16); fixed total."""
        n = packed.shape[0]
        if n == 0:
            return
        packed = np.ascontiguousarray(packed, dtype=np.uint32)
        self._lib.pcoder_encode_packed(
            self._h, packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n, total)

    def end_encoder(self) -> int:
        """Flush to file; returns the byte size."""
        return int(self._lib.pcoder_end_encoder(self._h))

    def start_decoder(self):
        self._lib.pcoder_start_decoder(self._h)

    def end_encoder_buf(self) -> bytes:
        """Flush and return the payload bytes (no file IO)."""
        cap = 1 << 16
        while True:
            out = np.zeros(cap, np.uint8)
            n = int(self._lib.pcoder_end_encoder_buf(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap))
            if n >= 0:
                return out[:n].tobytes()
            cap = -n

    def start_decoder_buf(self, data: bytes):
        buf = np.frombuffer(data, np.uint8)
        self._lib.pcoder_start_decoder_buf(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data))

    def decodes(self, tables: np.ndarray, ncode: int, n: int) -> np.ndarray:
        if n == 0:
            return np.zeros((0,), np.int32)
        tables = np.ascontiguousarray(tables, dtype=np.int32)
        assert tables.shape[0] >= n and tables.shape[1] == ncode + 1
        out = np.zeros((n,), np.int32)
        self._lib.pcoder_decodes(self._h, _i32ptr(tables), ncode, n,
                                 _i32ptr(out))
        return out
