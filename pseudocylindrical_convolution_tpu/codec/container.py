"""Self-describing bitstream container.

The reference ships exactly one stream layout and carries mode/model/size
out of band (pseudo_codec.py:93-160). This codec has two modes (dense
one-shot tables vs the single-program scan codec) whose streams are mutually
incompatible, so every file starts with a small header; cross-mode or
wrong-geometry decodes fail loudly instead of desyncing the arithmetic
coder.

Layout (big-endian):
  magic  4s   b"PC60"
  ver    u8   1
  mode   u8   0 = dense (codec/pipeline.py), 1 = scan (wavefront_scan.py),
              2 = incremental (codec/incremental.py)
  npart  u8
  flags  u8   scan executable profile; streams are only decodable by a
              same-profile executable, so a mismatch must fail loudly.
              bit 0 (FLAG_BF16): bf16 activation buffers; bit 1
              (FLAG_BURST): run-gather (row-burst) window mode; bit 2
              (FLAG_SLAB): slab window mode; bit 3 (FLAG_HOIST): hoisted
              stacked window gather; bits 4-7: conv_chunks - 1
  vdim   u16  valid_dim
  h, w   u16  latent plane dims
  lanes  u16  scan mode only (0 for dense)
  batch  u8   scan executable batch (0 for dense)
  pad    u8
  [lanes * u32 lane_nbytes]   scan mode only
  payload bytes
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"PC60"
VERSION = 1
MODE_DENSE = 0
MODE_SCAN = 1
MODE_INCR = 2
FLAG_BF16 = 1
FLAG_BURST = 2
FLAG_SLAB = 4
FLAG_HOIST = 8
CHUNKS_SHIFT = 4        # bits 4-7 hold conv_chunks - 1
FLAG2_MMPAD = 1         # second flag byte (was reserved padding; old
                        # streams carry 0 = plain gather pads)
FLAG2_PALLASWIN = 2     # window assembled by the Pallas VMEM kernel
FLAG2_FUSEDSTEP = 4     # fused window+conv Pallas layer-step kernel
FLAG2_FUSEDUNROLL = 8   # fused kernel with python-unrolled conv taps
_FMT = ">4sBBBBHHHHBB"
_HLEN = struct.calcsize(_FMT)


def write_stream(fname: str, mode: int, npart: int, valid_dim: int, h: int,
                 w: int, payload: bytes, lanes: int = 0, batch: int = 0,
                 lane_nbytes=None, flags: int = 0, flags2: int = 0) -> int:
    """Write header + payload; returns total file size in bytes."""
    hdr = struct.pack(_FMT, MAGIC, VERSION, mode, npart, flags, valid_dim,
                      h, w, lanes, batch, flags2)
    body = b""
    if mode == MODE_SCAN:
        assert lanes and lane_nbytes is not None and len(lane_nbytes) == lanes
        body = np.asarray(lane_nbytes, ">u4").tobytes()
    with open(fname, "wb") as f:
        f.write(hdr)
        f.write(body)
        f.write(payload)
    return _HLEN + len(body) + len(payload)


def read_stream(fname: str) -> dict:
    with open(fname, "rb") as f:
        data = f.read()
    if len(data) < _HLEN or data[:4] != MAGIC:
        raise ValueError(f"{fname}: not a PC60 bitstream (bad magic)")
    (magic, ver, mode, npart, flags, vdim, h, w, lanes, batch,
     flags2) = struct.unpack(_FMT, data[:_HLEN])
    if ver != VERSION:
        raise ValueError(f"{fname}: unsupported container version {ver}")
    off = _HLEN
    lane_nbytes = None
    if mode == MODE_SCAN:
        lane_nbytes = np.frombuffer(data, ">u4", count=lanes, offset=off)
        lane_nbytes = lane_nbytes.astype(np.int64)
        off += 4 * lanes
    return {"mode": mode, "npart": npart, "valid_dim": vdim, "h": h, "w": w,
            "lanes": lanes, "batch": batch, "lane_nbytes": lane_nbytes,
            "flags": flags, "flags2": flags2, "payload": data[off:]}


def check_stream(hdr: dict, fname: str, mode: int, npart: int,
                 valid_dim: int, h: int, w: int):
    """Raise if a parsed header does not match the decoding configuration."""
    want = {"mode": mode, "npart": npart, "valid_dim": valid_dim, "h": h,
            "w": w}
    got = {k: hdr[k] for k in want}
    if got != want:
        raise ValueError(
            f"{fname}: stream/config mismatch: stream has {got}, decoder "
            f"expects {want}")
