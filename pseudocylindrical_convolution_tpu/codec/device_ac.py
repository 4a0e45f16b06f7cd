"""On-device arithmetic decoder: the Nayuki 32-bit state machine in uint32.

The reference decodes every wavefront step on the host
(/root/reference/coder/ArithmeticCoder.cpp:82-116 driven from
pseudo_codec.py:145-160), forcing a device->host round trip per step. Here
the decoder state machine itself runs on the TPU as masked vector ops over
L independent "lanes" (interleaved arithmetic-coder streams), so an entire
image decodes in ONE device program (codec/wavefront_scan.py).

Integer semantics are bit-identical to csrc/coder.cpp (STATE_SIZE=32,
total=65536) using only uint32 arithmetic:

  * range = high - low + 1 can be 2**32, so the state tracks
    range_m1 = high - low;
  * floor(c * range / total) with total = 2**16 is computed exactly via a
    16-bit split of range_m1 (no 64-bit ints, which TPUs lack natively);
  * the symbol search avoids the reference's `value = ((offset+1)*total-1)
    / range` division: c <= value  <=>  floor(c*range/total) <= offset
    (proof: c*range <= (offset+1)*total - 1  <=>  c*range < (offset+1)*total
    since both sides are integers), so the binary search collapses to eight
    vectorized comparisons against the already-needed CDF products.

Bitstreams are read MSB-first from a flat uint32 word array; each lane has a
static word offset and bit length; reads past the end return 0 (matching
BitReader::get, csrc/coder.cpp:49-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TOTAL_BITS = 16           # total = 65536 always (CDF monotonic repair)
_TOP = jnp.uint32(1 << 31)
_SECOND = jnp.uint32(1 << 30)
_LOW31 = jnp.uint32((1 << 31) - 1)
_U1 = jnp.uint32(1)
_U16 = jnp.uint32(16)
_MASK16 = jnp.uint32(0xFFFF)


def pack_lane_words(payload: bytes, lane_nbytes: np.ndarray):
    """Host-side: split a lane-concatenated payload into a word array.

    Returns (words (nwords,) uint32 big-endian, word_off (L,) int32,
    nbits (L,) int32). Each lane starts at a word boundary; bit i of lane l
    is (words[word_off[l] + i//32] >> (31 - i%32)) & 1.
    """
    lane_nbytes = np.asarray(lane_nbytes, np.int64)
    nwords_l = (lane_nbytes + 3) // 4
    word_off = np.concatenate([[0], np.cumsum(nwords_l)])
    words = np.zeros(int(word_off[-1]) * 4, np.uint8)
    pos = 0
    for l, nb in enumerate(lane_nbytes):
        words[int(word_off[l]) * 4: int(word_off[l]) * 4 + int(nb)] = \
            np.frombuffer(payload, np.uint8, count=int(nb), offset=pos)
        pos += int(nb)
    w32 = words.reshape(-1, 4)
    out = (w32[:, 0].astype(np.uint32) << 24) | \
          (w32[:, 1].astype(np.uint32) << 16) | \
          (w32[:, 2].astype(np.uint32) << 8) | w32[:, 3].astype(np.uint32)
    return out, word_off[:-1].astype(np.int32), \
        (lane_nbytes * 8).astype(np.int32)


def init_state(words, word_off, nbits):
    """Start L lane decoders: read 32 bits each (= the lane's first word).

    words: (nwords,) uint32; word_off/nbits: (..., L) int32.
    Returns the state dict of (..., L) uint32 arrays.
    """
    word_off = jnp.asarray(word_off, jnp.int32)
    code = jnp.take(jnp.asarray(words, jnp.uint32), word_off)
    return {
        "low": jnp.zeros_like(code),
        "range_m1": jnp.full_like(code, jnp.uint32(0xFFFFFFFF)),
        "code": code,
        "pos": jnp.full_like(code, jnp.uint32(32)),
        "word_off": word_off,
        "nbits": jnp.asarray(nbits, jnp.uint32),
    }


def _shift16(c, rh, rl):
    """Exact floor(c * (range_m1 + 1) / 2**16) for c <= 2**16 (uint32).

    range_m1 = rh*2**16 + rl. c*range = c*rh*2**16 + c*rl + c; the low part
    c*rl + c can reach exactly 2**32 (c=2**16, rl=2**16-1), so the final
    carry is extracted before the add. Wraps mod 2**32 only for
    c = total = 2**16 with range = 2**32, where the sole use is
    new_high = low + result - 1 and the wrap gives the right residue.
    """
    t = c * rl
    u = (t & _MASK16) + c
    return c * rh + (t >> _U16) + (u >> _U16)


def _read_bit(state, take):
    """Next stream bit per lane (0 past end); advances pos where take."""
    pos = state["pos"]
    widx = (state["word_off"].astype(jnp.uint32) + (pos >> jnp.uint32(5))
            ).astype(jnp.int32)
    word = jnp.take(state["words_ref"], widx)
    bit = (word >> (jnp.uint32(31) - (pos & jnp.uint32(31)))) & _U1
    bit = jnp.where(pos < state["nbits"], bit, jnp.uint32(0))
    state = dict(state)
    state["pos"] = jnp.where(take, pos + _U1, pos)
    return state, bit


def _renorm(state, active):
    """Both renormalization loops of Decoder::read (csrc/coder.cpp:128-137),
    run in lock-step across lanes with per-lane masking."""

    def c1(s):
        return ((s["low"] ^ (s["low"] + s["range_m1"])) & _TOP) == 0

    def body1(s):
        m = s["_m1"]
        high = s["low"] + s["range_m1"]
        s, bit = _read_bit(s, m)
        s["code"] = jnp.where(m, (s["code"] << _U1) | bit, s["code"])
        nlow = s["low"] << _U1
        nhigh = (high << _U1) | _U1
        s["low"] = jnp.where(m, nlow, s["low"])
        s["range_m1"] = jnp.where(m, nhigh - nlow, s["range_m1"])
        s["_m1"] = active & c1(s)
        return s

    def c2(s):
        high = s["low"] + s["range_m1"]
        return (s["low"] & ~high & _SECOND) != 0

    def body2(s):
        m = s["_m1"]
        high = s["low"] + s["range_m1"]
        s, bit = _read_bit(s, m)
        ncode = (s["code"] & _TOP) | ((s["code"] << _U1) & _LOW31) | bit
        s["code"] = jnp.where(m, ncode, s["code"])
        nlow = (s["low"] << _U1) & _LOW31
        nhigh = ((high << _U1) & _LOW31) | _TOP | _U1
        s["low"] = jnp.where(m, nlow, s["low"])
        s["range_m1"] = jnp.where(m, nhigh - nlow, s["range_m1"])
        s["_m1"] = active & c2(s)
        return s

    state = dict(state)
    state["_m1"] = active & c1(state)
    state = jax.lax.while_loop(lambda s: jnp.any(s["_m1"]), body1, state)
    state["_m1"] = active & c2(state)
    state = jax.lax.while_loop(lambda s: jnp.any(s["_m1"]), body2, state)
    del state["_m1"]
    return state


def decode_symbols(state, words, cdf, active):
    """Decode one symbol per active lane.

    state: dict from init_state; words: (nwords,) uint32 (passed separately
    so the big array is not part of loop carries); cdf: (..., L, 9) uint32
    CDF rows (entries 0..65536, strictly increasing); active: (..., L) bool.
    Returns (state, symbols (..., L) int32); inactive lanes are untouched
    and return 0.
    """
    rm1 = state["range_m1"]
    rh, rl = rm1 >> _U16, rm1 & _MASK16
    offset = state["code"] - state["low"]
    lows = _shift16(cdf, rh[..., None], rl[..., None])       # (..., L, 9)
    sym = jnp.sum((lows[..., 1:8] <= offset[..., None]).astype(jnp.int32),
                  axis=-1)
    sym_low = jnp.take_along_axis(lows, sym[..., None], axis=-1)[..., 0]
    sym_high = jnp.take_along_axis(lows, sym[..., None] + 1, axis=-1)[..., 0]
    new_low = state["low"] + sym_low
    new_rm1 = sym_high - sym_low - _U1
    st = dict(state)
    st["low"] = jnp.where(active, new_low, st["low"])
    st["range_m1"] = jnp.where(active, new_rm1, st["range_m1"])
    st["words_ref"] = jnp.asarray(words, jnp.uint32)
    st = _renorm(st, active)
    del st["words_ref"]
    return st, jnp.where(active, sym, 0)
