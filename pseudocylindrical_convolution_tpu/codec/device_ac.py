"""On-device arithmetic decoder: the Nayuki 32-bit state machine in uint32.

The reference decodes every wavefront step on the host
(/root/reference/coder/ArithmeticCoder.cpp:82-116 driven from
pseudo_codec.py:145-160), forcing a device->host round trip per step. Here
the decoder state machine itself runs on the TPU as masked vector ops over
L independent "lanes" (interleaved arithmetic-coder streams), so an entire
image decodes in ONE device program (codec/wavefront_scan.py). Both
renormalization loops are evaluated in CLOSED FORM (counts via clz, updates
as batched shifts + one multi-bit stream read -- see _renorm), so the cost
per decoded symbol is O(1) regardless of how many bits it consumes: decode
speed is then nearly independent of the operating bitrate.

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


def _shl(x, n):
    """x << n for n in [0, 32] (uint32; n >= 32 yields 0)."""
    return jnp.where(n >= jnp.uint32(32), jnp.uint32(0),
                     x << jnp.minimum(n, jnp.uint32(31)))


def _ones(n):
    """(1 << n) - 1 for n in [0, 32] (uint32)."""
    return jnp.where(n >= jnp.uint32(32), jnp.uint32(0xFFFFFFFF),
                     (_U1 << jnp.minimum(n, jnp.uint32(31))) - _U1)


def _read_bits(state, n):
    """Read the next n stream bits per lane, MSB-first, into the LOW n bits
    of the result (bits past the lane end read as 0, matching
    BitReader::get, csrc/coder.cpp:49-57). n: (..., L) uint32 in [0, 32];
    pos advances by n. Lanes that must stay untouched pass n = 0."""
    pos = state["pos"]
    woff = state["word_off"].astype(jnp.uint32)
    widx = (woff + (pos >> jnp.uint32(5))).astype(jnp.int32)
    s = pos & jnp.uint32(31)
    w0 = jnp.take(state["words_ref"], widx)          # clip-mode gather
    w1 = jnp.take(state["words_ref"], widx + 1)
    # 32-bit window starting at bit position pos. Any w1 bits that belong
    # to the next lane's word span lie at stream positions >= this lane's
    # padded span >= nbits, so the validity mask below zeroes them.
    window = (w0 << s) | jnp.where(s > 0, _shr_pos(w1, jnp.uint32(32) - s),
                                   jnp.uint32(0))
    val = jnp.where(n >= jnp.uint32(32), window,
                    _shr_pos(window, jnp.uint32(32) - n))
    # zero the low (n - valid) bits that lie past the stream end
    remi = jnp.maximum(state["nbits"].astype(jnp.int32)
                       - pos.astype(jnp.int32), 0).astype(jnp.uint32)
    ninv = n - jnp.minimum(n, remi)
    val = val & ~_ones(ninv)
    state = dict(state)
    state["pos"] = pos + n
    return state, val


def _shr_pos(x, n):
    """x >> n for n in [0, 32] (uint32; n >= 32 yields 0)."""
    return jnp.where(n >= jnp.uint32(32), jnp.uint32(0),
                     x >> jnp.minimum(n, jnp.uint32(31)))


def _renorm(state, active):
    """Both renormalization loops of Decoder::read (csrc/coder.cpp:128-137)
    in closed form -- O(1) per symbol instead of one masked while_loop
    iteration per consumed bit.

    Loop 1 shifts out the identical leading bits of low/high one at a time;
    its trip count is n1 = clz(low ^ high), and the iterated updates
    telescope to single shifts (shifted-in 1s of high = (1<<n1)-1; the code
    register appends the next n1 stream bits). Loop 2 (underflow) deletes
    bit 30 while low has a 1 and high has a 0 there; its trip count is
    n2 = min(clz(~low << 1), clz(high << 1)) and the updates telescope the
    same way with the MSB pinned. Phase 2's preconditions (MSB(low)=0,
    MSB(high)=1) hold after phase 1 by construction. Exactness is pinned by
    the C++-oracle tests (tests/test_device_ac.py)."""
    low, rm1, code = state["low"], state["range_m1"], state["code"]
    high = low + rm1

    n1 = jax.lax.clz(low ^ high).astype(jnp.uint32)   # clz(0) = 32
    n1 = jnp.where(active, n1, jnp.uint32(0))
    state, bits1 = _read_bits(state, n1)
    low1 = _shl(low, n1)
    high1 = _shl(high, n1) | _ones(n1)
    code1 = _shl(code, n1) | bits1

    # clz(x << 1) is exact for counts <= 30 and saturates to 32 when bits
    # 30..0 are all underflow-shaped; the true trip count there is 31 (the
    # shifted-in 0/1 at bit 0 breaks the condition when it reaches bit 30)
    n2 = jnp.minimum(jnp.minimum(jax.lax.clz(_shl(~low1, _U1)),
                                 jax.lax.clz(_shl(high1, _U1))),
                     jnp.uint32(31)).astype(jnp.uint32)
    n2 = jnp.where(active, n2, jnp.uint32(0))
    state, bits2 = _read_bits(state, n2)
    low2 = _shl(low1, n2) & _LOW31
    high2 = (_shl(high1, n2) & _LOW31) | _TOP | _ones(n2)
    code2 = (code1 & _TOP) | (_shl(code1, n2) & _LOW31) | bits2

    state["low"] = jnp.where(active, low2, low)
    state["range_m1"] = jnp.where(active, high2 - low2, rm1)
    state["code"] = jnp.where(active, code2, code)
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
