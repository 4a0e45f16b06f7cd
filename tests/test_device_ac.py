"""On-device arithmetic decoder vs the native C++ coder (oracle).

The C++ lane encoder (csrc/coder.cpp pcoder_encode_lanes) and the jax
decoder (codec/device_ac.py) must implement the identical Nayuki-32 integer
state machine; any divergence shows up as a symbol mismatch here.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.codec.coder_bridge import (
    Coder, encode_lanes)
from pseudocylindrical_convolution_tpu.codec import device_ac

# whole file is the device-AC oracle: seconds per test, part of the quick tier
pytestmark = pytest.mark.quick

TOTAL = 65536


def _random_tables(n, rng):
    """(n, 9) int32 strictly-increasing CDF rows, [0]=0, [8]=TOTAL."""
    t = np.zeros((n, 9), np.int64)
    for i in range(n):
        t[i, 1:8] = np.sort(rng.choice(np.arange(1, TOTAL), 7, replace=False))
    t[:, 8] = TOTAL
    return t.astype(np.int32)


def _pack(tables, syms):
    low = tables[np.arange(len(syms)), syms].astype(np.uint32)
    high = tables[np.arange(len(syms)), syms + 1].astype(np.uint32)
    return low | ((high - 1) << 16)


def test_single_lane_matches_file_coder(tmp_path):
    rng = np.random.default_rng(0)
    n = 400
    tables = _random_tables(n, rng)
    syms = rng.integers(0, 8, n).astype(np.int32)
    packed = _pack(tables, syms)

    fname = str(tmp_path / "s.bin")
    c = Coder(fname)
    c.start_encoder()
    c.encode_packed(packed, TOTAL)
    c.end_encoder()
    file_bytes = open(fname, "rb").read()

    payload, lane_nbytes = encode_lanes(packed, np.array([0, n]))
    assert payload == file_bytes
    assert int(lane_nbytes[0]) == len(file_bytes)


def test_device_decode_matches_cpp_lanes():
    import jax
    step = jax.jit(device_ac.decode_symbols)
    rng = np.random.default_rng(1)
    L, n = 8, 1200
    tables = _random_tables(n, rng)
    syms = rng.integers(0, 8, n).astype(np.int32)

    # irregular "steps": variable counts, lane of position i in a step = i%L
    counts, left = [], n
    while left:
        c = min(left, int(rng.integers(1, 3 * L)))
        counts.append(c)
        left -= c
    offsets = np.concatenate([[0], np.cumsum(counts)])

    lane_syms = [[] for _ in range(L)]
    lane_packed = [[] for _ in range(L)]
    packed_all = _pack(tables, syms)
    for z, c in enumerate(counts):
        for i in range(c):
            m = offsets[z] + i
            lane_syms[i % L].append(syms[m])
            lane_packed[i % L].append(packed_all[m])
    lane_off = np.concatenate(
        [[0], np.cumsum([len(p) for p in lane_packed])]).astype(np.int64)
    payload, lane_nbytes = encode_lanes(
        np.concatenate([np.array(p, np.uint32) if p else
                        np.zeros(0, np.uint32) for p in lane_packed]),
        lane_off)

    words, word_off, nbits = device_ac.pack_lane_words(payload, lane_nbytes)
    words = jnp.asarray(words)
    state = device_ac.init_state(words, word_off, nbits)

    out = np.zeros(n, np.int32)
    for z, c in enumerate(counts):
        nrounds = (c + L - 1) // L
        for r in range(nrounds):
            pos = offsets[z] + r * L + np.arange(L)
            active = pos < offsets[z + 1]
            rows = tables[np.minimum(pos, n - 1)].astype(np.uint32)
            state, s = step(state, words, jnp.asarray(rows),
                            jnp.asarray(active))
            s = np.asarray(s)
            out[pos[active]] = s[active]
    np.testing.assert_array_equal(out, syms)


def _renorm_scalar(low, high, code, bits, pos, nbits):
    """The original bit-at-a-time renorm loops (csrc/coder.cpp:128-137),
    as plain python ints -- the oracle for the closed-form _renorm."""
    def read():
        nonlocal pos
        b = bits[pos] if pos < nbits else 0
        pos += 1
        return b
    while ((low ^ high) & 0x80000000) == 0:
        code = ((code << 1) & 0xFFFFFFFF) | read()
        low = (low << 1) & 0xFFFFFFFF
        high = ((high << 1) & 0xFFFFFFFF) | 1
    while low & ~high & 0x40000000:
        code = (code & 0x80000000) | ((code << 1) & 0x7FFFFFFF) | read()
        low = (low << 1) & 0x7FFFFFFF
        high = ((high << 1) & 0x7FFFFFFF) | 0x80000001
    return low, high, code, pos


def test_renorm_closed_form_edge_states():
    """Closed-form _renorm == the bit-serial loops on crafted states that
    random streams never hit: low==high (32 shifts), saturated underflow
    (low=0x7FFF..., high=0x8000... -> 31 underflow steps), reads running
    past the stream end, and a random state sweep."""
    from pseudocylindrical_convolution_tpu.codec.device_ac import _renorm
    rng = np.random.default_rng(7)
    word = np.uint32(0xA5C3F019)
    words = jnp.asarray(np.array([word, 0x5A3CF901, 0xDEADBEEF], np.uint32))
    bits = [(int(w) >> (31 - i)) & 1 for w in np.asarray(words)
            for i in range(32)]

    cases = [
        (0x12345678, 0x12345678, 0x12345678),   # low==high: n1=32
        (0x7FFFFFFF, 0x80000000, 0x7FFFFFFF),   # saturated underflow: n2=31
        (0x7FFF0000, 0x80000FFF, 0x7FFFABCD),   # long underflow run
        (0x00000000, 0xFFFFFFFF, 0x000000FF),   # no renorm at all
        (0x40000000, 0x401FFFFF, 0x40100000),   # plain n1 run
    ]
    for _ in range(40):
        lo = int(rng.integers(0, 1 << 32, dtype=np.uint64))
        hi = int(rng.integers(lo, 1 << 32, dtype=np.uint64))
        cases.append((lo, hi, int(rng.integers(lo, hi + 1,
                                               dtype=np.uint64))))

    for nbits_v in (96, 40, 3, 0):   # includes past-end reads
        for pos0 in (0, 17, 39):
            for lo, hi, cd in cases:
                want = _renorm_scalar(lo, hi, cd, bits, pos0, nbits_v)
                st = {
                    "low": jnp.asarray([lo], jnp.uint32),
                    "range_m1": jnp.asarray([hi - lo], jnp.uint32),
                    "code": jnp.asarray([cd], jnp.uint32),
                    "pos": jnp.asarray([pos0], jnp.uint32),
                    "word_off": jnp.asarray([0], jnp.int32),
                    "nbits": jnp.asarray([nbits_v], jnp.uint32),
                    "words_ref": words,
                }
                out = _renorm(st, jnp.asarray([True]))
                got = (int(out["low"][0]),
                       int(out["low"][0]) + int(out["range_m1"][0]),
                       int(out["code"][0]), int(out["pos"][0]))
                assert got == want, (hex(lo), hex(hi), hex(cd), nbits_v,
                                     pos0, got, want)
                # inactive lanes are untouched
                out2 = _renorm(dict(st), jnp.asarray([False]))
                assert int(out2["low"][0]) == lo
                assert int(out2["code"][0]) == cd
                assert int(out2["pos"][0]) == pos0


def test_empty_and_tiny_lanes():
    rng = np.random.default_rng(2)
    L, n = 4, 3  # lane 3 gets nothing
    tables = _random_tables(n, rng)
    syms = rng.integers(0, 8, n).astype(np.int32)
    packed = _pack(tables, syms)
    lane_off = np.array([0, 1, 2, 3, 3], np.int64)
    payload, lane_nbytes = encode_lanes(packed, lane_off)
    words, word_off, nbits = device_ac.pack_lane_words(payload, lane_nbytes)
    words = jnp.asarray(words)
    state = device_ac.init_state(words, word_off, nbits)
    active = np.array([True, True, True, False])
    rows = tables[[0, 1, 2, 2]].astype(np.uint32)
    state, s = device_ac.decode_symbols(state, words, jnp.asarray(rows),
                                        jnp.asarray(active))
    np.testing.assert_array_equal(np.asarray(s)[:3], syms)
