"""Pallas frontier kernel (prototype): verified against a direct loop in
interpreter mode. On-hardware compilation currently trips Mosaic's
lane-dimension alignment rule (dynamic slice on the minor dim must be
128-aligned); the planned fix is a slab re-layout putting the group window
on an untiled leading dim (ARCHITECTURE.md §8)."""

import numpy as np
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.ops.pallas_frontier import (
    frontier_conv_pallas)


def test_frontier_kernel_interpret_matches_reference():
    S, npart, C, h, G, cout = 3, 4, 12, 2, 4, 3
    SW = G + h + 3
    rng = np.random.RandomState(0)
    slab = rng.randn(S, npart, C, h + 4, SW).astype(np.float32)
    W = rng.randn(S, G, cout, C, 5, 5).astype(np.float32)
    got = np.asarray(frontier_conv_pallas(jnp.asarray(slab), jnp.asarray(W),
                                          True))
    q0 = G + h - 2
    want = np.zeros((S, npart, G, h, cout), np.float32)
    for s in range(S):
        for b in range(npart):
            for g in range(G):
                for r in range(h):
                    for o in range(cout):
                        acc = 0.0
                        for kh in range(5):
                            for kw in range(5):
                                m = q0 - g - r + kw
                                acc += (W[s, g, o, :, kh, kw]
                                        * slab[s, b, :, r + kh, m]).sum()
                        want[s, b, g, r, o] = acc
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
