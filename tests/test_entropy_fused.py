import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.entropy import (
    entropy_net_init, entropy_net_raw, entropy_subnet_raw)

GEOM = Geometry(npart=4, opt=True, config_file="/nonexistent")


def test_fused_equals_per_subnet():
    ngroup = 4
    p = entropy_net_init(jax.random.PRNGKey(0), ngroup)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, ngroup, 2, 16)) * 7 - 3.5
    fused = entropy_net_raw(p, x, GEOM, ngroup)
    from pseudocylindrical_convolution_tpu.ops.fill import pseudo_fill
    xf = pseudo_fill(x, GEOM)
    sep = {
        "weight": entropy_subnet_raw(p["weight_net"], xf, GEOM, ngroup),
        "delta": entropy_subnet_raw(p["delta_net"], xf, GEOM, ngroup),
        "mean": entropy_subnet_raw(p["mean_net"], xf, GEOM, ngroup),
    }
    for k in fused:
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(sep[k]),
                                   rtol=2e-5, atol=2e-5)


def test_causality_dense_vs_partial():
    """Core causal property: the raw params at cells with z = i+j+g depend
    only on symbols with z' < z. Zeroing all symbols with z' >= z must not
    change the params extracted at step-z cells."""
    ngroup = 4
    h, w = 2, 16
    p = entropy_net_init(jax.random.PRNGKey(2), ngroup)
    key = jax.random.PRNGKey(3)
    sym = jnp.floor(jax.random.uniform(key, (4, ngroup, h, w)) * 8)
    x = sym - 3.5
    full = entropy_net_raw(p, x, GEOM, ngroup)
    npart = 4
    h_out = h * npart
    hindex = GEOM.hindex(h_out, w)

    i_glob = np.arange(h_out)
    for z in [3, 10, 17]:
        # net input with future (z' >= z) zeroed -- what the decoder sees
        zmap = np.zeros((npart, ngroup, h, w), np.float32)
        for g in range(ngroup):
            for i in range(h_out):
                for j in range(w):
                    if i + j + g < z and j < hindex[i // h]:
                        zmap[i // h, g, i % h, j] = 1
        partial_x = x * zmap  # undecoded cells -> 0 (not -3.5), as in decode
        part = entropy_net_raw(p, partial_x, GEOM, ngroup)
        for g in range(ngroup):
            for i in range(h_out):
                j = z - g - i
                if 0 <= j < hindex[i // h]:
                    b, r = i // h, i % h
                    for k in ("weight", "delta", "mean"):
                        a = np.asarray(full[k][b, g * 3:(g + 1) * 3, r, j])
                        bb = np.asarray(part[k][b, g * 3:(g + 1) * 3, r, j])
                        np.testing.assert_allclose(a, bb, rtol=1e-4,
                                                   atol=1e-5)
