import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.ops.quant import (
    pseudo_quant, pseudo_dquant, quant_init_weight, quant_levels,
    quant_update_weight)
from pseudocylindrical_convolution_tpu.ops.gmm import entropy_gmm_loss
from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table
from pseudocylindrical_convolution_tpu.ops.masks import conv_mask

from reference_sim import gmm_table_repair_ref


def _levels_np(w):
    g = np.concatenate([w[:, :1], np.exp(w[:, 1:])], axis=1)
    return np.cumsum(g, axis=1)


def test_quant_forward_nearest():
    C, bins = 3, 8
    rng = np.random.RandomState(0)
    w = quant_init_weight(C, bins) + rng.randn(C, bins).astype(np.float32) * 0.1
    x = rng.rand(2, C, 4, 6).astype(np.float32)
    mask = np.ones((2, 1, 4, 6), np.float32)
    top, q, hist = pseudo_quant(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(mask))
    top, q = np.asarray(top), np.asarray(q).astype(int)
    L = _levels_np(w)
    for idx in np.ndindex(x.shape):
        c = idx[1]
        best = np.argmin(np.abs(L[c] - x[idx]))
        # ties resolve upward; allow either when numerically tied
        assert abs(L[c, q[idx]] - x[idx]) <= abs(L[c, best] - x[idx]) + 1e-6
        np.testing.assert_allclose(top[idx], L[c, q[idx]], rtol=1e-6)
    # histogram: negative usage counts, mean-normalized over N
    h = np.asarray(hist)
    assert h.sum() == -x.size / x.shape[0]  # all positions valid
    assert (h <= 0).all()


def test_quant_masked_region_zero():
    C = 2
    w = quant_init_weight(C)
    x = np.ones((1, C, 2, 4), np.float32)
    mask = np.ones((1, 1, 2, 4), np.float32)
    mask[..., 2:] = 0
    top, q, hist = pseudo_quant(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(mask))
    assert (np.asarray(top)[..., 2:] == 0).all()
    assert (np.asarray(q)[..., 2:] == 0).all()
    assert np.asarray(hist).sum() == -2 * C * 2  # only valid counted


def test_quant_grads_match_reference_rules():
    """Check the three custom gradient paths on a tiny tensor."""
    C, bins = 1, 8
    w = quant_init_weight(C, bins)
    x = np.array([[[[0.05, 0.3, 0.9]]]], np.float32)  # (1,1,1,3)
    mask = np.ones((1, 1, 1, 3), np.float32)
    top_alpha = 0.01

    def f(xx, ww):
        t, q, h = pseudo_quant(xx, ww, jnp.asarray(mask), top_alpha)
        return jnp.sum(t * g_top_np) + jnp.sum(q * g_q_np)

    g_top_np = np.array([[[[1.0, 2.0, 3.0]]]], np.float32)
    g_q_np = np.array([[[[0.5, -0.5, 1.0]]]], np.float32)
    gx, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx, gw = np.asarray(gx), np.asarray(gw)

    L = _levels_np(w)[0]
    gaps = np.exp(w[0])
    tops = L[[np.argmin(np.abs(L - v)) for v in x.ravel()]]
    qs = np.array([np.argmin(np.abs(L - v)) for v in x.ravel()])
    # data grad = g_top + alpha * g_q / beta
    for i, (xv, tv, qv) in enumerate(zip(x.ravel(), tops, qs)):
        if tv < xv:
            beta = gaps[qv + 1] if qv < bins - 1 else 10000.0
        elif tv > xv:
            beta = gaps[qv] if qv > 0 else 10000.0
        else:
            beta = gaps[qv]
        beta = max(beta, 0.001)
        expect = g_top_np.ravel()[i] + top_alpha * g_q_np.ravel()[i] / beta
        np.testing.assert_allclose(gx.ravel()[i], expect, rtol=1e-5)
    # weight grad = sum_{q>=j}(top-x) * (exp(w_j) for j>0)
    for j in range(bins):
        s = sum((tv - xv) for xv, tv, qv in zip(x.ravel(), tops, qs) if qv >= j)
        s *= gaps[j] if j > 0 else 1.0
        np.testing.assert_allclose(gw[0, j], s, rtol=1e-4, atol=1e-6)


def test_dquant_inverts_levels():
    C = 4
    rng = np.random.RandomState(1)
    w = quant_init_weight(C) + rng.randn(C, 8).astype(np.float32) * 0.05
    q = rng.randint(0, 8, size=(1, C, 2, 3)).astype(np.float32)
    mask = np.ones((1, 1, 2, 3), np.float32)
    out = np.asarray(pseudo_dquant(jnp.asarray(q), jnp.asarray(w),
                                   jnp.asarray(mask)))
    L = _levels_np(w)
    for idx in np.ndindex(q.shape):
        np.testing.assert_allclose(out[idx], L[idx[1], int(q[idx])], rtol=1e-5)


def test_quant_update_weight_merges_unused_bins():
    C, bins = 2, 8
    w = quant_init_weight(C, bins)
    count = np.zeros((C, bins), np.float32)
    count[0, :5] = 10.0          # channel 0: top 3 bins unused
    count[1, 1:] = 10.0          # channel 1: level 0 unused
    w2 = np.asarray(quant_update_weight(jnp.asarray(w), jnp.asarray(count),
                                        bins))
    # channel 0: j=4, w[4:]=w[4]-log(4)
    expect = w[0, 4] - np.log(4.0)
    np.testing.assert_allclose(w2[0, 4:], expect, rtol=1e-6)
    # channel 1: j=7 unchanged-ish (count[1,7]>0 so j=7, w[7:] = w7-log(1)=w7)
    np.testing.assert_allclose(w2[1, 7], w[1, 7], rtol=1e-6)
    # channel 1 level-0 shift: w0 += exp(w1_old); w1=w2=log((e^w1+e^w2)/2)
    np.testing.assert_allclose(w2[1, 0], w[1, 0] + np.exp(w[1, 1]), rtol=1e-6)
    t2 = np.log((np.exp(w[1, 1]) + np.exp(w[1, 2])) / 2)
    np.testing.assert_allclose(w2[1, 1], t2, rtol=1e-6)
    np.testing.assert_allclose(w2[1, 2], t2, rtol=1e-6)


def test_gmm_table_consistent_with_gmm_loss():
    """The reference's own oracle (EntropyGmmTable.py:60-85):
    exp(-loss)*65536 ~= table[l+1]-table[l]."""
    rng = np.random.RandomState(0)
    n, ng = 64, 3
    wraw = rng.rand(n, ng).astype(np.float32)
    delta = (rng.rand(n, ng) * 3).astype(np.float32)
    mean = (rng.rand(n, ng) * 8 - 3.5).astype(np.float32)
    label = rng.randint(1, 7, size=(n, 1)).astype(np.float32)

    sw = np.exp(wraw - wraw.max(1, keepdims=True))
    sw = sw / sw.sum(1, keepdims=True)
    loss = np.asarray(entropy_gmm_loss(
        jnp.asarray(sw), jnp.asarray(delta + 1e-6), jnp.asarray(mean),
        jnp.asarray(label - 3.5)))
    p_ref = np.exp(-loss) * 65536

    table = np.asarray(gmm_cdf_table(jnp.asarray(wraw), jnp.asarray(delta),
                                     jnp.asarray(mean)))
    li = label.ravel().astype(int)
    p_tab = table[np.arange(n), li + 1] - table[np.arange(n), li]
    # integer rounding: match within 2 counts
    np.testing.assert_allclose(p_tab, p_ref, atol=2.5)
    # structural checks
    assert (table[:, 0] == 0).all()
    assert (table[:, -1] == 65536).all()
    assert (np.diff(table, axis=1) > 0).all()


def test_gmm_table_repair_matches_ref():
    rng = np.random.RandomState(2)
    raw = np.sort(rng.randint(0, 65536, size=(32, 7)), axis=1)
    # inject some non-monotone rows
    raw[::3, 2] = raw[::3, 1]
    raw[::4, 4] = raw[::4, 3] - 1
    table = np.concatenate([np.zeros((32, 1), int), raw,
                            np.full((32, 1), 65536)], axis=1)
    from pseudocylindrical_convolution_tpu.ops.gmm_table import _monotonic_repair
    got = np.asarray(_monotonic_repair(jnp.asarray(table, dtype=jnp.int32), 8))
    want = gmm_table_repair_ref(table)
    np.testing.assert_array_equal(got, want)


def test_gmm_loss_grad_matches_analytic():
    rng = np.random.RandomState(5)
    n, ng = 10, 3
    w = rng.rand(n, ng).astype(np.float32) / ng + 0.1
    d = (rng.rand(n, ng) + 0.5).astype(np.float32)
    mu = rng.randn(n, ng).astype(np.float32)
    lb = rng.randint(-3, 4, size=(n, 1)).astype(np.float32)

    def f(w_, d_, mu_):
        return jnp.sum(entropy_gmm_loss(w_, d_, mu_, jnp.asarray(lb)))

    gw, gd, gm = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(w), jnp.asarray(d), jnp.asarray(mu))
    # analytic formulas from entropy_gmm_cuda.cu:35-68
    s2 = 1 / np.sqrt(2.0)
    sp2 = 1 / np.sqrt(2 * np.pi)
    xa = lb - 0.5 - mu
    xb = lb + 0.5 - mu
    iv = 1.0 / d
    fa = 0.5 + 0.5 * np.vectorize(np.math.erf if hasattr(np, 'math') else None)(xa * iv * s2) \
        if False else 0.5 * (1 + np.array(jax.lax.erf(jnp.asarray(xa * iv * s2))))
    fb = 0.5 * (1 + np.array(jax.lax.erf(jnp.asarray(xb * iv * s2))))
    p = fb - fa
    ga = sp2 * iv * np.exp(-0.5 * (xa * iv) ** 2)
    gb = sp2 * iv * np.exp(-0.5 * (xb * iv) ** 2)
    sump = (w * p).sum(1, keepdims=True)
    ip = -1.0 / (sump + 1e-7)
    np.testing.assert_allclose(gw, p * ip, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gd, iv * (-xb * gb + xa * ga) * w * ip,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(gm, (ga - gb) * w * ip, rtol=1e-3, atol=1e-5)


def test_conv_masks():
    ngroup, cin_pg, cout_pg, k = 4, 2, 3, 5
    m5 = conv_mask(5, ngroup * cout_pg, ngroup * cin_pg, k, ngroup)
    m6 = conv_mask(6, ngroup * cout_pg, ngroup * cin_pg, k, ngroup)
    # v6 keeps strictly more taps; both keep the strictly-causal region
    assert m6.sum() > m5.sum()
    for go in range(ngroup):
        for gi in range(ngroup):
            for kh in range(k):
                for kw in range(k):
                    keep5 = m5[go * cout_pg, gi * cin_pg, kh, kw]
                    keep6 = m6[go * cout_pg, gi * cin_pg, kh, kw]
                    z = kh + kw + gi - (go + k - 1)  # z_in - z_out
                    assert keep5 == (1.0 if z < 0 else 0.0)
                    assert keep6 == (1.0 if z <= 0 else 0.0)
