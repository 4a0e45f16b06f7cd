import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.models.entropy import entropy_net_raw
from pseudocylindrical_convolution_tpu.utils.checkpoint import (
    ModelSaver, _fused_ent_to_params, _nested_to_flat, load_params,
    reference_to_params, save_params, train_ent_to_fused)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()


def test_save_load_roundtrip(tmp_path):
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    fn = str(tmp_path / "m.pkl")
    save_params(params, fn)
    back = load_params(fn)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_saver_best_latest(tmp_path):
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    sv = ModelSaver(str(tmp_path), "t")
    msg = sv.save(params, [1.0])
    assert "best_0" in msg
    msg = sv.save(params, [2.0])
    assert "latest" in msg
    msg = sv.save(params, [0.5])
    assert "best_0" in msg


def test_model_saver_best_survives_restart(tmp_path):
    """Segmented training restarts the process every few epochs; a RESUMED
    ModelSaver must keep the previous segments' best-loss memory so a worse
    later epoch cannot clobber best_0 (sidecar {prefix}_saver.json)."""
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    sv = ModelSaver(str(tmp_path), "t")
    sv.save(params, [1.0])
    sv2 = ModelSaver(str(tmp_path), "t", resume=True)  # resumed segment
    assert sv2.best == [1.0]
    assert "latest" in sv2.save(params, [1.5])  # worse: must NOT take best_0
    assert "best_0" in sv2.save(params, [0.7])


def test_model_saver_fresh_run_resets_best(tmp_path):
    """A fresh (non-resume) run into an existing save_dir resets the
    best-loss memory (ADVICE r3: otherwise a retrain can inherit the old
    run's best and finish without writing any {prefix}_best_i.pkl)."""
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    sv = ModelSaver(str(tmp_path), "t")
    sv.save(params, [0.1])
    sv2 = ModelSaver(str(tmp_path), "t")       # fresh retrain, same dir
    assert sv2.best is None
    assert "best_0" in sv2.save(params, [5.0])  # its own first epoch wins


def test_fused_ent_conversion_roundtrip():
    """train subnets -> fused codec layout -> back == identity, and the
    fused thirds follow [weight, delta, mean] order (GMM batch layout)."""
    params = cmpnet_init(jax.random.PRNGKey(1), CFG)
    ent = params["ent"]
    fused = train_ent_to_fused(ent)
    assert fused["ent.net.0.conv.weight"].shape[0] == 3
    back = _fused_ent_to_params(_unflatten(fused)["ent"])
    flat_a = _nested_to_flat(ent)
    flat_b = _nested_to_flat(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
    # order check: third 0 of the fused weight == weight_net weights
    np.testing.assert_array_equal(
        fused["ent.net.3.conv1.conv.weight"][1],
        np.asarray(ent["delta_net"]["net"]["3"]["conv1"]["conv"]["weight"]))


def _unflatten(flat):
    root = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return root


def test_reference_torch_checkpoint_conversion(tmp_path):
    """Write reference-named torch .pt files from our params, convert back,
    and check the converted model computes identically."""
    torch = pytest.importorskip("torch")
    params = cmpnet_init(jax.random.PRNGKey(2), CFG)
    # encoder checkpoint: encoder.* + quant.weight (+count)
    enc_flat = {f"encoder.{k}": torch.tensor(v) for k, v in
                _nested_to_flat(params["encoder"]).items()}
    enc_flat["quant.weight"] = torch.tensor(
        np.asarray(params["quant"]["weight"]))
    enc_flat["quant.count"] = torch.zeros_like(enc_flat["quant.weight"])
    dec_flat = {f"decoder.{k}": torch.tensor(v) for k, v in
                _nested_to_flat(params["decoder"]).items()}
    ent_flat = {k: torch.tensor(v) for k, v in
                train_ent_to_fused(params["ent"]).items()}
    pe, pd, pn = (str(tmp_path / f"{n}.pt") for n in
                  ("1_8_encoder", "1_8_decoder", "1_8_ent"))
    torch.save(enc_flat, pe)
    torch.save(dec_flat, pd)
    torch.save(ent_flat, pn)

    from pseudocylindrical_convolution_tpu.utils.checkpoint import (
        load_torch_state_dict)
    conv = reference_to_params(load_torch_state_dict(pe),
                               load_torch_state_dict(pd),
                               load_torch_state_dict(pn))
    # parity on a forward through the entropy net (exercises all ent params)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, CFG.ngroup, 2, 16)) * 7
    r1 = entropy_net_raw(params["ent"], x - 3.5, GEOM, CFG.ngroup)
    r2 = entropy_net_raw(conv["ent"], x - 3.5, GEOM, CFG.ngroup)
    for k in r1:
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r2[k]),
                                   rtol=1e-6)
    # encoder/decoder weights identical
    fa = _nested_to_flat(params["encoder"])
    fb = _nested_to_flat(conv["encoder"])
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
