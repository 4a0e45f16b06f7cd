"""End-to-end CLI test on a tiny model (registry monkeypatched)."""

import os

import numpy as np
import pytest

import jax

from pseudocylindrical_convolution_tpu import cli
from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.utils.checkpoint import save_params


@pytest.fixture
def tiny_model(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    mdir = tmp_path / "mse"
    mdir.mkdir()
    save_params(params, str(mdir / "1_8.pkl"))
    monkeypatch.setattr(cli, "MODEL_MSE_LIST", ["1_8"])
    monkeypatch.setattr(cli, "MSE_CHANNEL_LIST", [8])
    monkeypatch.setattr(cli, "MSE_MODEL_DIR", str(mdir))
    # tiny images: npart*16 = 64 rows
    monkeypatch.setattr(cli, "IMAGE_HW", (64, 128))

    def _setup(model_idx, mse, device_id=0):
        geom = cfg.geometry()
        return cfg, geom, cli.load_codec_params(str(mdir), "1_8")

    monkeypatch.setattr(cli, "_setup", _setup)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(64, 128, 3), dtype=np.uint8)
    fn = str(tmp_path / "img.png")
    cv2.imwrite(fn, img)
    return fn, tmp_path


def test_cli_missing_model_graceful(tiny_model):
    """A registry index without an installed checkpoint must fail at
    argument-check time with the list of installed rate points."""
    fn, tmp = tiny_model
    cli.MODEL_MSE_LIST.append("9_192")
    cli.MSE_CHANNEL_LIST.append(192)
    with pytest.raises(SystemExit) as ei:
        cli.main(["--enc", "--img-list", fn, "--code-list",
                  str(tmp / "x.bin"), "--model-idx", "1"])
    msg = str(ei.value)
    assert "9_192" in msg and "Installed mse rate points" in msg
    assert "0 (1_8)" in msg


@pytest.mark.parametrize("mode", ["scan", "dense", "incremental"])
def test_cli_enc_dec_test_roundtrip(tiny_model, capsys, mode):
    fn, tmp = tiny_model
    code = str(tmp / "img.bin")
    out = str(tmp / "img_dec.png")
    cli.main(["--enc", "--img-list", fn, "--code-list", code,
              "--model-idx", "0", "--mode", mode, "--batch", "2",
              "--lanes", "8"])
    assert os.path.getsize(code) > 0
    cli.main(["--dec", "--code-list", code, "--out-list", out,
              "--model-idx", "0"])
    assert os.path.exists(out)
    cli.main(["--test", "--code-list", code, "--img-list", fn,
              "--model-idx", "0"])
    captured = capsys.readouterr().out
    assert "PSNR" in captured and "Bitrate" in captured
    # decoding twice must be deterministic
    out2 = str(tmp / "img_dec2.png")
    cli.main(["--dec", "--code-list", code, "--out-list", out2,
              "--model-idx", "0"])
    import cv2
    np.testing.assert_array_equal(cv2.imread(out), cv2.imread(out2))
