"""End-to-end training-driver smoke: tiny config, synthetic images, one
epoch through run() (dataset -> sampler -> sharded step -> validation ->
checkpointing)."""

import os

import numpy as np
import pytest


def test_run_one_epoch(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(4):
        n = f"im{i}.png"
        cv2.imwrite(str(img_dir / n),
                    rng.randint(0, 255, (64, 128, 3), dtype=np.uint8))
        names.append(n)
    train_list = tmp_path / "train.txt"
    test_list = tmp_path / "test.txt"
    train_list.write_text("\n".join(names) + "\n")
    test_list.write_text(names[0] + "\n")

    from pseudocylindrical_convolution_tpu.train.loop import (
        build_argparser, run)
    args = build_argparser().parse_args([
        "--img-dir", str(img_dir), "--train-list", str(train_list),
        "--test-list", str(test_list), "--epochs", "1",
        "--batch-size", "1", "--acc-batch", "2", "--test-batch-size", "1",
        "--valid-dim", "8", "--channels", "8", "--code-dim", "8",
        "--npart", "4", "--viewport_size", "17",
        "--save-dir", str(tmp_path / "save")])
    run(args)
    saved = os.listdir(tmp_path / "save")
    assert any(f.endswith("_final.pkl") for f in saved), saved
    assert any("log" in f for f in saved)


def test_wavefront_schedule_highres():
    """Config-4 scale geometry (2048x4096 -> latent 16x512)."""
    from pseudocylindrical_convolution_tpu.geometry import Geometry
    from pseudocylindrical_convolution_tpu.codec.wavefront import (
        wavefront_schedule)
    geom = Geometry(npart=16, opt=True, config_file="/nonexistent")
    order, counts, nsteps = wavefront_schedule(geom, 16, 512, 48)
    assert nsteps == 16 * 16 + 512 + 48 - 2
    hindex = geom.hindex(256, 512)
    total = sum(int(hindex[i // 16]) for i in range(256)) * 48
    assert counts.sum() == len(order) == total
