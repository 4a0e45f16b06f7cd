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


def test_resume_bitmatch(tmp_path):
    """A save at step k + full-state resume must bit-match an uninterrupted
    run at step k+n (VERDICT r2 weak #2: params-only resume silently reset
    the quantizer `count` histogram and both Adam states; the reference
    checkpoints count as a parameter, PseudoContextV2.py:250)."""
    import jax
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.parallel.mesh import (
        make_mesh, shard_train_step)
    from pseudocylindrical_convolution_tpu.parallel.train import (
        LossWeights, TrainState, create_train_state, make_train_step)
    from pseudocylindrical_convolution_tpu.utils.checkpoint import (
        is_train_state_file, load_train_state, save_train_state)

    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
    geom = cfg.geometry()
    lw = LossWeights(viewport_size=17)
    # check_iters=2 makes the quant bin-merge depend on the restored count
    mk = lambda: create_train_state(  # noqa: E731
        cmpnet_init(jax.random.PRNGKey(0), cfg), cfg)
    _, tx_o, tx_e = mk()
    step_fn = make_train_step(cfg, geom, lw, tx_o, tx_e, acc_batch=2,
                              check_iters=2, axis_name="data")
    mesh = make_mesh(2)
    step = shard_train_step(step_fn, mesh, True)
    batches = [jax.random.uniform(jax.random.PRNGKey(10 + i),
                                  (2, 2, 3, 64, 128), jnp.float32)
               for i in range(4)]

    s, _, _ = mk()                       # uninterrupted: 4 steps
    for b in batches:
        s, _ = step(s, b)
    ref = jax.tree.map(np.asarray, s)

    s, _, _ = mk()                       # interrupted at step 2
    for b in batches[:2]:
        s, _ = step(s, b)
    fn = str(tmp_path / "ts.pkl")
    save_train_state(s, fn)
    assert is_train_state_file(fn)
    ld = load_train_state(fn)
    s2 = TrainState(**ld)
    for b in batches[2:]:
        s2, _ = step(s2, b)

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(jax.tree.map(np.asarray, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_one_epoch_ssim_family(tmp_path):
    """SSIM-loss config (beta>0, gamma=0): exercises top_alpha=0.01, the
    SSIM gradient path, and ssim_anchor-based validation; all metrics must
    stay finite (the lr-1e-4 on-chip run diverged; the shipped recipe
    finetunes at 1e-5, tools/round3_train.sh)."""
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    names = []
    for i in range(2):
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
        "--beta", "10", "--gamma", "0", "--lr", "1e-5",
        "--save-dir", str(tmp_path / "save")])
    run(args)
    log = next(f for f in os.listdir(tmp_path / "save") if "log" in f)
    text = (tmp_path / "save" / log).read_text()
    assert "nan" not in text.lower()
    assert "tloss" in text
