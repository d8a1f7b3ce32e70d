"""End-to-end integration: train on synthetic haze -> checkpoints -> resume
-> evaluate from Best.  Tiny model/images on CPU; the real-TPU equivalent is
driven manually via the CLI (see .claude/skills/verify)."""

import os

import jax
import numpy as np
import pytest

from focalnet_tpu.configs import TrainConfig
from focalnet_tpu.data import make_synthetic_dataset
from focalnet_tpu.evaluation import evaluate
from focalnet_tpu.models import build_net
from focalnet_tpu.train import load_params, train


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = make_synthetic_dataset(
        os.path.join(str(root), "data"), n_train=4, n_test=2, hw=(32, 32)
    )
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    cfg = TrainConfig(
        data_dir=data, batch_size=2, num_epoch=2, print_freq=1,
        valid_freq=1, save_freq=1, num_worker=1, crop_size=32,
        model_save_dir=os.path.join(str(root), "weights"),
        learning_rate=1e-3, grad_clip=1.0,
    )
    # train inside the fixture so every test in this module (infer/eval/
    # resume) can run standalone under -k selection, not only after the
    # training test
    train(model, None, cfg, log_file=os.path.join(cfg.model_save_dir, "train.log"))
    return model, cfg, root


def test_train_checkpoints_eval(tiny_setup):
    model, cfg, root = tiny_setup

    # the reference's checkpoint trio + final (train.py:110-131)
    for name in ["model", "model_1", "model_2", "Best", "Final"]:
        assert os.path.isdir(os.path.join(cfg.model_save_dir, name)), name

    # real TensorBoard events written when the torch-bundled writer exists
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
    except Exception:
        pass
    else:
        runs = os.path.join(cfg.model_save_dir, "runs")
        assert any(f.startswith("events.") for f in os.listdir(runs)), runs

    # log formats parse (plot_logs contract)
    from focalnet_tpu.utils.plot_logs import parse_log

    d = parse_log(os.path.join(cfg.model_save_dir, "train.log"))
    assert len(d["psnr"]) == 2 and len(d["content"]) >= 2

    # eval from Best produces metrics and saved images
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))
    out = evaluate(model, params, cfg.data_dir,
                   result_dir=os.path.join(str(root), "imgs"), save_images=True)
    assert 5.0 < out["psnr"] < 60.0
    assert 0.0 < out["ssim"] <= 1.0
    assert len(os.listdir(os.path.join(str(root), "imgs"))) == 4


def test_resume_continues(tiny_setup):
    model, cfg, root = tiny_setup
    # resume from the rolling checkpoint for one more epoch
    cfg2 = cfg.replace(num_epoch=3)
    train(model, None, cfg2,
          resume=os.path.join(cfg.model_save_dir, "model"),
          log_file=os.path.join(cfg.model_save_dir, "train.log"))
    assert os.path.isdir(os.path.join(cfg.model_save_dir, "model_3"))


def test_infer_mode(tiny_setup, tmp_path):
    """GT-free inference: dehaze a directory of images from Best."""
    model, cfg, root = tiny_setup
    from focalnet_tpu.evaluation import infer

    params = load_params(os.path.join(cfg.model_save_dir, "Best"))
    out_dir = str(tmp_path / "dehazed")
    res = infer(model, params, os.path.join(cfg.data_dir, "test", "hazy"), out_dir)
    assert res["count"] == 4
    assert len(os.listdir(out_dir)) == 4


def test_infer_batched_matches_batch1(tiny_setup, tmp_path):
    """Shape-bucketed batched infer (--valid_batch for --mode infer):
    same saved outputs as batch-1 on a MIXED-size directory, including a
    partial final bucket (VERDICT r2 item 8).  XLA fuses a batch-2 forward
    differently from batch-1, so floats can differ by an ulp — allow one
    uint8 quantization level, exact otherwise."""
    from PIL import Image

    from focalnet_tpu.evaluation import infer

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))

    # 3 images at 32x32 (one partial bucket at batch=2) + 2 at 32x64
    src = tmp_path / "mixed"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate([(32, 32), (32, 32), (32, 32),
                                (32, 64), (32, 64)]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"img{i}.png")

    out1, outb = str(tmp_path / "b1"), str(tmp_path / "bN")
    infer(model, params, str(src), out1, batch_size=1)
    infer(model, params, str(src), outb, batch_size=2)
    files = sorted(os.listdir(out1))
    assert files == sorted(os.listdir(outb)) and len(files) == 5
    for f in files:
        a = np.asarray(Image.open(os.path.join(out1, f))).astype(np.int16)
        b = np.asarray(Image.open(os.path.join(outb, f))).astype(np.int16)
        assert np.max(np.abs(a - b)) <= 1, f


def test_infer_pad_factor(tiny_setup, tmp_path):
    """--pad_factor coarsening: factor=64 collapses 32x32 and 32x64 images
    into ONE 64x64 padded shape (fewer compiles on mixed-size sets); outputs
    keep their original dims after the crop back."""
    from PIL import Image

    from focalnet_tpu.evaluation import infer

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))

    src = tmp_path / "mixed_pf"
    src.mkdir()
    rng = np.random.RandomState(1)
    sizes = [(32, 32), (32, 64), (32, 32)]
    for i, (h, w) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"img{i}.png")

    out = str(tmp_path / "pf64")
    res = infer(model, params, str(src), out, factor=64, batch_size=2)
    assert res["count"] == 3
    for i, (h, w) in enumerate(sizes):
        im = np.asarray(Image.open(os.path.join(out, f"img{i}.png")))
        assert im.shape == (h, w, 3)


def test_infer_mesh_sharded_matches_batch1(tiny_setup, tmp_path):
    """Serving scale-out: `infer(..., mesh=...)` shards each batch over the
    mesh's data axis; outputs must match the unsharded batch-1 run (same
    ≤1-quantization-level contract as the batched test)."""
    from PIL import Image

    from focalnet_tpu.evaluation import infer
    from focalnet_tpu.parallel import make_mesh

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))
    src = os.path.join(cfg.data_dir, "test", "hazy")

    out1, outm = str(tmp_path / "b1"), str(tmp_path / "mesh")
    infer(model, params, src, out1, batch_size=1)
    mesh = make_mesh((4,), ("data",))
    infer(model, params, src, outm, batch_size=4, mesh=mesh)
    files = sorted(os.listdir(out1))
    assert files == sorted(os.listdir(outm)) and len(files) == 4
    for f in files:
        a = np.asarray(Image.open(os.path.join(out1, f))).astype(np.int16)
        b = np.asarray(Image.open(os.path.join(outm, f))).astype(np.int16)
        assert np.max(np.abs(a - b)) <= 1, f

    # batch not divisible by the data axis is rejected
    with pytest.raises(ValueError):
        infer(model, params, src, outm, batch_size=3, mesh=mesh)


def test_cli_train_data_parallel(tmp_path):
    """CLI `--mode train --mesh_shape 4` on the 8-device CPU mesh: the
    training loop actually shards the batch over a multi-device data axis
    (VERDICT r2 item 5 — the DP plan's last mile)."""
    from focalnet_tpu.main import main, parse_args

    data = make_synthetic_dataset(
        os.path.join(str(tmp_path), "data"), n_train=4, n_test=1, hw=(32, 32)
    )
    save_dir = os.path.join(str(tmp_path), "weights")
    args = parse_args([
        "--mode", "train", "--data_dir", data,
        "--batch_size", "4", "--num_epoch", "1", "--print_freq", "1",
        "--valid_freq", "1", "--save_freq", "1", "--num_worker", "1",
        "--mesh_shape", "4", "--vssg_dim", "16", "--ssm_d_state", "4",
        "--scan_backend", "chunked", "--crop_size", "32",
        "--model_save_dir", save_dir,
        "--result_dir", os.path.join(str(tmp_path), "imgs"),
    ])
    main(args)
    assert os.path.isdir(os.path.join(save_dir, "Best"))
    import json
    with open(os.path.join(save_dir, "config.json")) as f:
        snap = json.load(f)
    assert tuple(snap["train"]["mesh_shape"]) == (4,)


def test_cli_train_dp_sp(tmp_path):
    """CLI `--mode train --mesh_shape 2,4` (dp x sp): param init and batch-1
    validation go through the mesh-free eval twin while the train step runs
    sequence-sharded — previously crashed in model.init (shard_map requires
    batch % data-axis == 0, violated by every batch-1 forward)."""
    from focalnet_tpu.main import main, parse_args

    data = make_synthetic_dataset(
        os.path.join(str(tmp_path), "data"), n_train=4, n_test=1, hw=(32, 32)
    )
    save_dir = os.path.join(str(tmp_path), "weights")
    args = parse_args([
        "--mode", "train", "--data_dir", data,
        "--batch_size", "4", "--num_epoch", "1", "--print_freq", "1",
        "--valid_freq", "1", "--save_freq", "1", "--num_worker", "1",
        "--mesh_shape", "2,4", "--vssg_dim", "16", "--ssm_d_state", "4",
        "--scan_backend", "chunked", "--crop_size", "32",
        "--model_save_dir", save_dir,
        "--result_dir", os.path.join(str(tmp_path), "imgs"),
    ])
    main(args)
    assert os.path.isdir(os.path.join(save_dir, "Best"))


def test_tiled_forward_assembly_exact():
    """The tile splitter/blender alone: with an identity forward, overlapping
    feather-blended tiles must reassemble the input EXACTLY (the weighted
    average of identical values is the value), for both overlap and
    no-overlap plans and for clamped last-tile positions."""
    from focalnet_tpu.evaluation import tiled_forward

    rng = np.random.RandomState(7)
    img = rng.rand(96, 80, 3).astype(np.float32)  # 80 forces a clamped tile
    for overlap in (0, 16):
        for bs in (1, 3):
            out = tiled_forward(lambda x: x, img, 32, overlap, bs)
            np.testing.assert_allclose(out, img, rtol=0, atol=1e-6)


def test_infer_tile_mode(tiny_setup, tmp_path):
    """--tile chop inference: a tile-sized image reproduces the whole-image
    forward exactly (single tile); larger/odd sizes come back at original
    dims through one (bs, tile, tile, 3) executable."""
    from PIL import Image

    from focalnet_tpu.evaluation import infer

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))

    src = tmp_path / "mixed_tile"
    src.mkdir()
    rng = np.random.RandomState(2)
    sizes = [(32, 32), (64, 96), (40, 50)]
    for i, (h, w) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"img{i}.png")

    out_whole, out_tile = str(tmp_path / "whole"), str(tmp_path / "tiled")
    infer(model, params, str(src), out_whole, batch_size=1)
    res = infer(model, params, str(src), out_tile, tile=32, tile_overlap=16,
                batch_size=2)
    assert res["count"] == 3
    for i, (h, w) in enumerate(sizes):
        im = np.asarray(Image.open(os.path.join(out_tile, f"img{i}.png")))
        assert im.shape == (h, w, 3)
    # the 32x32 image is a single 32x32 tile == the whole-image forward
    a = np.asarray(Image.open(os.path.join(out_whole, "img0.png"))).astype(np.int16)
    b = np.asarray(Image.open(os.path.join(out_tile, "img0.png"))).astype(np.int16)
    assert np.max(np.abs(a - b)) <= 1

    # invalid tile geometry is rejected
    with pytest.raises(ValueError):
        infer(model, params, str(src), out_tile, tile=40)
    with pytest.raises(ValueError):
        infer(model, params, str(src), out_tile, tile=32, tile_overlap=32)


def test_serve_mode(tiny_setup, tmp_path):
    """--mode serve line protocol: READY first, OK per request (default and
    explicit output paths), ERR keeps the loop serving, empty line exits."""
    import io

    from focalnet_tpu.evaluation import serve

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))
    hazy_dir = os.path.join(cfg.data_dir, "test", "hazy")
    imgs = sorted(os.listdir(hazy_dir))
    out_dir = str(tmp_path / "served")
    custom = str(tmp_path / "custom.png")
    req = "\n".join([
        os.path.join(hazy_dir, imgs[0]),
        os.path.join(hazy_dir, imgs[1]) + "\t" + custom,
        "/nonexistent/img.png",
        "",  # empty line = shutdown
        os.path.join(hazy_dir, imgs[0]),  # must NOT be served
    ]) + "\n"
    out = io.StringIO()
    res = serve(model, params, out_dir, warm_shapes=[(32, 32)],
                inp=io.StringIO(req), out=out)
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "READY"
    assert lines[1] == "OK\t" + os.path.join(out_dir, imgs[0])
    assert lines[2] == "OK\t" + custom
    assert lines[3].startswith("ERR\t") and len(lines) == 4
    assert res["count"] == 2
    assert os.path.isfile(os.path.join(out_dir, imgs[0]))
    assert os.path.isfile(custom)


def test_serve_mode_tiled_matches_infer(tiny_setup, tmp_path):
    """serve --tile warms its single executable before READY and produces
    byte-identical outputs to infer's tile mode."""
    import io

    from PIL import Image

    from focalnet_tpu.evaluation import infer, serve

    model, cfg, root = tiny_setup
    params = load_params(os.path.join(cfg.model_save_dir, "Best"))

    src = tmp_path / "in"
    src.mkdir()
    rng = np.random.RandomState(5)
    Image.fromarray((rng.rand(48, 72, 3) * 255).astype(np.uint8)).save(
        src / "odd.png")

    out_infer, out_serve = str(tmp_path / "via_infer"), str(tmp_path / "via_serve")
    infer(model, params, str(src), out_infer, tile=32, tile_overlap=8)
    out = io.StringIO()
    serve(model, params, out_serve, tile=32, tile_overlap=8,
          inp=io.StringIO(str(src / "odd.png") + "\n"), out=out)
    assert out.getvalue().splitlines()[0] == "READY"
    a = np.asarray(Image.open(os.path.join(out_infer, "odd.png")))
    b = np.asarray(Image.open(os.path.join(out_serve, "odd.png")))
    np.testing.assert_array_equal(a, b)
