"""Weight-converter tests: layout-rule numerics vs torch CPU, name
translation spot checks, and a full-model round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalnet_tpu.models import build_net
from focalnet_tpu.utils.convert import (
    _translate,
    conv_kernel,
    conv_transpose_kernel,
    convert_state_dict,
    dense_kernel,
)


def test_conv_kernel_numerics():
    import torch

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1, bias=True)
    x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    import flax.linen as nn

    m = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)])
    params = {"params": {
        "kernel": jnp.asarray(conv_kernel(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_transpose_kernel_numerics():
    """torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose SAME with
    the spatially-flipped transposed kernel — the exact upsampling geometry
    MIMOUNet uses (``MIMOUNet.py:95-96``)."""
    import torch

    tconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1, bias=True)
    x = np.random.RandomState(1).rand(2, 8, 6, 3).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    import flax.linen as nn

    m = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME")
    params = {"params": {
        "kernel": jnp.asarray(conv_transpose_kernel(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dense_kernel_numerics():
    import torch

    lin = torch.nn.Linear(6, 4)
    x = np.random.RandomState(2).rand(5, 6).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()
    got = x @ dense_kernel(lin.weight.detach().numpy()) + lin.bias.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_translate_names():
    """Spot-check translated names against the reference's state-dict keys
    (module tree in ``ITS/models/MIMOUNet.py`` / ``vmamba_layers.py``)."""
    cases = [
        (("feat_extract_0", "Conv_0", "kernel"), "feat_extract.0.main.0.weight", "conv"),
        (("feat_extract_3", "ConvTranspose_0", "kernel"),
         "feat_extract.3.main.0.weight", "conv_t"),
        (("SCM1", "BasicConv_2", "Conv_0", "kernel"), "SCM1.main.2.main.0.weight", "conv"),
        (("SCM1", "GroupNorm_0", "scale"), "SCM1.main.4.weight", "norm_scale"),
        (("FAM2", "BasicConv_0", "Conv_0", "bias"), "FAM2.merge.main.0.bias", "plain"),
        (("Encoder_0", "layers_0", "patch_embed_global_conv", "kernel"),
         "Encoder.0.layers.0.patch_embed_global.0.weight", "conv"),
        (("Encoder_0", "layers_0", "patch_embed_global_norm", "scale"),
         "Encoder.0.layers.0.patch_embed_global.2.weight", "norm_scale"),
        (("Encoder_0", "layers_0", "patch_unembed_global_conv", "kernel"),
         "Encoder.0.layers.0.patch_unembed_global.1.weight", "conv"),
        (("Decoder_2", "layers_0", "layers_0_global_1", "op", "in_proj", "kernel"),
         "Decoder.2.layers.0.layers.0.seq_global.blocks.1.op.in_proj.weight", "dense"),
        (("Decoder_2", "layers_0", "layers_0_global_1", "op", "x_proj_weight"),
         "Decoder.2.layers.0.layers.0.seq_global.blocks.1.op.x_proj_weight", "plain"),
        (("Encoder_1", "layers_0", "layers_0_global_0", "norm", "scale"),
         "Encoder.1.layers.0.layers.0.seq_global.blocks.0.norm.weight", "norm_scale"),
        (("Encoder_1", "layers_0", "layers_0_global_0", "mlp", "fc1", "kernel"),
         "Encoder.1.layers.0.layers.0.seq_global.blocks.0.mlp.fc1.weight", "dense"),
        (("Encoder_1", "layers_0", "layers_0_global_0", "op", "conv2d", "kernel"),
         "Encoder.1.layers.0.layers.0.seq_global.blocks.0.op.conv2d.weight", "conv"),
    ]
    for path, want_key, want_kind in cases:
        key, kind = _translate(path)
        assert key == want_key, (path, key, want_key)
        assert kind == want_kind, (path, kind, want_kind)


def _to_torch_layout(path_str, kind, w):
    """Inverse transforms for the round-trip test."""
    w = np.asarray(w)
    if kind == "conv":
        return np.transpose(w, (3, 2, 0, 1))
    if kind == "conv_t":
        return np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1]
    if kind == "dense":
        return np.transpose(w)
    return w


def test_full_model_round_trip():
    """Build a synthetic reference state dict from the flax tree (inverse
    transforms under translated names), convert it back, and require exact
    recovery with no missing or unused keys."""
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3))
    )
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        if path[0] == "params":
            path = path[1:]
        key, kind = _translate(path)
        assert key not in sd, f"name collision: {key}"
        sd[key] = _to_torch_layout(key, kind, leaf)

    converted, report = convert_state_dict(sd, params)
    assert report["missing"] == [], report["missing"][:5]
    assert report["unused"] == [], report["unused"][:5]
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(converted)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_load_torch_checkpoint_pkl(tmp_path):
    """Round-trip through an actual torch.save'd .pkl in the reference's
    {'model': state_dict} format."""
    import torch

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3))
    )
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)[1:]
        key, kind = _translate(path)
        sd[key] = torch.from_numpy(_to_torch_layout(key, kind, leaf).copy())
    pkl = tmp_path / "model.pkl"
    torch.save({"model": sd, "epoch": 7}, str(pkl))

    from focalnet_tpu.utils.convert import load_torch_checkpoint

    converted, report = load_torch_checkpoint(str(pkl), params)
    assert report["missing"] == [] and report["unused"] == []
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(converted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_mode_convert(tmp_path):
    """`--mode convert` migrates a reference .pkl into an Orbax dir loadable
    by --test_model (the reference-user migration path)."""
    import torch

    from focalnet_tpu.main import main, parse_args
    from focalnet_tpu.train import load_params

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3))
    )
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)[1:]
        key, kind = _translate(path)
        sd[key] = torch.from_numpy(_to_torch_layout(key, kind, leaf).copy())
    pkl = tmp_path / "Best.pkl"
    torch.save({"model": sd}, str(pkl))

    out = str(tmp_path / "weights" / "Best")
    main(parse_args([
        "--mode", "convert", "--input", str(pkl), "--test_model", out,
        "--vssg_dim", "16", "--ssm_d_state", "4",
        "--scan_backend", "chunked",
        "--model_save_dir", str(tmp_path / "weights"),
        "--result_dir", str(tmp_path / "results"),
    ]))
    loaded = load_params(out)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_torch_state_dict_round_trip():
    """Library inverse (flax -> torch layouts) feeds convert_state_dict back
    to exact recovery; key set covers every leaf with nothing unused."""
    from focalnet_tpu.utils.convert import to_torch_state_dict

    model = build_net("1mlp", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    params = model.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((1, 32, 32, 3))
    )
    sd = to_torch_state_dict(params)
    converted, report = convert_state_dict(sd, params)
    assert report["missing"] == [] and report["unused"] == []
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(converted)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_cli_mode_convert_to_torch(tmp_path):
    """`--mode convert --input <Orbax dir>` writes a reference-format .pkl
    (the jax->torch export direction: reference users can take weights
    trained here back to ITS/eval.py)."""
    import torch

    from focalnet_tpu.main import main, parse_args
    from focalnet_tpu.train.checkpoint import CheckpointManager
    from focalnet_tpu.utils.convert import load_torch_checkpoint

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    params = model.init(
        {"params": jax.random.PRNGKey(5)}, jnp.zeros((1, 32, 32, 3))
    )
    ckpt = CheckpointManager(str(tmp_path / "weights"), async_save=False)
    ckpt._save("Best", {"params": params})
    ckpt.wait()

    pkl = str(tmp_path / "exported.pkl")
    main(parse_args([
        "--mode", "convert", "--input", str(tmp_path / "weights" / "Best"),
        "--output", pkl,
        "--vssg_dim", "16", "--ssm_d_state", "4",
        "--scan_backend", "chunked",
        "--model_save_dir", str(tmp_path / "weights"),
        "--result_dir", str(tmp_path / "results"),
    ]))
    obj = torch.load(pkl, map_location="cpu", weights_only=False)
    assert set(obj) == {"model", "epoch"}
    # and the pkl is consumable by the forward converter (full cycle)
    back, report = load_torch_checkpoint(pkl, params)
    assert report["missing"] == [] and report["unused"] == []
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
