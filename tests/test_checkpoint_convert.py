import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu.train.checkpoint_convert import (
    convert_fbocc_checkpoint, export_fbocc_checkpoint)


def test_deconv3d_parity(rng):
    """flax ConvTranspose with the converter's weight layout must match
    torch ConvTranspose3d (validates the deblock mapping)."""
    import flax.linen as nn
    import torch.nn as tnn

    Cin, Cout = 4, 3
    x = rng.randn(1, Cin, 4, 4, 2).astype(np.float32)
    t = tnn.ConvTranspose3d(Cin, Cout, 2, stride=2, bias=False)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    from fbbev_tpu.train.checkpoint_convert import _deconv3d
    m = nn.ConvTranspose(Cout, (2, 2, 2), strides=(2, 2, 2), use_bias=False)
    kernel = _deconv3d(t.weight.detach().numpy())
    out = m.apply({"params": {"kernel": jnp.asarray(kernel)}},
                  jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, atol=1e-5)


def test_fbocc_checkpoint_roundtrip():
    """export -> convert must reproduce the exact flagship variable tree
    (names, shapes, values), with no unused torch keys."""
    model = FBOCC()
    batch_shapes = dict(
        imgs=jax.ShapeDtypeStruct((1, 6, 256, 704, 3), jnp.float32),
        rots=jax.ShapeDtypeStruct((1, 6, 3, 3), jnp.float32),
        trans=jax.ShapeDtypeStruct((1, 6, 3), jnp.float32),
        intrins=jax.ShapeDtypeStruct((1, 6, 3, 3), jnp.float32),
        post_rots=jax.ShapeDtypeStruct((1, 6, 3, 3), jnp.float32),
        post_trans=jax.ShapeDtypeStruct((1, 6, 3), jnp.float32),
        bda=jax.ShapeDtypeStruct((1, 3, 3), jnp.float32),
        start_of_sequence=jax.ShapeDtypeStruct((1,), jnp.bool_),
        sequence_group_idx=jax.ShapeDtypeStruct((1,), jnp.int32),
        curr_to_prev_ego_rt=jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
    )
    state = init_temporal_state(1, (100, 100, 8), 16, 80)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch_shapes,
                            state)
    r = np.random.RandomState(0)
    variables = jax.tree.map(
        lambda s: r.randn(*s.shape).astype(np.float32), shapes)

    sd = export_fbocc_checkpoint(variables)
    back = convert_fbocc_checkpoint(sd)
    assert back["unused_keys"] == []

    flat_orig = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_back = dict(jax.tree_util.tree_flatten_with_path(
        back["params"])[0])
    orig_keys = {jax.tree_util.keystr(k) for k, _ in flat_orig}
    back_keys = set(
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(back["params"])[0])
    missing = orig_keys - back_keys
    extra = back_keys - orig_keys
    assert not missing, f"converter misses params: {sorted(missing)[:10]}"
    assert not extra, f"converter invents params: {sorted(extra)[:10]}"
    for k, v in flat_orig:
        np.testing.assert_array_equal(
            flat_back[k], np.asarray(v),
            err_msg=jax.tree_util.keystr(k))

    for tree_name in ("batch_stats",):
        o = dict(jax.tree_util.tree_flatten_with_path(
            variables[tree_name])[0])
        bks = dict(jax.tree_util.tree_flatten_with_path(
            back[tree_name])[0])
        assert set(map(jax.tree_util.keystr, o)) == set(
            map(jax.tree_util.keystr, bks))


def test_vovnet_converter_roundtrip_consumes_all():
    """Export a real VoVNet-19 init to reference naming, re-import, and
    check exact round-trip with every key consumed both ways."""
    import jax
    import jax.numpy as jnp

    from fbbev_tpu.models.vovnet import VoVNetCP
    from fbbev_tpu.train.checkpoint_convert import (
        convert_vovnet_checkpoint, export_vovnet_checkpoint)

    spec = "V-19-slim-eSE" if "V-19-slim-eSE" in __import__(
        "fbbev_tpu.models.vovnet", fromlist=["STAGE_SPECS"]
    ).STAGE_SPECS else "V-99-eSE"
    model = VoVNetCP(spec_name=spec, out_indices=(2, 3))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    variables = {
        "params": {"img_backbone": jax.tree.map(
            np.asarray, dict(variables["params"]))},
        "batch_stats": {"img_backbone": jax.tree.map(
            np.asarray, dict(variables["batch_stats"]))}}

    sd = export_vovnet_checkpoint(variables, spec_name=spec)
    assert any(k.startswith("img_backbone.stem.stem_1/conv") for k in sd)
    out = convert_vovnet_checkpoint(sd, spec_name=spec)
    assert out["unused_keys"] == []

    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(out["params"]))
    # out params nested under img_backbone
    got = out["params"]["img_backbone"]
    ref = variables["params"]["img_backbone"]
    ga = jax.tree_util.tree_leaves_with_path(got)
    gb = dict(jax.tree_util.tree_leaves_with_path(ref))
    assert len(ga) == len(gb)
    for path, leaf in ga:
        np.testing.assert_array_equal(leaf, gb[path])
    gs = jax.tree_util.tree_leaves_with_path(
        out["batch_stats"]["img_backbone"])
    rs = dict(jax.tree_util.tree_leaves_with_path(
        variables["batch_stats"]["img_backbone"]))
    assert len(gs) == len(rs)
    for path, leaf in gs:
        np.testing.assert_array_equal(leaf, rs[path])


def _roundtrip_backbone(model, export_fn, convert_fn, sample_key):
    """Export a real init to reference naming, re-import, check exact
    round-trip with every key consumed both ways (the VoVNet pattern)."""
    import jax
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = {
        "params": {"img_backbone": jax.tree.map(
            np.asarray, dict(variables["params"]))},
        "batch_stats": {"img_backbone": jax.tree.map(
            np.asarray, dict(variables.get("batch_stats", {})))}}
    sd = export_fn(variables)
    assert any(sample_key in k for k in sd), sorted(sd)[:8]
    out = convert_fn(sd)
    assert out["unused_keys"] == []
    for coll in ("params", "batch_stats"):
        ref = variables[coll].get("img_backbone", {})
        got = out[coll].get("img_backbone", {}) if out[coll] else {}
        ga = jax.tree_util.tree_leaves_with_path(got)
        gb = dict(jax.tree_util.tree_leaves_with_path(ref))
        assert len(ga) == len(gb), (coll, len(ga), len(gb))
        for path, leaf in ga:
            np.testing.assert_array_equal(leaf, gb[path], err_msg=str(path))


def test_convnext_converter_roundtrip_consumes_all():
    from fbbev_tpu.models.convnext import ConvNeXt
    from fbbev_tpu.train.checkpoint_convert import (
        convert_convnext_checkpoint, export_convnext_checkpoint)

    _roundtrip_backbone(
        ConvNeXt(arch="tiny"),
        lambda v: export_convnext_checkpoint(v, arch="tiny"),
        lambda sd: convert_convnext_checkpoint(sd, arch="tiny"),
        "downsample_layers.0.0")


def test_swin_converter_roundtrip_consumes_all():
    from fbbev_tpu.models.swin import SwinTransformer
    from fbbev_tpu.train.checkpoint_convert import (
        convert_swin_checkpoint, export_swin_checkpoint)

    _roundtrip_backbone(
        SwinTransformer(arch="tiny"),
        lambda v: export_swin_checkpoint(v, arch="tiny"),
        lambda sd: convert_swin_checkpoint(sd, arch="tiny"),
        "attn.w_msa.qkv")


def test_swin_merge_permutation_is_consistent():
    """The unfold-order permutation must be its own round-trip AND place
    our (dy, dx, c) channel o at reference column c*4 + dy*2 + dx."""
    from fbbev_tpu.train.checkpoint_convert import _linear

    C = 3
    o = np.arange(4 * C)
    dy, dx, c = o // (2 * C), (o // C) % 2, o % C
    perm = c * 4 + dy * 2 + dx
    w = np.random.RandomState(0).randn(2 * C, 4 * C).astype(np.float32)
    ours = _linear(w)[perm]
    for oo in range(4 * C):
        np.testing.assert_array_equal(ours[oo], w[:, perm[oo]])
    inv = np.argsort(perm)
    np.testing.assert_array_equal(_linear(ours[inv]), w)


def test_dla_converter_roundtrip_consumes_all():
    from fbbev_tpu.models.dla import DLANet
    from fbbev_tpu.train.checkpoint_convert import (
        convert_dla_checkpoint, export_dla_checkpoint)

    _roundtrip_backbone(
        DLANet(arch="dla34"),
        export_dla_checkpoint,
        convert_dla_checkpoint,
        "level3.tree1.project.0")
