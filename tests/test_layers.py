"""Layer parity vs torch: validates layout conventions (NHWC <-> NCHW and
weight transposition) that the checkpoint converter depends on."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from fbbev_tpu.models.layers import ConvBN, resize_bilinear, resize_trilinear


def _t2f_conv(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def test_convbn_matches_torch(rng):
    B, H, W, Cin, Cout = 2, 8, 10, 4, 6
    x = rng.randn(B, Cin, H, W).astype(np.float32)

    tconv = tnn.Conv2d(Cin, Cout, 3, stride=2, padding=1, bias=False)
    tbn = tnn.BatchNorm2d(Cout).eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(Cout).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(rng.rand(Cout).astype(np.float32) + 0.5))
        ref = torch.relu(tbn(tconv(torch.from_numpy(x)))).numpy()

    m = ConvBN(Cout, 3, 2, padding=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, Cin)))
    params = {
        "conv": {"kernel": jnp.asarray(
            _t2f_conv(tconv.weight.detach().numpy()))},
        "bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
               "bias": jnp.asarray(tbn.bias.detach().numpy())},
    }
    batch_stats = {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                          "var": jnp.asarray(tbn.running_var.numpy())}}
    out = m.apply({"params": params, "batch_stats": batch_stats},
                  jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4)


def test_convbn_train_updates_stats(rng):
    m = ConvBN(4, 3, padding=1)
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    _, updated = m.apply(variables, x, True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn"]["mean"]
    after = updated["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_resize_bilinear_vs_torch(rng):
    import torch.nn.functional as F
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    for ac in (False, True):
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (10, 14),
                                          align_corners=ac))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(10, 14),
            mode="bilinear", align_corners=ac,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"ac={ac}")


def test_resize_trilinear_vs_torch(rng):
    import torch.nn.functional as F
    x = rng.randn(1, 4, 5, 6, 3).astype(np.float32)
    for ac in (False, True):
        ours = np.asarray(resize_trilinear(jnp.asarray(x), (8, 10, 12),
                                           align_corners=ac))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), size=(8, 10, 12),
            mode="trilinear", align_corners=ac,
        ).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"ac={ac}")


def test_upsample_onepass_matches_axis_chain(rng):
    """The one-pass 3D integer upsample (FBBEV_UPSAMPLE3D=onepass) is the
    same math as the per-axis chain -- exact equality across mixed
    factors, including the occ head's 1x (deblock level) and 4x (coarse
    level) cases, and the torch trilinear oracle."""
    import torch
    import torch.nn.functional as F
    from fbbev_tpu.models.layers import _upsample_int_3d, _upsample_int_axis

    x = rng.randn(2, 4, 5, 3, 6).astype(np.float32)
    for rs in [(2, 2, 2), (1, 2, 4), (4, 4, 2), (1, 1, 1), (3, 1, 2)]:
        got = np.asarray(_upsample_int_3d(jnp.asarray(x), rs))
        ref = jnp.asarray(x)
        for ax, r in sorted(zip((1, 2, 3), rs), reverse=True):
            if r > 1:
                ref = _upsample_int_axis(ref, ax, r)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6,
                                   err_msg=f"rs={rs}")
        out_dhw = tuple(int(s * r) for s, r in zip(x.shape[1:4], rs))
        oracle = F.interpolate(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), size=out_dhw,
            mode="trilinear", align_corners=False,
        ).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, oracle, atol=1e-5,
                                   err_msg=f"rs={rs}")


def test_conv3d_zslab_matches_nn_conv(rng):
    """The z-slab 2D decomposition must match XLA's native 3D conv for
    stride 1 and stride 2."""
    import flax.linen as nn
    from fbbev_tpu.models.layers import Conv3DZSlab
    for stride in (1, 2):
        x = jnp.asarray(rng.randn(2, 8, 8, 4, 6).astype(np.float32))
        ref_m = nn.Conv(5, (3, 3, 3), strides=(stride,) * 3,
                        padding=[(1, 1)] * 3, use_bias=True)
        v = ref_m.init(jax.random.PRNGKey(0), x)
        ref = ref_m.apply(v, x)
        ours_m = Conv3DZSlab(5, strides=stride, use_bias=True)
        out = ours_m.apply({"params": dict(v["params"])}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"stride={stride}")


def test_conv3d_zfold_matches_nn_conv(rng):
    """The z-banded single-conv formulation must match XLA's native 3D
    conv for stride 1 and stride 2 (same param layout)."""
    import flax.linen as nn
    from fbbev_tpu.models.layers import Conv3DZFold
    for stride in (1, 2):
        x = jnp.asarray(rng.randn(2, 8, 8, 4, 6).astype(np.float32))
        ref_m = nn.Conv(5, (3, 3, 3), strides=(stride,) * 3,
                        padding=[(1, 1)] * 3, use_bias=True)
        v = ref_m.init(jax.random.PRNGKey(0), x)
        ref = ref_m.apply(v, x)
        out = Conv3DZFold(5, strides=stride, use_bias=True).apply(
            {"params": dict(v["params"])}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"stride={stride}")


def test_convbn_stride2_routes_to_zfold(rng, monkeypatch):
    """v5e miscompile workaround (docs/ROUND5.md): with no overrides,
    ConvBN must route stride-2 3x3x3 convs to Conv3DZFold (the stride-2
    z-slab formulation produces deterministic NaN voxel features in the
    flagship eval graph on chip) while stride-1 keeps the faster z-slab
    decomposition.  Guards the default so the workaround cannot silently
    regress."""
    import flax.linen as nn
    from fbbev_tpu.models.layers import ConvBN
    for var in ("FBBEV_CONV3D", "FBBEV_CONV3D_S1", "FBBEV_CONV3D_S2"):
        monkeypatch.delenv(var, raising=False)
    x = jnp.asarray(rng.randn(1, 8, 8, 4, 6).astype(np.float32))
    for stride, expect in ((1, "Conv3DZSlab"), (2, "Conv3DZFold")):
        m = ConvBN(5, 3, strides=stride, padding=1, ndim=3)
        table = nn.tabulate(m, jax.random.PRNGKey(0))(x, train=False)
        assert expect in table, f"stride={stride}: expected {expect}"
        other = "Conv3DZFold" if expect == "Conv3DZSlab" else "Conv3DZSlab"
        assert other not in table, f"stride={stride}: got {other}"


def test_conv1x1x1_dense_matches_nn_conv(rng):
    import flax.linen as nn
    from fbbev_tpu.models.layers import Conv1x1x1Dense
    for stride in (1, 2):
        x = jnp.asarray(rng.randn(2, 8, 8, 4, 6).astype(np.float32))
        ref_m = nn.Conv(5, (1, 1, 1), strides=(stride,) * 3, use_bias=True)
        v = ref_m.init(jax.random.PRNGKey(0), x)
        ref = ref_m.apply(v, x)
        out = Conv1x1x1Dense(5, strides=stride, use_bias=True).apply(
            {"params": dict(v["params"])}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"stride={stride}")


def test_deconv2x2x2_matches_conv_transpose(rng):
    import flax.linen as nn
    from fbbev_tpu.models.layers import Deconv2x2x2
    x = jnp.asarray(rng.randn(2, 4, 4, 2, 6).astype(np.float32))
    ref_m = nn.ConvTranspose(5, (2, 2, 2), strides=(2, 2, 2), use_bias=True)
    v = ref_m.init(jax.random.PRNGKey(0), x)
    ref = ref_m.apply(v, x)
    out = Deconv2x2x2(5, use_bias=True).apply({"params": dict(v["params"])}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
