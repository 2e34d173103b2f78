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
