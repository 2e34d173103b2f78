import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fbbev_tpu.ops import multi_scale_deformable_attention


def torch_msda_oracle(value, spatial_shapes, sampling_locations,
                      attention_weights):
    """Torch oracle with the semantics of mmcv's
    multi_scale_deformable_attn_pytorch (grid_sample align_corners=False,
    zero padding, weighted sum over levels x points)."""
    bs, _, num_heads, dim = value.shape
    _, num_q, _, num_lvl, num_p, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    out = torch.zeros(bs, num_q, num_heads, dim)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value_list[lvl].permute(0, 2, 3, 1).reshape(
            bs * num_heads, dim, H, W)
        g = sampling_locations[:, :, :, lvl] * 2 - 1  # (bs,q,heads,p,2)
        g = g.permute(0, 2, 1, 3, 4).reshape(bs * num_heads, num_q, num_p, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                align_corners=False)
        sampled = sampled.reshape(bs, num_heads, dim, num_q, num_p)
        w = attention_weights[:, :, :, lvl].permute(0, 2, 1, 3)
        out += (sampled * w[:, :, None]).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(bs, num_q, num_heads * dim)


def test_msda_vs_torch_oracle(rng):
    bs, heads, dim, num_q, num_p = 2, 4, 8, 10, 3
    shapes = [(6, 9), (3, 5)]
    num_v = sum(h * w for h, w in shapes)
    value = rng.randn(bs, num_v, heads, dim).astype(np.float32)
    loc = rng.rand(bs, num_q, heads, len(shapes), num_p, 2).astype(
        np.float32) * 1.2 - 0.1
    w = rng.rand(bs, num_q, heads, len(shapes), num_p).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)

    ours = np.asarray(multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_sample_onehot_matches_gather(rng):
    import jax.numpy as jnp
    from fbbev_tpu.ops.deform_attn import bilinear_sample_onehot, msda_sample
    B, HW, C, S = 3, 6 * 9, 7, 50
    value = rng.randn(B, HW, C).astype(np.float32)
    loc = (rng.rand(B, S, 2) * 1.2 - 0.1).astype(np.float32)
    ours = np.asarray(bilinear_sample_onehot(
        jnp.asarray(value), (6, 9), jnp.asarray(loc), chunk=16))
    ref = np.asarray(msda_sample(
        jnp.asarray(value)[:, :, None, :], (6, 9),
        jnp.asarray(loc)[:, :, None, None, :]))[:, :, 0, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_sample_matrix_matches_onehot(rng):
    """The rig-static dense interpolation matrix (serving hoist) must
    reproduce bilinear_sample_onehot exactly: mat @ value == sample."""
    import jax.numpy as jnp
    from fbbev_tpu.ops.deform_attn import (
        bilinear_sample_matrix, bilinear_sample_onehot)
    B, H, W, C, S = 2, 5, 8, 6, 37
    value = rng.randn(B, H * W, C).astype(np.float32)
    loc = (rng.rand(B, S, 2) * 1.3 - 0.15).astype(np.float32)
    mat = bilinear_sample_matrix(jnp.asarray(loc), (H, W))
    assert mat.shape == (B, S, H * W)
    ours = np.asarray(jnp.einsum("bsw,bwc->bsc", mat, jnp.asarray(value)))
    ref = np.asarray(bilinear_sample_onehot(
        jnp.asarray(value), (H, W), jnp.asarray(loc), chunk=16))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_deformable_sample_attend_matches_msda(rng):
    import jax.numpy as jnp
    from fbbev_tpu.ops.deform_attn import (
        deformable_sample_attend, multi_scale_deformable_attention)
    B, heads, hd, Q, P = 2, 4, 8, 37, 3
    shapes = [(6, 9)]
    value = rng.randn(B, 54, heads, hd).astype(np.float32)
    loc = (rng.rand(B, Q, heads, 1, P, 2) * 1.2 - 0.1).astype(np.float32)
    w = rng.rand(B, Q, heads, 1, P).astype(np.float32)
    ours = np.asarray(deformable_sample_attend(
        jnp.asarray(value), shapes[0], jnp.asarray(loc[:, :, :, 0]),
        jnp.asarray(w[:, :, :, 0]), chunk_q=8))
    ref = np.asarray(multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_kernel_matches_xla(rng):
    """Pallas fused sampling kernel (interpret mode on CPU) vs the XLA
    formulation."""
    import jax.numpy as jnp
    from fbbev_tpu.ops.deform_attn import deformable_sample_attend
    from fbbev_tpu.ops.pallas_deform import pallas_deformable_sample_attend
    B, heads, hd, Q, P = 2, 4, 8, 24, 4
    H, W = 6, 9
    value = rng.randn(B, H * W, heads, hd).astype(np.float32)
    loc = (rng.rand(B, Q, heads, P, 2) * 1.2 - 0.1).astype(np.float32)
    w = rng.rand(B, Q, heads, P).astype(np.float32)
    ref = deformable_sample_attend(
        jnp.asarray(value), (H, W), jnp.asarray(loc), jnp.asarray(w))
    out = pallas_deformable_sample_attend(
        jnp.asarray(value), (H, W), jnp.asarray(loc), jnp.asarray(w),
        tile_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_grid_tiled_self_attention_matches_dense(rng):
    """Tiled BEV self-attention sampling vs the dense formulation, with
    offsets within the slab radius."""
    import jax.numpy as jnp
    from fbbev_tpu.ops.deform_attn import (
        deformable_sample_attend, deformable_sample_attend_grid_tiled)
    B, heads, hd, P = 2, 4, 8, 4
    H, W = 16, 16
    Q = H * W
    value = rng.randn(B, Q, heads, hd).astype(np.float32)
    # reference points at the query cells + small offsets (<= 3 cells)
    ys, xs = np.meshgrid((np.arange(H) + 0.5) / H, (np.arange(W) + 0.5) / W,
                         indexing="ij")
    ref = np.stack([xs, ys], -1).reshape(1, Q, 1, 1, 2)
    off = (rng.rand(B, Q, heads, P, 2) - 0.5) * 6 / np.array([W, H])
    loc = (ref + off).astype(np.float32)
    attn = rng.rand(B, Q, heads, P).astype(np.float32)
    ref_out = deformable_sample_attend(
        jnp.asarray(value), (H, W), jnp.asarray(loc), jnp.asarray(attn))
    out = deformable_sample_attend_grid_tiled(
        jnp.asarray(value), (H, W), jnp.asarray(loc), jnp.asarray(attn),
        tile=4, slab=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4)


def test_deformable_sample_attend_remat_grads_match():
    """remat=True (scan-body rematerialisation for the training graph's
    one-hot residuals) must be gradient-identical to remat=False."""
    import jax

    from fbbev_tpu.ops.deform_attn import (
        bilinear_sample_onehot, deformable_sample_attend)

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(2, 48, 4, 8).astype(np.float32))
    loc = jnp.asarray(rng.rand(2, 16, 4, 4, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(2, 16, 4, 4).astype(np.float32))

    def loss(v, remat):
        return jnp.sum(deformable_sample_attend(
            v, (6, 8), loc, attn, chunk_q=8, remat=remat) ** 2)

    g0 = jax.grad(lambda v: loss(v, False))(v)
    g1 = jax.grad(lambda v: loss(v, True))(v)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-5)

    vb = jnp.asarray(rng.randn(2, 48, 8).astype(np.float32))
    locb = jnp.asarray(rng.rand(2, 32, 2).astype(np.float32))
    gb0 = jax.grad(lambda v: jnp.sum(bilinear_sample_onehot(
        v, (6, 8), locb, chunk=16) ** 2))(vb)
    gb1 = jax.grad(lambda v: jnp.sum(bilinear_sample_onehot(
        v, (6, 8), locb, chunk=16, remat=True) ** 2))(vb)
    np.testing.assert_allclose(np.asarray(gb0), np.asarray(gb1),
                               rtol=1e-5, atol=1e-5)
