import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.ops.dcnv3 import dcnv3_core


def test_dcnv3_zero_offset_uniform_mask_is_box_filter(rng):
    """With zero offsets and a uniform (softmaxed) mask, DCNv3 reduces to a
    3x3 zero-padded box filter per channel."""
    B, H, W, C, G = 1, 6, 7, 8, 2
    K = 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    mask = np.full((B, H, W, G * K), 1.0 / K, np.float32)
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            ref += pad[:, dy:dy + H, dx:dx + W]
    ref /= K
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dcnv3_integer_offset_shifts_samples(rng):
    """A constant (+1, 0) pixel offset makes every sample read one column
    to the right (equivalent to shifting the input left)."""
    B, H, W, C, G, K = 1, 6, 8, 4, 1, 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    offset[..., 0::2] = 1.0  # x-offsets
    mask = np.zeros((B, H, W, G * K), np.float32)
    mask[..., 4] = 1.0  # centre point only
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    # centre sample + 1px right == x shifted left by one (zeros at the edge)
    ref = np.concatenate([x[:, :, 1:], np.zeros((B, H, 1, C))], axis=2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dcnv3_mask_weighting(rng):
    B, H, W, C, G, K = 1, 5, 5, 2, 1, 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    mask = np.zeros((B, H, W, G * K), np.float32)
    mask[..., 4] = 0.5  # half the centre value
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    np.testing.assert_allclose(out, 0.5 * x, atol=1e-5)


def _bilinear_zeros(im, px, py):
    """Bilinear sample (H, W, C) at pixel coords (px, py), zeros outside —
    torch grid_sample(align_corners=False, padding_mode='zeros') semantics
    where p = loc * size - 0.5."""
    H, W, _ = im.shape
    x0, y0 = int(np.floor(px)), int(np.floor(py))
    out = 0.0
    for (xi, wx) in ((x0, x0 + 1 - px), (x0 + 1, px - x0)):
        for (yi, wy) in ((y0, y0 + 1 - py), (y0 + 1, py - y0)):
            if 0 <= xi < W and 0 <= yi < H:
                out = out + wx * wy * im[yi, xi]
    return out


def _oracle_dcnv3(x, offset, mask, kh, kw, sh, sw, ph, pw, dh, dw, G,
                  offset_scale):
    """Loop-based float64 oracle of the documented DCNv3 spec
    (dcnv3_func.py::dcnv3_core_pytorch): padded input, reference points at
    strided dilated-kernel centres, x-major K ordering, offset_scale on
    grid + offsets."""
    B, H, W, C = x.shape
    Cg = C // G
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0))).astype(np.float64)
    H_, W_ = H + 2 * ph, W + 2 * pw
    Ho = (H_ - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W_ - (dw * (kw - 1) + 1)) // sw + 1
    K = kh * kw
    kpts = [(-((dw * (kw - 1)) // 2) + ix * dw,
             -((dh * (kh - 1)) // 2) + iy * dh)
            for ix in range(kw) for iy in range(kh)]  # x-major ordering
    off = offset.reshape(B, Ho, Wo, G, K, 2).astype(np.float64)
    msk = mask.reshape(B, Ho, Wo, G, K).astype(np.float64)
    out = np.zeros((B, Ho, Wo, C), np.float64)
    for b in range(B):
        for i in range(Ho):
            ry = (dh * (kh - 1)) // 2 + 0.5 + i * sh
            for j in range(Wo):
                rx = (dw * (kw - 1)) // 2 + 0.5 + j * sw
                for g in range(G):
                    im = xp[b, :, :, g * Cg:(g + 1) * Cg]
                    acc = np.zeros(Cg, np.float64)
                    for k, (gx, gy) in enumerate(kpts):
                        lx = rx + gx * offset_scale \
                            + off[b, i, j, g, k, 0] * offset_scale
                        ly = ry + gy * offset_scale \
                            + off[b, i, j, g, k, 1] * offset_scale
                        acc += msk[b, i, j, g, k] * _bilinear_zeros(
                            im, lx - 0.5, ly - 0.5)
                    out[b, i, j, g * Cg:(g + 1) * Cg] = acc
    return out


@pytest.mark.parametrize("cfg", [
    dict(kh=3, kw=3, sh=1, sw=1, ph=1, pw=1, dh=1, dw=1, G=2, scale=1.0),
    dict(kh=3, kw=3, sh=2, sw=2, ph=1, pw=1, dh=1, dw=1, G=2, scale=1.0),
    dict(kh=3, kw=3, sh=1, sw=1, ph=2, pw=2, dh=2, dw=2, G=1, scale=1.0),
    dict(kh=3, kw=5, sh=2, sw=1, ph=0, pw=2, dh=1, dw=1, G=2, scale=1.0),
    dict(kh=3, kw=3, sh=1, sw=1, ph=1, pw=1, dh=1, dw=1, G=2, scale=0.5),
])
def test_dcnv3_general_configs_match_oracle(rng, cfg):
    """Arbitrary stride/pad/dilation/rect-kernel/offset_scale configs match
    a loop-based float64 oracle of the reference spec (the reference tests
    its CUDA op against dcnv3_core_pytorch the same way,
    ops_dcnv3/test.py:34-60)."""
    from fbbev_tpu.ops.dcnv3 import dcnv3_output_size

    kh, kw, G = cfg["kh"], cfg["kw"], cfg["G"]
    B, H, W, Cg = 2, 7, 9, 3
    C = G * Cg
    K = kh * kw
    Ho, Wo = dcnv3_output_size(
        (H, W), (kh, kw), (cfg["sh"], cfg["sw"]), (cfg["ph"], cfg["pw"]),
        (cfg["dh"], cfg["dw"]))
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = (rng.randn(B, Ho, Wo, G * K * 2) * 2).astype(np.float32)
    mask = rng.rand(B, Ho, Wo, G, K).astype(np.float32) + 1e-5
    mask = (mask / mask.sum(-1, keepdims=True)).reshape(B, Ho, Wo, G * K)

    out = np.asarray(dcnv3_core(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        kernel=(kh, kw), stride=(cfg["sh"], cfg["sw"]),
        pad=(cfg["ph"], cfg["pw"]), dilation=(cfg["dh"], cfg["dw"]),
        groups=G, offset_scale=cfg["scale"]))
    ref = _oracle_dcnv3(x, offset, mask, kh, kw, cfg["sh"], cfg["sw"],
                        cfg["ph"], cfg["pw"], cfg["dh"], cfg["dw"], G,
                        cfg["scale"])
    assert out.shape == ref.shape == (B, Ho, Wo, C)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dcnv3_gradcheck_numerical(rng):
    """Autodiff gradients of the composition match central differences in
    float64 for all three inputs (reference gradchecks its hand-written
    backward the same way, ops_dcnv3/test.py:34-60)."""
    import jax

    B, H, W, G, Cg = 1, 5, 6, 2, 2
    kh = kw = 3
    K = 9
    C = G * Cg
    cfg = dict(kernel=(3, 3), stride=(2, 1), pad=(1, 1), dilation=(1, 1),
               groups=G, offset_scale=1.0)
    Ho, Wo = (H + 2 - 3) // 2 + 1, (W + 2 - 3) // 1 + 1
    x = rng.randn(B, H, W, C).astype(np.float64)
    offset = (rng.randn(B, Ho, Wo, G * K * 2) * 0.37).astype(np.float64)
    mask = rng.rand(B, Ho, Wo, G * K).astype(np.float64)
    cot = rng.randn(B, Ho, Wo, C).astype(np.float64)

    with jax.enable_x64(True):
        def f(x_, o_, m_):
            return jnp.vdot(
                dcnv3_core(x_, o_, m_, **cfg), jnp.asarray(cot))

        grads = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))
        eps = 1e-6
        for ai, arr in enumerate((x, offset, mask)):
            flat = arr.reshape(-1)
            idxs = rng.choice(flat.size, size=12, replace=False)
            for idx in idxs:
                args = [np.array(x), np.array(offset), np.array(mask)]
                args[ai].reshape(-1)[idx] += eps
                fp = float(f(*[jnp.asarray(a) for a in args]))
                args[ai].reshape(-1)[idx] -= 2 * eps
                fm = float(f(*[jnp.asarray(a) for a in args]))
                num = (fp - fm) / (2 * eps)
                got = float(np.asarray(grads[ai]).reshape(-1)[idx])
                np.testing.assert_allclose(got, num, rtol=2e-4, atol=1e-6)
