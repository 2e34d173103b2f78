"""DCNv3 core op (InternImage deformable convolution v3).

Functional spec: the reference ships CUDA kernels plus a pure-PyTorch
reference implementation (``/root/reference/mmdet3d/ops/ops_dcnv3/functions/
dcnv3_func.py`` -- ``dcnv3_core_pytorch``): grouped K-point deformable
sampling with per-point softmax masks over a strided/padded/dilated output
grid.  Sampling locations are reference points (output-pixel centres in the
*padded* input, ``_get_reference_points``) plus the dilated kernel grid
*scaled by offset_scale* plus learned offsets normalised by the padded
spatial size; bilinear, align_corners=False, zero padding outside.

Spec parity notes:

* K ordering follows the reference's ``_generate_dilation_grids`` (x-major:
  ``k = ix * kh + iy``) so InternImage checkpoints map 1:1.
* The reference's debug impl mis-routes ``pad_h/pad_w`` through ``F.pad``
  (pads W by pad_h and H by pad_w -- harmless there because every config
  is square); this implementation pads H by ``pad[0]`` and W by ``pad[1]``
  (the CUDA kernel's semantics, ``dcnv3_im2col_cuda.cuh``).
* Gradients come from JAX autodiff of this composition (the reference
  hand-writes ``dcnv3_backward``); ``tests/test_dcnv3.py`` gradchecks it
  against numerical differences like ``ops_dcnv3/test.py:34-60``.

This XLA composition is used by large-backbone zoo variants only; hot-path
sampling machinery lives in ``deform_attn.py``.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from fbbev_tpu.ops.grid_sample import grid_sample_2d

_IntPair = Union[int, Tuple[int, int]]


def _pair(v: _IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def dcnv3_output_size(in_size: Tuple[int, int], kernel: _IntPair = (3, 3),
                      stride: _IntPair = 1, pad: _IntPair = None,
                      dilation: _IntPair = 1) -> Tuple[int, int]:
    """Output (H_out, W_out) for a DCNv3 config (conv arithmetic on the
    padded input, ``dcnv3_func.py::_get_reference_points``)."""
    kh, kw = _pair(kernel)
    dh, dw = _pair(dilation)
    if pad is None:
        pad = ((dh * (kh - 1)) // 2, (dw * (kw - 1)) // 2)
    ph, pw = _pair(pad)
    sh, sw = _pair(stride)
    H_, W_ = in_size[0] + 2 * ph, in_size[1] + 2 * pw
    return ((H_ - (dh * (kh - 1) + 1)) // sh + 1,
            (W_ - (dw * (kw - 1) + 1)) // sw + 1)


def dcnv3_core(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
               kernel: _IntPair = (3, 3), stride: _IntPair = 1,
               pad: _IntPair = None, dilation: _IntPair = 1,
               groups: int = 4, offset_scale: float = 1.0) -> jnp.ndarray:
    """Args:
      x: (B, H, W, C) value features (already input-projected).
      offset: (B, H_out, W_out, G*K*2) pixel-unit offsets ((x, y)
        interleaved last, reference K ordering).
      mask: (B, H_out, W_out, G*K) *already softmaxed over K* per group.
      kernel/stride/pad/dilation: int or (h, w) pairs; ``pad=None`` means
        SAME-for-stride-1 (``(dilation * (kernel - 1)) // 2``).
      groups: channel groups G; offset_scale: reference ``offset_scale``
        (scales both the kernel grid and the learned offsets).

    Returns: (B, H_out, W_out, C).
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    if pad is None:
        pad = ((dh * (kh - 1)) // 2, (dw * (kw - 1)) // 2)
    ph, pw = _pair(pad)

    B, H, W, C = x.shape
    K = kh * kw
    G = groups
    Cg = C // G

    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    H_, W_ = H + 2 * ph, W + 2 * pw
    H_out = (H_ - (dh * (kh - 1) + 1)) // sh + 1
    W_out = (W_ - (dw * (kw - 1) + 1)) // sw + 1
    if offset.shape[1:3] != (H_out, W_out):
        raise ValueError(
            f"offset spatial shape {offset.shape[1:3]} != computed output "
            f"({H_out}, {W_out}) for input ({H}, {W}) kernel ({kh}, {kw}) "
            f"stride ({sh}, {sw}) pad ({ph}, {pw}) dilation ({dh}, {dw})")

    # coordinate math in the offset dtype (>= f32) so f64 runs stay f64
    # (gradcheck) while bf16 offsets still get f32 coords
    cdtype = jnp.promote_types(offset.dtype, jnp.float32)

    # reference points: strided output-pixel centres of the dilated kernel
    # in the padded input, normalised to [0, 1] (:95-125)
    ry = ((dh * (kh - 1)) // 2 + 0.5
          + jnp.arange(H_out, dtype=cdtype) * sh) / H_
    rx = ((dw * (kw - 1)) // 2 + 0.5
          + jnp.arange(W_out, dtype=cdtype) * sw) / W_
    ref = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1)  # (Ho, Wo, 2)

    # dilated kernel grid, reference K ordering (x-major: k = ix*kh + iy,
    # ``_generate_dilation_grids``), normalised by the padded size
    gx = -((dw * (kw - 1)) // 2) + jnp.arange(kw, dtype=cdtype) * dw
    gy = -((dh * (kh - 1)) // 2) + jnp.arange(kh, dtype=cdtype) * dh
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="ij")  # (kw, kh)
    grid = jnp.stack([gxx / W_, gyy / H_], -1).reshape(K, 2)

    off = offset.astype(cdtype).reshape(B, H_out, W_out, G, K, 2)
    norm = jnp.asarray([W_, H_], cdtype)
    loc = (ref[None, :, :, None, None, :]
           + grid[None, None, None, None] * offset_scale
           + off * (offset_scale / norm))  # (B, Ho, Wo, G, K, 2) in [0, 1]

    # sample per group over the PADDED input: value (B*G, H_, W_, Cg),
    # grid (B*G, Ho*Wo, K, 2) in [-1, 1]
    v = xp.reshape(B, H_, W_, G, Cg)
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(B * G, H_, W_, Cg)
    g2 = jnp.transpose(loc, (0, 3, 1, 2, 4, 5)).reshape(
        B * G, H_out * W_out, K, 2) * 2.0 - 1.0
    sampled = grid_sample_2d(v, g2, align_corners=False)  # (B*G, HoWo, K, Cg)

    m = jnp.transpose(mask.reshape(B, H_out, W_out, G, K),
                      (0, 3, 1, 2, 4)).reshape(B * G, H_out * W_out, K)
    out = jnp.einsum("nqkc,nqk->nqc", sampled, m.astype(sampled.dtype))
    out = out.reshape(B, G, H_out, W_out, Cg)
    return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(B, H_out, W_out, C)
