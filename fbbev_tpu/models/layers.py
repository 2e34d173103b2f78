"""Shared flax building blocks.

Conventions (locked framework-wide):
* channels-last activations (NHWC / NDHWC) -- the TPU-native layout.
* parameters are float32; ``dtype`` selects the compute dtype (bf16 for
  the MXU-heavy paths, f32 for numerically sensitive islands mirroring the
  reference's ``@force_fp32`` policy, SURVEY.md section 2.5).
* BatchNorm with momentum 0.9 / eps 1e-5 (torch defaults).  Under ``jit``
  with a batch-sharded mesh, batch statistics are computed over the global
  batch by XLA collectives, which reproduces the reference's SyncBN
  semantics (``tools/train.py:242-244``) with no extra code.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# escape hatch for debugging TPU-compiler issues with the decomposed conv
# formulations: comma-separated subset of {zslab,pointwise,deconv} disables
# that decomposition (falls back to native XLA convs)
_DISABLED_DECOMP = set(
    os.environ.get("FBBEV_DISABLE_CONV_DECOMP", "").split(","))

# KNOWN ISSUE (v5e/axon; re-bisected round 2): the pointwise-matmul conv
# decomposition inside the full *training* graph crashes the TPU worker
# at execution time (not compile) -- even in f32, and even with an
# optimization_barrier before each matmul (tried and disproven this
# round; .repro_zslab_pointwise.py no longer reproduces at the op-pair
# level, so the fault needs the full backward graph).  Bisect evidence:
# the identical tiny-config train run passes with
# FBBEV_DISABLE_CONV_DECOMP=pointwise and crashes without it.  The
# pointwise decomposition therefore stays eval/serving-only; training
# falls back to native 1x1x1 convs.  Param layouts are identical, so
# routing by mode is checkpoint-safe.
_POINTWISE_EVAL_ONLY = True

# opt-in: route eligible 3x3 stride-1 2D convs through the Pallas
# blocked-im2col kernel (ops/pallas_conv.py).  TPU only; param layout is
# nn.Conv-compatible so the routing is checkpoint-safe.
_PALLAS3X3 = os.environ.get("FBBEV_PALLAS3X3", "0") == "1"

# route eligible 3x3x3 stride-1 3D convs through the Pallas z-banded
# im2col kernel (ops/pallas_conv3d.py) in EVAL graphs on TPU.  Opt-in via
# FBBEV_CONV3D=pallas until the on-chip A/B lands; param layout is
# nn.Conv-compatible so the routing is checkpoint-safe.
_PALLAS_CONV3D = os.environ.get("FBBEV_CONV3D", "") == "pallas"


def _pallas3d_interpret() -> bool:
    return os.environ.get("FBBEV_FORCE_PALLAS_CONV3D") == "interpret"


def _pallas3d_eligible(x, features, ks, st, dl, pad, ndim, train) -> bool:
    if not _PALLAS_CONV3D or "pallas3d" in _DISABLED_DECOMP:
        return False
    if train or ndim != 3 or ks != (3, 3, 3) or st != (1, 1, 1) \
            or dl != (1, 1, 1):
        return False
    if pad not in ("SAME", [(1, 1)] * 3):
        return False
    if jax.default_backend() != "tpu" and not _pallas3d_interpret():
        return False
    from fbbev_tpu.ops import pallas_conv3d
    return pallas_conv3d.supports(x.shape, features)


def _pallas3x3_eligible(x, ks, st, dl, pad, ndim) -> bool:
    if not _PALLAS3X3 or "pallas3x3" in _DISABLED_DECOMP or ndim != 2:
        return False
    if ks != (3, 3) or st != (1, 1) or dl != (1, 1):
        return False
    if pad not in ("SAME", [(1, 1), (1, 1)]):
        return False
    B, H, W, Cin = x.shape
    if Cin % 64 or H < 4 or W < 8:
        return False
    return jax.default_backend() == "tpu"


class PallasConv3x3(nn.Module):
    """3x3 stride-1 SAME conv on the Pallas im2col kernel; param layout
    matches ``nn.Conv`` (kernel (3, 3, Cin, Cout))."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fbbev_tpu.ops import pallas_conv
        Cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, Cin, self.features))
        y = pallas_conv.conv3x3(x.astype(self.dtype),
                                kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class PallasConv3D(nn.Module):
    """3x3x3 stride-1 SAME conv on the Pallas z-banded im2col kernel
    (``ops/pallas_conv3d.py``); param layout matches ``nn.Conv`` /
    ``Conv3DZSlab`` (kernel (3, 3, 3, Cin, Cout)), so the train path can
    create the params through ``Conv3DZSlab`` and eval can route here."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fbbev_tpu.ops import pallas_conv3d
        Cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, Cin, self.features))
        y = pallas_conv3d.conv3d_3x3x3(
            x.astype(self.dtype), kernel.astype(self.dtype),
            interpret=_pallas3d_interpret())
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Conv3DZSlab(nn.Module):
    """3x3x3 (stride 1/2, pad 1) 3D conv decomposed into three z-shifted 2D
    convs, folding Z into the conv batch.

    XLA's native 3D convolution tiles poorly on TPU for the shallow-Z BEV
    volumes used here (measured ~2x slower, docs/PERF.md); the 2D
    decomposition hits the ordinary 2D conv path.  Parameter layout is
    identical to ``nn.Conv`` (kernel (3, 3, 3, Cin, Cout)) so checkpoints
    are interchangeable.
    """

    features: int
    strides: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Y, X, Z, Cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, Cin, self.features))
        s = self.strides
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
        Zo = (Z + 2 - 3) // s + 1
        out = None
        kern = kernel.astype(self.dtype)
        xp = xp.astype(self.dtype)
        for dz in range(3):
            xs = jax.lax.slice_in_dim(xp, dz, dz + (Zo - 1) * s + 1, s,
                                      axis=3)
            x2 = jnp.moveaxis(xs, 3, 1).reshape(B * Zo, Y, X, Cin)
            if s == 1 and _pallas3x3_eligible(
                    x2, (3, 3), (1, 1), (1, 1), [(1, 1), (1, 1)], 2):
                from fbbev_tpu.ops import pallas_conv
                y2 = pallas_conv.conv3x3(x2, kern[:, :, dz])
            else:
                y2 = jax.lax.conv_general_dilated(
                    x2, kern[:, :, dz], (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y2 = jnp.moveaxis(
                y2.reshape((B, Zo) + y2.shape[1:]), 1, 3)
            out = y2 if out is None else out + y2
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            out = out + bias.astype(self.dtype)
        return out


class Conv3DZFold(nn.Module):
    """3x3x3 (stride 1/2, pad 1) 3D conv as ONE vanilla 2D conv with z
    folded into channels: the kernel is expanded to a z-banded
    (3, 3, Z*Cin, Zo*Cout) block matrix (rows outside the +-1 z band are
    zero), so ``out[y, x, zo] = sum_dz k[.., dz] * x[.., zo+dz-1]`` drops
    out of a single conv2d.  ~Z/3 x more MACs than the true 3D conv but
    measured ~parity with the z-slab decomposition at BEV shapes
    (docs/PERF.md "z-folded dense 2D formulation"), and -- being a single
    ordinary convolution -- it composes with Pallas kernels in full
    graphs where the z-slab decomposition faults the v5e worker
    (docs/ROUND2.md).  Param layout matches ``nn.Conv``
    (kernel (3, 3, 3, Cin, Cout)); the banded expansion is rebuilt
    in-graph each call (~25 MB bf16 write per 256-ch conv, ~0.03 ms).
    """

    features: int
    strides: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Y, X, Z, Cin = x.shape
        Co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, Cin, self.features))
        s = self.strides
        Zo = (Z + 2 - 3) // s + 1
        zi = jnp.arange(Z)
        zo = jnp.arange(Zo) * s
        dz = zi[None, :] - zo[:, None] + 1          # (Zo, Z)
        mask = (dz >= 0) & (dz < 3)
        kern = kernel.astype(self.dtype)
        Kz = jnp.take(kern, jnp.clip(dz, 0, 2), axis=2)  # (3,3,Zo,Z,Ci,Co)
        Kz = Kz * mask[None, None, :, :, None, None].astype(self.dtype)
        K2 = jnp.transpose(Kz, (0, 1, 3, 4, 2, 5)).reshape(
            3, 3, Z * Cin, Zo * Co)
        x2 = x.astype(self.dtype).reshape(B, Y, X, Z * Cin)
        y2 = jax.lax.conv_general_dilated(
            x2, K2, (s, s), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y2.reshape(B, y2.shape[1], y2.shape[2], Zo, Co)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (Co,))
            out = out + bias.astype(self.dtype)
        return out


class Conv1x1x1Dense(nn.Module):
    """1x1x1 3D conv as a flattened matmul (XLA's 3-spatial-dim conv path
    is measurably slower for pointwise convs).  Param layout matches
    ``nn.Conv`` (kernel (1, 1, 1, Cin, Cout))."""

    features: int
    strides: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.strides != 1:
            s = self.strides
            x = x[:, ::s, ::s, ::s, :]
        Cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, Cin, self.features))
        y = jnp.einsum(
            "...c,co->...o", x.astype(self.dtype),
            kernel.reshape(Cin, self.features).astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Deconv2x2x2(nn.Module):
    """ConvTranspose 2x2x2 stride 2 as a matmul + pixel shuffle (each
    output voxel has exactly one input tap).  Param layout matches
    ``nn.ConvTranspose`` (kernel (2, 2, 2, Cin, Cout), unflipped)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Y, X, Z, Cin = x.shape
        Co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, 2, Cin, Co))
        # lax.conv_transpose does not flip the kernel; the scatter view
        # (out[2i+a] += x[i] w[a]) corresponds to the flipped taps
        wk = jnp.flip(kernel, (0, 1, 2)).reshape(8, Cin, Co)
        wk = jnp.transpose(wk, (1, 0, 2)).reshape(Cin, 8 * Co)
        y = x.astype(self.dtype) @ wk.astype(self.dtype)
        y = y.reshape(B, Y, X, Z, 2, 2, 2, Co)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
            B, 2 * Y, 2 * X, 2 * Z, Co)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (Co,))
            y = y + bias.astype(self.dtype)
        return y


class ConvBN(nn.Module):
    """Conv (+ optional BN) (+ optional activation)."""

    features: int
    kernel_size: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[str, int, Sequence[Tuple[int, int]]] = "SAME"
    dilation: Union[int, Tuple[int, ...]] = 1
    use_bias: bool = False
    norm: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32
    ndim: int = 2
    # opt out of the decomposed conv formulations for this instance
    # (e.g. convs whose outputs feed a Pallas kernel -- the z-slab
    # decomposition composed with other graph structures faults the v5e
    # worker, docs/ROUND2.md)
    force_native: bool = False
    # per-instance 3x3x3 implementation override: None = global default
    # (FBBEV_CONV3D env), else "zslab" | "zfold" | "native".  Added for
    # the occfuse crash bisect (docs/ROUND4.md): the v5e worker faults
    # when the z-slab decomposition and the occ-fuse Pallas kernel share
    # a graph, so the occ head can locally route around z-slab without
    # paying Conv3DZFold's Z/3x MAC overhead in the 3D encoder.
    impl3d: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks,) * self.ndim
        st = self.strides
        if isinstance(st, int):
            st = (st,) * self.ndim
        dl = self.dilation
        if isinstance(dl, int):
            dl = (dl,) * self.ndim
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * self.ndim
        if (not self.force_native and _pallas3d_eligible(
                x, self.features, ks, st, dl, pad, self.ndim, train)):
            x = PallasConv3D(self.features, use_bias=self.use_bias,
                             dtype=self.dtype, name="conv")(x)
        elif ("zslab" not in _DISABLED_DECOMP and not self.force_native
                and self.impl3d != "native"
                and self.ndim == 3 and ks == (3, 3, 3) and dl == (1, 1, 1)
                and pad == [(1, 1)] * 3 and st[0] == st[1] == st[2]
                and st[0] in (1, 2)):
            # FBBEV_CONV3D=zfold: single-conv z-banded formulation
            # (composes with Pallas kernels where z-slab faults the v5e
            # worker, docs/ROUND2.md).  self.impl3d overrides per
            # instance (occfuse bisect); FBBEV_CONV3D_S1 / _S2 override
            # by stride (NaN bisects).
            #
            # DEFAULT: stride-1 -> z-slab (fastest measured), stride-2 ->
            # z-fold.  The stride-2 z-slab formulation MISCOMPILES on
            # v5e in the flagship eval graph: deterministic NaN voxel
            # features (~3M f32 logit NaNs/frame, all classes NaN at the
            # same voxels), CPU clean on the identical graph; routing
            # only the stride-2 convs to z-fold zeroes it
            # (docs/ROUND5.md nan_matrix batch 2).  Same miscompile
            # family as the round-2 worker faults.  Regression probe:
            # tools/nan_count.py with FBBEV_CONV3D=zslab.
            sel = self.impl3d or os.environ.get("FBBEV_CONV3D")
            if sel is None:
                sel = os.environ.get(f"FBBEV_CONV3D_S{st[0]}")
            if sel is None and st[0] == 2:
                sel = "zfold"
            impl = Conv3DZFold if sel == "zfold" else Conv3DZSlab
            x = impl(self.features, strides=st[0],
                     use_bias=self.use_bias, dtype=self.dtype,
                     name="conv")(x)
        elif ("pointwise" not in _DISABLED_DECOMP and not self.force_native
              and not (train and _POINTWISE_EVAL_ONLY)
              and self.ndim == 3 and ks == (1, 1, 1)
              and st[0] == st[1] == st[2]):
            x = Conv1x1x1Dense(self.features, strides=st[0],
                               use_bias=self.use_bias,
                               dtype=self.dtype, name="conv")(x)
        elif not self.force_native and _pallas3x3_eligible(
                x, ks, st, dl, pad, self.ndim):
            x = PallasConv3x3(self.features, use_bias=self.use_bias,
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features, ks, strides=st, padding=pad,
                kernel_dilation=dl, use_bias=self.use_bias, dtype=self.dtype,
                name="conv",
            )(x)
        if self.norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock2D(nn.Module):
    """Torch-style ResNet basic block (two 3x3 convs + identity)."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, 3, self.strides, padding=1,
                   dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, padding=1, act=None,
                   dtype=self.dtype, name="conv2")(y, train)
        if self.downsample or residual.shape[-1] != self.features \
                or self.strides != 1:
            residual = ConvBN(self.features, 1, self.strides, padding=0,
                              act=None, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck2D(nn.Module):
    """Torch-style ResNet bottleneck (1x1 -> 3x3(stride) -> 1x1, expansion 4).

    'pytorch' style: the stride sits on the 3x3 conv
    (cf. mmdet ResNet ``style='pytorch'``, used by the FB-OCC config).
    """

    planes: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        residual = x
        y = ConvBN(self.planes, 1, 1, padding=0, dtype=self.dtype,
                   name="conv1")(x, train)
        y = ConvBN(self.planes, 3, self.strides, padding=1, dtype=self.dtype,
                   name="conv2")(y, train)
        y = ConvBN(out_ch, 1, 1, padding=0, act=None, dtype=self.dtype,
                   name="conv3")(y, train)
        if x.shape[-1] != out_ch or self.strides != 1:
            residual = ConvBN(out_ch, 1, self.strides, padding=0, act=None,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class Mlp(nn.Module):
    """fc -> relu -> fc (dropout omitted: reference config uses drop=0)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SELayer(nn.Module):
    """Camera-parameter squeeze-excitation gate
    (cf. depth_net.py:241-255): x * sigmoid(expand(relu(reduce(se))))."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        se = nn.Dense(self.channels, dtype=self.dtype, name="reduce")(x_se)
        se = nn.relu(se)
        se = nn.Dense(self.channels, dtype=self.dtype, name="expand")(se)
        gate = nn.sigmoid(se)
        # x: (B, H, W, C); gate: (B, C)
        return x * gate[:, None, None, :]


def max_pool_same(x, window: int, strides: int):
    """Torch-style maxpool with SAME-ish padding (k=3, s=2, p=1)."""
    pad = (window - 1) // 2
    return nn.max_pool(
        x, (window, window), strides=(strides, strides),
        padding=[(pad, pad), (pad, pad)],
    )


def max_pool_ceil(x, window: int, strides: int):
    """Torch ``MaxPool2d(window, strides, ceil_mode=True)`` (padding=0):
    right/bottom -inf padding only, exactly enough for the ceil-division
    output size.  Distinct from padding=1 SAME pooling — the window grid
    starts at 0, not -1 (VoVNet inter-stage pools, ``vovnet.py:262``)."""
    pads = []
    for dim in (1, 2):
        size = x.shape[dim]
        out = -(-(size - window) // strides) + 1
        pads.append((0, max(0, (out - 1) * strides + window - size)))
    return nn.max_pool(x, (window, window), strides=(strides, strides),
                       padding=pads)


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """2D bilinear resize matching torch ``F.interpolate``.

    jax.image.resize('linear') matches align_corners=False (half-pixel
    centres); the align_corners=True variant is built from a linspace
    gather, used where the reference specifies it.
    """
    import jax
    B, H, W, C = x.shape
    oh, ow = out_hw
    if not align_corners:
        return jax.image.resize(x, (B, oh, ow, C), method="linear")
    # align_corners=True: sample positions linspace(0, size-1, out)
    from fbbev_tpu.ops.grid_sample import grid_sample_2d
    ys = jnp.linspace(-1.0, 1.0, oh)
    xs = jnp.linspace(-1.0, 1.0, ow)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, oh, ow, 2))
    return grid_sample_2d(x, grid, align_corners=True)


def _upsample_int_axis(x, axis: int, s: int):
    """Exact integer-factor linear upsample along one axis
    (align_corners=False, half-pixel centres, edge clamp): phase k of the
    output samples input coordinate (k + .5)/s - .5, a fixed 2-tap lerp.

    One edge-padded copy + slice views (fused by XLA into the lerp) --
    the earlier prev/next ``concatenate`` formulation materialised two
    extra full-volume copies per axis (docs/PERF.md round-2 trace)."""
    import jax

    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xe = jnp.pad(x, pad, mode="edge")
    prev = jax.lax.slice_in_dim(xe, 0, n, axis=axis)
    nxt = jax.lax.slice_in_dim(xe, 2, n + 2, axis=axis)
    phases = []
    for k in range(s):
        c = (k + 0.5) / s - 0.5
        if c < 0:
            w = c + 1.0  # lerp(prev, x, w)
            phases.append((1.0 - w) * prev + w * x)
        else:
            w = c  # lerp(x, next, w)
            phases.append((1.0 - w) * x + w * nxt)
    out = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= s
    return out.reshape(shape)


def _upsample_int_3d(x, rs):
    """One-pass exact integer-factor trilinear upsample of all three
    spatial axes of (B, D, H, W, C) (align_corners=False, half-pixel
    centres, edge clamp) -- same math as chaining
    :func:`_upsample_int_axis` per axis, but every phase volume is a
    separable 2-tap lerp over ONE edge-padded copy and the full-res
    volume is written once: the per-axis chain writes ~1.75x the output
    volume for 2x factors (0.25 + 0.5 + 1.0), which showed up as ~3 ms
    of stack/interleave in the serving occ-head profile
    (docs/ROUND4.md session 4)."""
    import jax

    B, D, H, W, C = x.shape
    rd, rh, rw = rs

    def taps(r):
        # phase k samples input coordinate (k + .5)/r - .5 = i0 + w1
        out = []
        for k in range(r):
            c = (k + 0.5) / r - 0.5
            i0 = -1 if c < 0 else 0
            out.append((i0, c - i0))
        return out

    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")

    def lerp(v, axis, n, i0, w1):
        lo = jax.lax.slice_in_dim(v, 1 + i0, 1 + i0 + n, axis=axis)
        hi = jax.lax.slice_in_dim(v, 2 + i0, 2 + i0 + n, axis=axis)
        if w1 == 0.0:
            return lo
        return (1.0 - w1) * lo + w1 * hi

    # separable factorisation: rd D-lerps, then rd*rh H-lerps, then
    # rd*rh*rw W-lerps.  Each factor's phases are stacked at ITS OWN
    # axis position so the final interleave is a pure (adjacent-dim
    # merging) reshape -- the earlier single-axis stack needed a full-
    # volume transpose afterwards, which cost more than the 1.75x
    # rewrite it saved (round-5 on-chip A/B: 27.36 vs 28.93 fps).
    d_parts = []
    for (id0, wd) in taps(rd):
        xd = lerp(xe, 1, D, id0, wd)
        h_parts = []
        for (ih0, wh) in taps(rh):
            xdh = lerp(xd, 2, H, ih0, wh)
            w_parts = [lerp(xdh, 3, W, iw0, ww)
                       for (iw0, ww) in taps(rw)]
            h_parts.append(jnp.stack(w_parts, axis=4))  # (B,D,H,W,rw,C)
        d_parts.append(jnp.stack(h_parts, axis=3))  # (B,D,H,rh,W,rw,C)
    out = jnp.stack(d_parts, axis=2)          # (B,D,rd,H,rh,W,rw,C)
    return out.reshape(B, D * rd, H * rh, W * rw, C)


def resize_trilinear(x, out_dhw, align_corners: bool = False):
    """3D trilinear resize for (B, D, H, W, C)."""
    import jax
    B = x.shape[0]
    C = x.shape[-1]
    od, oh, ow = out_dhw
    if not align_corners:
        ratios = [o // i if o % i == 0 else 0
                  for o, i in zip((od, oh, ow), x.shape[1:4])]
        if all(r >= 1 for r in ratios):
            import os
            if os.environ.get("FBBEV_UPSAMPLE3D", "axis") == "onepass":
                return _upsample_int_3d(x, ratios)
            # innermost (sublane-adjacent) axis first, while its volume is
            # smallest; the leading-axis interleave is a free reshape
            for ax, r in sorted(zip((1, 2, 3), ratios), reverse=True):
                if r > 1:
                    x = _upsample_int_axis(x, ax, r)
            return x
        return jax.image.resize(x, (B, od, oh, ow, C), method="linear")
    from fbbev_tpu.ops.grid_sample import grid_sample_3d
    zs = jnp.linspace(-1.0, 1.0, od)
    ys = jnp.linspace(-1.0, 1.0, oh)
    xs = jnp.linspace(-1.0, 1.0, ow)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    grid = jnp.broadcast_to(
        jnp.stack([gx, gy, gz], -1)[None], (B, od, oh, ow, 3))
    return grid_sample_3d(x, grid, align_corners=True)


class _SplitPointwiseConv(nn.Module):
    """1x1x1 conv over the concat [x, e] without materialising it: the
    trailing input channel (a broadcastable embedding) contributes
    ``e * kernel[..., -1, :]``.  Param layout matches ``nn.Conv`` with
    ``Cin = x.C + 1``."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, e):
        Cin = x.shape[-1] + 1
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, Cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.reshape(Cin, self.features).astype(self.dtype)
        y = jnp.einsum("...c,co->...o", x.astype(self.dtype), k[:-1])
        y = y + e.astype(self.dtype) * k[-1] + bias.astype(self.dtype)
        return y


class _PermRowsPointwiseConv(nn.Module):
    """1x1x1 conv whose input channels may be permuted per-sample by
    permuting the WEIGHT rows (used to restore age order over the
    fuse-history ring slots, see ops/pallas_fuse_warp.py).  Param layout
    matches ``nn.Conv`` (kernel (1, 1, 1, Cin, F), bias)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, perm=None, x2=None, perm2=None,
                 force_native: bool = False, slots_fn=None):
        if slots_fn is not None:
            # fused-epilogue path (ops/pallas_fuse_warp.py): the slots'
            # contribution `slots @ k[perm]` is computed inside the warp
            # kernel -- slots_fn receives this sample-permuted weight
            # slice and returns (contribution (B, ..., F) f32, carry).
            # x is the slots' channel count (the slots tensor itself
            # never materialises).
            Cin = int(x) + x2.shape[-1]
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (1, 1, 1, Cin, self.features))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            k = kernel.reshape(Cin, self.features).astype(self.dtype)
            part, extra = slots_fn(jnp.take(k, perm, axis=0))
            y = (part.astype(self.dtype)
                 + jnp.einsum("b...c,bco->b...o", x2.astype(self.dtype),
                              k[perm2]))
            return y + bias.astype(self.dtype), extra
        Cin = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, Cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x2 is not None:
            # split input (e.g. [history slots | curr], never concatenated
            # in HBM); perm/perm2: (B, C_x)/(B, C_x2) int32 -- row r of
            # sample b's weight for x's channel r is the shared weight's
            # row perm[b, r]
            k = kernel.reshape(Cin, self.features).astype(self.dtype)
            y = (jnp.einsum("b...c,bco->b...o", x.astype(self.dtype),
                            k[perm])
                 + jnp.einsum("b...c,bco->b...o", x2.astype(self.dtype),
                              k[perm2]))
        elif perm is None:
            if force_native or "pointwise" in _DISABLED_DECOMP:
                # native conv path (the pointwise-matmul form faults the
                # v5e worker inside full TRAIN graphs, see module header)
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    (1, 1, 1), [(0, 0)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            else:
                k = kernel.reshape(Cin, self.features).astype(self.dtype)
                y = jnp.einsum("...c,co->...o", x.astype(self.dtype), k)
        else:
            k = kernel.reshape(Cin, self.features).astype(self.dtype)
            y = jnp.einsum("b...c,bco->b...o", x.astype(self.dtype),
                           k[perm])
        return y + bias.astype(self.dtype)


class RingCatConvBN(nn.Module):
    """The SoloFusion cat conv (``ConvBN(features, 1, ndim=3,
    use_bias=True)``) with an optional per-sample input-channel
    permutation.  Param tree is identical to that ConvBN, so checkpoints
    and the torch converter are unaffected; ``perm=None`` reproduces it
    exactly."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, perm=None, x2=None,
                 perm2=None, slots_fn=None):
        conv = _PermRowsPointwiseConv(self.features, dtype=self.dtype,
                                      name="conv")
        extra = None
        if slots_fn is not None:
            y, extra = conv(x, perm, x2, perm2, slots_fn=slots_fn)
        else:
            y = conv(x, perm, x2, perm2,
                     force_native=train and _POINTWISE_EVAL_ONLY)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        return y if extra is None else (y, extra)


class TimeEmbedConvBN(nn.Module):
    """ConvBN(features, 1, ndim=3, use_bias=True) over ``concat([x, e])``
    with the concat algebraically removed -- the reference's SoloFusion
    per-keyframe time-embedding conv (fbocc.py:110-118) concatenates a
    1-channel time embedding onto the (T+1)*C-channel frame stack; at
    flagship shapes that concat rewrites ~220 MB of HBM per frame for a
    0.7% channel add (docs/PERF.md r2).  Param tree is identical to the
    ConvBN it replaces (conv/kernel (1,1,1,C+1,F), conv/bias, bn/*)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, e, train: bool = False):
        y = _SplitPointwiseConv(self.features, dtype=self.dtype,
                                name="conv")(x, e)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)
