"""Camera-aware depth network (CM_DepthNet).

Parity reference: ``/root/reference/mmdet3d/models/fbbev/modules/depth_net.py``:

* 27-dim camera vector (intrinsics, image-aug homography, BDA, sensor2ego)
  -> BatchNorm1d -> two MLP+SE branches modulating a shared reduced feature
  (:258-366, :369-393)
* context head: 1x1 conv -> 80 channels
* depth head: 3x BasicBlock -> ASPP -> 1x1 conv -> 80 depth bins, softmax
* depth supervision: min-pool downsampled LiDAR depth -> one-hot bins,
  binary cross entropy over foreground pixels (:396-450)

Numerically sensitive pieces (softmax, loss) stay in float32 regardless of
the module compute dtype, mirroring the reference's ``@force_fp32`` policy.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fbbev_tpu.models.layers import BasicBlock2D, ConvBN, Mlp, SELayer
from fbbev_tpu.registry import HEADS


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (dilations 1/6/12/18 + global pool)."""

    mid_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.mid_channels
        b1 = ConvBN(m, 1, padding=0, dtype=self.dtype, name="aspp1")(x, train)
        b2 = ConvBN(m, 3, padding=6, dilation=6, dtype=self.dtype,
                    name="aspp2")(x, train)
        b3 = ConvBN(m, 3, padding=12, dilation=12, dtype=self.dtype,
                    name="aspp3")(x, train)
        b4 = ConvBN(m, 3, padding=18, dilation=18, dtype=self.dtype,
                    name="aspp4")(x, train)
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBN(m, 1, padding=0, dtype=self.dtype, name="gap")(gp, train)
        gp = jnp.broadcast_to(gp, b4.shape)
        y = jnp.concatenate([b1, b2, b3, b4, gp], axis=-1)
        y = ConvBN(m, 1, padding=0, dtype=self.dtype, name="proj")(y, train)
        # reference applies Dropout(0.5) here; intentionally omitted --
        # dropout inside the depth head hurts determinism and the released
        # recipe evaluates with it disabled anyway.
        return y


@HEADS.register
class CM_DepthNet(nn.Module):
    in_channels: int = 256
    mid_channels: int = 512
    context_channels: int = 80
    depth_channels: int = 80
    downsample: int = 16
    depth_bounds: Tuple[float, float, float] = (2.0, 42.0, 0.5)
    loss_depth_weight: float = 1.0
    use_aspp: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        """Args:
          x: (B, N, H, W, C) image features.
          mlp_input: (B, N, 27) camera vector.

        Returns:
          context: (B, N, H, W, context_channels)
          depth:   (B, N, depth_channels, H, W) softmax distribution (f32)
        """
        B, N, H, W, C = x.shape
        x = x.reshape(B * N, H, W, C)
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="param_bn")(mlp_input.reshape(B * N, -1))

        x = ConvBN(self.mid_channels, 3, padding=1, dtype=self.dtype,
                   name="reduce_conv")(x, train)

        context_se = Mlp(self.mid_channels, self.mid_channels,
                         name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, name="context_se")(x, context_se)
        context = nn.Conv(self.context_channels, (1, 1), use_bias=True,
                          dtype=self.dtype, name="context_conv")(context)

        depth_se = Mlp(self.mid_channels, self.mid_channels,
                       name="depth_mlp")(mlp_input)
        d = SELayer(self.mid_channels, name="depth_se")(x, depth_se)
        for i in range(3):
            d = BasicBlock2D(self.mid_channels, dtype=self.dtype,
                             name=f"depth_block{i}")(d, train)
        if self.use_aspp:
            d = ASPP(self.mid_channels, dtype=self.dtype, name="aspp")(
                d, train)
        d = nn.Conv(self.depth_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="depth_conv")(d)

        depth = jax.nn.softmax(d.astype(jnp.float32), axis=-1)
        context = context.reshape(B, N, H, W, self.context_channels)
        # depth returned channels-first over bins: (B, N, D, H, W)
        depth = jnp.transpose(
            depth.reshape(B, N, H, W, self.depth_channels), (0, 1, 4, 2, 3))
        return context, depth


@HEADS.register
class CM_ContextNet(nn.Module):
    """Camera-aware context-only head (no depth branch).

    Parity reference: ``depth_net.py:455-500`` — reduce_conv (3x3 ConvBN)
    -> camera-MLP SE modulation -> 1x1 context conv.  Used by configs that
    take depth from elsewhere (e.g. a frozen depth net) but still need the
    camera-conditioned context features.
    """

    in_channels: int = 512
    mid_channels: int = 512
    context_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        """Args:
          x: (B, N, H, W, C) image features.
          mlp_input: (B, N, 27) camera vector.

        Returns:
          context: (B, N, H, W, context_channels)
        """
        B, N, H, W, C = x.shape
        x = x.reshape(B * N, H, W, C)
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="param_bn")(mlp_input.reshape(B * N, -1))
        x = ConvBN(self.mid_channels, 3, padding=1, dtype=self.dtype,
                   name="reduce_conv")(x, train)
        context_se = Mlp(self.mid_channels, self.mid_channels,
                         name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, name="context_se")(x, context_se)
        context = nn.Conv(self.context_channels, (1, 1), use_bias=True,
                          dtype=self.dtype, name="context_conv")(context)
        return context.reshape(B, N, H, W, self.context_channels)


def get_mlp_input(cam) -> jnp.ndarray:
    """27-dim camera vector per (sample, camera).

    Order matches ``depth_net.py:369-393``: [fx, fy, cx, cy,
    post_rot(00,01), post_tran_x, post_rot(10,11), post_tran_y,
    bda(00,01,10,11,22), sensor2ego (3x4 row-major)].
    """
    B, N = cam.trans.shape[:2]
    bda = jnp.broadcast_to(cam.bda[:, None], (B, N, 3, 3))
    head = jnp.stack(
        [
            cam.intrins[..., 0, 0], cam.intrins[..., 1, 1],
            cam.intrins[..., 0, 2], cam.intrins[..., 1, 2],
            cam.post_rots[..., 0, 0], cam.post_rots[..., 0, 1],
            cam.post_trans[..., 0],
            cam.post_rots[..., 1, 0], cam.post_rots[..., 1, 1],
            cam.post_trans[..., 1],
            bda[..., 0, 0], bda[..., 0, 1], bda[..., 1, 0], bda[..., 1, 1],
            bda[..., 2, 2],
        ],
        axis=-1,
    )
    sensor2ego = jnp.concatenate(
        [cam.rots, cam.trans[..., None]], axis=-1).reshape(B, N, 12)
    return jnp.concatenate([head, sensor2ego], axis=-1)


def downsample_gt_depth(gt_depth: jnp.ndarray, downsample: int,
                        depth_bounds: Tuple[float, float, float],
                        depth_channels: int) -> jnp.ndarray:
    """Min-pool GT depth to the feature resolution and one-hot the bin.

    Returns (B*N*h*w, depth_channels) one-hot (all-zero rows = background),
    matching ``depth_net.py:396-434`` (zeros are treated as +inf for the
    min, bin = (d - (lo - step)) / step, out-of-range -> 0 -> dropped by the
    leading-column slice of the one-hot).
    """
    B, N, H, W = gt_depth.shape
    ds = downsample
    g = gt_depth.reshape(B * N, H // ds, ds, W // ds, ds)
    g = jnp.transpose(g, (0, 1, 3, 2, 4)).reshape(-1, ds * ds)
    g = jnp.where(g == 0.0, 1e5, g)
    g = jnp.min(g, axis=-1)
    lo, _hi, step = depth_bounds
    g = (g - (lo - step)) / step
    g = jnp.where((g < depth_channels + 1) & (g >= 0.0), g, 0.0)
    onehot = jax.nn.one_hot(g.astype(jnp.int32), depth_channels + 1)
    return onehot[:, 1:]


def depth_loss(gt_depth: jnp.ndarray, depth_pred: jnp.ndarray,
               downsample: int, depth_bounds, loss_weight: float = 1.0):
    """BCE between predicted depth distribution and one-hot GT over
    foreground pixels (``depth_net.py:436-450``)."""
    D = depth_pred.shape[2]
    labels = downsample_gt_depth(gt_depth, downsample, depth_bounds, D)
    preds = jnp.transpose(depth_pred, (0, 1, 3, 4, 2)).reshape(-1, D)
    preds = preds.astype(jnp.float32)
    fg = jnp.max(labels, axis=1) > 0.0
    eps = 1e-7
    p = jnp.clip(preds, eps, 1.0 - eps)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    bce = jnp.sum(bce * fg[:, None])
    return loss_weight * bce / jnp.maximum(1.0, jnp.sum(fg))
