"""Lift-Splat-Shoot forward projection (3D voxel output).

Parity reference: ``LSSViewTransformerFunction3D``
(``/root/reference/mmdet3d/models/fbbev/view_transformation/forward_projection/view_transformer.py:316-663``).

TPU-native formulation: the reference filters/sorts frustum points into
dynamic-length voxel intervals and runs a CUDA interval kernel; here every
frustum point is kept (static shape), invalid points route to a dump
segment, and the pooling is a (sorted) segment-sum -- see
``fbbev_tpu.ops.bev_pool``.  There are no parameters; this is a pure
geometry + pooling function packaged as a module for registry/config use.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fbbev_tpu import geometry
from fbbev_tpu.ops.bev_pool import lss_voxel_pool
from fbbev_tpu.registry import NECKS


@NECKS.register
class LSSViewTransformer3D:
    def __init__(self, grid_config, input_size: Tuple[int, int],
                 downsample: int = 16, extra_relu: bool = False):
        self.grid_config = dict(grid_config)
        self.input_size = tuple(input_size)
        self.downsample = downsample
        self.extra_relu = extra_relu
        self.dx, self.bx, self.nx = geometry.gen_dx_bx(
            grid_config["x"], grid_config["y"], grid_config["z"])
        self.grid_lower = [grid_config["x"][0], grid_config["y"][0],
                           grid_config["z"][0]]
        self.grid_interval = [grid_config["x"][2], grid_config["y"][2],
                              grid_config["z"][2]]
        self.grid_size = tuple(int(n) for n in self.nx)  # (nx, ny, nz)
        self.frustum = geometry.create_frustum(
            grid_config["depth"], self.input_size, downsample)
        self.D = self.frustum.shape[0]

    def __call__(self, cam: geometry.CamParams, context: jnp.ndarray,
                 depth: jnp.ndarray) -> jnp.ndarray:
        """Args:
          cam: camera parameters.
          context: (B, N, fH, fW, C) context features.
          depth: (B, N, D, fH, fW) softmax depth distribution.

        Returns:
          (B, Y, X, Z, C) voxel features (channels last).
        """
        coor = geometry.frustum_to_ego(jnp.asarray(self.frustum), cam)
        bev = lss_voxel_pool(
            coor, depth.astype(jnp.float32), context.astype(jnp.float32),
            self.grid_lower, self.grid_interval, self.grid_size)
        if self.extra_relu:
            bev = jnp.maximum(bev, 0.0)
        return bev
