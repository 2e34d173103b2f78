"""Ad-hoc TPU check: fused fuse_history kernel vs XLA fallback at
flagship shapes, streaming 3 frames.  Run from the repo root."""
import os
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "both"

import jax
import jax.numpy as jnp

from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state


def make_batch(seed, start, B=1, N=6):
    from fbbev_tpu import geometry
    rng = np.random.RandomState(seed)
    intr = np.diag([560.0, 560.0, 1.0]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 352.0, 128.0
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    rots = np.stack([geometry.rot_z(a) for a in angles])[None]
    post_rot = (np.eye(3) * 0.44 + np.diag([0.0, 0.0, 0.56])).astype(
        np.float32)
    c2p = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    if not start:
        th = 0.01 * seed
        c2p[:, 0, 0] = c2p[:, 1, 1] = np.cos(th)
        c2p[:, 0, 1], c2p[:, 1, 0] = -np.sin(th), np.sin(th)
        c2p[:, :3, 3] = rng.randn(B, 3) * 0.05
    return dict(
        imgs=jnp.asarray(rng.randn(B, N, 256, 704, 3).astype(np.float32)),
        rots=jnp.asarray(rots.astype(np.float32)),
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.asarray(post_rot), (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        start_of_sequence=jnp.full((B,), start, bool),
        sequence_group_idx=jnp.zeros((B,), jnp.int32),
        curr_to_prev_ego_rt=jnp.asarray(c2p),
    )


model = FBOCC(dtype=jnp.bfloat16)
state0 = init_temporal_state(1, (100, 100, 8), 16, 80, dtype=jnp.bfloat16)
batches = [make_batch(0, True)] + [make_batch(i, False) for i in (1, 2)]
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0], state0)


@jax.jit
def infer(variables, batch, state):
    outputs, new_state = model.apply(variables, batch, state, train=False)
    return outputs["occ_logits"], new_state


def stream(tag):
    state = init_temporal_state(1, (100, 100, 8), 16, 80,
                                dtype=jnp.bfloat16)
    outs = []
    t0 = time.perf_counter()
    for b in batches:
        lo, state = infer(variables, b, state)
        outs.append(np.asarray(lo.astype(jnp.float32)))
    print(f"{tag}: 3 frames in {time.perf_counter()-t0:.1f}s "
          f"(incl. compile)", flush=True)
    return outs


if mode == "fused":
    assert os.environ.get("FBBEV_DISABLE_FUSE_WARP") != "1"
    np.save("/tmp/fused_logits.npy", np.stack(stream("fused")))
elif mode == "fallback":
    assert os.environ.get("FBBEV_DISABLE_FUSE_WARP") == "1"
    np.save("/tmp/fb_logits.npy", np.stack(stream("fallback")))
elif mode == "compare":
    a = np.load("/tmp/fused_logits.npy")
    b = np.load("/tmp/fb_logits.npy")
    for i in range(a.shape[0]):
        d = np.abs(a[i] - b[i])
        agree = (a[i].argmax(-1) == b[i].argmax(-1)).mean()
        print(f"frame {i}: max|dlogit|={d.max():.4f} "
              f"mean={d.mean():.5f} argmax agree={agree:.5f}")
print("ok", flush=True)
