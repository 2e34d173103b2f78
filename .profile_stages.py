import time, numpy as np, jax, jax.numpy as jnp
from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu import geometry

def sync(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

rng = np.random.RandomState(0)
B,N = 1,6
intr = np.diag([560.,560.,1.]).astype(np.float32); intr[0,2]=352.; intr[1,2]=128.
rots = np.stack([geometry.rot_z(a) for a in np.linspace(0,2*np.pi,N,endpoint=False)])[None]
batch = dict(imgs=jnp.asarray(rng.randn(B,N,256,704,3).astype(np.float32)),
    rots=jnp.asarray(rots.astype(np.float32)), trans=jnp.zeros((B,N,3)),
    intrins=jnp.broadcast_to(jnp.asarray(intr),(B,N,3,3)),
    post_rots=jnp.broadcast_to(jnp.asarray((np.eye(3)*0.44+np.diag([0,0,.56])).astype(np.float32)),(B,N,3,3)),
    post_trans=jnp.zeros((B,N,3)), bda=jnp.broadcast_to(jnp.eye(3),(B,3,3)),
    start_of_sequence=jnp.zeros((B,),bool), sequence_group_idx=jnp.zeros((B,),jnp.int32),
    curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4),(B,4,4)))
model = FBOCC(dtype=jnp.bfloat16)
state = init_temporal_state(B,(100,100,8),16,80)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch, state)

cam = geometry.CamParams(batch["rots"],batch["trans"],batch["intrins"],batch["post_rots"],batch["post_trans"],batch["bda"])

def bind(v):
    return model.bind(v)
m = bind(variables)

@jax.jit
def stage_img(v, imgs, b):
    m = model.bind(v)
    feats = m.image_encoder(imgs, False)
    from fbbev_tpu.models.depth_net import get_mlp_input
    cam = geometry.CamParams(b["rots"],b["trans"],b["intrins"],b["post_rots"],b["post_trans"],b["bda"])
    mlp = get_mlp_input(cam)
    context, depth = m.depth_net(feats, mlp, False)
    return context, depth

@jax.jit
def stage_lss(v, b, context, depth):
    m = model.bind(v)
    cam = geometry.CamParams(b["rots"],b["trans"],b["intrins"],b["post_rots"],b["post_trans"],b["bda"])
    return m.forward_projection(cam, context, depth)

@jax.jit
def stage_bwd(v, b, context, depth, bev):
    m = model.bind(v)
    cam = geometry.CamParams(b["rots"],b["trans"],b["intrins"],b["post_rots"],b["post_trans"],b["bda"])
    lss_bev = jnp.mean(bev, axis=3)
    return m.backward_projection(context, lss_bev.astype(jnp.bfloat16), cam, depth, False)

@jax.jit
def stage_tail(v, b, bev, state):
    m = model.bind(v)
    fused, ns, _ = m.fuse_history(bev, state, b, b["bda"], True, False)
    x = m.img_bev_encoder_backbone(fused.astype(jnp.float32), False)
    vox = m.img_bev_encoder_neck(x, False)
    return m.occupancy_head(vox, False), ns

def timeit(name, fn, *args, iters=10):
    out = fn(*args); sync(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    print(f"{name:12s}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms")
    return out

ctx_depth = timeit("img+depth", stage_img, variables, batch["imgs"], batch)
context, depth = ctx_depth
bev = timeit("lss_pool", stage_lss, variables, batch, context, depth)
refined = timeit("backward", stage_bwd, variables, batch, context, depth, bev)
tail = timeit("fuse+enc+occ", stage_tail, variables, batch, bev, state)
