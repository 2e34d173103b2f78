import time, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from fbbev_tpu.models.layers import ConvBN, resize_trilinear
def sync(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])
def timeit(name, fn, *args, iters=15):
    out = fn(*args); sync(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    print(f"{name:30s}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms")
    return out

rng = np.random.RandomState(0)
dt = jnp.bfloat16
feats = [jnp.asarray(rng.randn(1,100,100,8,256).astype(np.float32)).astype(dt),
         jnp.asarray(rng.randn(1,50,50,4,256).astype(np.float32)).astype(dt),
         jnp.asarray(rng.randn(1,25,25,2,256).astype(np.float32)).astype(dt)]

# 1. deblock deconv
deb = nn.ConvTranspose(128, (2,2,2), strides=(2,2,2), use_bias=False, dtype=dt)
vd = deb.init(jax.random.PRNGKey(0), feats[0])
timeit("deblock deconv", jax.jit(lambda v,x: deb.apply(v,x)), vd, feats[0])

# 2. occ convs (3x3x3 256->128) at the 3 resolutions
oc = ConvBN(128, 3, padding=1, ndim=3, dtype=dt)
vo = oc.init(jax.random.PRNGKey(0), feats[0])
timeit("occ_conv level0 (100^2x8)", jax.jit(lambda v,x: oc.apply(v,x,False)), vo, feats[0])
vo1 = oc.init(jax.random.PRNGKey(0), feats[1])
timeit("occ_conv level1 (50^2x4)", jax.jit(lambda v,x: oc.apply(v,x,False)), vo1, feats[1])

# 3. resizes to (200,200,16)
small = jnp.asarray(rng.randn(1,100,100,8,128).astype(np.float32)).astype(dt)
timeit("resize 100->200 (bf16)", jax.jit(lambda x: resize_trilinear(x,(200,200,16))), small)
tiny = jnp.asarray(rng.randn(1,50,50,4,128).astype(np.float32)).astype(dt)
timeit("resize 50->200 (bf16)", jax.jit(lambda x: resize_trilinear(x,(200,200,16))), tiny)

# 4. weighted sum of 4 big volumes + pred convs
bigs = [jnp.asarray(rng.randn(1,200,200,16,128).astype(np.float32)).astype(dt) for _ in range(2)]
w = jnp.asarray(rng.rand(1,200,200,16,4).astype(np.float32)).astype(dt)
@jax.jit
def wsum(a, b, w):
    return a*w[...,0:1] + b*w[...,1:2] + a*w[...,2:3] + b*w[...,3:4]
timeit("weighted sum 4x(200^2x16x128)", wsum, bigs[0], bigs[1], w)
pred1 = ConvBN(64, 1, padding=0, ndim=3, dtype=dt)
vp = pred1.init(jax.random.PRNGKey(0), bigs[0])
timeit("pred conv1 1x1 (640k vox)", jax.jit(lambda v,x: pred1.apply(v,x,False)), vp, bigs[0])

# manual 2x trilinear upsample via repeat+shift-lerp (exact for align_corners=False)
@jax.jit
def up2x(x):
    # out[2i]=0.75x[i]+0.25x[i-1]; out[2i+1]=0.75x[i]+0.25x[i+1] per dim
    def up1(x, axis):
        xm = jnp.concatenate([jnp.take(x, jnp.asarray([0]), axis), jnp.moveaxis(jnp.moveaxis(x, axis, 0)[:-1], 0, axis)], axis)
        xp = jnp.concatenate([jnp.moveaxis(jnp.moveaxis(x, axis, 0)[1:], 0, axis), jnp.take(x, jnp.asarray([-1]), axis)], axis)
        a = 0.75*x + 0.25*xm
        b = 0.75*x + 0.25*xp
        stacked = jnp.stack([a, b], axis+1)
        shp = list(x.shape); shp[axis] *= 2
        return stacked.reshape(shp)
    for ax in (1,2,3): x = up1(x, ax)
    return x
o = timeit("manual 2x upsample", up2x, small)
ref = resize_trilinear(small.astype(jnp.float32), (200,200,16))
print("manual vs resize max diff:", float(jnp.abs(o.astype(jnp.float32)-ref).max()))
