import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
def sync(x): return np.asarray(x.ravel()[0:1])
def timeit(name, fn, *args, iters=15):
    out = fn(*args); sync(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/15*1e3:7.2f} ms")
    return out
rng = np.random.RandomState(0)
dt = jnp.bfloat16

# A) 1x1x1 conv 128->64 over 640k voxels: conv3d vs dense matmul
x = jnp.asarray(rng.randn(1,200,200,16,128).astype(np.float32)).astype(dt)
w = jnp.asarray((rng.randn(1,1,1,128,64)*0.05).astype(np.float32)).astype(dt)
@jax.jit
def conv3d_1x1(x, w):
    return lax.conv_general_dilated(x, w, (1,1,1), "VALID", dimension_numbers=("NDHWC","DHWIO","NDHWC"))
@jax.jit
def dense_1x1(x, w):
    B,Y,X,Z,C = x.shape
    return (x.reshape(-1, C) @ w.reshape(C, -1)).reshape(B,Y,X,Z,-1)
a = timeit("1x1x1 conv3d 128->64", conv3d_1x1, x, w)
b = timeit("1x1x1 as matmul", dense_1x1, x, w)
print("  diff:", float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()))

# B) deconv k2s2 256->128 as matmul + pixel shuffle
xin = jnp.asarray(rng.randn(1,100,100,8,256).astype(np.float32)).astype(dt)
wd = jnp.asarray((rng.randn(2,2,2,256,128)*0.05).astype(np.float32)).astype(dt)
import flax.linen as nn
deb = nn.ConvTranspose(128, (2,2,2), strides=(2,2,2), use_bias=False, dtype=dt)
@jax.jit
def deconv_ref(x, w):
    return deb.apply({"params": {"kernel": w}}, x)
@jax.jit
def deconv_mm(x, w):
    B,Y,X,Z,C = x.shape
    Co = w.shape[-1]
    w2 = w.reshape(8, C, Co)  # (dz*dy*dx? careful: kernel (ky,kx,kz? flax spatial dims (2,2,2)=(d1,d2,d3)
    # flax ConvTranspose k2s2: out[2i+a,2j+b,2k+c] = sum_ci x[i,j,k,ci] * w[a,b,c,ci,co]
    y = x.reshape(-1, C) @ w.reshape(-1, C, Co).transpose(1,0,2).reshape(C, 8*Co)
    y = y.reshape(B, Y, X, Z, 2,2,2, Co)
    y = jnp.transpose(y, (0,1,4,2,5,3,6,7)).reshape(B, 2*Y, 2*X, 2*Z, Co)
    return y
a = timeit("deconv k2s2 (ConvTranspose)", deconv_ref, xin, wd)
b = timeit("deconv as matmul+shuffle", deconv_mm, xin, wd)
print("  diff:", float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()))

# C) 3x3x3 conv as 3 z-slabs of 2D conv
x3 = jnp.asarray(rng.randn(1,100,100,8,256).astype(np.float32)).astype(dt)
w3 = jnp.asarray((rng.randn(3,3,3,256,128)*0.05).astype(np.float32)).astype(dt)
@jax.jit
def conv3d_ref(x, w):
    return lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3, dimension_numbers=("NDHWC","DHWIO","NDHWC"))
@jax.jit
def conv3d_as_2d(x, w):
    B,Y,X,Z,C = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0,0),(0,0),(0,0),(1,1),(0,0)))
    out = 0
    for dz in range(3):
        xs = xp[:, :, :, dz:dz+Z, :]                   # z-shifted input
        x2 = jnp.moveaxis(xs, 3, 1).reshape(B*Z, Y, X, C)
        y2 = lax.conv_general_dilated(x2, w[:, :, dz], (1,1), [(1,1)]*2,
                                      dimension_numbers=("NHWC","HWIO","NHWC"))
        out = out + jnp.moveaxis(y2.reshape(B, Z, Y, X, Co), 1, 3)
    return out
a = timeit("3x3x3 conv3d 256->128", conv3d_ref, x3, w3)
b = timeit("3x3x3 as 3x 2D convs", conv3d_as_2d, x3, w3)
print("  diff:", float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()))
