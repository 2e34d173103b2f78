import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
def sync(x): return np.asarray(x.ravel()[0:1])
def timeit(name, fn, *args, iters=20):
    out = fn(*args); sync(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms")
    return out

rng = np.random.RandomState(0)
B, Y, X, Z, C = 1, 100, 100, 8, 64
x = jnp.asarray(rng.randn(B,Y,X,Z,C).astype(np.float32)).astype(jnp.bfloat16)
w3 = jnp.asarray(rng.randn(3,3,3,C,C).astype(np.float32) * 0.05).astype(jnp.bfloat16)

@jax.jit
def conv3d(x, w):
    return lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3,
        dimension_numbers=("NDHWC","DHWIO","NDHWC"))

# fold Z into channels: (B,Y,X,Z*C), 2D conv with block-banded dense weights
def fold_weights(w3):
    # w3 (kz,ky,kx,Ci,Co) -> w2 (ky,kx, Z*Ci, Z*Co)
    w3 = np.asarray(w3, np.float32)
    w2 = np.zeros((3,3,Z*C,Z*C), np.float32)
    for zo in range(Z):
        for dz in (-1,0,1):
            zi = zo+dz
            if 0 <= zi < Z:
                # output zo gets input zi with kernel tap kz=dz+1
                w2[:,:, zi*C:(zi+1)*C, zo*C:(zo+1)*C] = w3[dz+1]
    return jnp.asarray(w2).astype(jnp.bfloat16)
w2 = fold_weights(w3)
x2 = x.reshape(B,Y,X,Z*C)

@jax.jit
def conv2d_folded(x2, w2):
    return lax.conv_general_dilated(x2, w2, (1,1), [(1,1)]*2,
        dimension_numbers=("NHWC","HWIO","NHWC"))

a = timeit("conv3d 3x3x3 (64ch, z=8)", conv3d, x, w3)
b = timeit("conv2d z-folded (512ch)", conv2d_folded, x2, w2)
print("max diff:", float(jnp.abs(a.reshape(B,Y,X,Z*C).astype(jnp.float32)-b.astype(jnp.float32)).max()))

# stage2 shapes: (50,50,4,128)
Y2,X2,Z2,C2 = 50,50,4,128
xx = jnp.asarray(rng.randn(B,Y2,X2,Z2,C2).astype(np.float32)).astype(jnp.bfloat16)
ww = jnp.asarray(rng.randn(3,3,3,C2,C2).astype(np.float32)*0.05).astype(jnp.bfloat16)
timeit("conv3d 3x3x3 (128ch, z=4)", conv3d, xx, ww)
# trilinear resize cost check
from fbbev_tpu.models.layers import resize_trilinear
big = jnp.asarray(rng.randn(1,100,100,8,128).astype(np.float32))
timeit("resize100->200 trilinear", jax.jit(lambda v: resize_trilinear(v,(200,200,16))), big)
