import time, numpy as np, jax, jax.numpy as jnp
from gluefactory_tpu.ops.pallas_attention import fused_attention
from gluefactory_tpu.ops.attention import masked_attention

rng = np.random.RandomState(0)
B,H,N,D = 8,4,1024,64
q = jnp.asarray(rng.randn(B,H,N,D), jnp.float32)
k = jnp.asarray(rng.randn(B,H,N,D), jnp.float32)
v = jnp.asarray(rng.randn(B,H,N,D), jnp.float32)
mask = jnp.asarray(rng.rand(B,N) > 0.2)
out = fused_attention(q,k,v,mask)
ref = masked_attention(q,k,v,mask, impl="xla")
print("err:", float(jnp.max(jnp.abs(out-ref))))

ITERS = 16
qs = jnp.asarray(rng.randn(ITERS,B,H,N,D), jnp.bfloat16)
ks = jnp.asarray(rng.randn(ITERS,B,H,N,D), jnp.bfloat16)
vs = jnp.asarray(rng.randn(ITERS,B,H,N,D), jnp.bfloat16)

floor_jit = jax.jit(lambda x: x + 1)
float(jax.device_get(floor_jit(jnp.float32(0))))
fs=[]
for i in range(7):
    t0=time.perf_counter(); float(jax.device_get(floor_jit(jnp.float32(i)))); fs.append(time.perf_counter()-t0)
floor=float(np.median(fs)); print("floor ms:", floor*1e3)

def bench(label, fn):
    def scan_fn(qx, kx, vx):
        def body(c, x):
            qq, kk, vv = x
            o = fn(qq, kk, vv, mask)
            return c + jnp.sum(o[..., 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), (qx, kx, vx))[0]
    f = jax.jit(scan_fn)
    float(jax.device_get(f(qs, ks, vs)))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(jax.device_get(f(qs,ks,vs))); ts.append(time.perf_counter()-t0)
    print(label, (np.median(ts)-floor)/ITERS*1e3, "ms/call")

bench("fused_pallas", fused_attention)
bench("xla", lambda *a: masked_attention(*a, impl="xla"))
