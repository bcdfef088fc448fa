import sys, time; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from camradepth_tpu.ops.conv_fused import Source, conv3x3_fused, conv3x3_reference
bf = jnp.bfloat16
B, H, W = 1, 416, 800
SCAN = 8

def mk(layer):
    keys = jax.random.split(jax.random.PRNGKey(layer), 12)
    specs = [(128, 128, False), (8, 8, False)]
    if layer >= 2: specs.append((128, 96, True))
    if layer >= 3: specs.append((128, 64, True))
    n = {1: 96, 2: 64, 3: 128}[layer]
    xs, affs = [], []
    for idx, (c, valid, aff) in enumerate(specs):
        x = (jax.random.normal(keys[idx], (B, H, W, c))*0.5).astype(bf)
        if valid < c: x = x.at[..., valid:].set(0)
        xs.append(x)
        affs.append((jax.random.normal(keys[4+idx], (B, valid))*0.2+1.0,
                     jax.random.normal(keys[8+idx], (B, valid))*0.1) if aff else None)
    wgt = jax.random.normal(keys[11], (3, 3, sum(v for _, v, _ in specs), n), jnp.float32)*0.05
    return specs, xs, affs, wgt

def timed(fn, specs, xs, affs, wgt):
    def many(xs, wgt, eps):
        def body(c, e):
            srcs = []
            for (cc, valid, aff), x, a in zip(specs, xs, affs):
                xe = (x + e).astype(x.dtype)
                srcs.append(Source(xe, a[0], a[1], True, valid) if aff
                            else Source(xe, valid=valid))
            r = fn(srcs, wgt)
            return c + r[0].astype(jnp.float32).mean() + r[1].mean(), None
        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s
    mj = jax.jit(many)
    eps = (jax.random.normal(jax.random.PRNGKey(9), (SCAN,)) * 1e-3).astype(bf)
    np.asarray(mj(xs, wgt, eps))
    t0 = time.perf_counter(); np.asarray(mj(xs, wgt, eps)); dt = time.perf_counter()-t0
    return dt / SCAN / B * 1000

for layer in (3, 2, 1):
    specs, xs, affs, wgt = mk(layer)
    t_pal = timed(conv3x3_fused, specs, xs, affs, wgt)
    print(f"layer{layer} pallas {t_pal:.3f} ms/frame", flush=True)
    t_ref = timed(conv3x3_reference, specs, xs, affs, wgt)
    print(f"layer{layer} xla    {t_ref:.3f} ms/frame", flush=True)
print("DONE", flush=True)
