import sys, time; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from camradepth_tpu.ops.conv_fused import Source, conv3x3_fused, conv3x3_reference
bf = jnp.bfloat16
B, H, W = 8, 416, 800

def mk(layer):
    keys = jax.random.split(jax.random.PRNGKey(layer), 12)
    # (C_array, valid, affine?) mirroring the du4 integration plan:
    # conv1: up_d 128 (DMA) + small skip 8 (blocked); conv2/3 add the
    # previous raw outputs, 128-padded with 96/64 valid channels.
    specs = [(128, 128, False), (8, 8, False)]
    if layer >= 2: specs.append((128, 96, True))
    if layer >= 3: specs.append((128, 64, True))
    n = {1: 96, 2: 64, 3: 128}[layer]
    flat, affs = [], []
    for idx, (c, valid, aff) in enumerate(specs):
        x = (jax.random.normal(keys[idx], (B, H, W, c))*0.5).astype(bf)
        if valid < c:
            x = x.at[..., valid:].set(0)
        flat.append(x)
        if aff:
            affs.append((jax.random.normal(keys[4+idx], (B, valid))*0.2+1.0,
                         jax.random.normal(keys[8+idx], (B, valid))*0.1))
        else:
            affs.append(None)
    wgt = jax.random.normal(keys[11], (3, 3, sum(v for _, v, _ in specs), n), jnp.float32)*0.05
    return specs, flat, affs, wgt

def build(specs, affs, fn):
    def f(*args):
        xs = args[:len(specs)]
        rest = list(args[len(specs):-1])
        wgt = args[-1]
        srcs = []
        for (c, valid, aff), x in zip(specs, xs):
            if aff:
                sc, sh = rest.pop(0), rest.pop(0)
                srcs.append(Source(x, sc, sh, True, valid))
            else:
                srcs.append(Source(x, valid=valid))
        return fn(srcs, wgt)
    return jax.jit(f)

def timeit(f, flat, K=8):
    o = f(*flat); np.asarray(o[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(K):
        o = f(*flat); np.asarray(o[0][0, 0, 0])
    return (time.perf_counter()-t0)/K

for layer in (3, 2, 1):
    specs, flat, affs, wgt = mk(layer)
    args = list(flat)
    for a in affs:
        if a is not None: args.extend(a)
    args.append(wgt)
    f_pal = build(specs, affs, conv3x3_fused)
    f_ref = build(specs, affs, conv3x3_reference)
    r2 = f_pal(*args); np.asarray(r2[0][0,0,0]); print(f"layer{layer} pallas compiled", flush=True)
    r1 = f_ref(*args)
    nv = r1[0].shape[-1]
    err = float(jnp.abs(r1[0].astype(jnp.float32)-r2[0][..., :nv].astype(jnp.float32)).max())
    serr = float(jnp.abs(r1[1]-r2[1]).max() / (jnp.abs(r1[1]).max()+1e-9))
    t_pal = timeit(f_pal, args)
    t_ref = timeit(f_ref, args)
    print(f"layer{layer}: maxerr {err:.4g} relsumerr {serr:.2g} xla {t_ref*1000/B:.3f} pallas {t_pal*1000/B:.3f} ms/frame", flush=True)
print("DONE", flush=True)
