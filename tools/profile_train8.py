"""Effective-batch-6 step as one microbatch padded to 8, with remats."""
import sys, time, dataclasses; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from camradepth_tpu.config import preset
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.step import make_train_step, init_state
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle

REMAT_DEC = True
cfg = preset("base")
cfg = cfg.replace(
    model=dataclasses.replace(cfg.model, remat_encoder=True,
                              remat_decoder=REMAT_DEC),
    train=dataclasses.replace(cfg.train, batch_size=6,
                              pad_microbatch_to=8),
)
mc = cfg.model
H, W = mc.img_size
model = CamRaDepth(mc)
sched = onecycle(cfg.train.learning_rate, total_steps=100,
                 div_factor=cfg.train.div_factor)
tx = diffgrad_norm(sched, weight_decay=cfg.train.weight_decay)
rng = jax.random.PRNGKey(0)
state = init_state(cfg, model, tx, rng)
step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

micro = {
    "features": jax.random.normal(rng, (1, 6, H, W, 7), jnp.float32),
    "gt_depth": jnp.abs(jax.random.normal(rng, (1, 6, H, W), jnp.float32)) * 0.1,
}
print("compiling b6->8 padded...", flush=True)
state, m = step(state, micro, rng)
np.asarray(m["loss"])
print("compiled", flush=True)
for _ in range(2):
    state, m = step(state, micro, rng)
np.asarray(m["loss"])
t0 = time.perf_counter()
K = 5
for _ in range(K):
    state, m = step(state, micro, rng)
np.asarray(m["loss"])
print(f"step time b6pad8: {(time.perf_counter()-t0)/K*1000:.1f} ms", flush=True)
print("DONE", flush=True)
