import sys; sys.path.insert(0, '/root/repo')
import dataclasses, re
import jax, jax.numpy as jnp
from camradepth_tpu.config import preset
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.step import make_train_step, init_state
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle
cfg = preset("base")
cfg = cfg.replace(model=dataclasses.replace(cfg.model, remat_decoder=True, remat_encoder=True))
mc = cfg.model
H, W = mc.img_size
model = CamRaDepth(mc)
sched = onecycle(cfg.train.learning_rate, total_steps=100, div_factor=cfg.train.div_factor)
tx = diffgrad_norm(sched, weight_decay=cfg.train.weight_decay)
rng = jax.random.PRNGKey(0)
state_shape = jax.eval_shape(lambda: init_state(cfg, model, tx, rng))
step = make_train_step(cfg, model, tx)
micro = {
    "features": jax.ShapeDtypeStruct((1, 6, H, W, 7), jnp.float32),
    "gt_depth": jax.ShapeDtypeStruct((1, 6, H, W), jnp.float32),
}
comp = jax.jit(step, donate_argnums=(0,)).lower(state_shape, micro, rng).compile()
txt = comp.as_text()
print("s2b [416,6,:", len(re.findall(r'bf16\[416,6,', txt)),
      " natural [6,416,800:", len(re.findall(r'bf16\[6,416,800', txt)), flush=True)
