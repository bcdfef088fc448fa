import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from camradepth_tpu.config import preset
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.step import make_train_step, init_state
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle
cfg = preset("base"); mc = cfg.model
H, W = mc.img_size
model = CamRaDepth(mc)
sched = onecycle(cfg.train.learning_rate, total_steps=100, div_factor=cfg.train.div_factor)
tx = diffgrad_norm(sched, weight_decay=cfg.train.weight_decay)
rng = jax.random.PRNGKey(0)
state_shape = jax.eval_shape(lambda: init_state(cfg, model, tx, rng))
step = make_train_step(cfg, model, tx)
ACC, MB = 3, 2
micro = {
    "features": jax.ShapeDtypeStruct((ACC, MB, H, W, 7), jnp.float32),
    "gt_depth": jax.ShapeDtypeStruct((ACC, MB, H, W), jnp.float32),
}
comp = jax.jit(step, donate_argnums=(0,)).lower(state_shape, micro, rng).compile()
open('/tmp/hlo_train.txt', 'w').write(comp.as_text())
print("written", flush=True)
