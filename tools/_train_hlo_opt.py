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
low = jax.jit(step, donate_argnums=(0,)).lower(state_shape, micro, rng)
comp = low.compile(compiler_options={"xla_tpu_run_space_to_batch": "false"})
txt = comp.as_text()
import re
s2b = len(re.findall(r'bf16\[416,2,', txt))
print("space-to-batch-shaped ops:", s2b, flush=True)
open('/tmp/hlo_train_nos2b.txt','w').write(txt)
print("written", flush=True)
