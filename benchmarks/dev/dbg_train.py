import sys, types, faulthandler
faulthandler.enable()
import jax
jax.config.update("jax_platforms", "cpu")
print("devices:", jax.devices(), flush=True)
from threedhumangan_tpu import configs
from threedhumangan_tpu.trainers import TRAINERS
opt = types.SimpleNamespace(config="MAP3DBN_TINY", tune="", variant=0, output_dir="/tmp/smoke2",
                            n_epochs=2, sample_interval=1000, model_save_interval=1000,
                            model_keep_interval=5000, bs_factor=1, seed=0)
cfg = configs.get_config(opt)
t = TRAINERS[cfg["trainer"]](0, 1, opt, cfg)
print("init ok", flush=True)
t.run(max_steps=2)
print("run ok, step =", t.step, flush=True)
