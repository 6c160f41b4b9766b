"""Capture a fresh jax.profiler trace of the flagship DDPM train step.

Usage: python scripts/profile_step.py [outdir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(__file__), "..", "experiments", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM

args = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--dit" in sys.argv:
    # DiT-S/2 conditional (the bench_dit_train model) instead of the UNet.
    out = args[0] if args else "experiments/DiT/profile_r3"
    model = DDPM(img_channels=3, img_size=32, network="dit", dim=384,
                 depth=12, num_heads=6, patch_size=2,
                 diffusion_timesteps=1000, num_classes=10, use_bf16=True)
else:
    out = args[0] if args else "experiments/DDPM/profile_r3"
    model = DDPM(img_channels=3, img_size=32, dim=64, diffusion_timesteps=1000,
                 sampling_timesteps=50, use_bf16=True)
rng = jax.random.PRNGKey(0)
state = jax.jit(model.init_state)(rng)
rs = np.random.RandomState(0)
batch = jax.tree_util.tree_map(jax.device_put, {
    "image": rs.randint(0, 256, size=(128, 32, 32, 3), dtype=np.uint8),
    "label": rs.randint(0, 10, size=128).astype(np.int32),
})
import functools
# Profile the steady-state majority step (host-gated EMA: do_ema=False on
# 9 of 10 steps past warmup), i.e. what a long training run mostly executes.
# Pass --ema to profile the do_ema=True variant instead.
do_ema = "--ema" in sys.argv
step = jax.jit(functools.partial(model.train_step_gated, do_ema=do_ema),
               donate_argnums=0)
state = state.replace(step=jnp.asarray(1000, jnp.int32))

def readback(m):
    return float(np.asarray(jnp.ravel(jax.tree_util.tree_leaves(m)[0])[0]))

m = None
for _ in range(6):
    state, m = step(state, batch, rng)
readback(m)
jax.profiler.start_trace(out)
for _ in range(3):
    state, m = step(state, batch, rng)
readback(m)
jax.profiler.stop_trace()
print("trace written to", out)
