"""Exact step-FLOP report via XLA cost analysis (BASELINE.md methodology).

Prints the measured FLOPs used to derive the A100 baseline estimates:
    python scripts/flops_report.py
Runs on the CPU backend (cost analysis needs no accelerator).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
    from lightning_generative_models_tpu.registry import load_model

    rng = jax.random.PRNGKey(0)
    batch = {
        "image": np.zeros((128, 32, 32, 3), np.uint8),
        "label": np.zeros(128, np.int32),
    }

    dcgan = load_model(
        {"name": "DCGAN",
         "args": {"img_channels": 3, "img_size": 32, "latent_dim": 100}}
    )
    state = jax.jit(dcgan.init_state)(rng)
    c = jax.jit(dcgan.train_step).lower(state, batch, rng).compile().cost_analysis()
    print(f"DCGAN train step bs128: {c['flops']/1e9:.1f} GFLOP "
          f"({c['flops']/128/1e6:.1f} MFLOP/img)")

    ddpm = DDPM(img_channels=3, img_size=32, dim=64, diffusion_timesteps=1000,
                sampling_timesteps=50, use_bf16=False)
    ds = jax.jit(ddpm.init_state)(rng)
    x = jnp.zeros((64, 32, 32, 3))
    t = jnp.zeros((64,), jnp.int32)
    cf = (
        jax.jit(lambda p, x, t: ddpm.unet.apply({"params": p}, x, t))
        .lower(ds.params["model"], x, t).compile().cost_analysis()
    )
    print(f"UNet dim-64 32x32 fwd: {cf['flops']/64/1e9:.3f} GFLOP/img")

    ct = jax.jit(ddpm.train_step).lower(ds, batch, rng).compile().cost_analysis()
    print(f"DDPM train step bs128: {ct['flops']/128/1e9:.3f} GFLOP/img")

    import functools

    cg = (
        jax.jit(functools.partial(ddpm.train_step_gated, do_ema=False))
        .lower(ds, batch, rng).compile().cost_analysis()
    )
    print(f"DDPM gated (no-EMA) step bs128: {cg['flops']/1e12:.4f} TFLOP "
          f"({cg['flops']/128/1e9:.3f} GFLOP/img) — the steady-state "
          f"majority step; MFU = this / step_time / 197e12 on v5e")

    dit = DDPM(img_channels=3, img_size=32, network="dit", dim=384, depth=12,
               num_heads=6, patch_size=2, diffusion_timesteps=1000,
               num_classes=10, use_bf16=False)
    dits = jax.jit(dit.init_state)(rng)
    cdg = (
        jax.jit(functools.partial(dit.train_step_gated, do_ema=False))
        .lower(dits, batch, rng).compile().cost_analysis()
    )
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(dits.params["model"])
    )
    print(f"DiT-S/2 ({n_params/1e6:.1f}M params) gated (no-EMA) step bs128: "
          f"{cdg['flops']/1e12:.4f} TFLOP "
          f"({cdg['flops']/128/1e9:.3f} GFLOP/img)")


if __name__ == "__main__":
    main()
