"""VAE: math golden tests + overfit + checkpoint round-trip + determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.data.datamodule import DataModule
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.checkpoint import CheckpointManager


def make_vae():
    return load_model(
        {
            "name": "VAE",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 8,
                "lr": 2e-3,
                "kld_weight": 1e-2,
            },
        }
    )


def fixed_batch(bs=16):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randint(0, 256, size=(bs, 28, 28, 1), dtype=np.uint8),
        "label": rng.randint(0, 10, size=bs).astype(np.int32),
    }


def test_reparameterize_stats(rng):
    model = make_vae()
    mu = jnp.full((4096, 8), 1.5)
    log_var = jnp.full((4096, 8), jnp.log(0.25))
    z = model.reparameterize(mu, log_var, rng)
    assert abs(float(z.mean()) - 1.5) < 0.05
    assert abs(float(z.std()) - 0.5) < 0.05


def test_kld_golden(rng):
    """KLD of N(0, I) vs prior is 0; matches the closed form used by the
    reference (vae.py:166)."""
    model = make_vae()
    state = model.init_state(rng)
    mu = jnp.zeros((2, 8))
    log_var = jnp.zeros((2, 8))
    kld = -0.5 * jnp.mean(1 + log_var - mu**2 - jnp.exp(log_var))
    assert float(kld) == 0.0


def test_overfit_loss_decreases(rng):
    model = make_vae()
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for i in range(60):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["train_loss"])
    last = float(metrics["train_loss"])
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"


def test_train_step_deterministic(rng):
    model = make_vae()
    batch = fixed_batch()
    outs = []
    for _ in range(2):
        state = model.init_state(rng)
        state, metrics = jax.jit(model.train_step)(state, batch, rng)
        outs.append(float(metrics["train_loss"]))
    assert outs[0] == outs[1]


def test_sample_shape_and_range(rng):
    model = make_vae()
    state = model.init_state(rng)
    images = model.sample(state, rng, 4)
    assert images.shape == (4, 28, 28, 1)
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0


def test_checkpoint_roundtrip(rng, tmp_path):
    model = make_vae()
    state = model.init_state(rng)
    state, _ = jax.jit(model.train_step)(state, fixed_batch(), rng)

    mgr = CheckpointManager(tmp_path, monitor="val_loss")
    mgr.save_last(state, step=1, epoch=0)
    template = model.init_state(rng)
    restored, step, epoch = mgr.restore(template)
    assert step == 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )


def test_eval_step_keys(rng):
    model = make_vae()
    state = model.init_state(rng)
    metrics = jax.jit(model.eval_step)(state, fixed_batch(), rng)
    assert {"val_loss", "val_recon_loss", "val_kld"} <= set(metrics.keys())
