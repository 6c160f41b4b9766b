"""Scan-based gradient accumulation: fixed-memory micro-batch grad sums.

Reference semantics: Lightning's ``accumulate_grad_batches``
(/root/reference/train.py:39,129) — k micro-batch gradients are averaged
before one optimizer step. The concat path is exact for mean losses; the scan
path here is the memory-bounded equivalent (peak activations = one
micro-batch). Equivalence is provable bit-close only for rng-free losses
(PixelCNN) — rng-consuming losses draw different noise per micro-batch by
design, like Lightning does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.data.datamodule import DataModule
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.trainer import Trainer


def _pixelcnn():
    return load_model(
        {
            "name": "PixelCNN",
            "args": {"img_channels": 1, "img_size": 8, "hidden_dim": 16,
                     "num_layers": 2, "lr": 1e-3},
        }
    )


def _micro_batches(k, b, hw=8, c=1):
    return [
        {
            "image": np.random.RandomState(i).randint(
                0, 256, (b, hw, hw, c)
            ).astype(np.uint8),
            "label": np.zeros((b,), np.int32),
        }
        for i in range(k)
    ]


def test_scan_accum_matches_concat_when_loss_is_rng_free():
    """PixelCNN's loss consumes no rng, so mean-of-micro-grads == grad of the
    concat batch up to float association; one Adam step must then agree."""
    model = _pixelcnn()
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    k, b = 4, 8
    micros = _micro_batches(k, b)

    concat = {key: np.concatenate([m[key] for m in micros]) for key in micros[0]}
    s_concat, _ = jax.jit(model.train_step)(state, concat, rng)

    stacked = {key: np.stack([m[key] for m in micros]) for key in micros[0]}
    trainer = Trainer.__new__(Trainer)  # borrow only the step factory
    trainer.model = model
    trainer.accumulate_grad_batches = k
    scan_step = jax.jit(trainer._make_scan_accum_step())
    s_scan, metrics = scan_step(state, stacked, rng)

    for a, b_ in zip(
        jax.tree_util.tree_leaves(s_concat.params),
        jax.tree_util.tree_leaves(s_scan.params),
    ):
        # Float association through Adam's grad normalization: ~1e-6 abs.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-5)
    assert int(s_scan.step) == 1
    assert np.isfinite(float(metrics["train_loss"]))


def test_scan_accum_matches_manual_grad_mean():
    """The scan must produce exactly the mean of per-micro grad_step outputs
    (same fold_in keys), for an rng-consuming model (VAE)."""
    model = load_model(
        {"name": "VAE", "args": {"img_channels": 1, "img_size": 28,
                                 "latent_dim": 4, "lr": 1e-3}}
    )
    rng = jax.random.PRNGKey(1)
    state = jax.jit(model.init_state)(rng)
    k, b = 3, 4
    micros = _micro_batches(k, b, hw=28)

    grads_list, metrics_list = [], []
    for i, micro in enumerate(micros):
        g, m = jax.jit(model.grad_step)(state, micro, jax.random.fold_in(rng, i))
        grads_list.append(g)
        metrics_list.append(m)
    mean_grads = jax.tree_util.tree_map(
        lambda *g: sum(g) / k, *grads_list
    )
    s_manual, _ = jax.jit(model.apply_grad_step)(state, mean_grads,
                                                 metrics_list[0])

    stacked = {key: np.stack([m[key] for m in micros]) for key in micros[0]}
    trainer = Trainer.__new__(Trainer)
    trainer.model = model
    trainer.accumulate_grad_batches = k
    s_scan, _ = jax.jit(trainer._make_scan_accum_step())(state, stacked, rng)

    for a, b_ in zip(
        jax.tree_util.tree_leaves(s_manual.params),
        jax.tree_util.tree_leaves(s_scan.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6,
                                   atol=1e-7)


def test_trainer_scan_mode_end_to_end(tmp_path):
    dm = DataModule(
        name="MNIST", img_size=28, img_channels=1, batch_size=8,
        synthetic_size=96,
    )
    model = load_model(
        {"name": "VAE", "args": {"img_channels": 1, "img_size": 28,
                                 "latent_dim": 4, "lr": 1e-3}}
    )
    t = Trainer(
        model, dm, tmp_path, max_steps=2, accumulate_grad_batches=3,
        grad_accum_mode="scan", log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    state = t.fit()
    assert t.global_step == 2
    assert int(state.step) == 2


def test_scan_mode_rejected_without_grad_step(tmp_path):
    gan = load_model(
        {"name": "VQGAN", "args": {"img_channels": 1, "img_size": 28}}
    )
    dm = DataModule(
        name="MNIST", img_size=28, img_channels=1, batch_size=8,
        synthetic_size=32,
    )
    if not getattr(gan, "supports_grad_accum", True):
        pytest.skip("model opts out of grad accum entirely")
    with pytest.raises(ValueError, match="grad_step"):
        Trainer(
            gan, dm, tmp_path, max_steps=1, accumulate_grad_batches=2,
            grad_accum_mode="scan",
        )
