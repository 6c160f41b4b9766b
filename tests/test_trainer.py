"""Trainer semantics: grad accumulation equivalence, resume, artifacts."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.data.datamodule import DataModule
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.trainer import Trainer


def make_model():
    return load_model(
        {
            "name": "VAE",
            "args": {"img_channels": 1, "img_size": 28, "latent_dim": 8,
                     "lr": 1e-3},
        }
    )


def make_dm(batch_size):
    return DataModule(
        name="MNIST", img_size=28, img_channels=1, batch_size=batch_size,
        synthetic_size=160,
    )


def test_grad_accum_equals_bigger_batch(tmp_path):
    """accumulate_grad_batches=2 at bs=8 must equal bs=16 exactly: the
    trainer concatenates micro-batches, and mean-reduced losses make that
    mathematically identical to gradient accumulation."""
    t1 = Trainer(
        make_model(), make_dm(16), tmp_path / "a", max_steps=3,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    s1 = t1.fit()
    t2 = Trainer(
        make_model(), make_dm(8), tmp_path / "b", max_steps=3,
        accumulate_grad_batches=2, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    s2 = t2.fit()
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_fsdp_strategy_end_to_end(tmp_path):
    """--strategy fsdp: same training math as data_parallel (identical
    params after 3 steps), state actually sharded during the run, and the
    checkpoint written from sharded state restores + resumes cleanly."""
    t1 = Trainer(
        make_model(), make_dm(16), tmp_path / "dp", max_steps=3,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    s1 = t1.fit()
    t2 = Trainer(
        make_model(), make_dm(16), tmp_path / "fsdp", max_steps=3,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=99,
        strategy="fsdp",
    )
    s2 = t2.fit()
    import jax

    # The VAE's big dense kernels are >= 2**16 elements: the default
    # min_size must shard them (the feature must not be a silent no-op).
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(s2.params)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)

    # Resume from the checkpoint that was saved from sharded arrays.
    t3 = Trainer(
        make_model(), make_dm(16), tmp_path / "fsdp", max_steps=5,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=99,
        strategy="fsdp",
    )
    s3 = t3.fit(resume=True)
    assert t3.global_step == 5
    assert np.isfinite(
        float(np.asarray(jax.tree_util.tree_leaves(s3.params)[0]).sum())
    )


def test_trainer_rejects_unknown_strategy(tmp_path):
    with pytest.raises(ValueError, match="strategy"):
        Trainer(make_model(), make_dm(16), tmp_path, strategy="pipeline")


def test_gan_ignores_grad_accum(tmp_path):
    gan = load_model(
        {"name": "GAN", "args": {"img_channels": 1, "img_size": 28,
                                 "latent_dim": 8}}
    )
    trainer = Trainer(
        gan, make_dm(16), tmp_path, max_steps=1, accumulate_grad_batches=4,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    assert trainer.accumulate_grad_batches == 1  # Lightning manual-opt parity


def test_resume_continues_step_count(tmp_path):
    dm = make_dm(16)
    t1 = Trainer(
        make_model(), dm, tmp_path, max_steps=3, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    t1.fit()
    assert t1.global_step == 3

    t2 = Trainer(
        make_model(), dm, tmp_path, max_steps=6, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    state = t2.fit(resume=True)
    assert t2.global_step == 6
    assert int(np.asarray(state.step)) == 6


def test_artifacts_written(tmp_path):
    t = Trainer(
        make_model(), make_dm(16), tmp_path, max_steps=2,
        log_every_n_steps=1, sample_every_n_steps=1, check_val_every_n_epoch=1,
    )
    t.fit()
    records = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert any("train_loss" in r for r in records)
    assert any("val_loss" in r for r in records)
    assert any("images_per_sec" in r for r in records)
    samples = list((tmp_path / "samples").glob("*.png"))
    assert samples, "no sample grids written"
    assert (tmp_path / "checkpoints" / "last").exists()


def test_best_checkpoint_written_on_mid_epoch_stop(tmp_path):
    """A --max_steps run usually stops mid-epoch, skipping every
    epoch-boundary maybe_save_best; the final-validation path must still
    write the 'best' checkpoint (regression: it validated but never saved,
    so --eval_which best had nothing to read)."""
    t = Trainer(
        make_model(), make_dm(16), tmp_path, max_steps=3,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=1,
    )
    t.fit()
    assert (tmp_path / "checkpoints" / "best").exists()
    meta = json.loads(
        (tmp_path / "checkpoints" / "checkpoint_meta_best.json").read_text()
    )
    assert meta["step"] == 3
    assert np.isfinite(meta["best_value"])


def test_checkpoint_meta_is_strict_json_without_best(tmp_path):
    """Before any best exists, best_value=inf must serialize as null —
    raw ``Infinity`` is not strict JSON and breaks external parsers —
    and must round-trip back to +inf on a fresh manager."""
    from lightning_generative_models_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path)
    ckpt._write_meta("last", step=5, epoch=0)
    text = (tmp_path / "checkpoint_meta_last.json").read_text()
    assert "Infinity" not in text
    meta = json.loads(text)
    assert meta["best_value"] is None
    fresh = CheckpointManager(tmp_path)
    assert fresh.best_value == float("inf")


def test_unroll_steps_matches_single_dispatch(tmp_path):
    """unroll_steps=2 must produce exactly the same parameters as the
    single-step dispatch over the same batches."""
    import jax

    t1 = Trainer(
        make_model(), make_dm(16), tmp_path / "u1", max_steps=4,
        log_every_n_steps=1, sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    s1 = t1.fit()
    t2 = Trainer(
        make_model(), make_dm(16), tmp_path / "u2", max_steps=4,
        unroll_steps=2, log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    s2 = t2.fit()
    assert t2.global_step == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_completed_run_resume_does_not_retrain(tmp_path):
    """After normal completion the last checkpoint records the NEXT epoch,
    so resuming a finished run performs zero additional train steps
    (regression: the finally-block interrupt save used to overwrite the
    epoch+1 boundary save and retrain the final epoch)."""
    dm = make_dm(16)
    t1 = Trainer(
        make_model(), dm, tmp_path, max_epochs=2, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    t1.fit()
    steps_after_run = t1.global_step
    assert steps_after_run > 0

    meta = json.loads(
        (tmp_path / "checkpoints" / "checkpoint_meta_last.json").read_text())
    assert meta["epoch"] == 2  # NEXT epoch, not the finished one

    t2 = Trainer(
        make_model(), dm, tmp_path, max_epochs=2, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    t2.fit(resume=True)
    assert t2.global_step == steps_after_run  # no retraining


def test_test_split_evaluation(tmp_path):
    """trainer.test() evaluates the held-out test split from the saved
    checkpoint (reference test_dataloader, data/datamodule.py:190-206, which
    nothing consumed) and logs test_-prefixed metrics."""
    dm = make_dm(16)
    t1 = Trainer(
        make_model(), dm, tmp_path, max_steps=3, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    )
    t1.fit()

    t2 = Trainer(
        make_model(), dm, tmp_path, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    metrics = t2.test()
    assert "test_loss" in metrics and np.isfinite(metrics["test_loss"])
    assert t2.global_step == 3  # restored from the checkpoint
    records = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert any("test_loss" in r for r in records)


def test_test_with_live_state_without_fit(tmp_path):
    """test(state=...) on a trainer that never ran fit() must work
    (regression: _eval_over dereferenced self._run_rng, which only the
    state-is-None restore branch initialized)."""
    import jax

    from lightning_generative_models_tpu.parallel import mesh as mesh_lib

    t = Trainer(
        make_model(), make_dm(16), tmp_path, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    state = jax.jit(t.model.init_state)(jax.random.PRNGKey(0))
    state = mesh_lib.replicate(state, t.mesh)
    metrics = t.test(state=state)
    assert "test_loss" in metrics and np.isfinite(metrics["test_loss"])


def test_experiment_dir_collision_warns(tmp_path, monkeypatch, caplog):
    """Two DIFFERENT configs can share a model name (the DiT backbone runs
    under model name "DDPM"), so reusing an experiment name silently
    overwrites the previous run. setup_arguments must warn loudly."""
    import logging

    import train as train_cli

    monkeypatch.setattr(
        train_cli, "EXPERIMENT_DIR", str(tmp_path), raising=False
    )
    train_cli.setup_arguments(
        ["--config_path", "configs/diffusion/ddpm_cifar10.json",
         "--experiment_name", "clash"],
        print_args=False,
    )
    with caplog.at_level(logging.WARNING, logger="train"):
        train_cli.setup_arguments(
            ["--config_path", "configs/diffusion/dit_cifar10.json",
             "--experiment_name", "clash"],
            print_args=False,
        )
    assert any("DIFFERENT config" in r.message for r in caplog.records)
    # Same config again: no warning.
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="train"):
        train_cli.setup_arguments(
            ["--config_path", "configs/diffusion/ddpm_cifar10.json",
             "--experiment_name", "solo"],
            print_args=False,
        )
    assert not any("DIFFERENT config" in r.message for r in caplog.records)
    # FID/metric artifacts from generate.py --fid in the SAME dir are run
    # outputs, not configs — they must not trigger the warning.
    caplog.clear()
    (tmp_path / "DDPM" / "solo" / "fid_10000_last_step2000.json").write_text(
        "{}"
    )
    with caplog.at_level(logging.WARNING, logger="train"):
        train_cli.setup_arguments(
            ["--config_path", "configs/diffusion/ddpm_cifar10.json",
             "--experiment_name", "solo"],
            print_args=False,
        )
    assert not any("DIFFERENT config" in r.message for r in caplog.records)


def test_eval_cli(tmp_path, monkeypatch):
    """python train.py --eval test end-to-end."""
    import train as train_cli

    monkeypatch.setattr(
        train_cli, "EXPERIMENT_DIR", str(tmp_path), raising=False
    )
    args = [
        "--config_path", "configs/vae/vae.json", "--experiment_name", "e",
        "--max_steps", "2", "--check_val_every_n_epoch", "99",
        "--sample_every_n_steps", "0",
    ]
    train_cli.main(args)
    metrics = train_cli.main(args + ["--eval", "test"])
    assert "test_loss" in metrics and np.isfinite(metrics["test_loss"])


def test_fsdp_grad_accum_mu_dtype_compose(tmp_path):
    """The three orthogonal knobs — FSDP sharding, gradient accumulation,
    bf16 first moment — compose in one run: state sharded, accumulation
    applied, mu stored bf16, training finite."""
    from lightning_generative_models_tpu.train.state import (
        set_default_mu_dtype,
    )

    set_default_mu_dtype(jnp.bfloat16)
    try:
        model = make_model()
    finally:
        set_default_mu_dtype(None)
    t = Trainer(
        model, make_dm(32), tmp_path, max_steps=3, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
        strategy="fsdp", accumulate_grad_batches=2,
    )
    s = t.fit()
    import jax

    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(s.params)
    )
    mus = [
        leaf for leaf in jax.tree_util.tree_leaves(s.opt_state)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
    ]
    assert mus, "bf16 first moment missing from the FSDP-sharded opt state"
    assert np.isfinite(
        float(np.asarray(jax.tree_util.tree_leaves(s.params)[0]).sum())
    )


def test_mu_dtype_cli(tmp_path, monkeypatch):
    """--mu_dtype bfloat16 trains end-to-end and round-trips a checkpoint
    resume (mu restored as bf16); the default float32 path is unaffected by
    a prior bf16 invocation in the same process."""
    import train as train_cli

    from lightning_generative_models_tpu.train.state import default_mu_dtype

    monkeypatch.setattr(
        train_cli, "EXPERIMENT_DIR", str(tmp_path), raising=False
    )
    args = [
        "--config_path", "configs/vae/vae.json", "--experiment_name", "mu",
        "--max_steps", "2", "--check_val_every_n_epoch", "99",
        "--sample_every_n_steps", "0", "--mu_dtype", "bfloat16",
        "--nu_dtype", "bfloat16",
    ]
    train_cli.main(args)
    assert default_mu_dtype() == jnp.bfloat16
    run_dir = tmp_path / "VAE" / "mu"
    ckpt = run_dir / "checkpoints" / "last"
    assert ckpt.exists()
    # resume with the same flag: restored mu must be bf16
    train_cli.main(args[:5] + ["4"] + args[6:] + ["--ckpt_path", str(ckpt)])
    # a following default-f32 invocation resets the process-wide knob
    train_cli.main([
        "--config_path", "configs/vae/vae.json", "--experiment_name", "mu2",
        "--max_steps", "1", "--check_val_every_n_epoch", "99",
        "--sample_every_n_steps", "0",
    ])
    assert default_mu_dtype() is None


def test_sigterm_saves_first_and_skips_validation(tmp_path):
    """Preemption path: on SIGTERM the trainer must checkpoint immediately
    and skip validation/sampling entirely (a DDPM validation can eat a
    preemptible TPU VM's ~30 s grace window). Regression for the
    unconditional post-loop _validate call."""
    dm = make_dm(16)
    t = Trainer(
        make_model(), dm, tmp_path, max_steps=50, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=1,
    )

    real_step = t._train_step
    calls = {"n": 0}

    def step_then_sigterm(*args):
        calls["n"] += 1
        out = real_step(*args)
        if calls["n"] == 2:  # signal lands mid-epoch, after the 2nd step
            t._handle_sigterm(None, None)
        return out

    t._train_step = step_then_sigterm
    t.fit()

    assert t.global_step == 2
    assert (tmp_path / "checkpoints" / "last").exists()
    meta = json.loads(
        (tmp_path / "checkpoints" / "checkpoint_meta_last.json").read_text())
    assert meta["epoch"] == 0  # current epoch: interrupted epoch is retried
    # No validation ran and no sample grids were written after the signal.
    records = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert not any("val_loss" in r for r in records)
    assert not list((tmp_path / "samples").glob("*.png"))


def test_profiler_window_fires_once(tmp_path):
    """Regression: after the profile window ended, the start condition
    re-fired every step (no latch), dumping one trace per step."""
    dm = make_dm(16)
    t = Trainer(
        make_model(), dm, tmp_path, max_steps=6, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
        profile_steps=(1, 2),
    )
    t.fit()
    dumps = list((tmp_path / "profile").glob("plugins/profile/*"))
    assert len(dumps) == 1, f"expected one trace dump, got {len(dumps)}"
