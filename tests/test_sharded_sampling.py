"""Mesh-sharded sampling: generation partitions over the data axis.

Samplers start from generated noise, not host data, so without a
constraint GSPMD sees only replicated operands and replicates the whole
denoising chain — on an N-chip mesh, N-1 chips compute identical samples
during validation grids and FID@10k generation. ``parallel.mesh.data_shard``
constrains the initial noise to ``P("data")`` against the ambient mesh
(``jax.set_mesh``), which the Trainer now enters for every strategy and
generate.py enters whenever more than one device is visible.

Pinned here:
- sharded sampling is numerically identical to unsharded (threefry is
  partitionable, the chain is batch-elementwise per example);
- the output is actually partitioned, not replicated (the constraint
  propagates through the whole lax.scan chain);
- uneven batches (n not divisible by the mesh) still work (GSPMD pads);
- data_shard is a mechanical no-op without an ambient mesh or without a
  data axis, so single-chip sampling and serving exports are untouched;
- DDPM/DDIM/DPM++, FlowMatching and EDM sampler entries are all covered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.registry import load_model

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def _tiny(name, **kw):
    args = {
        "img_size": 8, "img_channels": 1, "dim": 8, "dim_mults": [1, 2],
        "use_bf16": False, "ema_update_after_step": 1, "ema_update_every": 1,
    }
    if name == "DDPM":
        args.update(diffusion_timesteps=6, sampling_timesteps=3)
    elif name == "FlowMatching":
        args.update(sampling_steps=3)
    elif name == "EDM":
        args.update(sampling_steps=3)
    args.update(kw)
    return load_model({"name": name, "args": args})


def _sample_pair(model, n, **kw):
    """(unsharded, sharded) samples from the same state and rng."""
    import inspect

    statics = tuple(
        k for k in ("method",)
        if k in inspect.signature(model.sample).parameters
    )
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    fn = jax.jit(model.sample, static_argnums=2, static_argnames=statics)
    plain = np.asarray(fn(state, jax.random.fold_in(rng, 1), n, **kw))
    mesh = mesh_lib.create_mesh()
    with jax.set_mesh(mesh):
        rstate = mesh_lib.replicate(state, mesh)
        fn2 = jax.jit(model.sample, static_argnums=2, static_argnames=statics)
        sharded = fn2(rstate, jax.random.fold_in(rng, 1), n, **kw)
    return plain, sharded


@pytest.mark.parametrize("name,kw,atol", [
    ("DDPM", {"method": "ddim"}, 1e-5),
    ("DDPM", {"method": "ddpm"}, 1e-5),
    ("DDPM", {"method": "dpmpp"}, 1e-5),
    ("FlowMatching", {}, 1e-5),
    # EDM starts from sigma_max=80-scaled noise, which amplifies the tiny
    # fusion-order f32 drift between the sharded and unsharded
    # compilations; observed max |diff| ~1.4e-4 on [0,1] outputs.
    ("EDM", {}, 2e-3),
])
def test_sharded_matches_unsharded_and_is_partitioned(name, kw, atol):
    model = _tiny(name)
    plain, sharded = _sample_pair(model, 16, **kw)
    assert not sharded.sharding.is_fully_replicated, (
        "sampler output replicated under the data mesh — the data_shard "
        "constraint did not propagate"
    )
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=atol)


@pytest.mark.parametrize("name", ["GAN", "VAE", "NICE", "Glow"])
def test_one_shot_family_samplers_shard(name):
    """GAN/VAE/flow samplers (one forward from latent noise) shard too —
    their FID@10k generation is the same replicated-noise problem."""
    args = {"img_channels": 1, "img_size": 28, "latent_dim": 16, "lr": 1e-4}
    if name == "VAE":
        args = {"img_channels": 1, "img_size": 28, "latent_dim": 8, "lr": 2e-3}
    elif name == "NICE":
        args = {"img_channels": 1, "img_size": 8, "hidden_dim": 32,
                "num_coupling_layers": 4, "num_hidden_layers": 2, "lr": 1e-3}
    elif name == "Glow":
        args = {"img_channels": 1, "img_size": 8, "levels": 2, "depth": 2,
                "width": 8, "lr": 1e-3}
    model = load_model({"name": name, "args": args})
    plain, sharded = _sample_pair(model, 16)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_pixelcnn_sampler_shards():
    """PixelCNN's sampler is the structurally hardest case: a fori_loop
    whose carry is the image itself, updated one pixel per iteration with
    dynamic_update_slice — the data_shard constraint on the initial zeros
    must survive every per-pixel update (ADVICE r3)."""
    model = load_model({"name": "PixelCNN", "args": {
        "img_channels": 1, "img_size": 4, "hidden_dim": 8,
        "num_layers": 2, "num_levels": 4, "lr": 1e-3,
    }})
    plain, sharded = _sample_pair(model, 16)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_vqvae_sampler_shards():
    """VQVAE's random_sample draws integer codebook indices (randint, not
    normal) and decodes — sharding must propagate from the index draw
    through the embedding lookup and decoder (ADVICE r3)."""
    model = load_model({"name": "VQVAE", "args": {
        "img_channels": 1, "img_size": 8, "hidden_dim": 8,
        "num_residual_layers": 1, "num_residual_hiddens": 4,
        "num_embeddings": 16, "embedding_dim": 4, "lr": 1e-3,
    }})
    plain, sharded = _sample_pair(model, 16)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_sample_classes_sharded_z_replicated_labels():
    """Conditional sampling mixes a data-sharded z with replicated integer
    labels — the partitioner must shard the generator batch dim without
    gathering (ADVICE r3: the mixed-operand case)."""
    model = load_model({"name": "CGAN", "args": {
        "img_channels": 1, "img_size": 28, "latent_dim": 8,
        "num_classes": 10, "lr": 1e-4,
    }})
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    labels = jnp.arange(16, dtype=jnp.int32) % 10
    fn = jax.jit(model.sample_classes)
    plain = np.asarray(fn(state, jax.random.fold_in(rng, 1), labels))
    mesh = mesh_lib.create_mesh()
    with jax.set_mesh(mesh):
        rstate = mesh_lib.replicate(state, mesh)
        sharded = jax.jit(model.sample_classes)(
            rstate, jax.random.fold_in(rng, 1), labels)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_uneven_batch_shards_and_matches():
    model = _tiny("DDPM")
    plain, sharded = _sample_pair(model, 12)  # 12 % 8 != 0
    assert sharded.shape[0] == 12
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_data_shard_noop_without_mesh():
    x = jnp.ones((4, 3))
    assert mesh_lib.data_shard(x) is x


def test_data_shard_noop_without_data_axis():
    mesh = mesh_lib.create_mesh(axis_names=("expert",))
    x = jnp.ones((4, 3))
    with jax.set_mesh(mesh):
        assert mesh_lib.data_shard(x) is x


def test_trainer_mesh_context_enters_for_data_parallel():
    """The Trainer's ambient-mesh context is active for plain data
    parallelism too, so validation sampling shards out of the box."""
    from lightning_generative_models_tpu.train.trainer import Trainer
    from lightning_generative_models_tpu.data.datamodule import DataModule

    model = _tiny("DDPM")
    dm = DataModule(name="synthetic", batch_size=8, img_size=8, img_channels=3)
    trainer = Trainer(model, dm, experiment_dir="/tmp/shard_sampling_ctx")
    with trainer._mesh_context():
        am = jax.sharding.get_abstract_mesh()
        assert not am.empty and mesh_lib.DATA_AXIS in am.axis_names
