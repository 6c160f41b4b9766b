"""Data layer: synthetic datasets, datamodule semantics, sharding."""

import jax
import numpy as np
import pytest

from lightning_generative_models_tpu.data.datamodule import DataModule
from lightning_generative_models_tpu.data.datasets import synthetic_dataset
from lightning_generative_models_tpu.data.pipeline import prefetch_to_device
from lightning_generative_models_tpu.parallel import mesh as mesh_lib


def test_synthetic_deterministic():
    a_img, a_lbl = synthetic_dataset("MNIST", train=True, num_samples=32)
    b_img, b_lbl = synthetic_dataset("MNIST", train=True, num_samples=32)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_lbl, b_lbl)
    assert a_img.shape == (32, 28, 28, 1)
    assert a_img.dtype == np.uint8


def _dm(name="MNIST", channels=1, bs=16, n=128):
    return DataModule(
        name=name,
        img_size=28 if channels == 1 else 32,
        img_channels=channels,
        batch_size=bs,
        synthetic_size=n,
    )


def test_split_sizes():
    dm = _dm(n=100)
    dm.setup()
    assert len(dm.train_images) == 80
    assert len(dm.val_images) == 20


def test_batches_shape_and_determinism():
    dm = _dm()
    b1 = list(dm.train_batches(epoch=0))
    b2 = list(dm.train_batches(epoch=0))
    b3 = list(dm.train_batches(epoch=1))
    assert b1[0]["image"].shape == (16, 28, 28, 1)
    assert b1[0]["image"].dtype == np.uint8
    np.testing.assert_array_equal(b1[0]["image"], b2[0]["image"])
    assert not np.array_equal(b1[0]["image"], b3[0]["image"])  # reshuffled


def test_cifar10_supported():
    dm = _dm(name="CIFAR10", channels=3)
    dm.setup()
    assert dm.train_images.shape[1:] == (32, 32, 3)


def test_channel_sanity_check():
    with pytest.raises(ValueError, match="img_channels"):
        DataModule(name="MNIST", img_size=28, img_channels=3, synthetic_size=16)


def test_sharded_prefetch_divides_batch():
    """Per-device batch = global / n_devices (replaces reference
    data/datamodule.py:33 division)."""
    mesh = mesh_lib.create_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8  # conftest forces 8 virtual devices
    dm = _dm(bs=16)
    batch = next(iter(prefetch_to_device(dm.train_batches(0), mesh)))
    img = batch["image"]
    assert img.shape == (16, 28, 28, 1)
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(16 // n_dev, 28, 28, 1)}


def test_local_batch_size_validation():
    mesh = mesh_lib.create_mesh()
    assert mesh_lib.local_batch_size(16, mesh) == 2
    with pytest.raises(ValueError):
        mesh_lib.local_batch_size(12, mesh)
