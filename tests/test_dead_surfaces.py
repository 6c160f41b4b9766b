"""Coverage for the egress/externals-gated surfaces: dataset downloaders
(mocked urllib), W&B mirroring (stub module), and DDPM interpolation
end-to-end through the generate.py CLI.

Reference analogs: data/download_*.sh scripts, wandb logging in every model,
interpolate at /root/reference/models/generative/diffusion/ddpm.py:847-867.
"""

import gzip
import io
import json
import sys
import tarfile
import types
import zipfile

import jax
import numpy as np
import pytest


# -- downloaders (mocked network) ---------------------------------------------

def _fake_urlopen_factory(payload_by_suffix):
    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url):
        for suffix, payload in payload_by_suffix.items():
            if url.endswith(suffix):
                return _Resp(payload)
        raise AssertionError(f"unexpected URL {url}")

    return fake_urlopen


def test_download_mnist_like_fetches_and_gunzips(tmp_path, monkeypatch):
    from lightning_generative_models_tpu.data import download

    monkeypatch.setattr(download, "DATASET_PATH", str(tmp_path))
    raw = b"\x00\x00\x08\x01" + bytes(16)
    payloads = {f: gzip.compress(raw) for f in download.MNIST_FILES}
    monkeypatch.setattr(
        download.urllib.request, "urlopen", _fake_urlopen_factory(payloads)
    )
    download.download_mnist_like("MNIST")
    for fname in download.MNIST_FILES:
        assert (tmp_path / "MNIST" / fname).exists()  # the .gz
        assert (tmp_path / "MNIST" / fname[:-3]).read_bytes() == raw


def test_download_cifar10_extracts_tar(tmp_path, monkeypatch):
    from lightning_generative_models_tpu.data import download

    monkeypatch.setattr(download, "DATASET_PATH", str(tmp_path))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = b"fake batch"
        info = tarfile.TarInfo("cifar-10-batches-py/data_batch_1")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    monkeypatch.setattr(
        download.urllib.request,
        "urlopen",
        _fake_urlopen_factory({"cifar-10-python.tar.gz": buf.getvalue()}),
    )
    download.download_cifar10()
    assert (
        tmp_path / "CIFAR10" / "cifar-10-batches-py" / "data_batch_1"
    ).read_bytes() == b"fake batch"


def test_download_cyclegan_extracts_zip(tmp_path, monkeypatch):
    from lightning_generative_models_tpu.data import download

    monkeypatch.setattr(download, "DATASET_PATH", str(tmp_path))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("horse2zebra/trainA/img0.jpg", b"jpegbytes")
    monkeypatch.setattr(
        download.urllib.request,
        "urlopen",
        _fake_urlopen_factory({"horse2zebra.zip": buf.getvalue()}),
    )
    download.download_cyclegan("horse2zebra")
    assert (tmp_path / "horse2zebra" / "trainA" / "img0.jpg").exists()


def test_download_main_rejects_unknown():
    from lightning_generative_models_tpu.data import download

    assert download.main(["not-a-dataset"]) == 1


# -- W&B mirroring (stub module) ------------------------------------------------

class _WandbStub(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.logged = []
        self.finished = False
        stub = self

        class _Run:
            def log(self, payload, step=None):
                stub.logged.append((payload, step))

            def log_artifact(self, artifact):
                stub.artifacts.append(artifact)

            def finish(self):
                stub.finished = True

            id = "stub-run-id"

        self._run_cls = _Run
        self.artifacts = []

    class Artifact:
        def __init__(self, name, type=None):
            self.name, self.type = name, type
            self.files = []

        def add_file(self, path):
            self.files.append(path)

    def init(self, **kwargs):
        self.init_kwargs = kwargs
        return self._run_cls()

    class Image:
        def __init__(self, arr):
            self.arr = arr

    class Table:
        def __init__(self, columns=None, data=None):
            self.columns, self.data = columns, data


def test_wandb_mirroring_through_stub(tmp_path, monkeypatch):
    stub = _WandbStub()
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from lightning_generative_models_tpu.experiment.logger import ExperimentLogger

    lg = ExperimentLogger(
        tmp_path, use_wandb=True, project="test-proj",
        config={"model": {"name": "GAN"}},
    )
    assert lg._wandb is not None
    # Config uploaded as a W&B artifact (reference utils/callbacks.py:10-17).
    assert len(stub.artifacts) == 1
    assert stub.artifacts[0].type == "config"
    assert stub.artifacts[0].files == [str(tmp_path / "config.json")]

    lg.log_metrics({"loss": 1.5}, step=3)
    lg.log_image("grid", np.zeros((8, 8, 3), np.uint8), step=3)
    lg.log_table("latent", ["z0"], [[0.1]], step=3)
    lg.finish()

    assert stub.finished
    kinds = [list(p.keys())[0] for p, _ in stub.logged]
    assert "loss" in kinds and "grid" in kinds and "latent" in kinds
    # JSONL primary sink still written alongside the mirror.
    assert (tmp_path / "metrics.jsonl").exists()


# -- interpolate e2e (model + CLI) -----------------------------------------------

def test_ddpm_interpolate_model_level(rng):
    from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM

    model = DDPM(img_channels=1, img_size=8, dim=8, diffusion_timesteps=8,
                 sampling_timesteps=4, use_bf16=False)
    state = jax.jit(model.init_state)(rng)
    x1 = np.zeros((2, 8, 8, 1), np.float32)
    x2 = np.ones((2, 8, 8, 1), np.float32)
    out = jax.jit(model.interpolate)(state, x1, x2, jax.random.fold_in(rng, 1))
    out = np.asarray(out)
    assert out.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(out))


def test_generate_cli_interpolate(tmp_path, monkeypatch):
    """Full CLI path: train 1 DDPM step, then generate.py --interpolate."""
    import generate
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.registry import load_model
    from lightning_generative_models_tpu.train.trainer import Trainer

    config = {
        "model": {
            "name": "DDPM",
            "args": {"img_channels": 1, "img_size": 8, "dim": 8,
                     "diffusion_timesteps": 8, "sampling_timesteps": 4,
                     "use_bf16": False},
        },
        "dataset": {"name": "MNIST", "img_size": 8, "img_channels": 1,
                    "batch_size": 8},
    }
    cfg_path = tmp_path / "ddpm_tiny.json"
    cfg_path.write_text(json.dumps(config))

    exp_root = tmp_path / "experiments"
    monkeypatch.setattr(generate, "EXPERIMENT_DIR", str(exp_root))
    exp_dir = exp_root / "DDPM" / "run1"

    model = load_model(config["model"])
    dm = DataModule(name="MNIST", img_size=8, img_channels=1, batch_size=8,
                    synthetic_size=32)
    Trainer(model, dm, exp_dir, max_steps=1, log_every_n_steps=1,
            sample_every_n_steps=0, check_val_every_n_epoch=99).fit()

    images = generate.main([
        "--config_path", str(cfg_path),
        "--experiment_name", "run1",
        "--interpolate", "4",
        "--interpolate_t", "3",
    ])
    assert images.shape[0] == 4
    pngs = list(exp_dir.rglob("interpolation_*.png"))
    assert pngs, "interpolation grid PNG not written"

    # --sampler dpmpp + --sampling_steps through the same checkpoint.
    images = generate.main([
        "--config_path", str(cfg_path),
        "--experiment_name", "run1",
        "--num_samples", "2",
        "--sampler", "dpmpp",
        "--sampling_steps", "3",
    ])
    assert images.shape == (2, 8, 8, 1) and np.all(np.isfinite(images))

    # Non-diffusion models reject the flag with a clear error.
    import pytest

    vae_config = {
        "model": {"name": "VAE",
                  "args": {"img_channels": 1, "img_size": 8,
                           "latent_dim": 4, "lr": 1e-3}},
        "dataset": {"name": "MNIST", "img_size": 8, "img_channels": 1,
                    "batch_size": 8},
    }
    vae_cfg = tmp_path / "vae_tiny.json"
    vae_cfg.write_text(json.dumps(vae_config))
    from lightning_generative_models_tpu.registry import load_model as _lm

    Trainer(
        _lm(vae_config["model"]),
        DataModule(name="MNIST", img_size=8, img_channels=1, batch_size=8,
                   synthetic_size=32),
        exp_root / "VAE" / "run1", max_steps=1, log_every_n_steps=1,
        sample_every_n_steps=0, check_val_every_n_epoch=99,
    ).fit()
    with pytest.raises(SystemExit, match="does not support --sampler"):
        generate.main([
            "--config_path", str(vae_cfg),
            "--experiment_name", "run1",
            "--sampler", "dpmpp",
        ])
