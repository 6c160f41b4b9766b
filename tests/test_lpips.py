"""LPIPS (VGG16) perceptual distance: architecture + converter + VQGAN wiring.

The torch fixture (tests/torch_lpips_ref.py) mirrors the lpips package's
state_dict layout, so the converter and forward math are validated
numerically with random weights — the tests/torch_inception_ref.py precedent
(no downloadable weights in this environment).
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.metrics import lpips as lpips_mod


def test_lpips_identity_is_zero():
    variables = lpips_mod.he_scaled_random_variables(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    d = lpips_mod.lpips_distance(variables, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_positive_and_input_dependent():
    variables = lpips_mod.he_scaled_random_variables(0)
    k = jax.random.PRNGKey(2)
    x = jax.random.uniform(k, (2, 32, 32, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.fold_in(k, 1), (2, 32, 32, 3)) * 2 - 1
    d = np.asarray(lpips_mod.lpips_distance(variables, x, y))
    assert d.shape == (2,) and (d > 1e-4).all()
    # Distance grows with perturbation size (He init keeps features
    # input-dependent — the inception collapse lesson).
    d_small = np.asarray(
        lpips_mod.lpips_distance(variables, x, x + 0.01 * (y - x))
    )
    assert (d_small < d).all()


def test_lpips_grayscale_broadcasts():
    variables = lpips_mod.he_scaled_random_variables(0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 1)) * 2 - 1
    d = np.asarray(lpips_mod.lpips_distance(variables, x, -x))
    assert np.isfinite(d).all() and (d > 0).all()


def test_random_variables_deterministic():
    a = lpips_mod.he_scaled_random_variables(0)
    b = lpips_mod.he_scaled_random_variables(0)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_converter_and_forward_match_torch(tmp_path):
    """Random torch LPIPS -> state_dict -> converter -> Flax forward must
    match the torch forward numerically (architecture + converter parity)."""
    import torch

    from torch_lpips_ref import TorchLPIPS

    torch.manual_seed(0)
    ref = TorchLPIPS()
    path = tmp_path / "lpips_vgg.pth"
    torch.save(ref.state_dict(), str(path))

    variables = lpips_mod.load_torch_lpips(str(path))
    # All 13 convs + 5 lin heads converted.
    assert set(variables["vgg"]) == {f"Conv_{i}" for i in range(13)}
    assert tuple(w.shape[0] for w in variables["lins"]) == \
        lpips_mod.TAP_CHANNELS

    rs = np.random.RandomState(0)
    x = (rs.rand(2, 24, 24, 3).astype(np.float32) * 2 - 1)
    y = (rs.rand(2, 24, 24, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(lpips_mod.lpips_distance(variables, x, y))
    theirs = ref(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_converter_accepts_torchvision_layout(tmp_path):
    """A plain torchvision vgg16 state_dict (features.N.*) converts too;
    lin heads default to uniform 1/C."""
    import torch

    from torch_lpips_ref import TorchLPIPS

    torch.manual_seed(1)
    ref = TorchLPIPS()
    sd = ref.state_dict()
    # Re-key net.sliceK.IDX.* -> features.IDX.* (torchvision layout).
    tv = {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            idx = k.split(".")[2]
            tv[f"features.{idx}.{k.rsplit('.', 1)[1]}"] = v
    path = tmp_path / "vgg16.pth"
    torch.save(tv, str(path))
    variables = lpips_mod.load_torch_lpips(str(path))
    assert set(variables["vgg"]) == {f"Conv_{i}" for i in range(13)}
    for w, c in zip(variables["lins"], lpips_mod.TAP_CHANNELS):
        np.testing.assert_allclose(np.asarray(w), 1.0 / c)


def test_converter_rejects_lin_only_checkpoint(tmp_path):
    """The pip package's vgg.pth holds only lin heads; converting it alone
    must fail loudly, not produce a half-initialized network."""
    import torch

    sd = {f"lin{i}.model.1.weight": torch.zeros(1, c, 1, 1)
          for i, c in enumerate(lpips_mod.TAP_CHANNELS)}
    path = tmp_path / "lin_only.pth"
    torch.save(sd, str(path))
    with pytest.raises(ValueError, match="13"):
        lpips_mod.load_torch_lpips(str(path))


def test_sha256_pinning(tmp_path, monkeypatch):
    fake = tmp_path / "lpips_vgg.pth"
    fake.write_bytes(b"not weights")
    monkeypatch.setenv("LGM_TPU_LPIPS_WEIGHTS", str(fake))
    monkeypatch.setenv("LGM_TPU_LPIPS_SHA256", "deadbeef")
    with pytest.raises(ValueError, match="sha256"):
        lpips_mod.find_pretrained_weights()
    digest = hashlib.sha256(fake.read_bytes()).hexdigest()
    monkeypatch.setenv("LGM_TPU_LPIPS_SHA256", digest[:12])  # prefix ok
    assert lpips_mod.find_pretrained_weights() == fake
    # A too-short pin prefix matches almost anything — rejected outright.
    monkeypatch.setenv("LGM_TPU_LPIPS_SHA256", digest[:4])
    with pytest.raises(ValueError, match="at least 8"):
        lpips_mod.find_pretrained_weights()


def _tiny_vqgan(**kw):
    from lightning_generative_models_tpu.registry import load_model

    args = {
        "img_channels": 1, "img_size": 16, "embedding_dim": 4,
        "num_embeddings": 16, "hidden_dim": 8, "num_residual_layers": 1,
        "num_residual_hiddens": 4, "lr": 1e-3, "disc_start": 0,
    }
    args.update(kw)
    return load_model({"name": "VQGAN", "args": args})


@pytest.mark.slow
def test_vqgan_perceptual_train_step(monkeypatch):
    """VQGAN with perceptual_weight > 0: the LPIPS variables ride in
    mutable["lpips"], the jitted train step reports a finite
    perceptual_loss, and the frozen variables survive the step."""
    model = _tiny_vqgan(perceptual_weight=0.5)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    assert "lpips" in state.mutable
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.randint(0, 256, (4, 16, 16, 1), np.uint8),
        "label": np.zeros(4, np.int32),
    }
    step = jax.jit(model.train_step, donate_argnums=0)
    before = np.asarray(state.mutable["lpips"]["lins"][0])
    state, metrics = step(state, jax.device_put(batch), rng)
    assert np.isfinite(float(metrics["train_perceptual_loss"]))
    assert float(metrics["train_perceptual_loss"]) > 0
    assert np.isfinite(float(metrics["train_loss"]))
    np.testing.assert_array_equal(
        np.asarray(state.mutable["lpips"]["lins"][0]), before
    )
    # Eval reports it too.
    val = model.eval_step(state, jax.device_put(batch), rng)
    assert np.isfinite(float(val["val_perceptual_loss"]))


@pytest.mark.slow
def test_vqgan_default_has_no_perceptual():
    model = _tiny_vqgan()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    assert "lpips" not in state.mutable
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.randint(0, 256, (4, 16, 16, 1), np.uint8),
        "label": np.zeros(4, np.int32),
    }
    _, metrics = jax.jit(model.train_step, donate_argnums=0)(
        state, jax.device_put(batch), jax.random.PRNGKey(0)
    )
    assert "train_perceptual_loss" not in metrics
