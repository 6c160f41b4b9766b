"""ops/: attention kernels and device-side preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.ops import attention as A
from lightning_generative_models_tpu.ops.preprocess import (
    prepare_batch,
    random_hflip,
    to_float01,
)


def qkv(rng, n, d, b=1, h=2, dtype=jnp.float32):
    mk = lambda i: jax.random.normal(jax.random.fold_in(rng, i), (b, h, n, d), dtype)
    return mk(1), mk(2), mk(3)


@pytest.mark.parametrize("n,d", [(256, 64), (300, 64), (1024, 32)])
def test_flash_attention_matches_xla(rng, n, d):
    """Pallas online-softmax kernel vs plain attention (interpret mode on
    CPU; the same code compiles via Mosaic on TPU)."""
    q, k, v = qkv(rng, n, d)
    ref = A._xla_attention(q, k, v)
    old = A._INTERPRET
    A._INTERPRET = jax.default_backend() != "tpu"
    try:
        out = A._flash_attention(q, k, v)
    finally:
        A._INTERPRET = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_attention_grad_matches_xla(rng):
    """pallas_call has no reverse-mode rule, so _flash_attention carries a
    custom VJP (backward = differentiate the XLA math). Found live: a DiT
    with flash_attn=True at >=256 tokens died in linearization inside
    train_step before this existed. Gradients must match plain attention."""
    q, k, v = qkv(rng, 256, 32)

    def loss(fn, q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    ref_grads = jax.grad(lambda *a: loss(A._xla_attention, *a), (0, 1, 2))(
        q, k, v
    )
    old = A._INTERPRET
    A._INTERPRET = jax.default_backend() != "tpu"
    try:
        flash_grads = jax.grad(
            lambda *a: loss(A._flash_attention, *a), (0, 1, 2)
        )(q, k, v)
    finally:
        A._INTERPRET = old
    for g_ref, g_flash in zip(ref_grads, flash_grads):
        np.testing.assert_allclose(
            np.asarray(g_flash), np.asarray(g_ref), atol=2e-2, rtol=2e-2
        )


@pytest.mark.parametrize("n,h,d", [(64, 2, 16), (256, 6, 64), (72, 3, 8)])
def test_vmem_attention_matches_einsum(rng, n, h, d):
    """Fully-fused VMEM kernel (packed head-minor qkv, grid over batch) vs
    the einsum reference math — interpret mode on CPU, Mosaic on TPU."""
    qkv_packed = jax.random.normal(rng, (2, n, 3 * h * d), jnp.float32)
    ref = A._einsum_attention_qkv(qkv_packed, h)
    old = A._INTERPRET
    A._INTERPRET = jax.default_backend() != "tpu"
    try:
        out = A._vmem_attention(qkv_packed, h)
    finally:
        A._INTERPRET = old
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_vmem_attention_grad_matches_einsum(rng):
    """The VMEM kernel's backward is a real Pallas kernel (in-VMEM softmax
    recompute + the attention VJP identities) — its gradient must match
    differentiating the einsum math."""
    h = 4
    qkv_packed = jax.random.normal(rng, (2, 64, 3 * h * 16), jnp.float32)

    def loss(fn, x):
        out = fn(x, h)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    g_ref = jax.grad(lambda x: loss(A._einsum_attention_qkv, x))(qkv_packed)
    old = A._INTERPRET
    A._INTERPRET = jax.default_backend() != "tpu"
    try:
        g_vmem = jax.grad(lambda x: loss(A._vmem_attention, x))(qkv_packed)
    finally:
        A._INTERPRET = old
    np.testing.assert_allclose(
        np.asarray(g_vmem), np.asarray(g_ref), atol=1e-5, rtol=1e-5
    )


def test_vmem_attention_vmap_folds_into_batch(rng):
    """vmap over the VMEM kernel folds the mapped axis into the batch grid
    (ops/attention.py:_fold_leading_vmap) — custom_partitioning has no
    batching rule, and the pipeline's stage-nn.vmap needs one (VERDICT r3
    #3). Forward and gradient under vmap must match the vmapped einsum."""
    h = 4
    stacked = jax.random.normal(rng, (3, 2, 64, 3 * h * 16), jnp.float32)

    def loss(fn, x):
        out = jax.vmap(lambda y: fn(y, h, "h3d"))(x)
        return jnp.sum(out * jnp.cos(out)), out

    (ref_l, ref_out) = loss(A._einsum_attention_qkv, stacked)
    g_ref = jax.grad(lambda x: loss(A._einsum_attention_qkv, x)[0])(stacked)
    old = A._INTERPRET
    A._INTERPRET = jax.default_backend() != "tpu"
    try:
        (_, out) = loss(A._vmem_attention, stacked)
        g = jax.grad(lambda x: loss(A._vmem_attention, x)[0])(stacked)
    finally:
        A._INTERPRET = old
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=1e-5, rtol=1e-5
    )


def test_fused_attention_qkv_dispatch_and_validation(rng):
    # Off-TPU (or unfit shapes) must take the einsum path and still be right.
    h = 2
    x = jax.random.normal(rng, (2, 20, 3 * h * 16), jnp.float32)  # n%8 != 0
    np.testing.assert_allclose(
        np.asarray(A.fused_attention_qkv(x, h)),
        np.asarray(A._einsum_attention_qkv(x, h)),
        rtol=1e-6, atol=1e-6,
    )
    with pytest.raises(ValueError, match="not 3\\*heads\\*d"):
        A.fused_attention_qkv(x[..., :-1], h)


def test_vmem_attention_fits_bounds():
    # DiT-S/2 (n=256, 3*h*d=1152) fits; a 4096-token giant must not (its
    # n^2 f32 score matrix alone is 64 MB > VMEM).
    assert A._vmem_attention_fits(256, 1152, 6)
    assert not A._vmem_attention_fits(4096, 1152, 6)


def test_sdpa_dispatch_short_seq_uses_xla(rng):
    # Short sequences must not hit the Pallas path even when requested.
    q, k, v = qkv(rng, 64, 32)
    out = A.scaled_dot_product_attention(q, k, v, use_pallas=True)
    ref = A._xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_to_float01():
    u8 = np.array([[0, 127, 255]], np.uint8).reshape(1, 1, 3, 1)
    f = to_float01(jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(f).ravel(), [0.0, 127 / 255, 1.0])


def test_random_hflip_deterministic_and_valid(rng):
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    a = random_hflip(x, rng)
    b = random_hflip(x, rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Each sample is either identical or exactly mirrored.
    for i in range(2):
        xi, ai = np.asarray(x[i]), np.asarray(a[i])
        assert np.array_equal(ai, xi) or np.array_equal(ai, xi[:, ::-1, :])


def test_prepare_batch_eval_no_flip(rng):
    rs = np.random.RandomState(0)
    batch = {"image": rs.randint(0, 256, (4, 8, 8, 1), np.uint8),
             "label": np.zeros(4, np.int32)}
    out = prepare_batch(batch, rng, train=False)
    np.testing.assert_allclose(
        np.asarray(out["image"]), batch["image"].astype(np.float32) / 255.0
    )


def test_fused_pallas_preprocess_matches_reference(rng):
    from lightning_generative_models_tpu.ops.preprocess import (
        fused_normalize_flip_pallas,
    )

    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randint(0, 256, size=(8, 16, 16, 3), dtype=np.uint8))
    flip = jnp.asarray(rs.randint(0, 2, 8).astype(bool))
    out = fused_normalize_flip_pallas(
        imgs, flip, interpret=jax.default_backend() != "tpu"
    )
    base = imgs.astype(jnp.float32) / 255.0
    ref = jnp.where(flip[:, None, None, None], base[:, :, ::-1, :], base)
    # half-LSB tolerance: the flip permutation rides the MXU (bf16 pass)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2.5e-3)


def test_vq_pallas_kernel_matches_xla(rng):
    from lightning_generative_models_tpu.ops import vq as vq_ops
    from lightning_generative_models_tpu.models.modules.vector_quantizer import (
        nearest_code_indices,
    )

    vq_ops._INTERPRET = jax.default_backend() != "tpu"
    try:
        z = jax.random.normal(jax.random.fold_in(rng, 1), (1000, 64))
        cb = jax.random.normal(jax.random.fold_in(rng, 2), (512, 64))
        ref = nearest_code_indices(z, cb)
        ours = vq_ops.nearest_codes_pallas(z, cb)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))
    finally:
        vq_ops._INTERPRET = False


def test_vq_spmd_kernel_sharded(rng):
    """custom_partitioning runs the VQ kernel per batch shard on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lightning_generative_models_tpu.models.modules.vector_quantizer import (
        nearest_code_indices,
    )
    from lightning_generative_models_tpu.ops import vq as vq_ops
    from lightning_generative_models_tpu.parallel import mesh as mesh_lib

    vq_ops._INTERPRET = jax.default_backend() != "tpu"
    try:
        mesh = mesh_lib.create_mesh()
        flat = jax.device_put(
            jax.random.normal(jax.random.fold_in(rng, 1), (2048, 64)),
            NamedSharding(mesh, P("data", None)),
        )
        cb = jax.device_put(
            jax.random.normal(jax.random.fold_in(rng, 2), (512, 64)),
            NamedSharding(mesh, P()),
        )
        out = jax.jit(vq_ops._nearest_codes_spmd)(flat, cb)
        ref = nearest_code_indices(flat, cb)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert out.sharding.spec == P("data")
    finally:
        vq_ops._INTERPRET = False


def test_vq_spmd_kernel_under_grad(rng, monkeypatch):
    """Regression: a live tracer (the trainable codebook) reaching the
    custom_partitioning wrapper under jax.grad raised 'Differentiation rule
    for custom_partitioning not implemented' — every VQ model's train_step
    crashed on TPU, where the dispatch gate routes N>=1024 lookups to the
    SPMD kernel. nearest_codes must sever gradients before the primitive
    binds (the argmin indices carry no gradient anyway)."""
    from lightning_generative_models_tpu.ops import vq as vq_ops

    monkeypatch.setattr(vq_ops, "_INTERPRET", jax.default_backend() != "tpu")
    # Force the gate's backend check so CPU CI exercises the TPU-only path.
    monkeypatch.setattr(vq_ops.jax, "default_backend", lambda: "tpu")

    flat = jax.random.normal(jax.random.fold_in(rng, 1), (1024, 8))
    cb = jax.random.normal(jax.random.fold_in(rng, 2), (128, 8))

    def loss(codebook):
        idx = vq_ops.nearest_codes(
            jax.lax.stop_gradient(flat), codebook, use_pallas=True
        )
        return jnp.sum((codebook[idx] - flat) ** 2)

    grads = jax.grad(loss)(cb)  # crashed before the stop_gradient fix
    assert grads.shape == cb.shape
    assert bool(jnp.isfinite(grads).all())


# -- UNet attention modules: token-major layout vs naive reference ----------

def _naive_linear_attention(x, params, heads=4, dim_head=32):
    """Round-1 [b,h,d,n] formulation of lucidrains linear attention
    (reference ddpm.py:203-239), run in f32 on the same parameters."""
    b, hh, ww, c = x.shape
    n = hh * ww
    g0 = params["norm_g"]
    xn = x * jax.lax.rsqrt(jnp.sum(x**2, -1, keepdims=True) + 1e-12)
    xn = xn * g0 * (c**0.5)
    w_qkv = params["qkv_kernel"]  # [c, 3*h*d]
    qkv = (xn.reshape(b, n, c) @ w_qkv).reshape(b, n, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))  # [b,h,d,n]
    mem = params["mem_kv"]
    mk = jnp.broadcast_to(mem[0], (b, *mem[0].shape))
    mv = jnp.broadcast_to(mem[1], (b, *mem[1].shape))
    k = jnp.concatenate([mk, k], axis=-1)
    v = jnp.concatenate([mv, v], axis=-1)
    q = jax.nn.softmax(q, axis=-2) * (dim_head**-0.5)
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bhdn,bhen->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", context, q)
    out = out.transpose(0, 3, 1, 2).reshape(b, hh, ww, heads * dim_head)
    out = out @ params["out_kernel"] + params["out_bias"]
    g1 = params["out_norm_g"]
    on = out * jax.lax.rsqrt(jnp.sum(out**2, -1, keepdims=True) + 1e-12)
    return on * g1 * (out.shape[-1] ** 0.5)


def _naive_full_attention(x, params, heads=4, dim_head=32):
    """Round-1 [b,h,n,d] full attention (reference ddpm.py:242-271)."""
    b, hh, ww, c = x.shape
    n = hh * ww
    g0 = params["RMSNorm_0"]["g"]
    xn = x * jax.lax.rsqrt(jnp.sum(x**2, -1, keepdims=True) + 1e-12)
    xn = xn * g0 * (c**0.5)
    w_qkv = params["Conv_0"]["kernel"][0, 0]
    qkv = (xn.reshape(b, n, c) @ w_qkv).reshape(b, n, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [b,h,n,d]
    mem = params["mem_kv"]
    mk = jnp.broadcast_to(mem[0], (b, *mem[0].shape))
    mv = jnp.broadcast_to(mem[1], (b, *mem[1].shape))
    k = jnp.concatenate([mk, k], axis=-2)
    v = jnp.concatenate([mv, v], axis=-2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * dim_head**-0.5, k)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, heads * dim_head)
    return out @ params["Conv_1"]["kernel"][0, 0] + params["Conv_1"]["bias"]


def test_linear_attention_matches_naive_reference(rng):
    from lightning_generative_models_tpu.models.modules.attention import (
        LinearAttention,
    )

    x = jax.random.normal(rng, (2, 8, 8, 64))
    mod = LinearAttention(64)
    params = mod.init(jax.random.fold_in(rng, 1), x)["params"]
    out = mod.apply({"params": params}, x)
    ref = _naive_linear_attention(x, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_full_attention_matches_naive_reference(rng):
    from lightning_generative_models_tpu.models.modules.attention import Attention

    x = jax.random.normal(rng, (2, 4, 4, 64))
    mod = Attention(64)
    params = mod.init(jax.random.fold_in(rng, 1), x)["params"]
    out = mod.apply({"params": params}, x)
    ref = _naive_full_attention(x, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


# -- fused Pallas linear attention: kernel vs XLA composition ---------------

def _fla_args(rng, n=64, c=64, b=2, heads=4, dim_head=32, m=4):
    import lightning_generative_models_tpu.ops.linear_attention as FLA

    hd = heads * dim_head
    mk = lambda i, shape: jax.random.normal(jax.random.fold_in(rng, i), shape)
    x = mk(0, (b, n, c))
    g0 = mk(1, (c,)) * 0.1 + 1.0
    qkv_kernel = mk(2, (c, 3 * hd)) * (c**-0.5)
    mem_kv = mk(3, (2, heads, dim_head, m))
    out_kernel = mk(4, (hd, c)) * (hd**-0.5)
    out_bias = mk(5, (c,)) * 0.1
    g1 = mk(6, (c,)) * 0.1 + 1.0
    return FLA, (x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1)


@pytest.mark.parametrize("n,c,b", [(64, 64, 2), (256, 128, 2), (16, 256, 2),
                                   (1024, 64, 6)])
def test_fused_linear_attention_matches_xla(rng, n, c, b):
    """The b=6/n=1024 case spans multiple grid steps with rows>1."""
    FLA, args = _fla_args(rng, n=n, c=c, b=b)
    ref = FLA.linear_attention_xla(*args, heads=4, dim_head=32,
                                   dtype=jnp.float32)
    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        out = FLA.fused_linear_attention(*args, 4, 32, jnp.float32)
    finally:
        FLA._INTERPRET = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_path_gate_covers_backward_working_set():
    """The dispatch gate must bound the max of the fwd AND bwd per-step
    working sets (regression: the fwd-only 48 MB gate let n=4096 shapes
    pass, then Mosaic compile-failed at runtime with no fallback)."""
    from lightning_generative_models_tpu.ops.linear_attention import (
        _fused_path_fits,
    )

    # Flagship DDPM dim-64 32x32 stages must keep the fused path.
    assert _fused_path_fits(128, 1024, 64, 128)
    assert _fused_path_fits(128, 256, 128, 128)
    assert _fused_path_fits(128, 64, 256, 128)
    # n=4096 single-row: fwd ~15.7 MB (passes), bwd ~37 MB (must reject).
    assert not _fused_path_fits(8, 4096, 64, 128)


@pytest.mark.parametrize("n,b", [(32, 2), (512, 8)])
def test_fused_linear_attention_grads_match_xla(rng, n, b):
    """custom_vjp backward == jax.grad of the composition. The b=8/n=512
    case runs the backward over multiple grid steps with rows>1, covering
    the cross-step weight-gradient accumulation."""
    FLA, args = _fla_args(rng, n=n, c=64, b=b)

    def loss_fused(*a):
        return jnp.sum(FLA.fused_linear_attention(*a, 4, 32, jnp.float32) ** 2)

    def loss_xla(*a):
        return jnp.sum(
            FLA.linear_attention_xla(*a, heads=4, dim_head=32,
                                     dtype=jnp.float32) ** 2
        )

    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    finally:
        FLA._INTERPRET = old
    g_ref = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4)


def test_fused_linear_attention_residual_matches_xla(rng):
    """residual=True folds the surrounding `attn(x) + x` into the kernel."""
    FLA, args = _fla_args(rng, n=64, c=64)
    ref = FLA.linear_attention_xla(*args, heads=4, dim_head=32,
                                   dtype=jnp.float32, residual=True)
    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        out = FLA.fused_linear_attention(*args, 4, 32, jnp.float32, True)
    finally:
        FLA._INTERPRET = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    # and it really is out(residual=False) + x
    base = FLA.linear_attention_xla(*args, heads=4, dim_head=32,
                                    dtype=jnp.float32, residual=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(base + args[0]),
                               atol=1e-6, rtol=1e-6)


def test_fused_linear_attention_residual_grads_match_xla(rng):
    FLA, args = _fla_args(rng, n=32, c=64)

    def loss_fused(*a):
        return jnp.sum(
            FLA.fused_linear_attention(*a, 4, 32, jnp.float32, True) ** 2)

    def loss_xla(*a):
        return jnp.sum(
            FLA.linear_attention_xla(*a, heads=4, dim_head=32,
                                     dtype=jnp.float32, residual=True) ** 2)

    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    finally:
        FLA._INTERPRET = old
    g_ref = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4)


def test_fused_linear_attention_spmd_batch_sharded(rng):
    """custom_partitioning: batch-sharded inputs on an 8-device mesh give
    the same outputs and (psum'd) weight gradients as unsharded execution."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    FLA, args = _fla_args(rng, n=32, c=64, b=8)

    def loss(*a):
        return jnp.sum(FLA.fused_linear_attention(*a, 4, 32, jnp.float32) ** 2)

    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        ref_out = jax.jit(loss)(*args)
        ref_grads = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(*args)

        devs = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("data",))
        xs = jax.device_put(args[0], NamedSharding(mesh, P("data", None, None)))
        rest = [jax.device_put(a, NamedSharding(mesh, P())) for a in args[1:]]
        out = jax.jit(loss)(xs, *rest)
        grads = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(xs, *rest)
    finally:
        FLA._INTERPRET = old

    np.testing.assert_allclose(float(out), float(ref_out), rtol=1e-5)
    for gs, gr in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_fused_linear_attention_head_scale_disparity(rng):
    """Regression: with one head's qkv columns scaled far above the others,
    a row-global softmax stabilizer underflowed the small heads' segments
    to 0/0 NaN. The per-head-max stabilizer must stay finite and match XLA."""
    FLA, args = _fla_args(rng, n=64, c=64)
    qkv = np.asarray(args[2]).copy()
    # head 0's q columns dominate: logits gap >> 88 (f32 exp underflow)
    qkv[:, :32] *= 300.0
    args = (args[0], args[1], jnp.asarray(qkv), *args[3:])
    ref = FLA.linear_attention_xla(*args, heads=4, dim_head=32,
                                   dtype=jnp.float32)
    assert np.isfinite(np.asarray(ref)).all()
    old = FLA._INTERPRET
    FLA._INTERPRET = jax.default_backend() != "tpu"
    try:
        out = FLA.fused_linear_attention(*args, 4, 32, jnp.float32)
        g = jax.grad(
            lambda *a: jnp.sum(
                FLA.fused_linear_attention(*a, 4, 32, jnp.float32) ** 2)
        )(*args)
    finally:
        FLA._INTERPRET = old
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)
