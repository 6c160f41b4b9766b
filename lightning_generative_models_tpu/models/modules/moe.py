"""Mixture-of-Experts MLP — Switch-style top-1 routing, GShard dispatch.

Beyond reference (the reference has no MoE anywhere); this is the
TPU-canonical formulation (Lepikhin et al. 2020 GShard, arXiv:2006.16668;
Fedus et al. 2021 Switch, arXiv:2101.03961): routing is expressed as two
dense einsums against a static-shaped one-hot dispatch tensor, so the whole
layer is MXU matmuls with no dynamic shapes, no sorting, and no host
round-trips — exactly what XLA wants. Tokens over capacity are dropped
(their residual branch contributes zero, the skip connection carries them),
and a load-balancing auxiliary loss keeps the router spread.

Expert parallelism falls out as a layout annotation like everything else in
this repo: the expert-major parameters ``wi/wo/bi/bo`` ([e, ...]) are
sharded over the mesh's "model" axis (parallel/mesh.py:tp_sharding), and
GSPMD turns the dispatch/combine einsums into the all-to-all exchange.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEMlp(nn.Module):
    """Drop-in replacement for the transformer MLP (fc1 -> gelu -> fc2).

    ``capacity_factor`` sets each expert's token budget per batch row:
    ``cap = ceil(n * capacity_factor / num_experts)`` — static, so the
    dispatch tensors compile to fixed shapes. The Switch load-balancing loss
    ``e * sum_e(f_e * P_e)`` (f = routed-token fraction, P = mean router
    probability; 1.0 at perfect balance) is sown into the "intermediates"
    collection as ``moe_aux`` — a no-op unless the caller applies with
    ``mutable=["intermediates"]`` (the DDPM train loss does; samplers don't).
    """

    hidden: int
    mlp_dim: int
    num_experts: int
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        e = self.num_experts
        cap = max(1, math.ceil(n * self.capacity_factor / e))

        # Router in f32 (tiny, and argmax/softmax precision matters).
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)  # [b, n, e]
        gate = jnp.max(probs, axis=-1)  # [b, n]
        choice = jnp.argmax(probs, axis=-1)  # [b, n]
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)  # [b, n, e]

        # Load balance BEFORE capacity dropping (Switch eq. 4).
        f_frac = onehot.mean(axis=(0, 1))  # [e]
        p_mean = probs.mean(axis=(0, 1))  # [e]
        self.sow("intermediates", "moe_aux", e * jnp.sum(f_frac * p_mean))

        # Position of each token within its expert (1-based); tokens past
        # the capacity fall out of the one-hot range and vanish.
        pos = jnp.cumsum(onehot, axis=1) * onehot  # [b, n, e]
        slot = jnp.sum(pos, axis=-1).astype(jnp.int32) - 1  # [b, n], -1 = none
        dispatch = (
            jax.nn.one_hot(slot, cap, dtype=jnp.float32)[:, :, None, :]
            * onehot[..., None]
        )  # [b, n, e, cap]
        combine = dispatch * gate[:, :, None, None]

        # Expert-major parameters: dim 0 is the expert-parallel axis.
        lecun = nn.initializers.lecun_normal()
        wi = self.param("wi", lecun, (e, d, self.mlp_dim))
        bi = self.param("bi", nn.initializers.zeros, (e, self.mlp_dim))
        wo = self.param("wo", lecun, (e, self.mlp_dim, d))
        bo = self.param("bo", nn.initializers.zeros, (e, d))

        xd = x.astype(self.dtype)
        xin = jnp.einsum("bnec,bnd->ebcd", dispatch.astype(self.dtype), xd)
        h = jnp.einsum("ebcd,edf->ebcf", xin, wi.astype(self.dtype))
        h = nn.gelu(h + bi.astype(self.dtype)[:, None, None, :],
                    approximate=True)
        out = jnp.einsum("ebcf,efd->ebcd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[:, None, None, :]
        return jnp.einsum(
            "bnec,ebcd->bnd", combine.astype(self.dtype), out
        )
