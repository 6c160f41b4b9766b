"""Training state: a functional, multi-optimizer replacement for Lightning.

The reference relies on ``pl.LightningModule`` to own parameters, (multiple)
optimizers, EMA copies and step counters, updated by side effect
(reference: models/generative/gan/gan.py:118,151-165 manual optimization;
models/generative/diffusion/ddpm.py:998 EMA). On TPU all of that becomes one
immutable pytree threaded through pure jitted step functions, so the entire
optimization step — including alternating GAN updates — compiles to a single
XLA program.

``params`` / ``mutable`` / ``opt_state`` are dicts keyed by *parameter group*
(e.g. ``{"G": ..., "D": ...}``), which is how the reference's multiple
optimizers are expressed functionally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Immutable training state threaded through jitted steps."""

    step: jax.Array
    params: Dict[str, Any]
    mutable: Dict[str, Any]  # per-group mutable collections (batch_stats, ema codebook)
    opt_state: Dict[str, Any]
    ema_params: Optional[Any] = None  # EMA weights (diffusion); None otherwise

    def apply_updates(self, group: str, updates: Any) -> "TrainState":
        new_params = dict(self.params)
        new_params[group] = optax.apply_updates(self.params[group], updates)
        return self.replace(params=new_params)


# Process-wide dtype for Adam's first moment (``mu``). ``None`` keeps optax's
# default (moments match the param dtype, fp32 here). ``jnp.bfloat16`` halves
# mu's HBM footprint; the optimizer slice of a train step is bandwidth-bound
# over four weight-shaped trees (params, grads, mu, nu), so this trims ~1/8 of
# that traffic — measured +1.7% on the DDPM bs128 step on a v5e (7530 vs 7403
# img/s, scripts/conv_attack.py base128/mubf16 interleaved). Changes numerics
# (not bit-identical): 60-step tiny-DDPM loss trajectories track f32-mu to
# <=0.13% relative on CPU. Opt-in via ``train.py --mu_dtype bfloat16``; set
# BEFORE model construction (models bake their optimizer at __init__).
_MU_DTYPE: Optional[Any] = None

# Same story for the second moment (``nu``): optax has no nu_dtype knob, so
# ``with_nu_dtype`` wraps the transform to store nu in bf16 (compute stays
# f32 via type promotion inside scale_by_adam). Measured +0.9% on top of
# bf16-mu on the DDPM bs128 v5e step (7579 vs 7510 img/s; +1.9% total over
# f32 moments). Numerics: bf16's 8-bit mantissa perturbs the per-param step
# scale ~0.2% after the sqrt; 60-step tiny-DDPM loss trajectories track f32
# to <=0.23% relative on CPU. Opt-in via ``train.py --nu_dtype bfloat16``.
_NU_DTYPE: Optional[Any] = None


def set_default_mu_dtype(dtype: Optional[Any]) -> None:
    """Set the process-wide Adam first-moment dtype (None = param dtype)."""
    global _MU_DTYPE
    _MU_DTYPE = dtype


def default_mu_dtype() -> Optional[Any]:
    return _MU_DTYPE


def set_default_nu_dtype(dtype: Optional[Any]) -> None:
    """Set the process-wide Adam second-moment dtype (None = param dtype)."""
    global _NU_DTYPE
    _NU_DTYPE = dtype


def default_nu_dtype() -> Optional[Any]:
    return _NU_DTYPE


def with_nu_dtype(
    opt: optax.GradientTransformation, dtype: Optional[Any]
) -> optax.GradientTransformation:
    """Store any ``nu`` field in the optimizer state as ``dtype``.

    The state's pytree STRUCTURE is unchanged (only leaf dtypes), so
    checkpoints remain structurally compatible — but a resume must use the
    same dtype choice as the original run (documented on the CLI flag).
    """
    if dtype is None:
        return opt

    def _cast(state: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda s: s._replace(
                nu=jax.tree_util.tree_map(lambda x: x.astype(dtype), s.nu)
            )
            if hasattr(s, "nu")
            else s,
            state,
            is_leaf=lambda s: hasattr(s, "nu"),
        )

    def _update(updates, state, params=None):
        u, s = opt.update(updates, state, params)
        return u, _cast(s)

    return optax.GradientTransformation(
        lambda params: _cast(opt.init(params)), _update
    )


def make_adam(
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam with torch semantics: L2 weight decay added to the gradient
    *before* the moment update (torch.optim.Adam, not AdamW) — matches the
    reference's optimizer settings (e.g. gan.py configure_optimizers).
    """
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps += [
        optax.scale_by_adam(b1=b1, b2=b2, mu_dtype=_MU_DTYPE),
        optax.scale(-lr),
    ]
    return with_nu_dtype(optax.chain(*steps), _NU_DTYPE)


def make_rmsprop(lr: float) -> optax.GradientTransformation:
    """RMSprop matching torch defaults (alpha=0.99, eps=1e-8) — used by the
    reference's WGAN weight-clipping variant (wgan.py:170-181)."""
    return optax.rmsprop(learning_rate=lr, decay=0.99, eps=1e-8)


def init_multi_opt(
    optimizers: Dict[str, optax.GradientTransformation],
    params: Dict[str, Any],
) -> Dict[str, Any]:
    return {k: optimizers[k].init(params[k]) for k in optimizers}


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """ema <- decay * ema + (1 - decay) * new."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        new_params,
    )


def global_norm(tree: Any) -> jax.Array:
    return optax.global_norm(tree)


def count_params(tree: Any) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(tree))
