"""Round-3 DDPM train-step attack: interleaved A/B variants on the real TPU.

Round-2 profile attribution (experiments/DDPM/profile_r2, re-analyzed with
the xplane proto): of a 17.4 ms step — conv fwd 17.7%, conv wgrad 13.9%,
fused linear attention 18.2%, GN/FiLM chains ~16%, LAYOUT COPIES 15.7%
(5469 ops! relayouts around the Pallas calls + weight-layout churn),
weight-shaped optimizer fusions ~12% (batch-independent), EMA lax.cond 2.6%.

Variants measured here (same process, interleaved, min-of-reps — see
memory: shared-chip contention is additive, min is the steady-state):

- base128 / base256 / base512: the shipped train step at different global
  batches. Weight-shaped work (~2.5 ms: opt update, wgrad tails, EMA) is
  batch-independent, so larger batches amortize it per-image.
- unroll2: two train steps per dispatch (the --unroll_steps path), to
  resolve the VERDICT r2 contradiction under the hardened protocol.
- remat128: nn.remat on ResnetBlock (recompute in bwd; trades FLOPs for
  HBM traffic).
- autolayout128: jit with Layout.AUTO on the donated state so XLA picks
  parameter layouts (kills canonical-layout copies around wgrad/opt).

Usage: python scripts/conv_attack.py [--variants a,b,c] [--steps N]
Prints one line per variant: img/s + per-step ms.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(__file__), "..", "experiments", ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def make_batch(bs):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 32, 32, 3), dtype=np.uint8),
        "label": rs.randint(0, 10, size=bs).astype(np.int32),
    }


def make_model():
    return DDPM(img_channels=3, img_size=32, dim=64, diffusion_timesteps=1000,
                sampling_timesteps=50, use_bf16=True)


class Variant:
    """One compiled train-step chain with its own state."""

    def __init__(self, name, bs, steps_per_dispatch=1, jit_kwargs=None,
                 model=None, images_per_dispatch=None):
        self.name = name
        self.bs = bs
        self.k = steps_per_dispatch
        self.images = images_per_dispatch or bs * steps_per_dispatch
        model = model or make_model()
        rng = jax.random.PRNGKey(0)
        state = jax.jit(model.init_state)(rng)
        self.rng = rng
        batch = jax.tree_util.tree_map(jax.device_put, make_batch(bs))

        if steps_per_dispatch == 1:
            fn = model.train_step
        else:
            def fn(state, b, r, _k=steps_per_dispatch, _m=model):
                m = None
                for _ in range(_k):
                    state, m = _m.train_step(state, b, r)
                return state, m

        kw = dict(donate_argnums=0)
        kw.update(jit_kwargs or {})
        self.step = jax.jit(fn, **kw)
        self.state = state
        self.batch = batch

    def chain(self, n):
        m = None
        for _ in range(n):
            self.state, m = self.step(self.state, self.batch, self.rng)
        _readback(m)

    def compile(self):
        t0 = time.perf_counter()
        self.chain(1)
        return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--variants", type=str,
                   default="base128,base256,unroll2,remat128,autolayout128")
    args = p.parse_args()
    wanted = args.variants.split(",")

    variants = []

    def add(v):
        # Compile AT CONSTRUCTION, inside any active monkeypatch scope —
        # a deferred compile loop would trace patched code into other
        # variants (and unpatched code into this one).
        try:
            dt = v.compile()
            print(f"[compile] {v.name}: {dt:.1f}s", flush=True)
            variants.append(v)
        except Exception as e:
            print(f"[compile] {v.name}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    for name in wanted:
        if name == "base128":
            add(Variant("base128", 128))
        elif name == "base256":
            add(Variant("base256", 256))
        elif name == "base512":
            add(Variant("base512", 512))
        elif name == "unroll2":
            add(Variant("unroll2", 128, steps_per_dispatch=2))
        elif name == "remat128":
            import flax.linen as nn

            from lightning_generative_models_tpu.models.diffusion import (
                unet as unet_mod,
            )

            orig = unet_mod.ResnetBlock
            unet_mod.ResnetBlock = nn.remat(orig)
            try:
                add(Variant("remat128", 128))
            finally:
                unet_mod.ResnetBlock = orig
        elif name == "autolayout128":
            from jax.experimental.layout import Format, Layout

            auto = Format(Layout.AUTO)
            add(
                Variant(
                    "autolayout128", 128,
                    jit_kwargs=dict(
                        in_shardings=(auto, None, None),
                        out_shardings=(auto, None),
                    ),
                )
            )
        elif name == "xlaattn1024":
            # XLA linear attention at the 32x32 stage (n=1024) only: the
            # Pallas call forces {2,1,0} row-major operands while the convs
            # produce {0,3,2,1}, costing ~0.7 ms of relayout copies per step
            # in the r2 profile. Does the kernel still win at n=1024 after
            # paying them?
            from lightning_generative_models_tpu.ops import (
                linear_attention as fla,
            )

            orig_fits = fla._fused_path_fits

            def fits_except_1024(b, n, c, hd):
                return n != 1024 and orig_fits(b, n, c, hd)

            fla._fused_path_fits = fits_except_1024
            try:
                add(Variant("xlaattn1024", 128))
            finally:
                fla._fused_path_fits = orig_fits
        elif name == "fwd128":
            # Loss forward only (no grad/update): splits fwd vs bwd+update.
            model = make_model()

            def fwd_fn(state, batch, rng, _m=model):
                from lightning_generative_models_tpu.ops.preprocess import (
                    prepare_batch,
                )

                rng = jax.random.fold_in(rng, state.step)
                aug_rng, loss_rng = jax.random.split(rng)
                x01 = prepare_batch(batch, aug_rng, train=True)["image"]
                loss = _m.diffusion.p_losses(
                    _m._apply_fn(state.params["model"]), x01, loss_rng
                )
                return state.replace(step=state.step + 1), {"loss": loss}

            v = Variant("fwd128", 128, model=model, jit_kwargs={})
            v.step = jax.jit(fwd_fn, donate_argnums=0)
            add(v)
        elif name == "gated128":
            import functools

            model = make_model()
            v = Variant("gated128", 128, model=model)
            v.step_ema = jax.jit(
                functools.partial(model.train_step_gated, do_ema=True),
                donate_argnums=0,
            )
            v.step_noema = jax.jit(
                functools.partial(model.train_step_gated, do_ema=False),
                donate_argnums=0,
            )
            v.state = v.state.replace(step=jnp.asarray(1000, jnp.int32))
            v.images = 128 * 10  # one "chain unit" = a 10-step EMA cycle
            v.k = 10

            def gated_chain(n, _v=v):
                m = None
                for _ in range(n):
                    for _ in range(9):
                        _v.state, m = _v.step_noema(_v.state, _v.batch, _v.rng)
                    _v.state, m = _v.step_ema(_v.state, _v.batch, _v.rng)
                _readback(m)

            v.chain = gated_chain
            add(v)
        elif name == "rowmajor128":
            # Constrain every 4-D UNet conv output to row-major NHWC: XLA
            # prefers batch-minor {0,3,2,1} for conv activations, and every
            # Pallas attention boundary then pays a full-tensor relayout
            # copy (25 copies of bf16[128,32,32,64] per step, ~1.1 ms total
            # across stages in the r3 profile). If convs can write
            # row-major directly for less than that, the copies vanish.
            import flax.linen as nn
            from jax.experimental.layout import (
                Format,
                Layout,
                with_layout_constraint,
            )

            row = Layout(major_to_minor=(0, 1, 2, 3))
            del Format  # with_layout_constraint wants a bare Layout

            # Method-level patch: a subclass would change flax's automatic
            # module naming (params land under RMConv_0, apply looks for
            # Conv_0 — the first attempt's ScopeParamNotFoundError).
            orig_call = nn.Conv.__call__

            def call_rowmajor(self, x):
                y = orig_call(self, x)
                if y.ndim == 4:
                    y = with_layout_constraint(y, row)
                return y

            nn.Conv.__call__ = call_rowmajor
            try:
                add(Variant("rowmajor128", 128))
            finally:
                nn.Conv.__call__ = orig_call
        elif name == "mubf16":
            # Adam first moment in bf16 (optax mu_dtype): the optimizer's
            # ~2.15 ms/step is bandwidth-bound over 4 weight-shaped trees
            # (params, grads, mu, nu); halving mu's footprint cuts ~1/8 of
            # that traffic. Changes numerics (not bit-identical) — would
            # ship as an opt-in flag only on a measured win.
            import optax

            model = make_model()
            model.optimizer = optax.adam(
                2e-5, b1=0.9, b2=0.99, mu_dtype=jnp.bfloat16
            )
            add(Variant("mubf16", 128, model=model))
        elif name == "munubf16":
            # Both Adam moments in bf16 (the shipped --mu_dtype/--nu_dtype
            # path). Measured: 7579 vs 7440 base / 7510 mubf16 img/s.
            import optax

            from lightning_generative_models_tpu.train.state import (
                with_nu_dtype,
            )

            model = make_model()
            model.optimizer = with_nu_dtype(
                optax.adam(2e-5, b1=0.9, b2=0.99, mu_dtype=jnp.bfloat16),
                jnp.bfloat16,
            )
            add(Variant("munubf16", 128, model=model))
        elif name.startswith("vmem"):
            kib = int(name[4:]) * 1024
            add(
                Variant(
                    name, 128,
                    jit_kwargs=dict(
                        compiler_options={
                            "xla_tpu_scoped_vmem_limit_kib": str(kib)
                        }
                    ),
                )
            )
        else:
            raise SystemExit(f"unknown variant {name}")

    n1 = max(args.steps // 5, 1)
    n2 = args.steps
    seg1 = {v.name: [] for v in variants}
    seg2 = {v.name: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:  # interleaved: every rep visits every variant
            t0 = time.perf_counter()
            v.chain(n1)
            t1 = time.perf_counter()
            v.chain(n2)
            t2 = time.perf_counter()
            seg1[v.name].append(t1 - t0)
            seg2[v.name].append(t2 - t1)
        print(f"[rep {rep}] done", flush=True)

    print("\n=== results (min-of-segments slope) ===")
    for v in variants:
        per_dispatch = (min(seg2[v.name]) - min(seg1[v.name])) / (n2 - n1)
        per_img = per_dispatch / v.images
        print(f"{v.name:16s}  {1.0 / per_img:10.1f} img/s   "
              f"{per_dispatch * 1e3 / v.k:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
