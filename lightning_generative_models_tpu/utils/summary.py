"""Per-layer model summaries (reference: torchinfo tables printed at model
construction, /root/reference/models/generative/gan/gan.py:323-354 and
ddpm.py:1061-1094).

Two levels:

- :func:`param_table` — always available: walks the params pytree and prints
  one row per parameter leaf (path, shape, dtype, count). No inputs needed.
- :func:`module_table` — ``flax.linen.tabulate`` over a module with example
  inputs: layer hierarchy, output shapes, params, and forward FLOPs (XLA
  cost-analysis based). Models opt in by returning specs from
  ``summary_spec()``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import numpy as np


def _count(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_table(params: Dict[str, Any], max_rows: int = 200) -> str:
    """Torchinfo-style per-layer parameter table from a params pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows: list[Tuple[str, str, str, int]] = []
    for path, leaf in flat:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))).__str__() for k in path
        )
        rows.append((name, str(tuple(leaf.shape)), str(leaf.dtype), int(np.prod(leaf.shape))))

    name_w = max([len(r[0]) for r in rows] + [10])
    shape_w = max([len(r[1]) for r in rows] + [7])
    lines = [
        f"{'layer':<{name_w}}  {'shape':<{shape_w}}  {'dtype':<10}  {'params':>12}",
        "-" * (name_w + shape_w + 30),
    ]
    shown = rows[:max_rows]
    for name, shape, dtype, count in shown:
        lines.append(f"{name:<{name_w}}  {shape:<{shape_w}}  {dtype:<10}  {count:>12,}")
    if len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more rows)")
    lines.append("-" * (name_w + shape_w + 30))
    lines.append(f"{'total':<{name_w}}  {'':<{shape_w}}  {'':<10}  {_count(params):>12,}")
    return "\n".join(lines)


def module_table(
    module: Any,
    example_args: Sequence[Any],
    compute_flops: bool = True,
    depth: int = 2,
    **apply_kwargs: Any,
) -> str:
    """flax.linen.tabulate table: layer tree, output shapes, params, FLOPs."""
    import flax.linen as nn

    fn = nn.tabulate(
        module,
        jax.random.PRNGKey(0),
        depth=depth,
        compute_flops=compute_flops,
        console_kwargs={"width": 120, "force_terminal": False},
    )
    return fn(*example_args, **apply_kwargs)
