"""Sharded training steps: dp x tp SPMD over a device mesh.

``make_sharded_train_step`` is models.make_train_step with placement: params
are laid out by ``param_specs`` (e.g. mesh.mlp_sharding_rules), batches are
split on ``dp``, and the jitted step inherits the input shardings — XLA's
SPMD partitioner emits the psum/all-gather collectives over ICI.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from jax.sharding import Mesh, PartitionSpec

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.mlp import make_train_step
from minidiff_tpu.models.optim import SGD, Optimizer
from minidiff_tpu.parallel.mesh import shard_tree

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Tuple


def make_sharded_train_step(
    model: "Any",
    mesh: Mesh,
    optimizer: "Optional[Optimizer]" = None,
    loss_fn: "Callable" = F.cross_entropy,
    param_specs: "Any" = None,
    batch_spec: "Optional[PartitionSpec]" = None,
    apply_fn: "Optional[Callable]" = None,
):
    """Returns (step, place_params, place_batch).

    step(params, opt_state, x, y) -> (params, opt_state, loss), jit-compiled;
    place_* lay inputs out on the mesh (params per param_specs, batch split
    on the dp axis).  Outputs keep their shardings, so iterating
    ``params, opt_state, loss = step(place_params(params), ...)`` never
    gathers state back to one device.
    """
    optimizer = optimizer or SGD(0.1)
    step = make_train_step(model, optimizer, loss_fn=loss_fn, jit=True,
                           apply_fn=apply_fn)

    if batch_spec is None:
        batch_spec = PartitionSpec("dp") if "dp" in mesh.axis_names else PartitionSpec()

    def place_params(tree: "Any") -> "Any":
        if param_specs is None:
            return shard_tree(tree, mesh, PartitionSpec())
        return shard_tree(tree, mesh, param_specs)

    def place_batch(x: "md.Tensor", y: "md.Tensor") -> "Tuple[md.Tensor, md.Tensor]":
        xs = shard_tree(x, mesh, PartitionSpec(*batch_spec, *([None] * (x.ndim - len(batch_spec)))))
        ys = shard_tree(y, mesh, batch_spec)
        return xs, ys

    return step, place_params, place_batch
