"""Mesh-sharded IL training step.

Wraps trainers.base_trainer.make_train_step (the exact compute graph the
single-chip trainer runs) in a jit whose argument shardings place:

- params / optimizer state: tensor-parallel over ``model``
  (parallel.mesh.param_shardings), replicated over ``data``;
- the (T*N, ...) flattened observation batch, prev_actions: ``data`` on
  the leading axis;
- the (T, N) mask / target / weight arrays: ``data`` on the lane axis;
- rnn_states (N, L, H): ``data`` on the lane axis.

XLA then inserts the grad psum over ``data`` and the activation
all-gathers over ``model`` — no hand-written collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ivlnce_tpu.parallel.mesh import param_shardings
from ivlnce_tpu.trainers.base_trainer import make_train_step


def sharded_train_step(
    policy,
    optimizer,
    mesh: Mesh,
    params,
    opt_state,
    use_progress: bool = True,
    alpha: float = 1.0,
    update_map_bn: bool = False,
):
    """Return a jitted train step with explicit mesh shardings.

    Call as ``step(params, opt_state, observations, prev_actions,
    episode_masks, tour_masks, corrected, weights, rnn_states)`` where
    masks/corrected/weights are (T, N) and observations are flattened
    (T*N, ...).
    """
    step = make_train_step(
        policy, optimizer, use_progress, alpha, update_map_bn=update_map_bn
    )

    p_sh = param_shardings(params, mesh)
    o_sh = param_shardings(opt_state, mesh)
    flat = NamedSharding(mesh, P("data"))  # prefix: shards dim0 of leaves
    lane = NamedSharding(mesh, P(None, "data"))
    rnn = NamedSharding(mesh, P("data", None, None))

    return jax.jit(
        step,
        in_shardings=(p_sh, o_sh, flat, flat, lane, lane, lane, lane, rnn),
        out_shardings=(
            p_sh,
            o_sh,
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
            rnn,
        ),
        donate_argnums=(0, 1),
    )
