"""Parallelism for Monte-Carlo planner evaluation (SURVEY.md section 2,
"Parallelism strategies"). The reference is a single-process ROS node graph
with NO parallelism; the TPU framework's axes are:

(a) DATA parallelism over orchards: vmap over PRNG keys inside each device,
    shard_map over the mesh 'data' axis across devices. Rollouts are
    independent, so the only collective is the final metrics reduction
    (psum over ICI) - no DCN traffic.
(b) spatial parallelism inside kernels (XLA fusion / Pallas tiles over the
    grid) - see aosx.perceive / aosx.gvd.

Sequence/tensor/pipeline/expert parallelism are N/A for this workload
(SURVEY.md section 5, long-context note) and deliberately not built.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import engine
from ..config import AosParams, Statics
from ..orchards import OrchardSpec, make_orchard


def rollout_summary(final, metrics):
    """Small per-orchard result pytree (keeps host transfer tiny)."""
    status = metrics["status"]
    done = metrics["completed"]
    first_done = jnp.min(
        jnp.where(done, jnp.arange(done.shape[0]), done.shape[0])
    )
    path_len = jnp.sum(
        jnp.sqrt(jnp.sum(jnp.diff(metrics["xy"], axis=0) ** 2, axis=1))
    )
    return dict(
        completed=final.mission.exploration_completed,
        steps_to_complete=first_done,
        final_status=status[-1],
        travel_distance=path_len,
        final_dist_to_origin=jnp.sqrt(jnp.sum(final.robot.xy**2)),
        waypoints=final.wp.count,
    )


def rollout_one(key, spec: OrchardSpec, params: AosParams, s: Statics, n_steps: int,
                ror_method: str = "sorted"):
    """One procedural orchard: generate -> perceive -> GVD -> closed loop."""
    pc, poly = make_orchard(key, spec, s)
    excl = jnp.zeros((s.max_exclusions, 3), jnp.float32)
    world = engine.prepare_world(pc, poly, params, excl, s, ror_method=ror_method)
    final, metrics = engine.episode(world, params, s, n_steps)
    return rollout_summary(final, metrics)


def batched_rollouts(keys, spec, params, s, n_steps, ror_method="sorted"):
    """vmap over orchards within one device."""
    return jax.vmap(
        lambda k: rollout_one(k, spec, params, s, n_steps, ror_method)
    )(keys)


def sharded_rollouts(keys, spec, params, s, n_steps, mesh: Mesh,
                     ror_method="sorted"):
    """shard_map the orchard batch across the mesh 'data' axis; each device
    runs its shard with vmap; a psum reduces the completion count (the only
    collective - rides ICI)."""

    def shard_fn(k):
        out = batched_rollouts(k, spec, params, s, n_steps, ror_method)
        total_done = jax.lax.psum(
            jnp.sum(out["completed"].astype(jnp.int32)), "data"
        )
        return out, total_done

    f = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P()),
        check_vma=False,  # scan carries inside the rollout start unvarying
    )
    return jax.jit(f)(keys)
