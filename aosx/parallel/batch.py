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


# ---------------------------------------------------------------------------
# chunked rollouts: the axon tunnel kills device calls running longer than
# ~60 s, which caps a single-call batched episode at batch ~64. Splitting the
# episode into step chunks (state carried across jit calls, summary
# accumulated IN-jit so nothing is stacked) keeps every call short and lets
# the batch fill HBM instead.
# ---------------------------------------------------------------------------


def _acc_init(s: Statics, n_steps_total: int):
    return dict(
        first_done=jnp.int32(n_steps_total),
        travel=jnp.float32(0.0),
        last_xy=jnp.zeros((2,), jnp.float32),
        has_prev=jnp.bool_(False),
        last_status=jnp.int32(0),
    )


def rollout_begin(key, spec: OrchardSpec, params: AosParams, s: Statics,
                  n_steps_total: int, ror_method: str = "sorted"):
    """Build the world + initial state + summary accumulator for one orchard."""
    pc, poly = make_orchard(key, spec, s)
    excl = jnp.zeros((s.max_exclusions, 3), jnp.float32)
    world = engine.prepare_world(pc, poly, params, excl, s, ror_method=ror_method)
    return world, engine.initial_state(world, s), _acc_init(s, n_steps_total)


def rollout_chunk(world, st, acc, params, s: Statics, n: int, offset):
    """Advance one rollout by n control ticks, folding the summary stats
    (first completion step, sequential travel distance, last status) into
    the accumulator instead of stacking per-step metrics."""

    def body(carry, i):
        st, acc = carry
        st, m = engine.step(st, world, params, s)
        xy = m["xy"]
        seg = jnp.sqrt(jnp.sum((xy - acc["last_xy"]) ** 2))
        acc = dict(
            first_done=jnp.minimum(
                acc["first_done"],
                jnp.where(m["completed"], offset + i, acc["first_done"]),
            ),
            travel=acc["travel"] + jnp.where(acc["has_prev"], seg, 0.0),
            last_xy=xy,
            has_prev=jnp.bool_(True),
            last_status=m["status"],
        )
        return (st, acc), None

    (st, acc), _ = jax.lax.scan(body, (st, acc), jnp.arange(n, dtype=jnp.int32))
    return st, acc


def rollout_finish(st, acc):
    """Same fields as rollout_summary (travel accumulated sequentially, so it
    can differ from the stacked-diff sum by float rounding ~1e-4)."""
    return dict(
        completed=st.mission.exploration_completed,
        steps_to_complete=acc["first_done"],
        final_status=acc["last_status"],
        travel_distance=acc["travel"],
        final_dist_to_origin=jnp.sqrt(jnp.sum(st.robot.xy**2)),
        waypoints=st.wp.count,
    )
