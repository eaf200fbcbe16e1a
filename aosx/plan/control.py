"""Control-mode state machine (C12; reference: src/aos_state_machine_node.cpp).

Pure function of (state, pose, plan path) -> (state, mod, goal) - trivially
vmappable across the orchard batch. Mode meanings: 0 follow, 1 precise
approach, 2 semi-precise approach, 3 stop/arrived.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AosParams
from ..geom import normalized_angle
from ..types import ControlState, Path


def on_path(state: ControlState, path: Path) -> ControlState:
    """pathCallback (cpp:60-77): adopt the new goal (last pose of /plan) only
    when it differs from the current goal."""
    has = path.count > 0
    gi = jnp.maximum(path.count - 1, 0)
    new_xy = path.xy[gi]
    new_yaw = path.yaw[gi]
    changed = has & (
        ~state.goal_initialized
        | jnp.any(new_xy != state.goal_xy)
        | (new_yaw != state.goal_yaw)
    )
    return ControlState(
        mode=state.mode,
        is_path_received=state.is_path_received | changed,
        goal_initialized=state.goal_initialized | changed,
        odom_cnt=state.odom_cnt,
        goal_xy=jnp.where(changed, new_xy, state.goal_xy),
        goal_yaw=jnp.where(changed, new_yaw, state.goal_yaw),
    )


def control_tick(
    state: ControlState, pose_xy, pose_yaw, params: AosParams
):
    """baseLinkOdomCallback + updateControlMode (cpp:83-141) for ONE odometry
    message. Returns (state, publish: bool, mod, goal_xy, goal_yaw).

    The 1-in-5 decimation (cpp:84-86) is reproduced via odom_cnt; when the
    decimator skips, publish=False and mode is unchanged. Before the first
    path arrives, mod 3 is published (cpp:88-92).
    """
    cnt = state.odom_cnt + 1
    fire = (cnt % params.sm_skipping_hz) == 0
    cnt = jnp.where(fire, 0, cnt)

    dist = jnp.sqrt(jnp.sum((state.goal_xy - pose_xy) ** 2))
    yaw_diff = jnp.abs(normalized_angle(state.goal_yaw - pose_yaw))

    m = state.mode
    pr = state.is_path_received
    stop1 = (dist < params.sm_precise_dist) & (yaw_diff < params.sm_precise_yaw) & (m == 1) & pr
    stop2 = (dist < params.sm_semi_dist) & (yaw_diff < params.sm_semi_yaw) & (m == 2) & pr
    approach = (dist < params.sm_approach_dist) & (m != 3)
    follow = (m != 2) & (m != 1) & pr

    new_mode = jnp.where(
        stop1 | stop2,
        3,
        jnp.where(approach, 2, jnp.where(follow, 0, m)),  # is_precise_task=false (cpp:48)
    )
    new_pr = jnp.where(stop1 | stop2, False, pr)

    mode = jnp.where(fire & state.goal_initialized, new_mode, state.mode)
    pr_out = jnp.where(fire & state.goal_initialized, new_pr, state.is_path_received)
    mod_out = jnp.where(state.goal_initialized, mode, 3)

    st = ControlState(
        mode=mode,
        is_path_received=pr_out,
        goal_initialized=state.goal_initialized,
        odom_cnt=cnt,
        goal_xy=state.goal_xy,
        goal_yaw=state.goal_yaw,
    )
    return st, fire, mod_out, state.goal_xy, state.goal_yaw
