"""Ops dashboard - the aos_panel_plugin replacement (C13; reference:
src/ui/aos_panel_plugin*.cpp, ~1350 LoC of Qt). The RViz panel's four
functions map to:

- status tab        -> episode_report(): control-mode text, position,
                       cluster/waypoint progress with the panel's formula
                       (total waypoints = 2 per cluster + 3 for the last;
                       aos_panel_plugin_ros2.cpp:232-244)
- parameters tab    -> params_get/params_set: read/patch the
                       aos_planner_params.yaml schema (the panel regex-patches
                       the YAML; we round-trip it structurally)
- remote control    -> N/A (no station link in the sim engine)
- map save chain    -> save_map(): checkpoint the world + cluster info
                       (replacing /lio_sam/save_map + /gvd/save_cluster_info)

Run: python -m aosx.dashboard [--steps N] [--pcd file] [--out dir]
     python -m aosx.dashboard --pcd-seq 'maps/frame_*.pcd'   # growing SLAM
     map snapshots through the exact incremental engine (aosx.incremental)
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

MODE_TEXT = {0: "Path Following", 1: "Precise Approach", 2: "Semi-Precise Approach", 3: "Stopped/Arrived"}


def panel_total_waypoints(n_clusters: int) -> int:
    """The panel's progress denominator (aos_panel_plugin_ros2.cpp:232-244):
    2 waypoints per cluster plus 3 on the last."""
    if n_clusters <= 0:
        return 0
    return 2 * (n_clusters - 1) + 3


def episode_report(final, metrics, statics) -> dict:
    from .guards import describe
    from .types import STATUS_STRINGS

    status = int(np.asarray(metrics["status"])[-1])
    mod = int(np.asarray(metrics["mod"])[-1])
    xy = np.asarray(final.robot.xy)
    target = int(np.asarray(final.mission.target_wp))
    n_wp = int(np.asarray(final.wp.count))
    report = dict(
        status=STATUS_STRINGS.get(status, str(status)),
        control_mode=MODE_TEXT.get(mod, str(mod)),
        position=[round(float(xy[0]), 3), round(float(xy[1]), 3)],
        waypoint_progress=f"{max(target, 0)}/{n_wp}",
        cluster_index=int(np.asarray(metrics["cluster_idx"])[-1])
        if "cluster_idx" in metrics else None,
        exploration_completed=bool(np.asarray(final.mission.exploration_completed)),
        docking=bool(np.asarray(final.mission.waiting_for_docking)),
        travel_distance=round(
            float(np.sum(np.sqrt(np.sum(np.diff(np.asarray(metrics["xy"]), axis=0) ** 2, axis=1)))),
            2,
        ),
    )
    if "guards" in metrics:
        tripped = describe(int(np.asarray(metrics["guards"]).ravel()[-1]))
        if tripped:
            report["approximation_guards"] = tripped
    return report


def params_get(yaml_path: str, node: str = "aos_seed_gen_node"):
    from .config import load_yaml

    return load_yaml(yaml_path, node)


def params_set(yaml_path: str, updates: dict, node: str = "/**"):
    """Structural YAML patch (the panel regex-patches in place,
    aos_panel_plugin_params.cpp:59-125; we round-trip the document)."""
    import yaml

    with open(yaml_path) as f:
        doc = yaml.safe_load(f) or {}
    sec = doc.setdefault(node, {}).setdefault("ros__parameters", {})
    sec.update(updates)
    with open(yaml_path, "w") as f:
        yaml.safe_dump(doc, f, sort_keys=False)


def save_map(out_dir: str, world, final_state, rows_sorted=None):
    from .io.checkpoint import save_cluster_info, save_state

    os.makedirs(out_dir, exist_ok=True)
    save_state(os.path.join(out_dir, "episode_state"), final_state)
    if rows_sorted is not None:
        save_cluster_info(os.path.join(out_dir, "cluster_info"), world.graph, rows_sorted)


def _serve_loop(bufs, valids, poly, params, excl, S, steps_per_frame):
    """Drive the live serving API (aosx/serving.py) over recorded map
    snapshots, one message at a time — the production host-loop shape from
    MIGRATION.md, exercised by a CLI surface. The ServeState carry is
    DONATED on both entry points (serving.host_jit_donated): the input
    buffers are reused for the output, halving the steady-state footprint
    of the largest live object (measured benchmarks/PROBE_DONATE.json).
    The caller-side contract is visible below: the carry is re-threaded
    from every return and never reused after the call.

    Odometry is simulated host-side with the same unicycle follower the
    replay engine uses, fed from each tick's published cmd — so the
    decisions match the --cached replay of the same frames
    (tests/test_serving.py pins the equivalence for recorded poses).
    Returns (final CachedEngineState, flat metrics dict, IncrementalState,
    levels list)."""
    import jax
    import jax.numpy as jnp

    from . import serving
    from .engine import Robot, _move_robot
    from .types import Path, PointCloud

    F = bufs.shape[0]

    def pc_frame(f):
        return PointCloud(xyz=jnp.asarray(bufs[f]), valid=jnp.asarray(valids[f]))

    init = serving.host_jit(lambda pc: serving.serve_init(
        pc, poly, params, excl, S, ror_method="exact"))
    frame = serving.host_jit_donated(
        lambda sv, pc: serving.serve_map_frame(
            sv, pc, poly, params, excl, S, ror_method="exact"),
        donate_argnums=(0,))
    tick = serving.host_jit_donated(
        lambda sv, xy, yaw: serving.serve_control_tick(sv, xy, yaw, params, S),
        donate_argnums=(0,))

    @jax.jit
    def move(xy, yaw, follow, mod, plan_xy, plan_len, gxy, gyaw):
        # identical to step_cached's motion: Path with zero yaws (the
        # follower never reads them) over the published plan; `follow` is
        # the monotone progress index (engine.Robot.follow_i), reset by the
        # caller whenever the adopted plan changes
        r = _move_robot(
            Robot(xy=xy, yaw=yaw, follow_i=follow), mod,
            Path(xy=plan_xy, yaw=jnp.zeros((S.max_plan,), jnp.float32),
                 count=plan_len),
            gxy, gyaw)
        return r.xy, r.yaw, r.follow_i

    sv = init(pc_frame(0))
    xy = np.zeros(2, np.float32)
    yaw = np.float32(0.0)
    follow = np.int32(0)
    last_adopted = None
    levels = []
    rows = []
    for f in range(F):
        sv, level = frame(sv, pc_frame(f))
        levels.append(int(level))
        for _ in range(steps_per_frame):
            sv, cmd = tick(sv, xy, yaw)
            adopted = int(np.asarray(cmd["adopted"]))
            if adopted != last_adopted:
                follow = np.int32(0)
                last_adopted = adopted
            xy, yaw, follow = move(cmd["xy"], cmd["yaw"], follow, cmd["mod"],
                                   cmd["plan_xy"], cmd["plan_len"],
                                   cmd["goal_xy"], cmd["goal_yaw"])
            xy, yaw, follow = np.asarray(xy), np.asarray(yaw), np.asarray(follow)
            rows.append({k: np.asarray(cmd[k]) for k in
                         ("mod", "status", "cluster_idx", "guards")}
                        | {"xy": xy, "yaw": yaw})
    metrics = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    return sv.st, metrics, sv.inc, levels


def main():
    import jax
    import jax.numpy as jnp

    from . import engine
    from .config import TEST_STATICS as S, AosParams, params_as_f32
    from .orchards import OrchardSpec, make_orchard
    from .types import PointCloud, Polygon

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--pcd", type=str, default=None, help="replay a PCD map")
    ap.add_argument("--pcd-seq", type=str, default=None,
                    help="comma-separated PCD files or a glob: snapshots of a "
                         "growing SLAM map, replayed through the exact "
                         "incremental engine (aosx.incremental). Index-stable "
                         "append-only sequences reuse unchanged work; anything "
                         "else falls back to from-scratch frames (level 3)")
    ap.add_argument("--polygon", type=str, default=None, help="polygon JSON (xy pairs)")
    ap.add_argument("--params", type=str, default=None, help="aos_planner_params.yaml")
    ap.add_argument("--out", type=str, default="/tmp/aosx_run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", type=str, default="default", choices=["default", "cpu"])
    ap.add_argument("--cells", action="store_true",
                    help="overlay the Voronoi ownership cells in the figure")
    ap.add_argument("--cached", action="store_true",
                    help="with --pcd-seq: run the full serving loop "
                         "(incremental world gates + per-world plan cache, "
                         "replan-free ticks) — bit-identical metrics to the "
                         "replan-every-tick engine (tests/test_incremental.py)")
    ap.add_argument("--serve", action="store_true",
                    help="with --pcd-seq: drive the LIVE host-loop serving "
                         "API (serving.serve_init/serve_map_frame/"
                         "serve_control_tick) message-by-message instead of "
                         "the in-jit replay scan — the production deployment "
                         "shape (MIGRATION.md), with donated ServeState "
                         "carries (serving.host_jit_donated: measured "
                         "~1.5 ms/frame + steady-state HBM halving, "
                         "benchmarks/PROBE_DONATE.json). Robot odometry is "
                         "simulated host-side by the same unicycle follower "
                         "the replay uses")
    args = ap.parse_args()

    # --serve / --cached only have a meaning on the --pcd-seq serving loop;
    # silently falling through to the one-shot episode path surprised a
    # reviewer (ADVICE r4) — fail loudly instead.
    if args.serve and not args.pcd_seq:
        ap.error("--serve requires --pcd-seq (the live serving loop runs "
                 "over a map-frame sequence)")
    if args.cached and not args.pcd_seq:
        ap.error("--cached requires --pcd-seq")

    if args.device == "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    params = params_as_f32(AosParams() if args.params is None else params_get(args.params)[0])

    def load_polygon():
        if args.polygon:
            return Polygon.from_array(
                np.asarray(json.load(open(args.polygon)), np.float32), S)
        return Polygon.from_array(np.zeros((0, 2), np.float32), S)

    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    if args.pcd_seq:
        import glob as _glob

        from . import incremental
        from .io.pcd import load_pcd

        if any(ch in args.pcd_seq for ch in "*?["):
            files = sorted(_glob.glob(args.pcd_seq))
        else:
            files = [p for p in args.pcd_seq.split(",") if p]
        if not files:
            raise SystemExit(f"--pcd-seq matched no files: {args.pcd_seq}")
        F = len(files)
        bufs = np.zeros((F, S.max_points, 3), np.float32)
        valids = np.zeros((F, S.max_points), bool)
        for f, path in enumerate(files):
            xyz = load_pcd(path)
            n = min(len(xyz), S.max_points)
            bufs[f, :n] = xyz[:n]
            valids[f, :n] = True
        frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))
        poly = load_polygon()
        steps_per_frame = max(args.steps // F, 1)
        if args.serve:
            final, metrics, inc, levels = _serve_loop(
                bufs, valids, poly, params, excl, S, steps_per_frame)
        else:
            replay = (incremental.replay_episode_incremental_cached
                      if args.cached else incremental.replay_episode_incremental)
            final, metrics, inc = jax.jit(
                lambda fr, pr: replay(
                    fr, poly, pr, excl, S, steps_per_frame, ror_method="exact",
                    return_inc=True)
            )(frames, params)
            levels = [int(v) for v in np.asarray(metrics.pop("inc_level"))]
            metrics = jax.tree_util.tree_map(
                lambda x: np.asarray(x).reshape((-1,) + x.shape[2:]), metrics)
        # the replay's final IncrementalState already holds the last frame's
        # world — no duplicate from-scratch pass for the figure/saved map
        world, perceive_out = inc.world, inc.out
        owner = None
        if args.cells:
            owner = jax.jit(
                lambda o, pr: engine.owner_plane(o, pr, S)
            )(perceive_out, params)

        report = episode_report(final, metrics, S)
        report["incremental_levels"] = levels
        print(json.dumps(report, indent=2))
        os.makedirs(args.out, exist_ok=True)
        save_map(args.out, world, final)
        try:
            from .io.render import save_episode_figure

            save_episode_figure(
                os.path.join(args.out, "episode.png"), world, state=final,
                metrics=metrics, resolution=S.resolution,
                seeds=perceive_out.seeds, rows=perceive_out.rows_sorted,
                owner=owner, show_cells=args.cells,
            )
            print(f"figure: {args.out}/episode.png")
        except Exception as e:  # matplotlib optional
            print("render skipped:", e)
        return

    if args.pcd:
        from .io.pcd import load_pcd

        xyz = load_pcd(args.pcd)
        n = min(len(xyz), S.max_points)
        buf = np.zeros((S.max_points, 3), np.float32)
        buf[:n] = xyz[:n]
        valid = np.zeros(S.max_points, bool)
        valid[:n] = True
        pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
        poly = load_polygon()
    else:
        spec = OrchardSpec(n_rows=3, row_len=12.0, origin=(6.0, 4.0))
        pc, poly = make_orchard(jax.random.PRNGKey(args.seed), spec, S)

    world, perceive_out, owner = jax.jit(
        lambda pc, poly, pr, ex: engine.prepare_world_full(
            pc, poly, pr, ex, S, ror_method="exact", with_owner=True)
    )(pc, poly, params, excl)
    final, metrics = jax.jit(lambda w, p: engine.episode(w, p, S, args.steps))(world, params)

    report = episode_report(final, metrics, S)
    print(json.dumps(report, indent=2))

    os.makedirs(args.out, exist_ok=True)
    save_map(args.out, world, final)
    try:
        from .io.render import save_episode_figure

        save_episode_figure(
            os.path.join(args.out, "episode.png"), world, state=final,
            metrics=jax.tree_util.tree_map(np.asarray, metrics),
            resolution=S.resolution,
            seeds=perceive_out.seeds, rows=perceive_out.rows_sorted,
            owner=owner, show_cells=args.cells,
        )
        print(f"figure: {args.out}/episode.png")
    except Exception as e:  # matplotlib optional
        print("render skipped:", e)


if __name__ == "__main__":
    main()
