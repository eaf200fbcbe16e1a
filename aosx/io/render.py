"""Host-side renderer reproducing the reference's RViz marker semantics
(C13-lite; SURVEY.md section 5 observability). Matplotlib is gated - the
engine never depends on it.

Color/shape semantics mirrored from the reference:
- voronoi seeds yellow, graph nodes purple, edges sky blue (aos_gvd_node.cpp:1019-1096)
- waypoints: completed black, current yellow (green+large while docking),
  future red (aos_path_gen_node.cpp:1697-1764)
- tree rows green, ray casts red/gray by hit (aos_seed_gen_node.cpp markers)
"""

from __future__ import annotations

import numpy as np


def render_world(world, state=None, metrics=None, ax=None, show_grid=True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(14, 6))

    skel = world.skeleton
    h = int(skel.h_cells)
    w = int(skel.w_cells)
    res = 0.05 if not hasattr(skel, "resolution") else skel.resolution
    ox, oy = float(skel.origin_x), float(skel.origin_y)

    if show_grid:
        occ = np.asarray(world.occupancy.occ)[:h, :w]
        sk = np.asarray(skel.occ)[:h, :w]
        img = np.zeros((h, w, 3))
        img[occ == 1] = (0.85, 0.85, 0.85)
        img[sk == 1] = (0.2, 0.2, 0.2)
        # extent in world coords; note res from the statics the caller used
        ax.imshow(
            img, origin="lower",
            extent=(ox, ox + w * _res(world), oy, oy + h * _res(world)),
            interpolation="nearest",
        )

    g = world.graph
    n = int(g.num_nodes)
    e = int(g.num_edges)
    nodes = np.asarray(g.nodes)[:n]
    edges = np.asarray(g.edges)[:e]
    for a, b in edges:
        ax.plot(*zip(nodes[a], nodes[b]), color=(0.0, 0.8, 1.0), lw=0.6, zorder=2)
    ax.scatter(nodes[:, 0], nodes[:, 1], s=6, color=(0.8, 0.0, 0.8), zorder=3)

    labels = np.asarray(g.node_labels)[:n]
    lab = nodes[labels > 0]
    ax.scatter(lab[:, 0], lab[:, 1], s=40, facecolors="none", edgecolors="orange", zorder=4)

    wp = world.waypoints if state is None else state.wp
    nw = int(wp.count)
    wxy = np.asarray(wp.xy)[:nw]
    if state is not None:
        cur = int(state.mission.target_wp)
        dock = bool(np.asarray(state.mission.waiting_for_docking))
        for i, p in enumerate(wxy):
            if i < cur:
                c, s = "black", 25
            elif i == cur:
                c, s = ("green", 90) if dock else ("yellow", 60)
            else:
                c, s = "red", 25
            ax.scatter(*p, s=s, color=c, zorder=5, edgecolors="k", linewidths=0.5)
            ax.annotate(f"WP{i}", p, fontsize=6, zorder=6)
    else:
        ax.scatter(wxy[:, 0], wxy[:, 1], s=30, color="red", zorder=5)

    if state is not None:
        plan = state.plan
        pc = int(plan.count)
        pxy = np.asarray(plan.xy)[:pc]
        if pc:
            ax.plot(pxy[:, 0], pxy[:, 1], "b-", lw=1.2, zorder=4)
        ax.scatter(*np.asarray(state.robot.xy), marker="*", s=120, color="magenta", zorder=7)

    if metrics is not None:
        trail = np.asarray(metrics["xy"])
        ax.plot(trail[:, 0], trail[:, 1], color="magenta", lw=0.8, alpha=0.6, zorder=4)

    ax.set_aspect("equal")
    return ax


def _res(world):
    # resolution is static config, not carried in GridWorld; infer from the
    # occupancy bbox if the caller didn't bake it in. Default 0.05.
    return getattr(world, "resolution", 0.05)


def save_episode_figure(path, world, state=None, metrics=None, resolution=0.05):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    class _W:  # tiny shim carrying resolution for extent computation
        def __init__(self, w):
            self.__dict__.update({k: getattr(w, k) for k in
                                  ("skeleton", "occupancy", "graph", "waypoints")})
            self.resolution = resolution

    ax = render_world(_W(world), state=state, metrics=metrics)
    ax.figure.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(ax.figure)
