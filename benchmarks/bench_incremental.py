"""Incremental map-update latency on the real TPU (FLOOR.md lever 1).

Measures jitted aosx.incremental.perceive_update at BENCH_STATICS scale
(2000x2048 cells, the bench.py orchard) for the four update levels:

  noop     - same frame again (empty delta, level 0)
  densify  - 4096 duplicate points onto occupied cells (level 0)
  grow     - the last 8% of the map appears (skeleton changes, level 2)
  violate  - one point removed (contract violation, level 3 from-scratch)

Each measurement is floor-calibrated (a trivial jit's median round-trip is
subtracted; the axon tunnel floor drifts 28-35 ms, CLAUDE.md). Writes
benchmarks/INCREMENTAL.json.

Run: timeout 3000 python benchmarks/bench_incremental.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import incremental
    from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.types import PointCloud

    spec = OrchardSpec(
        n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
        trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
        polygon_pad=2.0,
    )
    key = jax.random.PRNGKey(0)
    pc, poly = make_orchard(key, spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    xyz = np.asarray(pc.xyz)
    valid = np.asarray(pc.valid)
    n_valid = int(valid.sum())
    order = np.flatnonzero(valid)

    # base frame: drop the last 8% of valid points (kept index-stable: the
    # dropped slots are simply invalid, matching the growing-map contract)
    n_drop = int(0.08 * n_valid)
    base_valid = valid.copy()
    base_valid[order[-n_drop:]] = False
    pc_base = PointCloud(xyz=jnp.asarray(xyz), valid=jnp.asarray(base_valid))

    # densify frame: base + duplicates of existing points in free slots,
    # sources chosen so NO keep decision can flip (provably level 0):
    #   - the source is kept, so the dup lands in an already-occupied cell
    #     and its own count (cnt_src + 1) clears the threshold;
    #   - no point within ror_radius (2D superset of the 3D ball) of the
    #     source sits at cnt == min_neighbors - 1, so the dup's +1 cannot
    #     promote a dropped point;
    #   - chosen sources pairwise > 2*ror_radius apart, so no point's count
    #     gains more than +1 in total.
    # (A naive "duplicate anything" densify measured level 2: real orchard
    # noise points sit at the ROR threshold and re-observation promotes
    # them - which the gates correctly detect.)
    from aosx.perceive.points import preprocess_full

    _, keep_j, cnt_j, valid_j, _, _ = jax.jit(
        lambda p: preprocess_full(p, poly, params, excl, S, ror_method="sorted")
    )(pc_base)
    keep_b = np.asarray(keep_j)
    cnt_b = np.asarray(cnt_j)
    valid_b = np.asarray(valid_j)
    r = float(np.asarray(params.ror_radius))
    minn = int(np.asarray(params.ror_min_neighbors))

    def cell_hash(idx, size):
        d = {}
        for i in idx:
            key = (int(xyz[i, 0] // size), int(xyz[i, 1] // size))
            d.setdefault(key, []).append(i)
        return d

    def near(d, p, size, rad):
        cx, cy = int(p[0] // size), int(p[1] // size)
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for j in d.get((cx + ox, cy + oy), ()):
                    if (xyz[j, 0] - p[0]) ** 2 + (xyz[j, 1] - p[1]) ** 2 <= rad * rad:
                        return True
        return False

    borderline = cell_hash(np.flatnonzero(valid_b & (cnt_b == minn - 1)), r)
    chosen_hash = {}
    chosen = []
    rng2 = np.random.default_rng(7)
    for i in rng2.permutation(np.flatnonzero(keep_b)):
        if len(chosen) >= min(4096, S.max_delta_points):
            break
        p = xyz[i]
        if near(borderline, p, r, r) or near(chosen_hash, p, 2 * r, 2 * r):
            continue
        chosen.append(i)
        chosen_hash.setdefault(
            (int(p[0] // (2 * r)), int(p[1] // (2 * r))), []).append(i)
    free = np.flatnonzero(~valid)
    ndup = min(len(chosen), len(free))
    dens_xyz = xyz.copy()
    dens_valid = base_valid.copy()
    dens_xyz[free[:ndup]] = xyz[np.asarray(chosen[:ndup])]
    dens_valid[free[:ndup]] = True
    pc_dens = PointCloud(xyz=jnp.asarray(dens_xyz), valid=jnp.asarray(dens_valid))

    # grow frame: the full original map (the 8% reappears; ~3.6k new points)
    pc_grow = PointCloud(xyz=jnp.asarray(xyz), valid=jnp.asarray(valid))

    # violation frame: base minus one valid point -> exact from-scratch
    viol_valid = base_valid.copy()
    viol_valid[order[0]] = False
    pc_viol = PointCloud(xyz=jnp.asarray(xyz), valid=jnp.asarray(viol_valid))

    print(f"# base={int(base_valid.sum())} densify(+{ndup}) "
          f"grow(+{n_drop}) of {n_valid} points", file=sys.stderr)

    # host_jit, NOT jax.jit: perceive_update's top-level lax.cond gate
    # retains runtime jaxpr consts, and jax 0.9.0's C++ fast path drops
    # them on the 2nd+ call — on axon that surfaces as a bare
    # INVALID_ARGUMENT at the level fetch (CLAUDE.md round-4 rule: every
    # host-loop probe wraps its repeated callables in serving.host_jit;
    # this script predated the rule and hit exactly that in round 5)
    from aosx.serving import host_jit

    init = jax.jit(lambda pc: incremental.perceive_init(
        pc, poly, params, excl, S, ror_method="sorted"))
    upd = host_jit(lambda st, pc: incremental.perceive_update(
        st, pc, poly, params, excl, S, ror_method="sorted"))

    t0 = time.time()
    st = init(pc_base)
    float(np.asarray(st.world.guards))  # sync
    print(f"# init compiled+ran ({time.time() - t0:.0f}s)", file=sys.stderr)

    # The floor must pay the SAME dispatch path as the measured call:
    # host_jit forces Python dispatch (the repeat-dispatch bug fix above),
    # which costs ~10+ ms of host time flattening the large PerceiveState
    # carry — a plain trivial-jit floor (C++ fast path, one tiny arg) would
    # under-subtract and report that host overhead as device time (seen in
    # the first round-5 re-measure: noop "device" 15.9 ms vs 1.3 real).
    # ...and return the full carry too: upd's Python-dispatch cost includes
    # adopting the ~50-leaf output tree, which a scalar-returning floor
    # misses (~7 ms at this tree size).
    floor_fn = host_jit(lambda st, pc: (
        st, st.world.guards + jnp.sum(pc.valid.astype(jnp.int32))))

    def floor_ms(reps=7):
        float(np.asarray(floor_fn(st, pc_base)[1]))
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            float(np.asarray(floor_fn(st, pc_base)[1]))
            ts.append((time.perf_counter() - t) * 1e3)
        return float(np.median(ts))

    def measure(pc_f, reps=7):
        # compile + level fetch once; timing fetches only the level scalar
        st2, level = upd(st, pc_f)
        lv = int(np.asarray(level))
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            _, level = upd(st, pc_f)
            float(np.asarray(level))
            ts.append((time.perf_counter() - t) * 1e3)
        return float(np.median(ts)), lv

    results = {}
    fl = floor_ms()
    print(f"# tunnel floor {fl:.1f} ms", file=sys.stderr)
    for name, pc_f in [("noop", pc_base), ("densify", pc_dens),
                       ("grow", pc_grow), ("violate", pc_viol)]:
        t0 = time.time()
        ms, lv = measure(pc_f)
        fl2 = floor_ms()
        device = max(0.0, ms - (fl + fl2) / 2)
        results[name] = {
            "reported_ms": round(ms, 2),
            "device_ms": round(device, 2),
            "level": lv,
        }
        print(f"# {name}: {ms:.1f} ms reported, ~{device:.1f} device "
              f"(level {lv}, {time.time() - t0:.0f}s incl compile)",
              file=sys.stderr)

    from_scratch = results["violate"]["device_ms"]
    reuse = results["densify"]["device_ms"]
    out = {
        "metric": "incremental_update_ms_2000x2000",
        "floor_ms": round(fl, 1),
        "scenarios": results,
        "speedup_densify_vs_scratch": round(
            from_scratch / max(reuse, 1e-6), 1),
        "note": "bit-exact vs from-scratch at every level "
                "(tests/test_incremental.py)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "INCREMENTAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
