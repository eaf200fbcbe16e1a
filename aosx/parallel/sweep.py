"""Parameter-sweep Monte-Carlo evaluation: many AosParams configurations
through the sustained rollout harness in lockstep lanes.

The reference tunes its planner by editing aos_planner_params.yaml (or the
RViz panel's parameter tab, which regex-patches the YAML —
aos_panel_plugin_params.cpp:59-125) and re-running a field trial ONE
configuration at a time. The TPU framework's equivalent exploits that
AosParams is a pytree of traced scalars (config.py:206-209): stacking P
configurations gives [P]-leaf arrays, and the SAME jitted rollout evaluates
every configuration as ordinary batch lanes — one compile, paired seeds, a
cartesian grid of planner variants per device call.

    stacked, configs = grid_params(heuristic_weight=[1.0, 3.0],
                                   docking_radius=[0.4, 0.7])
    res, stats = sweep_rollouts(stacked, configs, seeds_per_config=32,
                                spec=spec, s=s, steps_budget=1200,
                                batch=128)
    table, agg = summarize_sweep(res, len(configs), 32)

Sweepable fields are exactly AosParams' (thresholds, radii, weights —
everything the reference exposes as a ROS parameter). Shape-determining
knobs (grid size, inflation_cells, buffer caps) live in Statics and are
compile-time by design; sweeping those means one compile per value.

Rollout id layout is configuration-major: id = c * K + k runs configuration
c with per-config seed k, and every configuration sees the SAME K orchard
keys, so per-seed differences between configurations are paired (common
random numbers), not confounded with world variation.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AosParams, Statics, params_as_f32
from ..orchards import OrchardSpec
from .batch import sustained_rollouts


def stack_params(plist) -> AosParams:
    """[P] AosParams pytree from P configurations (leaves stacked on a new
    leading axis; numeric canonicalization via params_as_f32)."""
    plist = [params_as_f32(p) for p in plist]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *plist)


def grid_params(base: AosParams | None = None, **axes):
    """Cartesian product over named AosParams fields.

    Returns (stacked [P] AosParams, configs): configs[i] is the dict of
    axis values of row i (axes iterate in sorted-name order, last axis
    fastest — itertools.product order)."""
    if not axes:
        raise ValueError("grid_params needs at least one axis")
    base = AosParams() if base is None else base
    for name in axes:
        if not hasattr(base, name):
            raise ValueError(f"AosParams has no field {name!r}")
    names = sorted(axes)
    configs = [dict(zip(names, combo))
               for combo in itertools.product(*[axes[n] for n in names])]
    stacked = stack_params(
        [dataclasses.replace(base, **cfg) for cfg in configs])
    return stacked, configs


def sweep_rollouts(stacked: AosParams, configs, seeds_per_config: int,
                   spec: OrchardSpec, s: Statics, steps_budget: int, *,
                   batch: int, chunk_steps: int = 150,
                   refill: int | None = None, seed: int = 0,
                   ror_method: str = "sorted", cached: bool = False,
                   on_progress=None, classify: bool | None = None):
    """P configurations x seeds_per_config rollouts, configuration-major,
    through sustained_rollouts' lane-refill harness (params_queue). Every
    configuration runs the same seeds_per_config orchard keys.

    Returns (results, stats) exactly like sustained_rollouts; reshape with
    summarize_sweep."""
    P = len(configs)
    assert jax.tree_util.tree_leaves(stacked)[0].shape[0] == P, (
        "stacked/configs length mismatch")
    K = seeds_per_config
    queue = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, K, axis=0), stacked)
    base_keys = jax.random.split(jax.random.PRNGKey(seed), K)
    # gather, not tile: works for legacy uint32 [K, 2] AND typed key arrays
    keys = base_keys[jnp.tile(jnp.arange(K), P)]
    return sustained_rollouts(
        P * K, batch, spec, None, s, steps_budget,
        chunk_steps=chunk_steps, refill=refill, ror_method=ror_method,
        cached=cached, on_progress=on_progress,
        params_queue=queue, keys=keys, classify=classify,
    )


def summarize_sweep(results: dict, P: int, K: int):
    """Reshape sustained results to [P, K] and aggregate per configuration.

    Returns (table, agg): table[k] has shape [P, K]; agg per-config arrays
    [P] — completion_rate, mean/std travel and steps over COMPLETED
    rollouts only (NaN when none completed), failed and guard-flagged
    counts. Guard-flagged lanes are already forced completed=False /
    status=Failed by the engine (batch._invalidate_flagged), so no
    aggregate here can count a degraded rollout as a success."""
    table = {k: np.asarray(v).reshape((P, K) + np.asarray(v).shape[1:])
             for k, v in results.items()}
    comp = table["completed"].astype(bool)
    n_done = comp.sum(axis=1)

    def _masked(field):
        x = table[field].astype(np.float64)
        tot = np.where(comp, x, 0.0).sum(axis=1)
        mean = np.divide(tot, n_done, out=np.full(P, np.nan), where=n_done > 0)
        var = np.where(comp, (x - mean[:, None]) ** 2, 0.0).sum(axis=1)
        std = np.sqrt(np.divide(var, n_done, out=np.full(P, np.nan),
                                where=n_done > 0))
        return mean, std

    travel_mean, travel_std = _masked("travel_distance")
    steps_mean, steps_std = _masked("steps_to_complete")
    agg = dict(
        completion_rate=n_done / K,
        travel_mean=travel_mean, travel_std=travel_std,
        steps_mean=steps_mean, steps_std=steps_std,
        failed=(table["final_status"] == 1).sum(axis=1),
        guard_flagged=(table["guards"] != 0).sum(axis=1),
    )
    return table, agg


def compare_configs(table, i: int, j: int, *,
                    fields=("travel_distance", "steps_to_complete"),
                    n_boot: int = 4096, seed: int = 0):
    """Paired comparison of configurations i and j exploiting the sweep's
    common-random-numbers layout (row i and row j of `table` ran the SAME K
    orchard keys, sweep_rollouts docstring). Pairing cancels the per-orchard
    variance that dominates unpaired comparisons, so far fewer seeds resolve
    a configuration difference.

    For each field: per-seed differences d_k = x_i[k] - x_j[k] over seeds
    where BOTH configurations completed, with the mean and a percentile
    bootstrap CI (resampling seeds — the exchangeable unit — with a fixed
    PRNG seed for reproducibility). Completion is compared as a paired
    discordance count (seeds only-i vs only-j completed — the information-
    bearing cells of McNemar's test).

    Returns a dict: per field {mean_diff, ci_lo, ci_hi, n_pairs}; plus
    completion {rate_i, rate_j, only_i, only_j, n_seeds}. ci_lo/ci_hi are
    NaN when fewer than 2 paired seeds completed. A CI excluding 0 means
    the configurations genuinely differ on that metric at ~95% confidence.
    """
    comp = np.asarray(table["completed"]).astype(bool)
    ci_mask = comp[i] & comp[j]
    n_pairs = int(ci_mask.sum())
    rng = np.random.default_rng(seed)
    out = {}
    for f in fields:
        x = np.asarray(table[f], dtype=np.float64)
        d = (x[i] - x[j])[ci_mask]
        if n_pairs == 0:
            out[f] = dict(mean_diff=np.nan, ci_lo=np.nan, ci_hi=np.nan,
                          n_pairs=0)
            continue
        mean = float(d.mean())
        if n_pairs < 2:
            lo = hi = np.nan
        else:
            idx = rng.integers(0, n_pairs, size=(n_boot, n_pairs))
            boot = d[idx].mean(axis=1)
            lo, hi = (float(q) for q in np.percentile(boot, [2.5, 97.5]))
        out[f] = dict(mean_diff=mean, ci_lo=lo, ci_hi=hi, n_pairs=n_pairs)
    out["completion"] = dict(
        rate_i=float(comp[i].mean()), rate_j=float(comp[j].mean()),
        only_i=int((comp[i] & ~comp[j]).sum()),
        only_j=int((~comp[i] & comp[j]).sum()),
        n_seeds=int(comp.shape[1]),
    )
    return out
