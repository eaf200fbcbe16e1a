from .batch import batched_rollouts, rollout_summary, sharded_rollouts  # noqa: F401
