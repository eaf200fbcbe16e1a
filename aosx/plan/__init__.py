from .astar import astar, cost_matrix, k_nearest_nodes, plan_between  # noqa: F401
from .mission import build_waypoints, mission_tick, plan_current_path  # noqa: F401
from .linearize import linearize  # noqa: F401
from .control import control_tick  # noqa: F401
