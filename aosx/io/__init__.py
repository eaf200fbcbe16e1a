from .pcd import load_pcd, save_pcd  # noqa: F401
from .checkpoint import load_state, save_state  # noqa: F401
