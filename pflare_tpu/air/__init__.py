from .pcair import PCAIR
from .hierarchy import setup_hierarchy, Hierarchy, LevelData
from .smooth import vcycle_kaskade, vcycle_full, fc_point_richardson
from .stats import compute_stats, print_stats

__all__ = [
    "PCAIR",
    "setup_hierarchy",
    "Hierarchy",
    "LevelData",
    "vcycle_kaskade",
    "vcycle_full",
    "fc_point_richardson",
    "compute_stats",
    "print_stats",
]
