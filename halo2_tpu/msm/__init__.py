from .msm import msm, naive_msm, pippenger_msm, point_tree_sum

__all__ = ["msm", "naive_msm", "pippenger_msm", "point_tree_sum"]
