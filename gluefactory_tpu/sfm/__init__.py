"""Multi-view back-end (BASELINE.json north star): batched triangulation,
Schur-complement bundle adjustment, and pose-graph optimization as JAX
kernels, designed for TPU (fixed shapes, masked observations, scan loops,
observation sharding over the mesh for distributed BA).

The reference has no SfM back-end — two-view estimation is its ceiling
(`gluefactory/robust_estimators/`); this subpackage is the from-scratch
extension the north star asks for.
"""

from .triangulation import (  # noqa: F401
    triangulate_nview,
    triangulate_tracks,
    triangulate_two_view,
)
from .ba import bundle_adjust, reprojection_residuals  # noqa: F401
from .pose_graph import optimize_pose_graph  # noqa: F401
from .odometry import (  # noqa: F401
    chain_poses,
    relative_poses_from_matches,
    trajectory_ate,
)
from .tracks import build_tracks, gather_observations  # noqa: F401
