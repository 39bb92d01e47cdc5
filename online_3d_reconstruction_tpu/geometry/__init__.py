from online_3d_reconstruction_tpu.geometry import se3  # noqa: F401
from online_3d_reconstruction_tpu.geometry.backproject import (  # noqa: F401
    backproject_disparity,
    q_matrix,
)
