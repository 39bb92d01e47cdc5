from online_3d_reconstruction_tpu.parallel.mesh import make_mesh  # noqa: F401
from online_3d_reconstruction_tpu.parallel.ba_sharded import solve_ba_sharded  # noqa: F401
from online_3d_reconstruction_tpu.parallel.frames import batch_disparity  # noqa: F401
from online_3d_reconstruction_tpu.parallel.voxel_sharded import sharded_voxel_downsample  # noqa: F401
from online_3d_reconstruction_tpu.parallel.sgm_sharded import sharded_disparity  # noqa: F401
