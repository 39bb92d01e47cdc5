from online_3d_reconstruction_tpu.stereo.rectify import remap_bilinear, rectify_pair  # noqa: F401
from online_3d_reconstruction_tpu.stereo.census import census_transform, cost_volume  # noqa: F401
from online_3d_reconstruction_tpu.stereo.sgm import sgm_disparity  # noqa: F401
