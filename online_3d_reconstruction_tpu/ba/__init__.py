from online_3d_reconstruction_tpu.ba.problem import BAProblem  # noqa: F401
from online_3d_reconstruction_tpu.ba.schur import solve_ba  # noqa: F401
from online_3d_reconstruction_tpu.ba.window import WindowBA  # noqa: F401
