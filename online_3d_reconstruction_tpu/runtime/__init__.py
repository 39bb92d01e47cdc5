from online_3d_reconstruction_tpu.runtime.pipeline import (  # noqa: F401
    OnlineReconstructor,
    ReconstructionResult,
    reconstruct,
)
