from online_3d_reconstruction_tpu.utils.imaging import bilinear_sample_np  # noqa: F401
