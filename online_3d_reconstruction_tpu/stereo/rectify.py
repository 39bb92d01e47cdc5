"""Stereo rectification remap as an XLA gather.

The reference calls ``cv::remap`` with maps from ``initUndistortRectifyMap``
every frame (SURVEY.md §2.1 C4). On TPU the precomputed maps are just a
bilinear gather index field: four gathers + a fused lerp, one kernel, no
host round-trip. Maps are built once on the host (io/calibration.py) and
live on-device for the whole run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fill",))
def remap_bilinear(image: jnp.ndarray, map_xy: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Sample ``image`` (H, W) or (H, W, C) at ``map_xy`` (H', W', 2) coords.

    map_xy[..., 0] is the source x (column), [..., 1] the source y (row) —
    the cv::remap convention. Out-of-bounds pixels get ``fill``.
    """
    h, w = image.shape[:2]
    x = map_xy[..., 0].astype(jnp.float32)
    y = map_xy[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    valid = (x0i >= 0) & (x0i <= w - 2) & (y0i >= 0) & (y0i <= h - 2)
    x0c = jnp.clip(x0i, 0, w - 2)
    y0c = jnp.clip(y0i, 0, h - 2)

    v00 = image[y0c, x0c]
    v10 = image[y0c, x0c + 1]
    v01 = image[y0c + 1, x0c]
    v11 = image[y0c + 1, x0c + 1]

    if image.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
        valid = valid[..., None]

    img_dtype = image.dtype
    v00 = v00.astype(jnp.float32)
    v10 = v10.astype(jnp.float32)
    v01 = v01.astype(jnp.float32)
    v11 = v11.astype(jnp.float32)
    out = (
        v00 * (1 - tx) * (1 - ty)
        + v10 * tx * (1 - ty)
        + v01 * (1 - tx) * ty
        + v11 * tx * ty
    )
    out = jnp.where(valid, out, fill)
    if jnp.issubdtype(img_dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(img_dtype)


@jax.jit
def rectify_pair(left: jnp.ndarray, right: jnp.ndarray,
                 map_left: jnp.ndarray, map_right: jnp.ndarray):
    """Rectify both views of a stereo pair in one fused dispatch."""
    return remap_bilinear(left, map_left), remap_bilinear(right, map_right)
