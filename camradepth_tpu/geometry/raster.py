"""Sparse z-buffered rasterization: point sets -> min-depth-wins grids.

Replaces the pure-Python per-point raster loops of the RC-PDA libs
(fuse_radar.py:182-197, fuse_lidar.py:304-317 — the dataprep hot loops,
SURVEY.md §3.4) with a sort-based scatter that vectorizes on device:

  1. quantize points to pixel ids,
  2. stable-argsort by depth then by pixel id (preserving the reference's
     first-point-wins tie-break for equal depths),
  3. keep the first point per pixel group,
  4. scatter depth + payload channels.

jit-friendly: fixed-size point arrays with a validity mask (invalid points
get an out-of-range pixel id and are dropped by the scatter).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_points(
    x, y, h_out: int, w_out: int, downsample_scale: float, y_cutoff: int = 0
):
    """Continuous full-res pixel coords -> downsampled integer coords with
    the reference's center-aligned mapping and clipping
    (fuse_radar.py:169-183): q = round((p + 0.5)/s - 0.5) clipped to grid."""
    xp = jnp if isinstance(x, jax.Array) else np
    xq = (x + 0.5) / downsample_scale - 0.5
    yq = (y + 0.5) / downsample_scale - 0.5
    # grid is (h_full/s, w_full/s) BEFORE the y_cutoff crop
    xq = xp.clip(xq, 0, w_out - 1)
    yq = xp.clip(yq, 0, h_out - 1)
    xi = xp.round(xq).astype(xp.int32)
    yi = xp.round(yq).astype(xp.int32)
    return xi, yi, xq, yq


def raster_min_depth(
    pix_id: jnp.ndarray,
    depth: jnp.ndarray,
    payload: Dict[str, jnp.ndarray],
    num_pixels: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Min-depth-wins scatter of a flat point list.

    Args:
      pix_id: [N] int32 flattened pixel ids.
      depth: [N] float depths.
      payload: name -> [N] or [N, C] extra channels carried with the
        winning point.
      num_pixels: H*W of the target grid.
      valid: [N] bool; invalid points are dropped.
    Returns:
      (depth_map [num_pixels], {name: [num_pixels] or [num_pixels, C]}),
      zeros where no point landed.
    """
    n = depth.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    pid = jnp.where(valid, pix_id, num_pixels)  # sentinel bucket

    # Stable two-pass sort: by depth (ties keep original order = reference's
    # first-written-wins), then by pixel id (stable keeps depth order).
    order_d = jnp.argsort(depth, stable=True)
    pid_d = pid[order_d]
    order_p = jnp.argsort(pid_d, stable=True)
    order = order_d[order_p]

    pid_s = pid[order]
    first = jnp.concatenate(
        [jnp.array([True]), pid_s[1:] != pid_s[:-1]]
    )
    write = first & (pid_s < num_pixels)
    target = jnp.where(write, pid_s, num_pixels)

    def scatter(vals):
        vals_s = vals[order]
        out_shape = (num_pixels + 1,) + vals.shape[1:]
        out = jnp.zeros(out_shape, vals.dtype)
        out = out.at[target].set(vals_s, mode="drop")
        return out[:num_pixels]

    depth_map = scatter(depth)
    out_payload = {k: scatter(v) for k, v in payload.items()}
    return depth_map, out_payload


def rasterize_radar(
    x1,
    y1,
    depth1,
    times1,
    x2,
    y2,
    rcs,
    v_comp,
    valid,
    downsample_scale: float = 2.0,
    y_cutoff: int = 34,
    h_im: int = 900,
    w_im: int = 1600,
):
    """Full radar raster (reference cal_depthMap_flow, fuse_radar.py:156-204):
    depth/flow/time/RCS/|v| maps on the downsampled grid, then y-cutoff crop
    and the >0.5 m/s moving-mask binarization. RCS gets the +10 offset the
    reference applies before writing (fuse_radar.py:179-180).

    All inputs are fixed-size [N] arrays with a validity mask. Returns dict
    of [H_out - y_cutoff, W_out] maps.
    """
    h_out = int(h_im / downsample_scale)
    w_out = int(w_im / downsample_scale)
    xi1, yi1, xq1, yq1 = quantize_points(
        x1, y1, h_out, w_out, downsample_scale
    )
    # flow targets use the *quantized-clipped continuous* coords
    _, _, xq2, yq2 = quantize_points(x2, y2, h_out, w_out, downsample_scale)
    pix = yi1 * w_out + xi1
    payload = {
        "flow": jnp.stack([xq2 - xq1, yq2 - yq1], axis=-1),
        "time": times1,
        "rcs": rcs + 10.0,
        "v_comp": v_comp,
    }
    depth_map, maps = raster_min_depth(
        pix, depth1, payload, h_out * w_out, valid
    )
    def grid(a):
        return a.reshape((h_out, w_out) + a.shape[1:])[y_cutoff:]

    return {
        "depth": grid(depth_map),
        "flow": grid(maps["flow"]),
        "time": grid(maps["time"]),
        "rcs": grid(maps["rcs"]),
        "v_comp": (grid(maps["v_comp"]) > 0.5).astype(jnp.float32),
    }
