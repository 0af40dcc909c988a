"""Separable image filters as XLA convolutions.

These replace the reference's OpenCV C++ filter calls (GaussianBlur inside
ORB, Sobel inside Harris, box filters inside SGBM) with
``lax.conv_general_dilated`` so they fuse and run on the TPU's conv/MXU path
instead of the host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _conv2d_single(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME 2D convolution of (H, W) with (kh, kw); edges zero-padded."""
    out = lax.conv_general_dilated(
        img[None, None, :, :].astype(jnp.float32),
        kernel[None, None, :, :].astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def conv2d_separable(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable SAME convolution: rows with ``ky`` then cols with ``kx``."""
    out = _conv2d_single(img, ky.reshape(-1, 1))
    return _conv2d_single(out, kx.reshape(1, -1))


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """7x7 sigma-2 by default: the smoothing ORB applies before BRIEF."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    return conv2d_separable(img, k, k)


def box_filter(img: jax.Array, size: int, normalize: bool = True) -> jax.Array:
    k = jnp.full((size,), 1.0 / size if normalize else 1.0, jnp.float32)
    return conv2d_separable(img, k, k)


def sobel(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sobel gradients (dx, dy) with OpenCV's 3x3 kernels."""
    deriv = jnp.asarray([-1.0, 0.0, 1.0])
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    gx = conv2d_separable(img, deriv, smooth)  # d/dx: deriv along cols
    gy = conv2d_separable(img, smooth, deriv)
    return gx, gy


def maxpool2d_same(img: jax.Array, size: int) -> jax.Array:
    """Max over a size x size window centred on each pixel (SAME)."""
    return lax.reduce_window(
        img,
        -jnp.inf,
        lax.max,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding="SAME",
    )


def resize_bilinear(img: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize (align-corners=False, half-pixel centres) — matches
    ``cv2.resize(..., INTER_LINEAR)`` used for ORB pyramid levels."""
    return jax.image.resize(
        img.astype(jnp.float32), (height, width), method="linear"
    )
