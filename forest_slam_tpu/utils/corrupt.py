"""Synthetic motion-blur corruption — the robustness-experiment knob.

TPU-native equivalent of the reference's input-degradation machinery
(``apply_motion_blur`` / ``apply_random_motion_blur``,
stereo_slam.py:137-174): a rotated line kernel blurs the whole image, and a
random pixel mask (dilated to kernel-size boxes) selects which regions keep
the blurred values. The reference runs it inside the ingestion loop with
``blur_percentage=0`` by default (quirk B9 — machinery present, off);
here it is a jittable preprocessing op applied to image stacks before the
pipelines (layer L2 in SURVEY.md §1).

Design notes vs the reference:
- the line kernel is synthesized directly at angle theta with a tent
  (bilinear) cross-profile — the same shape ``cv2.warpAffine`` of a
  diagonal produces — and normalized to unit sum;
- the random region mask draws i.i.d. Bernoulli pixels at the requested
  density and dilates them with a max-pool, statistically equivalent to the
  reference's sample-without-replacement + box stamping;
- everything is fixed-shape and key-driven so it jits and vmaps over frame
  stacks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from forest_slam_tpu.utils.filters import _conv2d_single


class BlurConfig(NamedTuple):
    """Knobs of stereo_slam.py:152 (blur_percentage, kernel_size, angle)."""

    blur_percentage: float = 0.0  # % of pixels seeding blurred regions
    kernel_size: int = 15
    angle_deg: float = 0.0


def motion_blur_kernel(kernel_size: int, angle_deg) -> jax.Array:
    """(k, k) unit-sum line kernel at ``angle_deg`` (0 deg = horizontal)."""
    k = kernel_size
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    d = jnp.stack([jnp.cos(theta), jnp.sin(theta)])  # line direction
    c = (k - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(k) - c, jnp.arange(k) - c, indexing="ij")
    along = xs * d[0] + ys * d[1]
    perp = -xs * d[1] + ys * d[0]
    w = jnp.clip(1.0 - jnp.abs(perp), 0.0, 1.0) * (jnp.abs(along) <= c + 0.5)
    return w / jnp.maximum(jnp.sum(w), 1e-6)


def apply_motion_blur(
    image: jax.Array, kernel_size: int = 15, angle_deg=0.0
) -> jax.Array:
    """Blur the full (H, W) image with the rotated line kernel
    (stereo_slam.py:137-149)."""
    return _conv2d_single(image, motion_blur_kernel(kernel_size, angle_deg))


def apply_random_motion_blur(
    image: jax.Array, key: jax.Array, cfg: BlurConfig = BlurConfig()
) -> jax.Array:
    """Blur random kernel-size regions covering ~``blur_percentage`` seeds
    (stereo_slam.py:152-174). ``blur_percentage=0`` returns the image
    unchanged (the reference's default configuration, quirk B9)."""
    if cfg.blur_percentage <= 0.0:
        return image
    blurred = apply_motion_blur(image, cfg.kernel_size, cfg.angle_deg)
    p = cfg.blur_percentage / 100.0
    seeds = jax.random.bernoulli(key, p, image.shape)
    k = cfg.kernel_size
    # dilate seeds to (k, k) boxes: max-pool with SAME padding
    mask = lax.reduce_window(
        seeds.astype(jnp.float32),
        0.0,
        lax.max,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(mask > 0, blurred, image)


class SensorConfig(NamedTuple):
    """Photometric domain-shift proxy (VERDICT r4 missing #3).

    The learned front-end trains exclusively on clean procedural renders;
    the reference ran on a real camera (BotanicGarden ingestion,
    stereo_slam.py:35) whose images carry exposure drift, sensor noise and
    lens vignetting. Real bags are not distributable, so this models the
    dominant sensor nuisances so the bench can measure how the committed
    checkpoint behaves on a photometric domain it was NOT trained on:

    - per-frame exposure: multiplicative gain (log-uniform +-``max_gain``)
      and additive bias (uniform +-``max_bias`` gray levels);
    - per-frame gamma jitter in [1/(1+g), 1+g] applied on [0, 1]
      intensities;
    - shot noise: zero-mean Gaussian with variance proportional to the
      signal (std = ``shot_sigma`` * sqrt(I/255) * 255) plus a constant
      read-noise floor ``read_sigma`` (gray levels);
    - radial vignetting: I *= 1 - ``vignette`` * (r / r_corner)^2.
    """

    max_gain: float = 0.25  # log-uniform exposure gain
    max_bias: float = 12.0  # gray levels
    max_gamma: float = 0.25
    shot_sigma: float = 5.0  # gray levels at full scale
    read_sigma: float = 2.0  # gray levels
    vignette: float = 0.35  # corner attenuation fraction


def apply_sensor_nuisance(
    image: jax.Array, key: jax.Array, cfg: SensorConfig = SensorConfig()
) -> jax.Array:
    """One (H, W) [0, 255] frame -> photometrically shifted frame."""
    H, W = image.shape
    kg, kb, kgam, kn = jax.random.split(key, 4)
    gain = jnp.exp(
        jax.random.uniform(kg, (), minval=-cfg.max_gain, maxval=cfg.max_gain)
    )
    bias = jax.random.uniform(
        kb, (), minval=-cfg.max_bias, maxval=cfg.max_bias
    )
    glog = jax.random.uniform(
        kgam, (), minval=-jnp.log1p(cfg.max_gamma),
        maxval=jnp.log1p(cfg.max_gamma),
    )
    gamma = jnp.exp(glog)

    ys = (jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0) / (H / 2.0)
    xs = (jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0) / (W / 2.0)
    r2 = (ys[:, None] ** 2 + xs[None, :] ** 2) / 2.0  # 1.0 at corners
    vig = 1.0 - cfg.vignette * r2

    x = jnp.clip(image / 255.0, 0.0, 1.0) ** gamma * 255.0
    x = x * gain * vig + bias
    noise_std = cfg.shot_sigma * jnp.sqrt(jnp.clip(x, 0.0, 255.0) / 255.0)
    noise = jax.random.normal(kn, image.shape) * jnp.sqrt(
        noise_std**2 + cfg.read_sigma**2
    )
    return jnp.clip(x + noise, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(2,))
def _sensor_stack(images: jax.Array, keys: jax.Array, cfg: SensorConfig):
    return jax.vmap(lambda im, k: apply_sensor_nuisance(im, k, cfg))(
        images, keys
    )


def sensor_shift_stack(
    images: jax.Array, key: jax.Array, cfg: SensorConfig = SensorConfig()
) -> jax.Array:
    """Apply per-frame sensor nuisances to an (N, H, W) stack."""
    keys = jax.random.split(key, images.shape[0])
    return _sensor_stack(images, keys, cfg)


@functools.partial(jax.jit, static_argnums=(2,))
def _corrupt_stack(images: jax.Array, keys: jax.Array, cfg: BlurConfig):
    return jax.vmap(lambda im, k: apply_random_motion_blur(im, k, cfg))(
        images, keys
    )


def corrupt_stack(
    images: jax.Array, key: jax.Array, cfg: BlurConfig = BlurConfig()
) -> jax.Array:
    """Apply random motion blur per frame of an (N, H, W) stack."""
    if cfg.blur_percentage <= 0.0:
        return images
    keys = jax.random.split(key, images.shape[0])
    return _corrupt_stack(images, keys, cfg)
