"""Synthetic "forest corridor" sequence renderer.

The BotanicGarden rosbags are not distributed with the reference repo
(`.gitignore` excludes `ros_ws/src/Datasets/`; SURVEY.md §4), so end-to-end
pipeline tests and the throughput benchmark run on a procedurally rendered
stereo sequence with exact ground truth:

- the world is a textured corridor (ground plane + two walls — deliberately
  non-coplanar so PnP is well-posed), mimicking a forest trail's geometry;
- each frame is rendered by ray-casting every pixel against the planes and
  bilinearly sampling a fixed noise texture — one homography-style warp per
  plane, exact to sub-pixel;
- ground-truth camera poses, depth maps, and therefore disparity maps are
  available analytically for every frame.

The renderer is pure jnp (jit-able): the benchmark generates frames on the
TPU itself, and tests render tiny sequences on CPU.
"""

from __future__ import annotations

import contextlib
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, StereoRig
from forest_slam_tpu.core.lie import se3_matrix

_HI = jax.lax.Precision.HIGHEST

# Bump whenever the rendered pixels for a fixed (world, trajectory, rig)
# input would change — i.e. any edit to make_corridor_world / render_view /
# corridor_trajectory / default_rig that alters output values. bench.py
# folds this into its on-disk frame-cache key so stale frames are never
# silently reused (ADVICE r2 medium).
RENDER_VERSION = 1


class Plane(NamedTuple):
    origin: jax.Array  # (3,) a point on the plane
    e1: jax.Array  # (3,) texture u axis (unit)
    e2: jax.Array  # (3,) texture v axis (unit)
    # normal = cross(e1, e2)


class CorridorWorld(NamedTuple):
    planes: tuple[Plane, ...]
    textures: jax.Array  # (P, TH, TW) float32 intensities
    texture_scale: float  # metres per texture pixel


def make_corridor_world(
    key: jax.Array,
    half_width: float = 4.0,
    ground_y: float = 1.5,
    wall_height: float = 6.0,
    texture_px: int = 1024,
    texture_scale: float = 0.05,
) -> CorridorWorld:
    """Ground plane + left/right walls with independent noise textures."""
    keys = jax.random.split(key, 3)
    texs = []
    for k in keys:
        t = jax.random.uniform(k, (texture_px, texture_px), minval=0.0, maxval=255.0)
        # mild smoothing so bilinear sampling is well-behaved and gradients
        # exist at sub-pixel shifts
        kernel = jnp.array([0.25, 0.5, 0.25])
        t = jnp.apply_along_axis(lambda r: jnp.convolve(r, kernel, mode="same"), 0, t)
        t = jnp.apply_along_axis(lambda r: jnp.convolve(r, kernel, mode="same"), 1, t)
        texs.append(t)
    planes = (
        # ground: y = ground_y, textured along (x, z)
        Plane(
            origin=jnp.array([0.0, ground_y, 0.0]),
            e1=jnp.array([1.0, 0.0, 0.0]),
            e2=jnp.array([0.0, 0.0, 1.0]),
        ),
        # left wall: x = -half_width, textured along (z, y)
        Plane(
            origin=jnp.array([-half_width, ground_y - wall_height, 0.0]),
            e1=jnp.array([0.0, 0.0, 1.0]),
            e2=jnp.array([0.0, 1.0, 0.0]),
        ),
        # right wall: x = +half_width
        Plane(
            origin=jnp.array([half_width, ground_y - wall_height, 0.0]),
            e1=jnp.array([0.0, 0.0, 1.0]),
            e2=jnp.array([0.0, 1.0, 0.0]),
        ),
    )
    return CorridorWorld(
        planes=planes, textures=jnp.stack(texs), texture_scale=texture_scale
    )


class ForestWorld(NamedTuple):
    """Trunked forest scene for the same ray-caster: textured ground +
    overhead canopy + far side walls, plus N vertical cylinder trunks with
    a shared bark texture. The closest honest offline proxy for the
    BotanicGarden domain (dense vegetation, occlusion, depth
    discontinuities — reference README.md:2-8): trunks occlude each other
    and the ground, and depth jumps by metres across trunk silhouettes."""

    planes: tuple[Plane, ...]
    textures: jax.Array  # (P, TH, TW)
    texture_scale: float
    trunks: jax.Array  # (N, 5): cx, cz, radius, height, texture u-offset
    trunk_texture: jax.Array  # (TH, TW) bark
    ground_y: float


def make_forest_world(
    key: jax.Array,
    n_trees: int = 150,
    extent_x: float = 14.0,
    z_range: tuple[float, float] = (-5.0, 75.0),
    clear_half_width: float = 1.6,
    ground_y: float = 1.5,
    canopy_height: float = 6.0,
    texture_px: int = 1024,
    texture_scale: float = 0.05,
) -> ForestWorld:
    """Scattered vertical trunks + ground clutter + canopy + far walls.

    Trunks are uniform over x in [-extent_x, extent_x] excluding the
    camera's walking band |x| < clear_half_width, z in z_range, with
    radii 0.12-0.45 m and heights reaching the canopy. The bark texture
    is streaked vertically (noise smoothed along v) so trunks look
    different from the ground clutter and are feature-rich.
    """
    keys = jax.random.split(key, 9)
    kernel = jnp.array([0.25, 0.5, 0.25])

    def smooth(t, axis, reps=1):
        for _ in range(reps):
            t = jnp.apply_along_axis(
                lambda r: jnp.convolve(r, kernel, mode="same"), axis, t
            )
        return t

    def noise(k, reps_y=1, reps_x=1):
        t = jax.random.uniform(k, (texture_px, texture_px), minval=0.0, maxval=255.0)
        return smooth(smooth(t, 0, reps_y), 1, reps_x)

    # ground: multi-octave clutter (coarse blobs + fine grain)
    coarse = jax.random.uniform(keys[0], (texture_px // 8, texture_px // 8))
    coarse = jax.image.resize(coarse, (texture_px, texture_px), "bilinear")
    ground_tex = jnp.clip(
        0.55 * coarse * 255.0 + 0.45 * noise(keys[1]), 0.0, 255.0
    )
    canopy_tex = jnp.clip(
        0.5 * noise(keys[2], 3, 3) + 0.5 * noise(keys[3]), 0.0, 255.0
    )
    wall_l = noise(keys[4], 2, 2)
    wall_r = noise(keys[5], 2, 2)
    # bark: smooth strongly along v (axis 0) -> vertical streaks
    bark = noise(keys[6], 8, 1)

    planes = (
        Plane(  # ground
            origin=jnp.array([0.0, ground_y, 0.0]),
            e1=jnp.array([1.0, 0.0, 0.0]),
            e2=jnp.array([0.0, 0.0, 1.0]),
        ),
        Plane(  # canopy overhead
            origin=jnp.array([0.0, ground_y - canopy_height, 0.0]),
            e1=jnp.array([1.0, 0.0, 0.0]),
            e2=jnp.array([0.0, 0.0, 1.0]),
        ),
        Plane(  # distant left wall (dense-forest backdrop)
            origin=jnp.array([-extent_x - 2.0, ground_y - canopy_height, 0.0]),
            e1=jnp.array([0.0, 0.0, 1.0]),
            e2=jnp.array([0.0, 1.0, 0.0]),
        ),
        Plane(  # distant right wall
            origin=jnp.array([extent_x + 2.0, ground_y - canopy_height, 0.0]),
            e1=jnp.array([0.0, 0.0, 1.0]),
            e2=jnp.array([0.0, 1.0, 0.0]),
        ),
    )
    textures = jnp.stack([ground_tex, canopy_tex, wall_l, wall_r])

    ku = jax.random.split(keys[7], 4)
    side = jnp.where(jax.random.uniform(ku[0], (n_trees,)) < 0.5, -1.0, 1.0)
    cx = side * jax.random.uniform(
        ku[1], (n_trees,), minval=clear_half_width, maxval=extent_x
    )
    z0, z1 = z_range
    cz = jax.random.uniform(ku[2], (n_trees,), minval=z0, maxval=z1)
    radius = jax.random.uniform(ku[3], (n_trees,), minval=0.12, maxval=0.45)
    height = jnp.full((n_trees,), canopy_height)
    u_off = jax.random.uniform(
        keys[8], (n_trees,), minval=0.0, maxval=float(texture_px)
    )
    trunks = jnp.stack([cx, cz, radius, height, u_off], axis=1)
    return ForestWorld(
        planes=planes,
        textures=textures,
        texture_scale=texture_scale,
        trunks=trunks,
        trunk_texture=bark,
        ground_y=ground_y,
    )


def _sample_texture(tex: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample with wraparound (textures tile along the corridor)."""
    TH, TW = tex.shape
    u = u % TW
    v = v % TH
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = (u0 + 1) % TW
    v1 = (v0 + 1) % TH
    a = tex[v0, u0]
    b = tex[v0, u1]
    c = tex[v1, u0]
    d = tex[v1, u1]
    return a * (1 - fu) * (1 - fv) + b * fu * (1 - fv) + c * (1 - fu) * fv + d * fu * fv


@functools.partial(jax.jit, static_argnums=(3, 4))
def render_view(
    world,
    T_world_cam: jax.Array,
    K: jax.Array,
    height: int,
    width: int,
) -> tuple[jax.Array, jax.Array]:
    """Render one camera view of a CorridorWorld or ForestWorld.

    Returns (image (H, W) float32 in [0, 255], depth (H, W) float32 —
    z-depth in the camera frame, inf where nothing is hit).
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    dirs_cam = jnp.stack(
        [(gx - cx) / fx, (gy - cy) / fy, jnp.ones_like(gx)], axis=-1
    )  # (H, W, 3)
    R = T_world_cam[:3, :3]
    o = T_world_cam[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam, precision=_HI)

    best_depth = jnp.full((height, width), jnp.inf)
    best_val = jnp.zeros((height, width))
    for pi, plane in enumerate(world.planes):
        n = jnp.cross(plane.e1, plane.e2)
        denom = jnp.einsum("hwi,i->hw", dirs, n, precision=_HI)
        tnum = jnp.dot(plane.origin - o, n)
        t = tnum / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit = t > 1e-3
        # z-depth along the camera axis, not ray length (dirs_cam z = 1,
        # so the ray parameter t IS the z-depth for planes and trunks)
        zdepth = t * dirs_cam[..., 2]
        point = o[None, None, :] + t[..., None] * dirs
        rel = point - plane.origin
        u = jnp.einsum("hwi,i->hw", rel, plane.e1, precision=_HI) / world.texture_scale
        v = jnp.einsum("hwi,i->hw", rel, plane.e2, precision=_HI) / world.texture_scale
        val = _sample_texture(world.textures[pi], u, v)
        closer = hit & (zdepth < best_depth) & (zdepth > 0)
        best_depth = jnp.where(closer, zdepth, best_depth)
        best_val = jnp.where(closer, val, best_val)

    if isinstance(world, ForestWorld):
        best_val, best_depth = _raycast_trunks(
            world, o, dirs, best_val, best_depth
        )
    return best_val, best_depth


def _raycast_trunks(
    world: "ForestWorld",
    o: jax.Array,  # (3,) camera origin, world frame
    dirs: jax.Array,  # (H, W, 3) unnormalized rays (z-depth = ray param)
    best_val: jax.Array,
    best_depth: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Intersect every ray with every vertical cylinder trunk (lax.scan
    over trunks keeps memory at one (H, W) slab per accumulator — a
    broadcast (H, W, N) volume would be GBs at 960x600 x 150 trees)."""
    dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    a = dx * dx + dz * dz  # (H, W), > 0 unless ray is vertical

    def one_trunk(carry, trunk):
        best_val, best_depth = carry
        tcx, tcz, radius, h, u_off = (
            trunk[0], trunk[1], trunk[2], trunk[3], trunk[4],
        )
        ox = o[0] - tcx
        oz = o[2] - tcz
        b = 2.0 * (ox * dx + oz * dz)
        c = ox * ox + oz * oz - radius * radius
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / (2.0 * jnp.maximum(a, 1e-12))  # near intersection
        y = o[1] + t * dy
        hit = (
            (disc > 0.0)
            & (t > 1e-3)
            & (y <= world.ground_y)
            & (y >= world.ground_y - h)
        )
        px = o[0] + t * dx
        pz = o[2] + t * dz
        az = jnp.arctan2(pz - tcz, px - tcx)
        u = az * radius / world.texture_scale + u_off
        v = y / world.texture_scale
        val = _sample_texture(world.trunk_texture, u, v)
        closer = hit & (t < best_depth)
        return (
            jnp.where(closer, val, best_val),
            jnp.where(closer, t, best_depth),
        ), None

    (best_val, best_depth), _ = jax.lax.scan(
        one_trunk, (best_val, best_depth), world.trunks
    )
    return best_val, best_depth


def corridor_trajectory(
    n_frames: int,
    speed: float = 0.15,
    sway: float = 0.5,
    sway_period: float = 120.0,
) -> jax.Array:
    """(N, 4, 4) T_world_cam: forward motion down the corridor with gentle
    lateral sway and matching yaw — BotanicGarden-like 10 Hz walking pace."""
    i = jnp.arange(n_frames, dtype=jnp.float32)
    z = i * speed
    x = sway * jnp.sin(2 * jnp.pi * i / sway_period)
    dxdz = sway * (2 * jnp.pi / sway_period) * jnp.cos(2 * jnp.pi * i / sway_period) / speed
    yaw = jnp.arctan(dxdz * speed)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(cy)
    one = jnp.ones_like(cy)
    R = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        axis=-2,
    )  # (N, 3, 3) yaw about y
    t = jnp.stack([x, jnp.zeros_like(x), z], axis=-1)
    return se3_matrix(R, t)


def out_and_back_trajectory(
    n_forward: int = 20,
    n_turn: int = 12,
    speed: float = 0.25,
    n_rejoin: int = 6,
) -> jax.Array:
    """(N, 4, 4) loop trajectory: forward down the corridor, turn 180° in
    place, return PAST the start, turn back to the original heading, and
    retrace the first leg for ``n_rejoin`` frames — those final frames
    revisit the first frames' viewpoints exactly, giving the loop-closure
    backend a true loop to detect. N = 2*n_forward + 2*n_turn + 2*n_rejoin.
    """
    import numpy as _np

    yaw = []
    z = []
    # phase 1: forward
    yaw += [0.0] * n_forward
    z += list(_np.arange(n_forward) * speed)
    z_far = (n_forward - 1) * speed
    # phase 2: rotate 0 -> pi in place
    yaw += list(_np.linspace(0.0, _np.pi, n_turn, endpoint=False))
    z += [z_far] * n_turn
    # phase 3: return (heading -z), overshooting the start by n_rejoin steps
    n_back = n_forward + n_rejoin
    yaw += [_np.pi] * n_back
    z += list(z_far - _np.arange(1, n_back + 1) * speed)
    # phase 4: rotate pi -> 2 pi back to the initial heading
    yaw += list(_np.linspace(_np.pi, 2 * _np.pi, n_turn, endpoint=False))
    z += [z_far - n_back * speed] * n_turn
    # phase 5: retrace the first leg (true revisits of frames ~0..n_rejoin)
    yaw += [2 * _np.pi] * n_rejoin
    z += list(z_far - n_back * speed + _np.arange(1, n_rejoin + 1) * speed)
    yaw = _np.asarray(yaw, _np.float32)
    z = _np.asarray(z, _np.float32)
    cy, sy = _np.cos(yaw), _np.sin(yaw)
    zero = _np.zeros_like(cy)
    one = _np.ones_like(cy)
    R = _np.stack(
        [
            _np.stack([cy, zero, sy], -1),
            _np.stack([zero, one, zero], -1),
            _np.stack([-sy, zero, cy], -1),
        ],
        axis=-2,
    )
    t = _np.stack([zero, zero, z], axis=-1)
    return se3_matrix(jnp.asarray(R), jnp.asarray(t))


class SyntheticSequence(NamedTuple):
    images_left: jax.Array  # (N, H, W) float32 [0, 255]
    images_right: jax.Array  # (N, H, W)
    depths_left: jax.Array  # (N, H, W)
    T_world_cam: jax.Array  # (N, 4, 4) left-camera poses
    timestamps: np.ndarray  # (N,) float64
    rig: StereoRig


def default_rig(height: int, width: int, baseline: float = 0.25) -> StereoRig:
    """Ideal (distortion-free) rig at the requested resolution — synthetic
    frames are rendered pre-undistorted."""
    f = 0.67 * width
    K = np.array(
        [[f, 0, width / 2 - 0.5], [0, f, height / 2 - 0.5], [0, 0, 1]], np.float32
    )
    cam = PinholeCamera.create(K, None, width, height)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = baseline
    return StereoRig(left=cam, right=cam, T_left_right=jnp.asarray(T))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _render_sequence_stacks(world, Ts, K, T_lr, height: int, width: int):
    # world/K/T_lr enter as ARGUMENTS: tracing a concrete device array into
    # a closure permanently degrades the process's dispatch latency on the
    # tunneled TPU (measured ~0.03 ms -> ~2 ms per dispatch; see bench.py)
    def render_frame(T):
        img_l, dep_l = render_view(world, T, K, height, width)
        img_r, _ = render_view(world, T @ T_lr, K, height, width)
        return img_l, img_r, dep_l

    return jax.lax.map(render_frame, Ts)


def render_sequence(
    n_frames: int,
    height: int = 120,
    width: int = 160,
    seed: int = 0,
    speed: float = 0.15,
    dt: float = 0.1,
    scene: str = "corridor",
    device: str | None = None,
) -> SyntheticSequence:
    """Render a full stereo sequence (host convenience wrapper).

    ``scene``: "corridor" (textured box world) or "forest" (trunks +
    clutter + occlusion — the BotanicGarden-domain proxy).

    ``device``: platform name ("cpu") to pin the render to; the stacks are
    then fetched to host numpy per chunk. Used to keep the long forest
    ray-cast off the tunneled TPU, whose worker intermittently dies under
    multi-minute render dispatches (the consumer pipeline re-uploads the
    frames once)."""
    # rig construction stays outside the device context: arrays created
    # under default_device are committed there, and a cpu-committed
    # T_left_right would fault the TPU consumer pipeline
    rig = default_rig(height, width)
    ctx = (
        jax.default_device(jax.devices(device)[0])
        if device is not None
        else contextlib.nullcontext()
    )
    with ctx:
        if scene == "forest":
            world = make_forest_world(
                jax.random.PRNGKey(seed),
                z_range=(-5.0, n_frames * speed + 20.0),
            )
        else:
            world = make_corridor_world(jax.random.PRNGKey(seed))
        Ts = corridor_trajectory(n_frames, speed=speed)
        # chunk the device render: one lax.map over the whole sequence is a
        # single minutes-long dispatch at 960x600 x 160 frames x ~10^2-trunk
        # scan, which the tunneled TPU worker kills (observed repeated
        # "worker crashed" on forest renders); bounded chunks also cap the
        # output HBM footprint to chunk x 3 x H x W
        chunk = 32
        parts = []
        for s in range(0, n_frames, chunk):
            e = min(s + chunk, n_frames)
            part = _render_sequence_stacks(
                world, jnp.asarray(Ts[s:e]), rig.left.K, rig.T_left_right,
                height, width,
            )
            if device is not None:
                part = tuple(np.asarray(p) for p in part)
            parts.append(part)
    cat = np if device is not None else jnp
    imgs_l, imgs_r, deps_l = (
        cat.concatenate([p[i] for p in parts], axis=0) for i in range(3)
    )
    ts = 1.6e9 + np.arange(n_frames) * dt
    return SyntheticSequence(
        images_left=imgs_l,
        images_right=imgs_r,
        depths_left=deps_l,
        T_world_cam=Ts,
        timestamps=ts,
        rig=rig,
    )
