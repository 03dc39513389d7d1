"""ZInD equirectangular-panorama projection chain.

pixel -> sphere -> room-Cartesian (ego) -> world-metric (floor-plane
intersection), and inverses. Parity: salve/utils/zind_pano_utils.py,
including the left-handed -> right-handed flips (z negation, then x
negation after the floor intersection).

Functions are written with vectorized primitives that work identically on
NumPy (host parsing path) and jax.numpy arrays (device kernels pass jnp
via the `xp` module argument).
"""

from __future__ import annotations

import math

import numpy as np

EPS_RAD = 1e-10


def pixel_to_sphere(points_pix: np.ndarray, width: int, xp=np) -> np.ndarray:
    """(N,2) pano pixel coords [x,y] -> spherical [theta, phi] on the unit sphere.

    theta in [-pi, pi] (left edge -> right edge), phi in [-pi/2, pi/2]
    (bottom -> top); [0, 0] is the image center. Height is width/2.
    """
    height = width / 2
    x_arr = points_pix[..., 0]
    y_arr = xp.clip(points_pix[..., 1], 0, height - 1)

    theta = x_arr / (width - 1) * (2.0 * math.pi) - math.pi
    phi = (1.0 - y_arr / (height - 1)) * math.pi - math.pi / 2.0
    return xp.stack([theta, phi], axis=-1)


def sphere_to_cartesian(points_sph: np.ndarray, xp=np) -> np.ndarray:
    """Spherical [theta, phi(, rho)] -> room-Cartesian [x, y, z] (left-handed).

    The image center (theta=0, phi=0) maps to the +z axis direction.
    """
    theta = points_sph[..., 0]
    phi = xp.clip(points_sph[..., 1], -math.pi / 2, math.pi / 2)
    rho = points_sph[..., 2] if points_sph.shape[-1] == 3 else xp.ones_like(theta)

    rho_cos_phi = rho * xp.cos(phi)
    x = rho_cos_phi * xp.sin(theta)
    y = rho * xp.sin(phi)
    z = rho_cos_phi * xp.cos(theta)
    return xp.stack([x, y, z], axis=-1)


def cartesian_to_sphere(points_cart: np.ndarray, xp=np) -> np.ndarray:
    """Room-Cartesian [x,y,z] -> spherical [theta, phi, rho]."""
    x, y, z = points_cart[..., 0], points_cart[..., 1], points_cart[..., 2]
    theta = xp.arctan2(x, z)
    rho = xp.sqrt(x * x + y * y + z * z)
    phi = xp.arcsin(y / rho)
    return xp.stack([theta, phi, rho], axis=-1)


def sphere_to_pixel(points_sph: np.ndarray, width: int, xp=np) -> np.ndarray:
    """Spherical [theta, phi] -> pano pixel coords [x, y]."""
    height = width / 2
    theta = points_sph[..., 0]
    phi = points_sph[..., 1]
    x_arr = (theta + math.pi) / (2.0 * math.pi) * (width - 1)
    y_arr = (1.0 - (phi + math.pi / 2.0) / math.pi) * (height - 1)
    return xp.stack([x_arr, y_arr], axis=-1)


def room_cartesian_to_worldmetric(
    cartesian_coordinates: np.ndarray, camera_height: float, xp=np
) -> np.ndarray:
    """Intersect unit-sphere rays with the floor plane; output right-handed metric coords.

    Rays scaled so the (downward) vertical component equals camera height;
    axes permuted so z becomes vertical; x negated for handedness.
    """
    flipped = cartesian_coordinates * xp.asarray([1.0, 1.0, -1.0])
    y = flipped[..., 1:2]
    world = flipped / y * camera_height
    world = xp.stack([-world[..., 0], world[..., 2], world[..., 1]], axis=-1)
    return world


def pixel_to_worldmetric(
    points_px: np.ndarray, image_width: int, camera_height_m: float, xp=np
) -> np.ndarray:
    """Full chain pixel -> world-metric, valid for points on the floor."""
    points_sph = pixel_to_sphere(points_px, width=image_width, xp=xp)
    points_cartesian = sphere_to_cartesian(points_sph, xp=xp)
    return room_cartesian_to_worldmetric(points_cartesian, camera_height_m, xp=xp)


# Reference-API aliases.
convert_points_px_to_worldmetric = pixel_to_worldmetric
zind_pixel_to_sphere = pixel_to_sphere
zind_sphere_to_cartesian = sphere_to_cartesian
zind_cartesian_to_sphere = cartesian_to_sphere
zind_sphere_to_pixel = sphere_to_pixel
zind_room_cartesian_to_worldmetric = room_cartesian_to_worldmetric


def worldmetric_to_room_cartesian(
    points_worldmetric: np.ndarray, camera_height_m: float, xp=np
) -> np.ndarray:
    """Inverse of :func:`room_cartesian_to_worldmetric` for floor points.

    This is the transform `salve/utils/buggy_transforms.py:23` intends but
    never achieves (its sign-squaring step makes it unrecoverable and it
    halts at a live pdb.set_trace()). The inverse is recoverable for floor
    points because they are below the horizon: of the two antipodal
    unit-sphere rays mapping to a given floor location, the one with
    negative sphere-frame y (downward-looking) is the physical one.
    """
    x = points_worldmetric[..., 0]
    y = points_worldmetric[..., 1]
    # Un-permute: world = [-f.x, f.z, f.y] * (h / f.y) for f = cart * [1,1,-1].
    w = xp.stack([-x, xp.full_like(x, camera_height_m), y], axis=-1)
    norm = xp.sqrt(xp.sum(w * w, axis=-1, keepdims=True))
    flipped = -w / norm  # choose the downward-looking (f.y < 0) solution
    return flipped * xp.asarray([1.0, 1.0, -1.0])


def worldmetric_to_pixel(
    points_worldmetric: np.ndarray, image_width: int, camera_height_m: float, xp=np
) -> np.ndarray:
    """Full chain world-metric -> pano pixel, valid for points on the floor.

    The corrected counterpart of the reference's
    `buggy_transforms.convert_points_worldmetric_to_px` (known-buggy, dead
    code there); exact round-trip inverse of :func:`pixel_to_worldmetric`.
    """
    cart = worldmetric_to_room_cartesian(points_worldmetric, camera_height_m, xp=xp)
    sph = cartesian_to_sphere(cart, xp=xp)
    return sphere_to_pixel(sph, width=image_width, xp=xp)


# Reference-API alias (corrected behavior; see docstring above).
convert_points_worldmetric_to_px = worldmetric_to_pixel


def xy_to_u(xy: np.ndarray, xp=np) -> np.ndarray:
    """World-metric (N,2) -> horizontal texture coordinate u in [0,1]."""
    return (xp.arctan2(xy[..., 0], xy[..., 1]) / math.pi + 1.0) / 2.0


def xy_to_uv(xy: np.ndarray, camera_height_m: float, img_w: int, img_h: int, xp=np) -> np.ndarray:
    """World-metric floor points -> pano texture coordinates in [0,W]x[0,H]."""
    u = xy_to_u(xy, xp=xp)
    depths = xp.sqrt(xy[..., 0] ** 2 + xy[..., 1] ** 2)
    v = 1.0 - xp.arctan(depths / camera_height_m) / math.pi
    return xp.stack([u * img_w, v * img_h], axis=-1)


def get_uni_sphere_xyz(H: int, W: int, xp=np) -> np.ndarray:
    """(H,W,3) unit-sphere ray grid in the HoHoNet convention.

    Parity: salve/utils/hohonet_pano_utils.py:10 — u spans the image width
    with a half-pixel offset, v spans the height; x right, y down-ish, z up.
    """
    jj, ii = xp.meshgrid(xp.arange(H) * 1.0, xp.arange(W) * 1.0, indexing="ij")
    u = -(ii + 0.5) / W * 2 * math.pi
    v = ((jj + 0.5) / H - 0.5) * math.pi
    z = -xp.sin(v)
    c = xp.cos(v)
    y = c * xp.sin(u)
    x = c * xp.cos(u)
    return xp.stack([x, y, z], axis=-1)
