"""Model-mismatch synthetic scene: raycast textured room (bench quality).

The plain `Synthetic` dataset renders its frames with this framework's OWN
gaussian rasterizer, so every observation is exactly representable by the
map model — convergence tests pass but prove nothing about quality under
mismatch (VERDICT r2 weak #2 / next #3). This scene is the antidote:

  - geometry: an axis-aligned box room + an inner sphere + an inner box,
    rendered per-pixel by exact RAY CASTING (not splatting);
  - appearance: procedural multi-frequency textures with hard checker
    edges — content a finite gaussian mixture can only approximate;
  - sensor model: depth noise sigma = depth_noise * depth^2 (Kinect-like),
    random depth dropout, and smooth per-frame exposure drift (gain/bias)
    like real auto-exposure.

GT poses stay exact, so ATE is a true tracking metric, and PSNR against
these frames measures reconstruction under model mismatch. Frames are
pre-rendered single-threaded at init (the tunneled TPU backend forbids
device access from the preloader thread — see CLAUDE.md).
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import numpy as np

from .datasets import BaseDataset


@functools.lru_cache(maxsize=4)
def _raycast_fn(cam):
    import jax
    import jax.numpy as jnp

    H, W = cam.height, cam.width
    HALF = 2.0                      # room half-size (m)
    # Inner objects stay >= ~0.4 m clear of the camera orbit (radius 0.5
    # around the origin): an object grazing the path fills the view at
    # close range, empties the tracking masks and breaks the pose chain
    # (observed at the first bench attempt: a 22 cm ATE jump at the
    # sphere fly-by).
    SPH_C = jnp.asarray([1.25, -0.45, 0.85])
    SPH_R = 0.45
    BOX_LO = jnp.asarray([-1.5, -0.9, -1.25])
    BOX_HI = jnp.asarray([-0.7, 0.35, -0.55])
    EPS = 1e-4
    BIG = jnp.float32(1e9)

    u = (jnp.arange(W, dtype=jnp.float32) - cam.cx) / cam.fx
    v = (jnp.arange(H, dtype=jnp.float32) - cam.cy) / cam.fy
    # Unnormalized camera-ray dirs with z=1: the ray parameter t IS z-depth.
    dirs_cam = jnp.stack(
        [jnp.tile(u[None, :], (H, 1)), jnp.tile(v[:, None], (1, W)),
         jnp.ones((H, W))], axis=-1,
    )

    def face_tex(face_id, a, b):
        """Procedural texture on local face coords (a, b) in [-2, 2]."""
        base = jnp.asarray([
            [0.75, 0.35, 0.30], [0.30, 0.60, 0.75], [0.40, 0.70, 0.35],
            [0.75, 0.65, 0.30], [0.55, 0.40, 0.70], [0.70, 0.50, 0.45],
        ])[face_id]
        accent = jnp.asarray([
            [0.20, 0.55, 0.60], [0.70, 0.40, 0.25], [0.65, 0.30, 0.55],
            [0.25, 0.35, 0.65], [0.35, 0.65, 0.35], [0.30, 0.55, 0.30],
        ])[face_id]
        checker = ((jnp.floor(a / 0.35) + jnp.floor(b / 0.35)) % 2.0)
        stripes = 0.5 + 0.5 * jnp.sin(9.0 * a + 5.0 * b)
        fine = 0.5 + 0.5 * jnp.sin(23.0 * a) * jnp.sin(19.0 * b)
        w = (0.45 + 0.35 * checker + 0.10 * fine)[..., None]
        return jnp.clip(
            base * w + accent * (0.28 * stripes + 0.08 * fine)[..., None],
            0.0, 1.0,
        )

    def raycast(c2w):
        R = c2w[:3, :3]
        o = c2w[:3, 3]
        d = dirs_cam @ R.T                        # (H, W, 3) world dirs

        best_t = jnp.full((H, W), BIG)
        best_c = jnp.zeros((H, W, 3))

        def take(t, col, cond):
            nonlocal best_t, best_c
            hit = cond & (t > EPS) & (t < best_t)
            best_c = jnp.where(hit[..., None], col, best_c)
            best_t = jnp.where(hit, t, best_t)

        # Room walls (rays exit inward, so farthest-first ordering doesn't
        # matter: min-t wins).
        for axis in range(3):
            for si, sign in enumerate((-1.0, 1.0)):
                denom = d[..., axis]
                t = (sign * HALF - o[axis]) / jnp.where(
                    jnp.abs(denom) < 1e-9, 1e-9, denom
                )
                p = o[None, None, :] + t[..., None] * d
                oa, ob = [i for i in range(3) if i != axis]
                inside = (jnp.abs(p[..., oa]) <= HALF + 1e-3) & (
                    jnp.abs(p[..., ob]) <= HALF + 1e-3
                )
                col = face_tex(axis * 2 + si, p[..., oa], p[..., ob])
                take(t, col, inside)

        # Sphere.
        oc = o - SPH_C
        a_q = jnp.sum(d * d, axis=-1)
        b_q = 2.0 * jnp.sum(d * oc[None, None, :], axis=-1)
        c_q = jnp.sum(oc * oc) - SPH_R * SPH_R
        disc = b_q * b_q - 4.0 * a_q * c_q
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_s = (-b_q - sq) / (2.0 * a_q)
        p = o[None, None, :] + t_s[..., None] * d
        n = p - SPH_C[None, None, :]
        ang1 = jnp.arctan2(n[..., 1], n[..., 0])
        ang2 = jnp.arccos(jnp.clip(n[..., 2] / SPH_R, -1.0, 1.0))
        band = 0.5 + 0.5 * jnp.sin(6.0 * ang1) * jnp.sin(8.0 * ang2)
        swirl = ((jnp.floor(ang1 / 0.6) + jnp.floor(ang2 / 0.5)) % 2.0)
        col_s = jnp.clip(
            jnp.stack([0.85 * band + 0.1, 0.3 + 0.5 * swirl,
                       0.9 - 0.6 * band], axis=-1),
            0.0, 1.0,
        )
        take(t_s, col_s, disc > 0.0)

        # Inner box (slab method).
        d_safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t1 = (BOX_LO[None, None, :] - o[None, None, :]) / d_safe
        t2 = (BOX_HI[None, None, :] - o[None, None, :]) / d_safe
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit_b = (tmax > tmin) & (tmin > EPS)
        p = o[None, None, :] + tmin[..., None] * d
        ctr = 0.5 * (BOX_LO + BOX_HI)
        ext = 0.5 * (BOX_HI - BOX_LO)
        rel = (p - ctr[None, None, :]) / ext[None, None, :]
        fid = jnp.argmax(jnp.abs(rel), axis=-1)
        lu = jnp.take_along_axis(p, ((fid + 1) % 3)[..., None], axis=-1)[..., 0]
        lv = jnp.take_along_axis(p, ((fid + 2) % 3)[..., None], axis=-1)[..., 0]
        grid = ((jnp.floor(lu / 0.12) + jnp.floor(lv / 0.12)) % 2.0)
        col_b = jnp.clip(
            jnp.stack([0.15 + 0.75 * grid, 0.8 - 0.5 * grid,
                       0.25 + 0.3 * jnp.sin(17.0 * lu)], axis=-1),
            0.0, 1.0,
        )
        take(tmin, col_b, hit_b)

        return best_c, best_t

    return jax.jit(raycast)


class SyntheticHard(BaseDataset):
    """Raycast textured room with sensor noise + exposure drift (see module
    docstring). Config keys under `data`: n_frames, orbit_speed,
    depth_noise (sigma = depth_noise * depth^2, default 0.002),
    depth_dropout (default 0.003), exposure_amp (default 0.08)."""

    def __init__(self, config: Dict):
        super().__init__(config)
        import jax.numpy as jnp

        d = config["data"]
        self.n_frames = int(d.get("n_frames", 40))
        self.depth_noise = float(d.get("depth_noise", 0.002))
        self.depth_dropout = float(d.get("depth_dropout", 0.003))
        self.exposure_amp = float(d.get("exposure_amp", 0.08))
        self._seed = int(config.get("seed", 0))
        self._jnp = jnp

        orbit_speed = float(d.get("orbit_speed", 1.0 / 300.0))
        for i in range(self.n_frames):
            t = i * orbit_speed
            ang = 0.6 * math.sin(2 * math.pi * t)
            cx = 0.5 * math.sin(2 * math.pi * t)
            cz = 0.5 * math.cos(2 * math.pi * t)
            c2w = np.eye(4)
            c2w[:3, :3] = np.array(
                [
                    [math.cos(ang), 0, math.sin(ang)],
                    [0, 1, 0],
                    [-math.sin(ang), 0, math.cos(ang)],
                ]
            )
            c2w[:3, 3] = [cx, 0.1 * math.sin(4 * math.pi * t), cz]
            self.poses.append(c2w)
            self.timestamps.append(i / 30.0)

        self._frame_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._dev_cache: Dict[int, tuple] = {}
        # Pre-render everything single-threaded (device access from the
        # preloader thread crashes the tunneled TPU worker, CLAUDE.md).
        for i in range(len(self)):
            self._load_raw(i)

    def _load_raw(self, idx):
        if idx in self._frame_cache:
            return self._frame_cache[idx]
        jnp = self._jnp
        ray = _raycast_fn(self.full_camera)
        w2c_inv = np.asarray(self.poses[idx], np.float32)
        color, depth = ray(jnp.asarray(w2c_inv))

        # Exposure drift baked into the OBSERVED color (auto-exposure-like).
        t = idx / max(self.n_frames, 1)
        gain = 1.0 + self.exposure_amp * math.sin(2 * math.pi * t * 2.0)
        bias = 0.5 * self.exposure_amp * math.sin(2 * math.pi * t * 3.0 + 1.0)
        color = jnp.clip(color * gain + bias, 0.0, 1.0)
        rgb8 = np.asarray(
            jnp.clip(color * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        )
        depth = np.asarray(depth.astype(jnp.float16)).astype(np.float32)

        # Sensor noise on host (deterministic per frame).
        rng = np.random.default_rng(self._seed * 100003 + idx)
        depth = depth + rng.normal(
            scale=self.depth_noise, size=depth.shape
        ).astype(np.float32) * depth * depth
        drop = rng.uniform(size=depth.shape) < self.depth_dropout
        depth = np.where(drop, 0.0, np.maximum(depth, 0.0)).astype(np.float32)

        self._frame_cache[idx] = (rgb8, depth)
        # One-time upload of the final OBSERVED frame (noise included) so
        # the SLAM loop can skip its per-frame transfer (device_frame);
        # happens at dataset init, outside any timed region.
        self._dev_cache[idx] = (
            jnp.asarray(rgb8), jnp.asarray(depth.astype(np.float16))
        )
        return self._frame_cache[idx]

    def device_frame(self, idx):
        return self._dev_cache.get(idx) if self.crop_edge == 0 else None

    def __len__(self):
        return self.n_frames if self.frame_limit < 0 else min(
            self.n_frames, self.frame_limit
        )
