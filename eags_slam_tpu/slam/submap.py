"""Submap serialization unit (checkpoint + loop-closure interface).

Reference: src/entities/submap.py — gaussians are stored in the submap
(anchor-keyframe) frame, keyframe poses as `Tmc` relative to the anchor,
submaps chained by `T_prev_m` (:72-107); `restore_gauss` re-anchors into
world by composing `Twm = Twm_prev @ T_prev_m` and rotating means+quats in
float64 (:39-70); files `submaps/%06d` (:109-124).

Here the file format is npz (torch.save is a torch-world choice); pose
chaining runs in host numpy float64 (SURVEY.md §7.3 hard part 6: TPU f64 is
weak, but the chains live on host anyway). Storing gaussians anchor-relative
is what lets loop closure correct a whole submap by touching only `T_prev_m`
(lc.py:589-596).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


def _rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """f64 matrix -> wxyz quaternion (single)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _quat_mul_np(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    """Hamilton product, q1 single (4,), q2 batch (N, 4)."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2[:, 0], q2[:, 1], q2[:, 2], q2[:, 3]
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


@dataclass
class Submap:
    submap_id: int
    kf_id: int                      # global frame id of the anchor keyframe
    T_prev_m: np.ndarray            # (4,4) f64: anchor in previous anchor's frame
    Tmc: np.ndarray                 # (K,4,4) f64: keyframe poses in anchor frame
    kf_frame_ids: List[int]
    gaussians: Dict[str, np.ndarray] = field(default_factory=dict)
    # anchor-frame packed arrays: xyz, f_dc, f_rest, log_scales, quats,
    # opacity_logits
    # Per-keyframe global descriptors computed at MAP time from the
    # already-uploaded device keyframes (LC then skips re-decoding every
    # keyframe on the 1-core host just to recompute them — VERDICT r2
    # weak #7). None when unavailable (e.g. NetVLAD-gated runs).
    descs: "np.ndarray | None" = None

    @staticmethod
    def from_world_arrays(
        submap_id: int, kf_id: int, Twm: np.ndarray, T_prev_m: np.ndarray,
        Tmc: np.ndarray, kf_frame_ids: List[int], world_gauss: Dict[str, np.ndarray],
        descs: "np.ndarray | None" = None,
    ) -> "Submap":
        """Convert world-frame packed gaussians into the anchor frame (f64
        rotation of means + quaternions, reference submap.py:72-107)."""
        T_mw = np.linalg.inv(np.asarray(Twm, np.float64))
        R, t = T_mw[:3, :3], T_mw[:3, 3]
        q_mw = _rotmat_to_quat_np(R)
        g = dict(world_gauss)
        g["xyz"] = (world_gauss["xyz"].astype(np.float64) @ R.T + t).astype(
            np.float32
        )
        g["quats"] = _quat_mul_np(
            q_mw, world_gauss["quats"].astype(np.float64)
        ).astype(np.float32)
        return Submap(submap_id, kf_id, np.asarray(T_prev_m, np.float64),
                      np.asarray(Tmc, np.float64), list(kf_frame_ids), g,
                      descs)

    def restore_world(self, Twm: np.ndarray) -> Dict[str, np.ndarray]:
        """Anchor-frame gaussians -> world frame given the (possibly
        loop-corrected) anchor pose (reference restore_gauss :39-70)."""
        T = np.asarray(Twm, np.float64)
        R, t = T[:3, :3], T[:3, 3]
        q_wm = _rotmat_to_quat_np(R)
        out = dict(self.gaussians)
        out["xyz"] = (self.gaussians["xyz"].astype(np.float64) @ R.T + t).astype(
            np.float32
        )
        out["quats"] = _quat_mul_np(
            q_wm, self.gaussians["quats"].astype(np.float64)
        ).astype(np.float32)
        return out

    def path(self, out_dir: str) -> str:
        return os.path.join(out_dir, "submaps", f"{self.submap_id:06d}.npz")

    def save(self, out_dir: str) -> str:
        p = self.path(out_dir)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        extra = {}
        if self.descs is not None:
            extra["descs"] = np.asarray(self.descs, np.float32)
        gauss = dict(self.gaussians)
        # Re-sparsify all-zero f_rest to the (0, ...) marker (inverse of the
        # load-side densify): loop closure re-saves every submap after each
        # PGO to persist the corrected T_prev_m, and writing ~27 MB of SH
        # zeros per submap put the rewrite on the LC critical path.
        fr = gauss.get("f_rest")
        if fr is not None and fr.size and not np.any(fr):
            gauss["f_rest"] = np.zeros((0,) + fr.shape[1:], fr.dtype)
        # Uncompressed: zlib on the ~10-50 MB payload costs seconds of the
        # 1-core host's time at every submap boundary (the write sits on
        # the SLAM loop's critical path); disk is not the scarce resource.
        np.savez(
            p,
            submap_id=self.submap_id,
            kf_id=self.kf_id,
            T_prev_m=self.T_prev_m,
            Tmc=self.Tmc,
            kf_frame_ids=np.asarray(self.kf_frame_ids, np.int64),
            **extra,
            **{f"g_{k}": v for k, v in gauss.items()},
        )
        return p

    @staticmethod
    def load(path: str) -> "Submap":
        z = np.load(path)
        gauss = {k[2:]: z[k] for k in z.files if k.startswith("g_")}
        # All-zero f_rest is stored as a (0, ...) marker (see pack_state);
        # rebuild the dense zeros so consumers keep a uniform schema.
        fr = gauss.get("f_rest")
        if fr is not None and fr.shape[0] == 0 and "xyz" in gauss:
            gauss["f_rest"] = np.zeros(
                (gauss["xyz"].shape[0],) + fr.shape[1:], fr.dtype
            )
        return Submap(
            submap_id=int(z["submap_id"]),
            kf_id=int(z["kf_id"]),
            T_prev_m=z["T_prev_m"],
            Tmc=z["Tmc"],
            kf_frame_ids=list(z["kf_frame_ids"]),
            gaussians=gauss,
            descs=z["descs"] if "descs" in z.files else None,
        )


def pack_state(state) -> Dict[str, np.ndarray]:
    """Alive rows of a GaussianState -> host numpy dict (world frame).

    `f_rest` (SH degree >= 1, 45 of the ~59 floats per gaussian) is
    identically zero during SLAM — the mapper optimizes f_dc only and SH
    upgrades happen in the merged-map refinement (evaluation/merged_map.py).
    One scalar device probe decides whether to fetch it: moving ~47 MB of
    zeros across the ~20 MB/s tunneled link at every submap boundary cost
    seconds of the SLAM loop. The all-zero case travels as a (0, ...)
    marker that Submap.load re-densifies."""
    import jax.numpy as jnp

    alive = np.asarray(state.alive)
    p = state.params
    if bool(np.asarray(jnp.any(p.f_rest != 0))):
        f_rest = np.asarray(p.f_rest)[alive]
    else:
        f_rest = np.zeros((0,) + p.f_rest.shape[1:], np.float32)
    return {
        "xyz": np.asarray(p.xyz)[alive],
        "f_dc": np.asarray(p.f_dc)[alive],
        "f_rest": f_rest,
        "log_scales": np.asarray(p.log_scales)[alive],
        "quats": np.asarray(p.quats)[alive],
        "opacity_logits": np.asarray(p.opacity_logits)[alive],
    }
