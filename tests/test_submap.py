"""Submap serialization: world<->anchor frame roundtrip + chaining."""
import numpy as np

from eags_slam_tpu.slam.submap import Submap


def _rand_world_gauss(rng, n=30):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "f_dc": rng.normal(size=(n, 3)).astype(np.float32),
        "f_rest": np.zeros((n, 15, 3), np.float32),
        "log_scales": rng.normal(size=(n, 3)).astype(np.float32),
        "quats": q,
        "opacity_logits": rng.normal(size=(n, 1)).astype(np.float32),
    }


def _rand_pose(rng):
    import jax.numpy as jnp

    from eags_slam_tpu.core.se3 import se3_exp

    return np.asarray(
        se3_exp(jnp.asarray(0.4 * rng.normal(size=6).astype(np.float32))),
        np.float64,
    )


def test_anchor_roundtrip(rng, tmp_path):
    g = _rand_world_gauss(rng)
    Twm = _rand_pose(rng)
    Tmc = np.stack([np.eye(4), _rand_pose(rng)])
    sm = Submap.from_world_arrays(0, 0, Twm, Twm, Tmc, [0, 2], g)
    restored = sm.restore_world(Twm)
    np.testing.assert_allclose(restored["xyz"], g["xyz"], atol=1e-5)
    # Quaternions up to sign.
    qa = restored["quats"]
    qb = g["quats"]
    sign = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
    np.testing.assert_allclose(qa * sign, qb, atol=1e-5)

    # Save/load roundtrip.
    path = sm.save(str(tmp_path))
    sm2 = Submap.load(path)
    np.testing.assert_allclose(sm2.T_prev_m, sm.T_prev_m)
    np.testing.assert_allclose(sm2.Tmc, Tmc)
    assert sm2.kf_frame_ids == [0, 2]
    np.testing.assert_allclose(
        sm2.restore_world(Twm)["xyz"], g["xyz"], atol=1e-5
    )


def test_correction_moves_whole_submap(rng):
    """Loop-closure semantics: changing only T_prev_m rigidly moves content."""
    g = _rand_world_gauss(rng)
    Twm = _rand_pose(rng)
    sm = Submap.from_world_arrays(1, 10, Twm, Twm, np.eye(4)[None], [10], g)
    corr = _rand_pose(rng)
    moved = sm.restore_world(corr @ Twm)
    expect = g["xyz"] @ corr[:3, :3].T.astype(np.float32) + corr[:3, 3].astype(
        np.float32
    )
    np.testing.assert_allclose(moved["xyz"], expect, atol=1e-4)
