"""Mapper building blocks: seeding masks, seed sampling, growth dedup."""
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core import gaussians as G
from eags_slam_tpu.core.camera import Camera
from eags_slam_tpu.ops.rasterizer import RasterConfig
from eags_slam_tpu.slam import mapper as M

CAM = Camera(fx=40.0, fy=40.0, cx=23.5, cy=15.5, width=48, height=32)
RCFG = RasterConfig(tile=16, dup_side=4, tile_capacity=64, chunk=32,
                    backend="jnp")


def test_seeding_mask_update_empty_map():
    # Empty map -> alpha == 0 everywhere -> whole (valid-depth) image seeds.
    st = G.empty_state(64)
    mask = M.seeding_mask_update(
        st.params, st.alive, jnp.eye(4), jnp.full((32, 48), 2.0), CAM, RCFG,
        alpha_thre=0.6,
    )
    assert bool(jnp.all(mask))


def test_sample_seed_ids_update_mode(rng):
    seeding = np.zeros((32, 48), bool)
    seeding[10:20, 10:30] = True
    depth = np.full((32, 48), 2.0, np.float32)
    depth[:, :5] = 0.0
    gray = jnp.asarray(rng.uniform(0, 255, (32, 48)).astype(np.float32))
    ids, valid = M.sample_seed_ids(
        jnp.asarray(np.array([0, 1], np.uint32)), jnp.asarray(seeding),
        jnp.asarray(depth), gray, 100, 50, 64, False,
    )
    ids, valid = np.asarray(ids), np.asarray(valid)
    sel = ids[valid]
    rows, cols = sel // 48, sel % 48
    assert valid.sum() > 0
    assert np.all((rows >= 10) & (rows < 20) & (cols >= 10) & (cols < 30))


def test_sample_seed_ids_new_mode_unique(rng):
    seeding = np.ones((32, 48), bool)
    depth = np.full((32, 48), 2.0, np.float32)
    gray = jnp.asarray(rng.uniform(0, 255, (32, 48)).astype(np.float32))
    ids, valid = M.sample_seed_ids(
        jnp.asarray(np.array([3, 4], np.uint32)), jnp.asarray(seeding),
        jnp.asarray(depth), gray, 200, 100, 100, True,
    )
    sel = np.asarray(ids)[np.asarray(valid)]
    assert len(np.unique(sel)) == len(sel)  # duplicates removed


def test_grow_submap_dedups(rng):
    st = G.empty_state(512)
    depth = jnp.full((32, 48), 2.0)
    color = jnp.full((32, 48, 3), 0.5)
    pts, rgbs = M.backproject_world(color, depth, jnp.eye(4), CAM)
    edge = jnp.zeros((32, 48), bool)
    ids = jnp.arange(128, dtype=jnp.int32)
    valid = jnp.ones(128, bool)
    key = jnp.asarray(np.array([0, 1], np.uint32))
    st, n1 = M.grow_submap(st, key, ids, valid, pts, rgbs, edge, depth,
                           1e-4, CAM, 32, 48, True, False)
    assert int(n1) == 128
    # Growing with the SAME points again: radius dedup rejects all.
    st, n2 = M.grow_submap(st, key, ids, valid, pts, rgbs, edge, depth,
                           1e-4, CAM, 32, 48, True, False)
    assert int(n2) == 0


def test_keyframe_reservoir_uniform():
    """Past the window, retained keyframes stay a ~uniform sample over all
    past keyframes (reference keeps every keyframe and samples uniformly;
    the reservoir preserves that marginal with bounded memory)."""
    import numpy as np

    from eags_slam_tpu.slam.gaussian_slam import GaussianSLAM

    obj = object.__new__(GaussianSLAM)
    obj.mcfg = M.MapperConfig(max_keyframes=9)   # reservoir size 8
    obj._rng = np.random.default_rng(0)

    counts = np.zeros(64)
    trials = 400
    for _ in range(trials):
        obj.n_kf = 0
        obj._kf_seen = 0
        slots = {}
        for kf in range(64):
            s = obj._next_kf_slot()
            if s is not None:
                slots[s] = kf
        for kf in slots.values():
            counts[kf] += 1
        assert len(slots) == 8                    # window always full
    # Each keyframe retained with prob ~ 8/64 = 0.125.
    freq = counts / trials
    assert abs(freq.mean() - 8 / 64) < 1e-6
    assert freq.min() > 0.05 and freq.max() < 0.25, freq
