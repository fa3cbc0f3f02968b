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


def _mini_book():
    from eags_slam_tpu.core.gaussians import empty_state
    from eags_slam_tpu.utils import optim

    st = empty_state(8)
    opt = M._split(st.params)
    adam = st.adam
    book = M._BookState(
        best_loss=jnp.array(jnp.inf), ema=jnp.array(jnp.inf),
        ckpt_opt=opt, ckpt_adam=adam, has_ckpt=jnp.array(False),
        early_cnt=jnp.zeros((), jnp.int32),
        stale_cnt=jnp.zeros((), jnp.int32), stopped=jnp.array(False),
    )
    return st, opt, adam, book


def _drive(losses, stale_best_cnt):
    """Run _book_step over a scripted loss sequence; return stop iteration
    (or None). 20-iter budget: ckpt every 1, prunes at 6/12."""
    st, opt, adam, book = _mini_book()
    alive = st.alive
    for it, total in enumerate(losses):
        book, opt, adam, alive = M._book_step(
            book, jnp.asarray(it), jnp.asarray(total, jnp.float32),
            opt, adam, alive, pruning_thre=0.01, ckpt_every=1,
            early_thre=1, prune_iters=(6, 12), ema_beta=0.0,
            stale_best_cnt=stale_best_cnt)
        if bool(book.stopped):
            return it
    return None


def test_stale_best_stop_fires_on_flat_loss():
    # Loss decreases until iter 14 then goes exactly flat: the reference
    # divergence guard (1.15x band) never fires, the convergence stop does.
    losses = [1.0 - 0.05 * min(i, 14) for i in range(40)]
    assert _drive(losses, stale_best_cnt=0) is None  # off = reference
    it = _drive(losses, stale_best_cnt=3)
    assert it is not None and 14 < it <= 22


def test_stale_best_stop_resets_on_improvement():
    # Strictly improving past the last prune -> stale never accumulates.
    losses = [1.0 - 0.02 * i for i in range(30)]
    assert _drive(losses, stale_best_cnt=3) is None
