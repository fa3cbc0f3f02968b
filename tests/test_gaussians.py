import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core import gaussians as G


def test_insert_and_prune():
    st = G.empty_state(16)
    rows = G.point_rows(
        jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)).astype(np.float32)),
        jnp.full((6, 3), 0.5),
        jnp.full((6,), 0.01),
        jnp.full((6,), 0.5),
    )
    valid = jnp.array([True, True, False, True, True, True])
    st, n = G.insert(st, rows, valid)
    assert int(n) == 5
    assert int(G.num_alive(st)) == 5

    # Prune two of them.
    kill = jnp.zeros(16, bool).at[0].set(True).at[1].set(True)
    st = G.prune(st, kill)
    assert int(G.num_alive(st)) == 3

    # Insert again: freed slots are reused before fresh ones.
    st, n2 = G.insert(st, rows, jnp.ones(6, bool))
    assert int(n2) == 6
    assert int(G.num_alive(st)) == 9


def test_insert_overflow_drops():
    st = G.empty_state(4)
    rows = G.point_rows(
        jnp.zeros((8, 3)), jnp.full((8, 3), 0.5), jnp.full((8,), 0.01),
        jnp.full((8,), 0.5),
    )
    st, n = G.insert(st, rows, jnp.ones(8, bool))
    assert int(n) == 4
    assert int(G.num_alive(st)) == 4


def test_adam_reset_on_insert():
    st = G.empty_state(8)
    rows = G.point_rows(
        jnp.ones((2, 3)), jnp.full((2, 3), 0.5), jnp.full((2,), 0.01),
        jnp.full((2,), 0.5),
    )
    # Poison all moments, then insert: inserted slots must be zeroed.
    import jax
    adam = st.adam._replace(mu=jax.tree.map(lambda x: x + 7.0, st.adam.mu))
    st = st._replace(adam=adam)
    st2, _ = G.insert(st, rows, jnp.ones(2, bool))
    mu_xyz = np.asarray(st2.adam.mu.xyz)
    assert np.all(mu_xyz[:2] == 0.0)
    assert np.all(mu_xyz[2:] == 7.0)


def test_edge_pair_seeds_simple():
    # A horizontal 3-pixel edge segment at constant depth: the middle pixel
    # (sampled) pairs with both neighbors.
    h, w = 8, 8
    edge = np.zeros((h, w), bool)
    edge[4, 3:6] = True
    depth = np.ones((h, w), np.float32)
    pts = np.zeros((h * w, 3), np.float32)
    for r in range(h):
        for c in range(w):
            pts[r * w + c] = [c * 0.1, r * 0.1, 1.0]
    cols = np.full((h * w, 3), 0.5, np.float32)

    sample_ids = jnp.array([4 * w + 4, 0], jnp.int32)  # center edge px + non-edge
    sample_valid = jnp.array([True, True])
    (lo, hi, pv, xyz, rgb, ls, quats, member) = G.edge_pair_seeds(
        sample_ids, sample_valid, jnp.asarray(edge), jnp.asarray(depth),
        jnp.asarray(pts), jnp.asarray(cols), h, w,
    )
    pv = np.asarray(pv)
    assert pv.sum() == 2  # (center,left) and (center,right)
    sel = np.asarray(xyz)[pv]
    # Midpoints between (4,4)-(4,3) and (4,4)-(4,5).
    got = sorted(tuple(np.round(p, 3)) for p in sel)
    assert got == [(0.35, 0.4, 1.0), (0.45, 0.4, 1.0)]
    # Elongated along x: first scale bigger.
    s = np.exp(np.asarray(ls)[pv])
    assert np.allclose(s[:, 0], 1.25 * 0.1, atol=1e-4)
    assert np.allclose(s[:, 1], 0.5 * 0.1, atol=1e-4)
    assert bool(np.asarray(member)[0])
    assert not bool(np.asarray(member)[1])


def test_edge_pair_depth_gate():
    # Depth-inconsistent neighbor is rejected.
    h, w = 8, 8
    edge = np.zeros((h, w), bool)
    edge[4, 3:6] = True
    depth = np.ones((h, w), np.float32)
    depth[4, 3] = 2.0  # inconsistent
    pts = np.zeros((h * w, 3), np.float32)
    cols = np.full((h * w, 3), 0.5, np.float32)
    sample_ids = jnp.array([4 * w + 4], jnp.int32)
    out = G.edge_pair_seeds(
        sample_ids, jnp.array([True]), jnp.asarray(edge), jnp.asarray(depth),
        jnp.asarray(pts), jnp.asarray(cols), h, w,
    )
    assert np.asarray(out[2]).sum() == 1  # only the right neighbor survives


def test_edge_pair_dedup():
    # Both endpoints sampled: the shared pair appears once.
    h, w = 8, 8
    edge = np.zeros((h, w), bool)
    edge[4, 4:6] = True
    depth = np.ones((h, w), np.float32)
    pts = np.zeros((h * w, 3), np.float32)
    cols = np.full((h * w, 3), 0.5, np.float32)
    sample_ids = jnp.array([4 * w + 4, 4 * w + 5], jnp.int32)
    out = G.edge_pair_seeds(
        sample_ids, jnp.array([True, True]), jnp.asarray(edge),
        jnp.asarray(depth), jnp.asarray(pts), jnp.asarray(cols), h, w,
    )
    pv = np.asarray(out[2])
    assert pv.sum() == 1
