import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.ops import image as I


def _box_img(h=32, w=32):
    img = np.zeros((h, w), np.float32)
    img[8:24, 8:24] = 200.0
    return img


def test_canny_finds_box_edges():
    edges = np.asarray(I.canny(jnp.asarray(_box_img()), 50.0, 150.0))
    assert edges.sum() > 20
    # Edges concentrated near the box boundary ring.
    ys, xs = np.nonzero(edges)
    assert np.all((ys >= 5) & (ys <= 26) & (xs >= 5) & (xs <= 26))
    # Interior of the box is edge-free.
    assert edges[12:20, 12:20].sum() == 0


def test_canny_blank_image():
    edges = np.asarray(I.canny(jnp.zeros((16, 16)), 50.0, 150.0))
    assert edges.sum() == 0


def test_distance_transform_exact():
    edges = np.zeros((20, 20), bool)
    edges[10, 10] = True
    dt = np.asarray(I.distance_transform_l2(jnp.asarray(edges), window=8))
    assert dt[10, 10] == 0.0
    assert abs(dt[10, 13] - 3.0) < 1e-5
    assert abs(dt[13, 14] - 5.0) < 1e-5  # 3-4-5 triangle
    assert dt[0, 0] == 8.0  # clamped at window


def test_dt_gradients_point_away():
    edges = np.zeros((20, 20), bool)
    edges[10, 10] = True
    gx, gy, dt = I.dt_with_gradients(jnp.asarray(edges), window=8)
    # Right of the edge: distance grows with +x.
    assert float(gx[10, 13]) > 0.4
    assert float(gx[10, 7]) < -0.4
    assert float(gy[13, 10]) > 0.4


def test_pyr_down_shapes():
    g = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (32, 48)).astype(np.float32))
    d = I.pyr_down(g)
    assert d.shape == (16, 24)


def test_depth_pyr_down_hole_aware():
    d = np.zeros((4, 4), np.float32)
    d[0, 0] = 2.0  # one valid value in the top-left 2x2 block
    d[2:4, 2:4] = 3.0
    out = np.asarray(I.depth_pyr_down(jnp.asarray(d)))
    assert out.shape == (2, 2)
    assert out[0, 0] == 2.0  # mean of valid only, not 0.5
    assert out[1, 1] == 3.0
    assert out[0, 1] == 0.0  # all-hole block stays hole


def test_bilinear_sample():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    val, ok = I.bilinear_sample(img, jnp.asarray([[1.5, 1.5], [0.0, 0.0], [10.0, 0.0]]))
    assert abs(float(val[0]) - 7.5) < 1e-5
    assert float(val[1]) == 0.0
    assert bool(ok[0]) and bool(ok[1]) and not bool(ok[2])


def test_dilate():
    m = np.zeros((8, 8), bool)
    m[4, 4] = True
    out = np.asarray(I.dilate(jnp.asarray(m), 3))
    assert out.sum() == 9
