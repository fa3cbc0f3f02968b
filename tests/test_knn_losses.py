import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.ops import knn, losses


def test_mean_sq_dist_knn(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    mask = np.ones(50, bool)
    mask[45:] = False
    out = np.asarray(knn.mean_sq_dist_knn(jnp.asarray(pts), jnp.asarray(mask), k=3, chunk=16))
    # Brute-force reference over valid points.
    valid = pts[:45]
    d2 = ((valid[:, None] - valid[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out[:45], ref, rtol=1e-3)


def test_radius_dedup():
    existing = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    ex_mask = jnp.array([True])
    new = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 0.05],   # too close to existing -> drop
                [1.0, 0.0, 0.0],    # keep
                [1.0, 0.0, 0.05],   # too close to kept candidate above -> drop
                [2.0, 0.0, 0.0],    # keep
            ],
            np.float32,
        )
    )
    keep = np.asarray(
        knn.radius_dedup(new, jnp.ones(4, bool), existing, ex_mask, 0.1, chunk=4)
    )
    assert keep.tolist() == [False, True, False, True]


def test_statistical_inlier(rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32) * 0.1
    pts[0] = [10, 10, 10]  # gross outlier
    mask = np.ones(40, bool)
    inl = np.asarray(
        knn.statistical_inlier_mask(jnp.asarray(pts), jnp.asarray(mask), nb=5, chunk=8)
    )
    assert not inl[0]
    assert inl[1:].sum() >= 35


def test_overlap_ratio():
    a = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (30, 3)).astype(np.float32))
    r = knn.overlap_ratio(a, jnp.ones(30, bool), a, jnp.ones(30, bool), 0.01, chunk=8)
    assert float(r) == 1.0
    b = a + 100.0
    r2 = knn.overlap_ratio(a, jnp.ones(30, bool), b, jnp.ones(30, bool), 0.01, chunk=8)
    assert float(r2) == 0.0


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (24, 24, 3)).astype(np.float32))
    assert float(losses.ssim(img, img)) > 0.999
    noisy = img + 0.3 * jnp.asarray(rng.normal(size=(24, 24, 3)).astype(np.float32))
    assert float(losses.ssim(img, noisy)) < 0.9


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(losses.psnr(a, b)) - 20.0) < 1e-3


def test_isotropic_loss():
    ls = jnp.log(jnp.array([[0.1, 0.1, 0.1], [0.1, 0.2, 0.4]]))
    alive = jnp.array([True, False])
    assert float(losses.isotropic_loss(ls, alive)) < 1e-6
    alive2 = jnp.array([True, True])
    assert float(losses.isotropic_loss(ls, alive2)) > 0.01


def test_masked_l1():
    pred = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    gt = jnp.zeros((2, 2))
    mask = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    assert abs(float(losses.masked_l1(pred, gt, mask)) - 2.5) < 1e-6
