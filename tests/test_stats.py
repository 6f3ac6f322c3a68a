import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.utils import stats


def test_masked_mean_std(rng):
    x = rng.normal(size=256).astype(np.float32)
    mask = rng.uniform(size=256) < 0.6
    mu, sd = stats.masked_mean_std(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(mu, x[mask].mean(), atol=1e-5)
    np.testing.assert_allclose(sd, x[mask].std(), atol=1e-5)


def test_masked_median(rng):
    x = rng.normal(size=101).astype(np.float32)
    mask = rng.uniform(size=101) < 0.7
    med = stats.masked_median(jnp.asarray(x), jnp.asarray(mask))
    valid = np.sort(x[mask])
    np.testing.assert_allclose(med, valid[len(valid) // 2], atol=1e-6)


def test_masked_mad_known():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0, 100.0], jnp.float32)
    mask = jnp.ones(5, bool)
    mad, med = stats.masked_mad(x, mask)
    assert float(med) == 3.0
    np.testing.assert_allclose(mad, 1.4826 * 1.0, atol=1e-5)


def test_huber_weight_energy():
    k = 2.0
    r = jnp.asarray([0.5, -4.0], jnp.float32)
    w = stats.huber_weight(r, k)
    np.testing.assert_allclose(w, [1.0, 0.5], atol=1e-6)
    e = stats.huber_energy(r, k)
    # DSO form: hw*r^2*(2-hw): inlier -> r^2; outlier -> 2k|r| - k^2
    np.testing.assert_allclose(e, [0.25, 2 * 2 * 4 - 4], atol=1e-5)


def test_all_invalid_mask_is_safe():
    x = jnp.asarray([5.0, 6.0], jnp.float32)
    mask = jnp.zeros(2, bool)
    mu, sd = stats.masked_mean_std(x, mask)
    assert np.isfinite(float(mu)) and np.isfinite(float(sd))
    assert np.isfinite(float(stats.masked_median(x, mask)))
