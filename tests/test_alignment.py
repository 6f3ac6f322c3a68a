import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.utils import alignment, lie
from slam_eds_tpu.utils.lie import SE3


def test_umeyama_recovers_transform(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
    s, t = 1.7, np.array([0.5, -1.0, 2.0], np.float32)
    dst = s * src @ R.T + t
    s2, R2, t2 = alignment.umeyama(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(s2, s, rtol=1e-3)
    np.testing.assert_allclose(R2, R, atol=1e-2)
    np.testing.assert_allclose(t2, t, atol=1e-2)


def test_ate_zero_after_alignment(rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
    est = 2.0 * xyz @ R.T + np.array([1.0, 2.0, 3.0], np.float32)
    err = alignment.ate_rmse(jnp.asarray(est), jnp.asarray(xyz))
    assert float(err) < 1e-3


def test_rpe_identity(rng):
    n = 20
    taus = jnp.asarray(rng.normal(size=(n, 6)) * 0.1, jnp.float32)
    import jax
    poses = jax.vmap(SE3.exp)(taus)
    t_err, r_err = alignment.rpe(poses, poses, delta=2)
    assert float(t_err) < 1e-6 and float(r_err) < 1e-3
