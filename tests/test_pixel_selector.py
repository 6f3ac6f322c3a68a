import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops import pixel_selector as ps
from slam_eds_tpu.utils import image


def textured_image(rng, H=96, W=128):
    """DSO-side images live on the 0-255 photometric scale (ImageAndExposure);
    the gradient-histogram thresholds assume it."""
    ys, xs = np.mgrid[0:H, 0:W]
    img = (np.sin(xs * 0.4) * np.cos(ys * 0.3)
           + 0.5 * np.sin(xs * 0.05 + ys * 0.07)
           + 0.05 * rng.normal(size=(H, W)))
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def test_block_thresholds_shape_and_positive(rng):
    img = textured_image(rng)
    _, abs_sq = image.build_pyramid(img, 3)
    th = ps.block_thresholds(abs_sq[0])
    assert th.shape == (3, 4)
    assert (np.asarray(th) > 0).all()


def test_select_statuses_and_spacing(rng):
    img = textured_image(rng)
    pyr, abs_sq = image.build_pyramid(img, 3)
    status, (n1, n2, n4) = ps.select_status_map(pyr[0], abs_sq[0], abs_sq[1],
                                                abs_sq[2], pot=3)
    status = np.asarray(status)
    assert set(np.unique(status)).issubset({0, 1, 2, 4})
    assert int(n1) > 0
    # at most one level-1 selection per pot-cell
    H, W = status.shape
    for y0 in range(0, H - 3, 3):
        for x0 in range(0, W - 3, 3):
            assert (status[y0:y0 + 3, x0:x0 + 3] == 1).sum() <= 1


def test_make_maps_density_adaptation(rng):
    img = textured_image(rng)
    pyr, abs_sq = image.build_pyramid(img, 3)
    target = 300.0
    status, n_sel, _ = ps.make_maps(pyr[0], abs_sq, density=target)
    # within a factor ~2 of the target after adaptation+subsample
    assert 0.3 * target < n_sel < 2.5 * target


def test_status_to_points_capacity(rng):
    img = textured_image(rng)
    pyr, abs_sq = image.build_pyramid(img, 3)
    status, _, _ = ps.make_maps(pyr[0], abs_sq, density=200.0)
    score = abs_sq[0]
    uv, st, mask = ps.status_to_points(jnp.asarray(status), score, 256)
    assert uv.shape == (256, 2)
    n_sel = int((np.asarray(status) > 0).sum())
    assert int(mask.sum()) == min(n_sel, 256)
    # all masked points are actually selected pixels
    uvn = np.asarray(uv)[np.asarray(mask)]
    stn = np.asarray(status)
    for x, y in uvn[:20]:
        assert stn[int(y), int(x)] > 0


def test_candidate_points_grid_max(rng):
    g = jnp.asarray(rng.uniform(size=(64, 64)), jnp.float32)
    uv, mask = ps.candidate_points_grid(g, patch=8, capacity=128)
    assert int(mask.sum()) == 64  # one per 8x8 cell
    uvn = np.asarray(uv)[np.asarray(mask)]
    gn = np.asarray(g)
    for x, y in uvn[:10]:
        cy, cx = int(y) // 8 * 8, int(x) // 8 * 8
        assert gn[int(y), int(x)] == gn[cy:cy + 8, cx:cx + 8].max()


def test_candidate_points_grid_median(rng):
    g = jnp.asarray(rng.uniform(size=(32, 32)), jnp.float32)
    uv, mask = ps.candidate_points_grid(g, patch=8, capacity=1024, mode="median")
    # roughly half the pixels are above their cell median
    frac = int(mask.sum()) / 1024.0
    assert 0.3 < frac < 0.6
