import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops import immature as im
from slam_eds_tpu.utils import image
from slam_eds_tpu.utils.cameras import Pinhole, project, backproject
from slam_eds_tpu.utils.interp import bilinear
from slam_eds_tpu.utils.lie import SE3

H, W = 96, 128
CAM = Pinhole(jnp.float32(100.0), jnp.float32(100.0), jnp.float32(63.5),
              jnp.float32(47.5), W, H)


def textured(rng):
    ys, xs = np.mgrid[0:H, 0:W]
    img = (np.sin(xs * 0.33) * np.cos(ys * 0.29)
           + 0.6 * np.sin(xs * 0.13 + ys * 0.11)
           + 0.4 * np.cos(xs * 0.53) * np.sin(ys * 0.47))
    return jnp.asarray((img - img.min()) / (img.max() - img.min()) * 255.0,
                       jnp.float32)


def warp_image(img_ref, pose: SE3, idepth):
    ys, xs = np.mgrid[0:H, 0:W]
    uv = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    xyz = backproject(CAM, uv, jnp.full((H * W,), idepth, jnp.float32))
    uv_r = project(CAM, pose.inverse().apply(xyz))
    return np.asarray(bilinear(img_ref, uv_r[:, 0], uv_r[:, 1])).reshape(H, W)


def setup(rng, idepth_true=0.5, baseline=0.12):
    img_ref = textured(rng)
    pose = SE3.exp(jnp.asarray([baseline, 0.02, -0.01, 0.004, -0.003, 0.002],
                               jnp.float32))
    img_new = warp_image(img_ref, pose, idepth_true)
    host_pyr, _ = image.build_pyramid(img_ref, 1)
    tgt_pyr, _ = image.build_pyramid(jnp.asarray(img_new), 1)

    n = 64
    uv = jnp.asarray(np.stack([rng.uniform(20, W - 20, n),
                               rng.uniform(20, H - 20, n)], -1), jnp.float32)
    pts = im.make_immature(host_pyr[0], uv, jnp.ones(n, bool),
                           idepth_init_min=0.05, idepth_init_max=2.0)
    K = np.asarray(CAM.K)
    R, t = np.asarray(pose.R), np.asarray(pose.t)
    KRKi = jnp.asarray(K @ R @ np.linalg.inv(K), jnp.float32)
    Kt = jnp.asarray(K @ t, jnp.float32)
    return pts, tgt_pyr[0], KRKi, Kt, pose


def test_trace_narrows_interval_and_contains_truth(rng):
    pts, tgt, KRKi, Kt, _ = setup(rng)
    out = im.trace_on(pts, tgt, KRKi, Kt, jnp.asarray([1.0, 0.0]), W, H)
    st = np.asarray(out.status)
    good = st == im.IPS_GOOD
    assert good.sum() > 20, np.unique(st, return_counts=True)
    lo = np.asarray(out.idepth_min)[good]
    hi = np.asarray(out.idepth_max)[good]
    # interval tight and containing truth for most good points
    contains = (lo < 0.5) & (hi > 0.5)
    assert contains.mean() > 0.8, (lo[:5], hi[:5])
    assert np.median(hi - lo) < 0.5


def test_repeated_tracing_converges(rng):
    pts, tgt, KRKi, Kt, _ = setup(rng)
    out = pts
    for _ in range(3):
        out = im.trace_on(out, tgt, KRKi, Kt, jnp.asarray([1.0, 0.0]), W, H)
    good = np.asarray(out.status) == im.IPS_GOOD
    skipped = np.asarray(out.status) == im.IPS_SKIPPED
    assert (good | skipped).sum() > 20
    mid = 0.5 * (np.asarray(out.idepth_min) + np.asarray(out.idepth_max))
    err = np.abs(mid[good] - 0.5)
    assert np.median(err) < 0.05, np.median(err)


def test_trace_flags_oob_for_bad_interval(rng):
    pts, tgt, KRKi, Kt, _ = setup(rng)
    # idepth interval projecting far outside the image -> OOB
    pts = pts._replace(idepth_min=jnp.full_like(pts.idepth_min, 50.0),
                       idepth_max=jnp.full_like(pts.idepth_max, 60.0))
    out = im.trace_on(pts, tgt, KRKi, Kt, jnp.asarray([1.0, 0.0]), W, H)
    st = np.asarray(out.status)
    assert (st == im.IPS_OOB).mean() > 0.9


def test_trace_outlier_on_garbage_target(rng):
    pts, _, KRKi, Kt, _ = setup(rng)
    garbage = jnp.asarray(rng.normal(size=(H, W, 3)) * 200, jnp.float32)
    out = im.trace_on(pts, garbage, KRKi, Kt, jnp.asarray([1.0, 0.0]), W, H)
    st = np.asarray(out.status)
    assert (st == im.IPS_GOOD).mean() < 0.5


def test_activate_idepth_recovers_truth(rng):
    pts, tgt, KRKi, Kt, pose = setup(rng)
    out = im.trace_on(pts, tgt, KRKi, Kt, jnp.asarray([1.0, 0.0]), W, H)
    good = jnp.asarray(np.asarray(out.status) == im.IPS_GOOD)
    idp, e = im.activate_idepth(
        out, tgt[None], KRKi[None], Kt[None],
        jnp.asarray([[1.0, 0.0]]), jnp.ones(1, bool), gn_iterations=5)
    err = np.abs(np.asarray(idp)[np.asarray(good)] - 0.5)
    assert np.median(err) < 0.02, np.median(err)
