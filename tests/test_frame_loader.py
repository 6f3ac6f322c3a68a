"""Native dataflow layer: PNG decode parity, prefetching frame loader,
sequence scheduler vs the Python interleave (native/dataflow.cpp)."""
import numpy as np
import pytest

from slam_eds_tpu.io import frame_loader as fl
from slam_eds_tpu.io import event_buffer as eb
from slam_eds_tpu.io.image_rw import read_png, write_png

pytestmark = pytest.mark.skipif(not fl.available(),
                                reason="native toolchain unavailable")


def _write_seq(tmp_path, n=6, shape=(24, 32)):
    rng = np.random.default_rng(11)
    paths, imgs = [], []
    for k in range(n):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        p = str(tmp_path / f"f{k:03d}.png")
        write_png(p, img)
        paths.append(p)
        imgs.append(img)
    return paths, imgs


def test_native_png_matches_reader_gray8(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    write_png(p, img)
    out = fl.read_png_native(p)
    np.testing.assert_array_equal(out, img)


def test_native_png_matches_reader_gray16_rgb8(tmp_path):
    rng = np.random.default_rng(1)
    img16 = rng.integers(0, 65536, (9, 13), dtype=np.uint16)
    p16 = str(tmp_path / "g16.png")
    write_png(p16, img16)
    out16 = fl.read_png_native(p16)
    assert out16.dtype == np.uint16
    np.testing.assert_array_equal(out16, img16)

    rgb = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    prgb = str(tmp_path / "rgb.png")
    write_png(prgb, rgb)
    np.testing.assert_array_equal(fl.read_png_native(prgb), rgb)


def test_native_png_external_encoder_filters(tmp_path):
    """Adaptive filters (Sub/Up/Average/Paeth) from a real encoder decode
    identically to the Python reader."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:60, 0:80]
    img = (xs * 1.3 + ys * 0.7 + rng.normal(0, 3, (60, 80))).astype(np.uint8)
    p = str(tmp_path / "ext.png")
    assert cv2.imwrite(p, img)
    np.testing.assert_array_equal(fl.read_png_native(p), read_png(p))


def test_native_png_bad_file(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"definitely not a png")
    assert fl.read_png_native(p) is None


def test_frame_loader_in_order(tmp_path):
    paths, imgs = _write_seq(tmp_path, n=7)
    loader = fl.FrameLoader(paths, n_threads=2, depth=3)
    for img in imgs:
        out = loader.next()
        np.testing.assert_array_equal(out, img)
    assert loader.next() is None
    assert loader.next() is None     # stays exhausted


def test_frame_loader_decode_failure_raises_then_recovers(tmp_path):
    paths, imgs = _write_seq(tmp_path, n=3)
    with open(paths[1], "wb") as f:
        f.write(b"corrupt")
    loader = fl.FrameLoader(paths, n_threads=2, depth=2)
    np.testing.assert_array_equal(loader.next(), imgs[0])
    with pytest.raises(ValueError):
        loader.next()
    np.testing.assert_array_equal(loader.next(), imgs[2])
    assert loader.next() is None


def _mk_events(t0, t1, n, seed):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.uniform(t0, t1, n))
    return (rng.uniform(0, 31, n).astype(np.float32),
            rng.uniform(0, 23, n).astype(np.float32), ts,
            np.where(rng.random(n) > 0.5, 1.0, -1.0).astype(np.float32))


def test_scheduler_interleave_matches_python_loop():
    """The native scheduler must emit the exact work-item sequence of the
    runner's Python loop: FRAME k, then packets of <=cap events with
    t < t_{k+1}, thin (<min_events) packets dropped."""
    frame_times = np.asarray([0.0, 0.1, 0.2, 0.3])
    cap, min_events = 128, 64
    xs, ys, ts, ps = _mk_events(0.0, 0.3, 700, seed=3)

    # python reference using a second ring
    ring_py = eb.EventRing(1 << 12)
    ring_py.push(xs, ys, ts, ps)
    expected = []
    for k in range(len(frame_times)):
        expected.append(("frame", k))
        if k + 1 >= len(frame_times):
            continue
        while True:
            _, _, _, _, n, _ = ring_py.pop_until(frame_times[k + 1], cap)
            if n < min_events:
                break
            expected.append(("events", n))
            if n < cap:
                break

    ring = eb.EventRing(1 << 12)
    ring.push(xs, ys, ts, ps)
    sched = fl.SequenceScheduler(ring, None, frame_times, cap, min_events)
    got = []
    while True:
        kind, payload = sched.next()
        if kind == fl.DONE:
            break
        if kind == fl.FRAME:
            got.append(("frame", payload))
        else:
            exs, eys, ets, eps, n, med = payload
            got.append(("events", n))
            assert np.all(ets[:n] < frame_times[-1])
            assert med == pytest.approx(ets[n // 2])
    assert got == expected


def test_scheduler_pumps_reader(tmp_path):
    """With a file reader attached the scheduler tops the ring up itself."""
    frame_times = np.asarray([0.0, 0.05, 0.1])
    xs, ys, ts, ps = _mk_events(0.0, 0.1, 400, seed=9)
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        f.write("# t x y p\n")
        for i in range(len(ts)):
            f.write(f"{ts[i]:.9f} {xs[i]:.2f} {ys[i]:.2f} "
                    f"{1 if ps[i] > 0 else 0}\n")
    ring = eb.EventRing(1 << 12)
    reader = eb.EventFileReader(path)
    sched = fl.SequenceScheduler(ring, reader, frame_times, cap=512,
                                 min_events=32)
    frames, n_events = [], 0
    while True:
        kind, payload = sched.next()
        if kind == fl.DONE:
            break
        if kind == fl.FRAME:
            frames.append(payload)
        else:
            n_events += payload[4]
    assert frames == [0, 1, 2]
    # every event before the last frame time must have been delivered
    assert n_events == int(np.sum(ts < frame_times[-1]))


def test_scheduler_small_ring_loses_no_events(tmp_path):
    """Ring capacity below the pump threshold (cap<<4): push-back pressure
    must carry unpushed events over to later pumps, never drop them."""
    frame_times = np.asarray([0.0, 0.03, 0.06, 0.1])
    xs, ys, ts, ps = _mk_events(0.0, 0.1, 10_000, seed=21)
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        for i in range(len(ts)):
            f.write(f"{ts[i]:.9f} {xs[i]:.2f} {ys[i]:.2f} "
                    f"{1 if ps[i] > 0 else 0}\n")
    ring = eb.EventRing(2048)          # << cap * 16
    reader = eb.EventFileReader(path)
    sched = fl.SequenceScheduler(ring, reader, frame_times, cap=512,
                                 min_events=1)
    n_events = 0
    while True:
        kind, payload = sched.next()
        if kind == fl.DONE:
            break
        if kind == fl.EVENTS:
            n_events += payload[4]
    assert ring.dropped == 0
    assert n_events == int(np.sum(ts < frame_times[-1]))
