"""Tests for the native event ring buffer and its pure-python fallback."""
import numpy as np
import pytest

from slam_eds_tpu.io import event_buffer as eb


def _make(kind, capacity=1024):
    if kind == "native":
        if not eb.available():
            pytest.skip("native toolchain unavailable")
        return eb.EventRing(capacity)
    return eb.PurePythonRing(capacity)


@pytest.fixture(params=["native", "python"])
def ring(request):
    return _make(request.param)


def _push_n(ring, n, t0=0.0):
    rng = np.random.default_rng(42)
    xs = rng.uniform(0, 640, n).astype(np.float32)
    ys = rng.uniform(0, 480, n).astype(np.float32)
    ts = t0 + np.sort(rng.uniform(0, 1.0, n))
    ps = np.where(rng.random(n) > 0.5, 1.0, -1.0).astype(np.float32)
    assert ring.push(xs, ys, ts, ps) == n
    return xs, ys, ts, ps


def test_push_pop_roundtrip(ring):
    xs, ys, ts, ps = _push_n(ring, 100)
    assert len(ring) == 100
    ox, oy, ot, op, n, med = ring.pop_packet(60, 64)
    assert n == 60
    np.testing.assert_array_equal(ox[:60], xs[:60])
    np.testing.assert_array_equal(op[:60], ps[:60])
    assert med == ot[30]
    # padding repeats last event with zero polarity
    assert (op[60:] == 0).all()
    assert (ox[60:] == xs[59]).all()
    assert len(ring) == 40


def test_pop_until_time_slice(ring):
    n = 200
    xs = np.zeros(n, np.float32)
    ys = np.zeros(n, np.float32)
    ts = np.linspace(0.0, 1.99, n)
    ps = np.ones(n, np.float32)
    ring.push(xs, ys, ts, ps)
    _, _, ot, _, k, _ = ring.pop_until(1.0, 256)
    assert k == int(np.sum(ts < 1.0))
    assert (ot[:k] < 1.0).all()
    # remaining events still queued
    assert len(ring) == n - k


def test_nonmonotonic_repair(ring):
    ts = np.array([0.0, 0.5, 0.3, 0.6])
    ring.push(np.zeros(4, np.float32), np.zeros(4, np.float32), ts,
              np.ones(4, np.float32))
    assert ring.nonmonotonic == 1
    _, _, ot, _, n, _ = ring.pop_packet(4, 4)
    assert n == 4
    assert (np.diff(ot[:4]) >= 0).all()     # repaired to monotonic


def test_overflow_drops(ring):
    small = _make("native" if isinstance(ring, eb.EventRing) else "python",
                  capacity=64)
    _push_n_accepted = small.push(np.zeros(100, np.float32),
                                  np.zeros(100, np.float32),
                                  np.linspace(0, 1, 100),
                                  np.ones(100, np.float32))
    assert _push_n_accepted == 64
    assert small.dropped == 36
    assert len(small) == 64


def test_packet_feeds_raster_kernel(ring):
    """End-to-end: packetize then rasterize (the padded tail must be
    zero-weight)."""
    import jax.numpy as jnp
    from slam_eds_tpu.utils.events import build_event_frame

    _push_n(ring, 500)
    xs, ys, ts, ps, n, med = ring.pop_packet(500, 512)
    frames, norms = build_event_frame(jnp.asarray(xs), jnp.asarray(ys),
                                      jnp.asarray(ps), jnp.asarray(n),
                                      height=480, width=640)
    assert np.isfinite(np.asarray(frames)).all()
    assert float(norms[0]) > 0


def test_event_file_reader_and_undistort(tmp_path):
    from slam_eds_tpu.io import event_buffer as eb
    if not eb.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    p = tmp_path / "events.txt"
    with open(p, "w") as f:
        f.write("# t x y p\n")
        for i in range(1000):
            f.write(f"{i*1e-4:.6f} {i % 32} {(i * 7) % 24} {i % 2}\n")
        f.write("\n bad line\n")
    rd = eb.EventFileReader(str(p))
    xs, ys, ts, ps = rd.read(600)
    assert len(xs) == 600
    assert ps[0] == -1.0 and ps[1] == 1.0            # 0 -> -1, 1 -> +1
    np.testing.assert_allclose(ts[:3], [0.0, 1e-4, 2e-4], atol=1e-9)
    ring = eb.EventRing(1 << 12)
    total = rd.pump(ring)
    assert total == 400 and len(ring) == 400

    # undistortion maps: shift everything by (+2, +1)
    W, H = 32, 24
    mx, my = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    eb.apply_undistort(xs, ys, (mx + 2).astype(np.float32),
                       (my + 1).astype(np.float32), W, H)
    assert xs[0] == 2.0 and ys[0] == 1.0


def test_ring_free_space_tracks_occupancy():
    import numpy as np
    from slam_eds_tpu.io import event_buffer as eb
    if not eb.available():
        return
    ring = eb.EventRing(256)
    assert ring.free_space == 256
    n = 100
    ring.push(np.zeros(n, np.float32), np.zeros(n, np.float32),
              np.arange(n, dtype=np.float64), np.ones(n, np.float32))
    assert ring.free_space == 256 - n
    ring.pop_packet(40, 64)
    assert ring.free_space == 256 - n + 40
