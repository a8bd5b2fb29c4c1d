"""Host-health sentinel unit contract (bench.py:_host_health): the
stamp carries every probe, the floors are applied, and a floor no real
machine can meet forces a degraded verdict naming the failed probe —
so a driver bench artifact can never again silently record a sick (or
silently trust a checked-out) host."""

import sys

sys.path.insert(0, "/root/repo")


def test_host_health_stamp_shape_and_floor_logic(monkeypatch):
    import bench

    h = bench._host_health()
    assert h["status"] in ("ok", "degraded")
    for key in ("cpu_1way_mbps", "cpu_parallel_scale", "fsync_mbps",
                "load1", "failed_checks", "floors"):
        assert key in h
    # every failed check names a measured probe below its floor
    for k in h["failed_checks"]:
        if k != "load1":
            assert h[k] < bench.HEALTH_FLOORS[k]

    # an unmeetable floor must force degraded and name the probe
    monkeypatch.setitem(bench.HEALTH_FLOORS, "cpu_1way_mbps", 1e12)
    h2 = bench._host_health()
    assert h2["status"] == "degraded"
    assert "cpu_1way_mbps" in h2["failed_checks"]
