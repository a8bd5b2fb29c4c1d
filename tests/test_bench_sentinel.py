"""Host-health sentinel unit contract (bench.py:_host_health): the
stamp carries every probe, the floors are applied, and a floor no real
machine can meet forces a degraded verdict naming the failed probe —
so a driver bench artifact can never again silently record a sick (or
silently trust a checked-out) host.

Probe sizes are shrunk (8 MiB hash / 16 MiB write vs the calibrated
256 MiB production defaults): the floor/shape logic is what this test
asserts, not the host's actual bandwidth (round-5 ADVICE — the
full-size probes cost ~16 GB of hashing + ~1.7 GB of fsync'd writes
per invocation on shared CI hosts).
"""

import sys

sys.path.insert(0, "/root/repo")

SMALL = {"hash_mib": 8, "write_mib": 16}


def test_host_health_stamp_shape_and_floor_logic(monkeypatch):
    import bench

    h = bench._host_health(**SMALL)
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
    h2 = bench._host_health(**SMALL)
    assert h2["status"] == "degraded"
    assert "cpu_1way_mbps" in h2["failed_checks"]


def test_floors_scale_with_core_count(monkeypatch):
    """The parallel-scale floor must be reachable on small hosts: a
    fixed 8.0 floor would label every <16-core machine permanently
    degraded (round-5 ADVICE)."""
    import bench

    monkeypatch.setattr(bench.os, "cpu_count", lambda: 4)
    floors = bench._health_floors()
    assert floors["cpu_parallel_scale"] <= 2.0

    monkeypatch.setattr(bench.os, "cpu_count", lambda: 64)
    floors = bench._health_floors()
    assert floors["cpu_parallel_scale"] == 8.0  # capped at calibration

    monkeypatch.setenv("CM_HEALTH_FLOOR_FSYNC_MBPS", "42.5")
    floors = bench._health_floors()
    assert floors["fsync_mbps"] == 42.5
