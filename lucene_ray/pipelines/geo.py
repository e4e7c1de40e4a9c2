"""Geo queries over (lat, lon) columns — the LatLonPoint role
(document/LatLonPoint.java:67-68: newBoxQuery / newDistanceQuery,
sandbox LatLonPointPrototypeQueries.nearest) re-expressed Ray-Data-first.

The reference indexes points into a BKD tree and walks cells; the
columnar analog is parquet row-group pruning: ``geo_box`` over a path
pushes the box predicate into ``read_parquet`` (only row groups whose
lat/lon min/max stats intersect the box are read), and ``geo_distance``
derives the circle's bounding box first (the BKD coarse phase), reads
only that, then refines with the exact haversine — the same
box-then-refine shape as LatLonPointDistanceQuery. Everything per batch
is numpy; no per-row Python.

Distance math follows the published haversine formula with the mean
earth radius the reference uses (util/SloppyMath.java:209
``TO_METERS = 6_371_008.7714``); we use true trig where the reference
substitutes table-driven approximations (documented deviation — error
there is <= 40 cm, ours is ulp-level).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

EARTH_MEAN_RADIUS_M = 6_371_008.7714  # SloppyMath.java:209


def haversine_meters(lat1, lon1, lat2: float, lon2: float) -> np.ndarray:
    """Vectorized great-circle distance (SloppyMath.haversinMeters
    contract, exact trig): arrays ``lat1``/``lon1`` against one point."""
    x1 = np.radians(np.asarray(lat1, dtype=np.float64))
    x2 = np.radians(lat2)
    h1 = 1.0 - np.cos(x1 - x2)
    h2 = 1.0 - np.cos(np.radians(np.asarray(lon1, dtype=np.float64) - lon2))
    h = h1 + np.cos(x1) * np.cos(x2) * h2
    return EARTH_MEAN_RADIUS_M * 2.0 * np.arcsin(
        np.minimum(1.0, np.sqrt(h * 0.5))
    )


def circle_bounding_box(lat: float, lon: float, radius_m: float):
    """(min_lat, max_lat, min_lon, max_lon) of the spherical cap around
    (lat, lon) — the coarse box LatLonPointDistanceQuery prunes with
    (geo/Rectangle.java fromPointDistance). ``min_lon > max_lon`` means
    the box crosses the antimeridian; a cap touching a pole spans every
    longitude."""
    ang = radius_m / EARTH_MEAN_RADIUS_M  # angular radius
    lat_r = np.radians(lat)
    min_lat = np.degrees(lat_r - ang)
    max_lat = np.degrees(lat_r + ang)
    if min_lat <= -90.0 or max_lat >= 90.0 or ang >= np.pi:
        return max(min_lat, -90.0), min(max_lat, 90.0), -180.0, 180.0
    # standard cap-box longitude half-width: asin(sin(ang)/cos(lat))
    dlon = np.degrees(np.arcsin(min(1.0, np.sin(ang) / np.cos(lat_r))))
    min_lon, max_lon = lon - dlon, lon + dlon
    if min_lon < -180.0:
        min_lon += 360.0
    if max_lon > 180.0:
        max_lon -= 360.0
    return float(min_lat), float(max_lat), float(min_lon), float(max_lon)


def _box_filter_expr(min_lat, max_lat, min_lon, max_lon, lat_col, lon_col):
    import pyarrow.dataset as pads

    lat = pads.field(lat_col)
    lon = pads.field(lon_col)
    e = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        return e & (lon >= min_lon) & (lon <= max_lon)
    # antimeridian crossing: two disjoint lon ranges
    return e & ((lon >= min_lon) | (lon <= max_lon))


def _as_dataset(source, columns, flt):
    """Dataset from a path (with predicate/column pushdown — the BKD
    cell-prune analog) or pass a live Dataset through with a batch-level
    filter."""
    if isinstance(source, str):
        return ray.data.read_parquet(source, columns=columns, filter=flt)
    ds = source

    def apply(b: pa.Table) -> pa.Table:
        return b.filter(flt)

    return ds.map_batches(apply, batch_format="pyarrow")


def geo_box(source, min_lat: float, max_lat: float,
            min_lon: float, max_lon: float,
            lat_col: str = "lat", lon_col: str = "lon",
            columns: "list[str] | None" = None) -> ray.data.Dataset:
    """LatLonPoint.newBoxQuery (LatLonPoint.java:220): rows whose point
    falls in [min_lat, max_lat] x [min_lon, max_lon]; ``min_lon >
    max_lon`` selects across the antimeridian (the reference's box query
    accepts the same crossing encoding)."""
    flt = _box_filter_expr(min_lat, max_lat, min_lon, max_lon,
                           lat_col, lon_col)
    return _as_dataset(source, columns, flt)


def geo_distance(source, lat: float, lon: float, radius_m: float,
                 lat_col: str = "lat", lon_col: str = "lon",
                 columns: "list[str] | None" = None) -> ray.data.Dataset:
    """LatLonPoint.newDistanceQuery: rows within ``radius_m`` meters of
    (lat, lon). Two phases, like LatLonPointDistanceQuery: the circle's
    bounding box prunes at the read, the exact haversine refines per
    batch."""
    box = circle_bounding_box(lat, lon, radius_m)
    ds = geo_box(source, *box, lat_col=lat_col, lon_col=lon_col,
                 columns=columns)

    def refine(b: pa.Table) -> pa.Table:
        d = haversine_meters(
            b[lat_col].to_numpy(zero_copy_only=False),
            b[lon_col].to_numpy(zero_copy_only=False), lat, lon,
        )
        return b.filter(pa.array(d <= radius_m))

    return ds.map_batches(refine, batch_format="pyarrow")


def point_in_polygon(lat, lon, poly_lats, poly_lons) -> np.ndarray:
    """Vectorized even-odd crossing test (the PNPOLY algorithm Lucene's
    geo/GeoUtils cites; the reference evaluates it through the Polygon2D
    component tree, geo/Polygon2D — same predicate, tree-free here): one
    boolean per input point. The loop is over polygon EDGES (a handful);
    every point is tested in one numpy expression per edge, so the hot
    axis stays vectorized."""
    y = np.asarray(lat, dtype=np.float64)
    x = np.asarray(lon, dtype=np.float64)
    py = np.asarray(poly_lats, dtype=np.float64)
    px = np.asarray(poly_lons, dtype=np.float64)
    if py[0] == py[-1] and px[0] == px[-1]:  # accept closed rings too
        py, px = py[:-1], px[:-1]
    inside = np.zeros(y.shape, dtype=bool)
    n = py.shape[0]
    for j in range(n):
        y1, x1 = py[j], px[j]
        y2, x2 = py[(j + 1) % n], px[(j + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses the horizontal ray
        crosses = (y1 > y) != (y2 > y)
        # lon of the edge at the point's lat; guarded by `crosses`
        xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= crosses & (x < xint)
    return inside


def polygon_bounding_box(poly_lats, poly_lons):
    """(min_lat, max_lat, min_lon, max_lon) of the ring — the coarse
    phase LatLonPointInPolygonQuery prunes BKD cells with (the columnar
    analog prunes parquet row groups)."""
    py = np.asarray(poly_lats, dtype=np.float64)
    px = np.asarray(poly_lons, dtype=np.float64)
    return float(py.min()), float(py.max()), float(px.min()), float(px.max())


def geo_polygon(source, poly_lats, poly_lons,
                holes: "list[tuple]" = (),
                lat_col: str = "lat", lon_col: str = "lon",
                columns: "list[str] | None" = None) -> ray.data.Dataset:
    """LatLonPoint.newPolygonQuery (LatLonPoint.java:239,
    LatLonPointInPolygonQuery): rows whose point falls inside the
    polygon ring and outside every hole (geo/Polygon.java's
    shell-plus-holes model). Bounding-box prune at the read, exact
    even-odd refine per batch — the box-then-refine shape of the BKD
    walk. ``holes`` is a list of (hole_lats, hole_lons) rings."""
    box = polygon_bounding_box(poly_lats, poly_lons)
    ds = geo_box(source, *box, lat_col=lat_col, lon_col=lon_col,
                 columns=columns)

    def refine(b: pa.Table) -> pa.Table:
        y = b[lat_col].to_numpy(zero_copy_only=False)
        x = b[lon_col].to_numpy(zero_copy_only=False)
        mask = point_in_polygon(y, x, poly_lats, poly_lons)
        for hy, hx in holes:
            mask &= ~point_in_polygon(y, x, hy, hx)
        return b.filter(pa.array(mask))

    return ds.map_batches(refine, batch_format="pyarrow")


def distance_feature(source, lat: float, lon: float, pivot_m: float,
                     k: int = 10, boost: float = 1.0,
                     lat_col: str = "lat", lon_col: str = "lon",
                     id_col: str = "doc_id",
                     columns: "list[str] | None" = None) -> pa.Table:
    """LatLonPoint.newDistanceFeatureQuery (LatLonPoint.java:260,
    LatLonPointDistanceFeatureQuery): top-k rows by the distance-decay
    score ``boost * pivot_m / (pivot_m + haversine(origin, point))`` —
    the "boost by proximity" ranking signal. Same partial-top-k shape as
    :func:`geo_nearest` (score is a monotone decreasing function of
    distance, so nearest-k == highest-k); returns
    (rank, id, score) with ties broken on ``id_col`` ascending."""
    near = geo_nearest(source, lat, lon, k=k, lat_col=lat_col,
                       lon_col=lon_col, id_col=id_col, columns=columns)
    d = near["distance_m"].to_numpy()
    return pa.table({
        "rank": near["rank"],
        id_col: near[id_col],
        "score": pa.array(boost * (pivot_m / (pivot_m + d)), pa.float64()),
    })


def geo_nearest(source, lat: float, lon: float, k: int = 10,
                lat_col: str = "lat", lon_col: str = "lon",
                id_col: str = "doc_id",
                columns: "list[str] | None" = None) -> pa.Table:
    """k nearest points to (lat, lon) with their distances — the sandbox
    LatLonPointPrototypeQueries.nearest role. Per-batch partial top-k
    (k rows leave each batch), one tiny driver merge; ties break on
    ``id_col`` ascending. Returns (rank, id, lat, lon, distance_m)."""
    cols = columns or [id_col, lat_col, lon_col]
    ds = _as_dataset(source, cols, None) if isinstance(source, str) else source

    def partial(b: pa.Table) -> pa.Table:
        d = haversine_meters(
            b[lat_col].to_numpy(zero_copy_only=False),
            b[lon_col].to_numpy(zero_copy_only=False), lat, lon,
        )
        kk = min(k, b.num_rows)
        if b.num_rows > kk:
            idx = np.argpartition(d, kk - 1)[:kk]
        else:
            idx = np.arange(b.num_rows)
        out = b.take(pa.array(idx)).append_column(
            "distance_m", pa.array(d[idx], pa.float64())
        )
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            lat_col: pa.array([], pa.float64()),
            lon_col: pa.array([], pa.float64()),
            "distance_m": pa.array([], pa.float64()),
        })
    tbl = pa.Table.from_pylist(parts)
    d = tbl["distance_m"].to_numpy()
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, d))[:k]
    out = tbl.take(pa.array(order))
    return out.add_column(0, "rank", pa.array(
        np.arange(1, out.num_rows + 1, dtype=np.int64)))


def geo_heatmap(ds, min_lat: float, max_lat: float, min_lon: float,
                max_lon: float, grid_lat: int = 10, grid_lon: int = 10,
                lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """HeatmapFacetCounter role (spatial-extras/src/java/org/apache/
    lucene/spatial/prefix/HeatmapFacetCounter.java:63): per-grid-cell
    counts of points inside [min_lat, max_lat) x [min_lon, max_lon).

    Scale story: per-batch numpy bincount partials (at most
    grid_lat*grid_lon rows each) -> ONE tiny groupby over cell ids —
    the heatmap never exceeds the grid size no matter the corpus.
    Returns (cell_lat, cell_lon, n) for non-empty cells."""
    ch = (max_lat - min_lat) / grid_lat
    cw = (max_lon - min_lon) / grid_lon
    ncells = grid_lat * grid_lon

    def partial(b: pa.Table) -> pa.Table:
        lat = b[lat_col].to_numpy(zero_copy_only=False)
        lon = b[lon_col].to_numpy(zero_copy_only=False)
        m = ((lat >= min_lat) & (lat < max_lat)
             & (lon >= min_lon) & (lon < max_lon))
        ci = np.floor((lat[m] - min_lat) / ch).astype(np.int64)
        cj = np.floor((lon[m] - min_lon) / cw).astype(np.int64)
        cnt = np.bincount(ci * grid_lon + cj, minlength=ncells)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": nz.astype(np.int64),
                         "n_part": cnt[nz].astype(np.int64)})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cell").sum("n_part").take_all())
    rows.sort(key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    n = np.array([r["sum(n_part)"] for r in rows], dtype=np.int64)
    return pa.table({
        "cell_lat": cells // grid_lon,
        "cell_lon": cells % grid_lon,
        "n": n,
    })


def path_segment_constants(path_lats, path_lons) -> list:
    """Per-segment spherical constants for the path-corridor query —
    shared verbatim by the engine and the SQL twin so both sides
    evaluate IDENTICAL float64 expression trees (the house geo-parity
    contract). Each segment (a, b) of the polyline yields the unit
    endpoints, the normalized great-circle normal n = a x b / |a x b|,
    and the in-arc test vectors n x a and b x n."""
    out = []
    la = np.radians(np.asarray(path_lats, dtype=np.float64))
    lo = np.radians(np.asarray(path_lons, dtype=np.float64))
    v = np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                  np.sin(la)], axis=-1)
    for i in range(v.shape[0] - 1):
        a, b = v[i], v[i + 1]
        n = np.cross(a, b)
        n = n / np.linalg.norm(n)
        out.append({
            "a": a.tolist(), "b": b.tolist(), "n": n.tolist(),
            "na": np.cross(n, a).tolist(),   # >=0 -> past a, towards b
            "bn": np.cross(b, n).tolist(),   # >=0 -> before b
        })
    return out


def geo_path_distance(ds, path_lats, path_lons, radius_m: float,
                      lat_col: str = "lat", lon_col: str = "lon",
                      id_col: str = "doc_id"):
    """Path-corridor query — the LatLonShape LINE distance role
    (document/LatLonShape.java newDistanceQuery over Line geometries;
    spatial3d GeoPath, spatial3d/geom/GeoStandardPath.java:42): docs
    whose point lies within ``radius_m`` of the polyline, by exact
    spherical cross-track distance clamped to each arc (outside the
    arc, distance to the nearer endpoint). Explicit component
    arithmetic (no BLAS) so the SQL twin's expression tree matches
    term for term."""
    R = 6371008.7714
    segs = path_segment_constants(path_lats, path_lons)
    thresh = radius_m / R

    def part(b: pa.Table) -> pa.Table:
        la = np.radians(b[lat_col].to_numpy(zero_copy_only=False)
                        .astype(np.float64))
        lo = np.radians(b[lon_col].to_numpy(zero_copy_only=False)
                        .astype(np.float64))
        cl = np.cos(la)
        px, py, pz = cl * np.cos(lo), cl * np.sin(lo), np.sin(la)
        best = np.full(px.shape[0], np.inf)
        for s in segs:
            (ax, ay, az), (bx, by, bz) = s["a"], s["b"]
            (nx, ny, nz) = s["n"]
            (cax, cay, caz), (cbx, cby, cbz) = s["na"], s["bn"]
            sinxt = px * nx + py * ny + pz * nz
            xt = np.abs(np.arcsin(np.minimum(1.0, np.maximum(-1.0, sinxt))))
            in_arc = ((px * cax + py * cay + pz * caz >= 0)
                      & (px * cbx + py * cby + pz * cbz >= 0))
            da = np.arccos(np.minimum(1.0, np.maximum(
                -1.0, px * ax + py * ay + pz * az)))
            db = np.arccos(np.minimum(1.0, np.maximum(
                -1.0, px * bx + py * by + pz * bz)))
            best = np.minimum(best, np.where(in_arc, xt, np.minimum(da, db)))
        keep = best <= thresh
        return pa.table({id_col: pa.array(
            b[id_col].to_numpy(zero_copy_only=False)[keep])})

    return ds.map_batches(part, batch_format="pyarrow")


def path_distance_sql(path_lats, path_lons, radius_m: float,
                      lat_col: str = "lat", lon_col: str = "lon") -> str:
    """The corridor predicate as a DuckDB boolean expression over
    (lat, lon) columns — generated from the SAME path_segment_constants
    the engine uses, term-for-term identical float64 math."""
    R = 6371008.7714
    segs = path_segment_constants(path_lats, path_lons)
    thresh = repr(radius_m / R)
    p = (f"cos(radians({lat_col})) * cos(radians({lon_col}))",
         f"cos(radians({lat_col})) * sin(radians({lon_col}))",
         f"sin(radians({lat_col}))")
    terms = []
    for s in segs:
        dot = lambda v: (f"({p[0]} * ({v[0]!r}) + {p[1]} * ({v[1]!r})"
                         f" + {p[2]} * ({v[2]!r}))")
        xt = (f"abs(asin(least(1.0, greatest(-1.0, {dot(s['n'])}))))")
        in_arc = (f"({dot(s['na'])} >= 0 AND {dot(s['bn'])} >= 0)")
        da = f"acos(least(1.0, greatest(-1.0, {dot(s['a'])})))"
        db = f"acos(least(1.0, greatest(-1.0, {dot(s['b'])})))"
        terms.append(f"CASE WHEN {in_arc} THEN {xt}"
                     f" ELSE least({da}, {db}) END")
    return f"least({', '.join(terms)}) <= {thresh}"
