"""Pure-numpy WKT geometry kernels (no shapely / no JVM geo lib).

Implements exactly the geometry scalar surface the reference uses
(SURVEY.md §2.11 — ST_AsText / ST_X / ST_Y / ST_Centroid / ST_NPoints /
ST_Translate / ST_Scale / ST_Rotate / ST_Distance / ST_Intersects /
GeometryType plus the two schema.sql UDFs GeomResize / GeomRotate,
reference: fagi-gis schema.sql:97-104). Geometries are carried as WKT
strings (SRID 4326 implied, like dataset_{a,b}_geometries in
schema.sql:32-39); parsing happens once per Arrow batch inside pandas
UDFs — never per-row Python UDFs on the Spark hot path.

Designed for use inside ``mapInPandas`` / ``applyInPandas`` kernels:
every function here is driver-free, numpy-based, deterministic.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

# Geometry-type precedence: most complex type wins when deduping one
# geometry per subject (reference Constants.java:85-95, dedup loops at
# Importer.java:306-314).  Lower rank = higher precedence.
KIND_RANK = {
    "MULTIPOLYGON": 0,
    "POLYGON": 1,
    "MULTILINESTRING": 2,
    "LINESTRING": 3,
    "MULTIPOINT": 4,
    "POINT": 5,
}
NONE_RANK = 6

# meters per degree used by the reference for all meter<->degree
# conversions (Constants.java:79-80; FindLinkServlet.java:197,396).
METERS_PER_DEGREE = 111195.0

_TOKEN = re.compile(r"\(|\)|,|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|[A-Za-z]+")


@dataclass
class Geometry:
    """Parsed geometry.

    ``parts`` nesting by kind:
      POINT / MULTIPOINT / LINESTRING -> [coords (N,2)]
      MULTILINESTRING                 -> [line (N,2), ...]
      POLYGON                         -> [ring (N,2), ...] (ring 0 = exterior)
      MULTIPOLYGON                    -> list of polygons, each [rings...]
    """

    kind: str
    parts: list

    def polygons(self):
        """Yield ring-lists for each polygon component."""
        if self.kind == "POLYGON":
            yield self.parts
        elif self.kind == "MULTIPOLYGON":
            yield from self.parts


def _parse_group(tokens, i):
    """Parse one parenthesized group starting at tokens[i] == '('.

    Returns (group, next_i) where group is either a leaf — a list of
    [x, y, ...] coordinate lists — or a list of subgroups."""
    assert tokens[i] == "(", f"expected ( at {i}"
    i += 1
    items: list = []
    nums: list = []
    while True:
        t = tokens[i]
        if t == "(":
            sub, i = _parse_group(tokens, i)
            items.append(sub)
        elif t == ")":
            return (items if items else nums), i + 1
        elif t == ",":
            i += 1
        else:
            pair = []
            while tokens[i] not in (",", ")"):
                pair.append(float(tokens[i]))
                i += 1
            nums.append(pair)


def _is_leaf(group) -> bool:
    return bool(group) and isinstance(group[0], list) and group[0] and isinstance(group[0][0], float)


def _coords(seq) -> np.ndarray:
    return np.asarray(seq, dtype=np.float64)[:, :2]


def parse_wkt(wkt: str) -> Geometry | None:
    """Parse a WKT string. Returns None on EMPTY / unparseable input."""
    if wkt is None:
        return None
    tokens = _TOKEN.findall(wkt)
    if not tokens:
        return None
    kind = tokens[0].upper()
    if kind not in KIND_RANK and kind != "GEOMETRYCOLLECTION":
        return None
    rest = tokens[1:]
    if rest and rest[0].upper() == "EMPTY":
        return None
    if kind == "GEOMETRYCOLLECTION":
        # split sub-geometries by scanning kind tokens at depth 1
        return _parse_collection(wkt)
    try:
        group, _ = _parse_group(tokens, 1)
    except (AssertionError, IndexError, ValueError):
        return None
    if not group:
        return None
    if kind in ("POINT", "LINESTRING"):
        if not _is_leaf(group):
            return None
        return Geometry(kind, [_coords(group)])
    if kind == "MULTIPOINT":
        # both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
        if _is_leaf(group):
            return Geometry(kind, [_coords(group)])
        flat = [pair for sub in group for pair in sub]
        return Geometry(kind, [_coords(flat)])
    if kind in ("POLYGON", "MULTILINESTRING"):
        if _is_leaf(group):
            return None
        return Geometry(kind, [_coords(r) for r in group])
    if kind == "MULTIPOLYGON":
        if _is_leaf(group) or _is_leaf(group[0]):
            return None
        return Geometry(kind, [[_coords(r) for r in poly] for poly in group])
    return None


_COLL_SPLIT = re.compile(r"\b(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)\b", re.I)


def _parse_collection(wkt: str) -> Geometry | None:
    body = wkt[wkt.upper().index("GEOMETRYCOLLECTION") + len("GEOMETRYCOLLECTION"):]
    pieces = []
    matches = list(_COLL_SPLIT.finditer(body))
    for j, m in enumerate(matches):
        end = matches[j + 1].start() if j + 1 < len(matches) else len(body)
        sub = body[m.start():end].rstrip().rstrip(",").rstrip()
        # trim trailing unbalanced close-parens from the collection wrapper
        while sub.count(")") > sub.count("("):
            sub = sub[: sub.rindex(")")]
        g = parse_wkt(sub)
        if g is not None:
            pieces.append(g)
    if not pieces:
        return None
    return Geometry("GEOMETRYCOLLECTION", pieces)


def _fmt(v: float) -> str:
    """Deterministic shortest round-trip float formatting (PostGIS-like)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(c: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c)


def to_wkt(g: Geometry) -> str:
    k = g.kind
    if k == "POINT":
        return f"POINT ({_fmt_coords(g.parts[0])})"
    if k == "LINESTRING":
        return f"LINESTRING ({_fmt_coords(g.parts[0])})"
    if k == "MULTIPOINT":
        return f"MULTIPOINT ({_fmt_coords(g.parts[0])})"
    if k == "POLYGON":
        return "POLYGON (" + ", ".join(f"({_fmt_coords(r)})" for r in g.parts) + ")"
    if k == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(f"({_fmt_coords(l)})" for l in g.parts) + ")"
    if k == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in poly) + ")" for poly in g.parts
        ) + ")"
    if k == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(p) for p in g.parts) + ")"
    raise ValueError(k)


def _all_coords(g: Geometry):
    if g.kind in ("POINT", "LINESTRING", "MULTIPOINT"):
        yield from g.parts
    elif g.kind in ("POLYGON", "MULTILINESTRING"):
        yield from g.parts
    elif g.kind == "MULTIPOLYGON":
        for poly in g.parts:
            yield from poly
    elif g.kind == "GEOMETRYCOLLECTION":
        for p in g.parts:
            yield from _all_coords(p)


def npoints(g: Geometry) -> int:
    """ST_NPoints: total vertex count incl. ring-closing vertices."""
    return int(sum(len(c) for c in _all_coords(g)))


def bbox(g: Geometry) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax)."""
    mins = np.array([np.inf, np.inf])
    maxs = np.array([-np.inf, -np.inf])
    for c in _all_coords(g):
        mins = np.minimum(mins, c.min(axis=0))
        maxs = np.maximum(maxs, c.max(axis=0))
    return float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1])


def _ring_area_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    """Signed area and area-weighted centroid numerator of one ring."""
    x, y = ring[:, 0], ring[:, 1]
    # left-rotate via concatenate: same arrays as np.roll(x, -1) with
    # far less per-call overhead (roll pays normalize_axis machinery;
    # rings are typically 5 points, so fixed overhead dominates)
    x2 = np.concatenate((x[1:], x[:1]))
    y2 = np.concatenate((y[1:], y[:1]))
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return 0.0, 0.0, 0.0
    cx = ((x + x2) * cross).sum() / 6.0
    cy = ((y + y2) * cross).sum() / 6.0
    return a, cx, cy


def centroid(g: Geometry) -> tuple[float, float]:
    """ST_Centroid semantics: area centroid for (multi)polygons,
    length-weighted for lines, mean for points; degenerate shapes fall
    back to the vertex mean."""
    k = g.kind
    if k in ("POINT", "MULTIPOINT"):
        c = g.parts[0]
        m = c.mean(axis=0)
        return float(m[0]), float(m[1])
    if k in ("LINESTRING", "MULTILINESTRING"):
        lines = [g.parts[0]] if k == "LINESTRING" else g.parts
        tot_len = 0.0
        sx = sy = 0.0
        for ln in lines:
            seg = np.diff(ln, axis=0)
            seg_len = np.hypot(seg[:, 0], seg[:, 1])
            mid = (ln[:-1] + ln[1:]) / 2.0
            tot_len += seg_len.sum()
            sx += (mid[:, 0] * seg_len).sum()
            sy += (mid[:, 1] * seg_len).sum()
        if tot_len == 0.0:
            allc = np.vstack(lines)
            m = allc.mean(axis=0)
            return float(m[0]), float(m[1])
        return sx / tot_len, sy / tot_len
    if k in ("POLYGON", "MULTIPOLYGON"):
        tot_a = sx = sy = 0.0
        for rings in g.polygons():
            ext_a, ex, ey = _ring_area_centroid(rings[0])
            sign = 1.0 if ext_a >= 0 else -1.0
            tot_a += abs(ext_a)
            sx += sign * ex
            sy += sign * ey
            for hole in rings[1:]:
                ha, hx, hy = _ring_area_centroid(hole)
                tot_a -= abs(ha)
                hsign = 1.0 if ha >= 0 else -1.0
                sx -= hsign * hx
                sy -= hsign * hy
        if tot_a == 0.0:
            allc = np.vstack(list(_all_coords(g)))
            m = allc.mean(axis=0)
            return float(m[0]), float(m[1])
        return sx / tot_a, sy / tot_a
    if k == "GEOMETRYCOLLECTION":
        # PostGIS uses highest-dimension members; approximate with the
        # first polygon-bearing members, else lines, else points.
        for want in (("POLYGON", "MULTIPOLYGON"), ("LINESTRING", "MULTILINESTRING"), ("POINT", "MULTIPOINT")):
            sel = [p for p in g.parts if p.kind in want]
            if sel:
                cs = np.array([centroid(p) for p in sel])
                m = cs.mean(axis=0)
                return float(m[0]), float(m[1])
    raise ValueError(k)


def _map_coords(g: Geometry, fn) -> Geometry:
    k = g.kind
    if k in ("POINT", "LINESTRING", "MULTIPOINT"):
        return Geometry(k, [fn(g.parts[0])])
    if k in ("POLYGON", "MULTILINESTRING"):
        return Geometry(k, [fn(c) for c in g.parts])
    if k == "MULTIPOLYGON":
        return Geometry(k, [[fn(r) for r in poly] for poly in g.parts])
    if k == "GEOMETRYCOLLECTION":
        return Geometry(k, [_map_coords(p, fn) for p in g.parts])
    raise ValueError(k)


def translate(g: Geometry, dx: float, dy: float) -> Geometry:
    """ST_Translate."""
    d = np.array([dx, dy])
    return _map_coords(g, lambda c: c + d)


def scale_about_centroid(g: Geometry, f: float) -> Geometry:
    """GeomResize(geom, f): scale about the centroid (schema.sql:97-99)."""
    cx, cy = centroid(g)
    ctr = np.array([cx, cy])
    return _map_coords(g, lambda c: (c - ctr) * f + ctr)


def rotate_about_centroid(g: Geometry, degrees: float) -> Geometry:
    """GeomRotate(geom, deg): rotate about the centroid (schema.sql:101-104).

    The reference round-trips through EPSG:2249 to rotate in a planar CRS;
    we rotate in lon/lat degree space directly — deterministic and
    self-consistent (documented deviation, output parity covered by our
    own fixtures)."""
    cx, cy = centroid(g)
    ctr = np.array([cx, cy])
    rad = math.radians(degrees)
    rot = np.array([[math.cos(rad), -math.sin(rad)], [math.sin(rad), math.cos(rad)]])
    return _map_coords(g, lambda c: (c - ctr) @ rot.T + ctr)


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast of many points vs one ring.

    px, py: (M,) arrays. Returns (M,) bool."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    inside = np.zeros(px.shape[0], dtype=bool)
    for j in range(len(ring)):
        xj, yj, xk, yk = x[j], y[j], x2[j], y2[j]
        if yj == yk:
            continue
        cond = (yj > py) != (yk > py)
        if not cond.any():
            continue
        t = (py - yj) / (yk - yj)
        xint = xj + t * (xk - xj)
        inside ^= cond & (px < xint)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, g: Geometry) -> np.ndarray:
    """ST_Contains(polygon, point) for arrays of points (even-odd, holes
    subtract). Reference predicate: bif:st_contains / ST_Intersects
    coverage test (GeoClusterer.java:326-334)."""
    out = np.zeros(px.shape[0], dtype=bool)
    for rings in g.polygons():
        hit = point_in_ring(px, py, rings[0])
        for hole in rings[1:]:
            hit &= ~point_in_ring(px, py, hole)
        out |= hit
    return out


def _vertices(g: Geometry) -> np.ndarray:
    """All vertices of a geometry as one (N,2) array."""
    if g.kind == "GEOMETRYCOLLECTION":
        return np.vstack([_vertices(p) for p in g.parts])
    if g.kind in ("POLYGON", "MULTILINESTRING"):
        return np.vstack(g.parts)
    if g.kind == "MULTIPOLYGON":
        return np.vstack([r for poly in g.parts for r in poly])
    return g.parts[0]


def _edge_paths(g: Geometry) -> list:
    """Vertex paths whose consecutive pairs are edges (points have none)."""
    if g.kind == "GEOMETRYCOLLECTION":
        return [p for sub in g.parts for p in _edge_paths(sub)]
    if g.kind in ("POINT", "MULTIPOINT"):
        return []
    if g.kind in ("LINESTRING", "MULTILINESTRING", "POLYGON"):
        return [p for p in g.parts if len(p) >= 2]
    if g.kind == "MULTIPOLYGON":
        return [r for poly in g.parts for r in poly if len(r) >= 2]
    return []


def _has_polygons(g: Geometry) -> bool:
    if g.kind == "GEOMETRYCOLLECTION":
        return any(_has_polygons(p) for p in g.parts)
    return g.kind in ("POLYGON", "MULTIPOLYGON")


def _paths_cross(p: np.ndarray, q: np.ndarray) -> bool:
    """Any edge of path p (properly) intersects any edge of path q —
    orientation tests over the full edge-pair grid (paths are tiny;
    callers pre-filter candidates by bbox/cell)."""
    a0, a1 = p[:-1][:, None, :], p[1:][:, None, :]
    b0, b1 = q[:-1][None, :, :], q[1:][None, :, :]

    def orient(o, a, b):
        return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
                - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))

    d1, d2 = orient(a0, a1, b0), orient(a0, a1, b1)
    d3, d4 = orient(b0, b1, a0), orient(b0, b1, a1)
    proper = ((np.sign(d1) * np.sign(d2)) < 0) & ((np.sign(d3) * np.sign(d4)) < 0)
    return bool(proper.any())


def _vertex_on_path(v: np.ndarray, path: np.ndarray) -> bool:
    """Any vertex of v (N,2) lying ON an edge of path (collinear +
    within the edge's bbox) — the boundary-touch case ray casting and
    proper-crossing tests both miss."""
    a0, a1 = path[:-1][None, :, :], path[1:][None, :, :]
    pv = v[:, None, :]
    cross = ((a1[..., 0] - a0[..., 0]) * (pv[..., 1] - a0[..., 1])
             - (a1[..., 1] - a0[..., 1]) * (pv[..., 0] - a0[..., 0]))
    lo = np.minimum(a0, a1)
    hi = np.maximum(a0, a1)
    on = ((cross == 0)
          & (pv[..., 0] >= lo[..., 0]) & (pv[..., 0] <= hi[..., 0])
          & (pv[..., 1] >= lo[..., 1]) & (pv[..., 1] <= hi[..., 1]))
    return bool(on.any())


def geoms_intersect(ga: Geometry | None, gb: Geometry | None) -> bool:
    """Exact ST_Intersects over the engine's geometry kinds (boundary
    inclusive): bbox reject, then vertex-in-polygon containment (either
    direction, holes respected), proper edge crossings, boundary
    touches, and point equality. Replaces the envelope approximation in
    the clustering coverage feature (GeoClusterer.java:326-354 uses
    PostGIS ST_Intersects)."""
    if ga is None or gb is None:
        return False
    ax0, ay0, ax1, ay1 = bbox(ga)
    bx0, by0, bx1, by1 = bbox(gb)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return False
    va, vb = _vertices(ga), _vertices(gb)
    if _has_polygons(gb) and points_in_polygon(va[:, 0], va[:, 1], gb).any():
        return True
    if _has_polygons(ga) and points_in_polygon(vb[:, 0], vb[:, 1], ga).any():
        return True
    pa, pb = _edge_paths(ga), _edge_paths(gb)
    for p in pa:
        for q in pb:
            if _paths_cross(p, q):
                return True
    for q in pb:
        if _vertex_on_path(va, q):
            return True
    for p in pa:
        if _vertex_on_path(vb, p):
            return True
    # point-point (or shared-vertex touch) equality
    return bool((np.abs(va[:, None, :] - vb[None, :, :]).sum(axis=2) == 0).any())


# fast path for the overwhelmingly-common POINT: one anchored match +
# two float() parses replaces tokenizer, recursive parser, and three
# numpy allocations. float() here and float(token) in the general path
# are the same parse, so all outputs are bit-identical.
_POINT_FAST = re.compile(r"\s*POINT\s*\(\s*(-?[\d.Ee+-]+)\s+(-?[\d.Ee+-]+)\s*\)\s*\Z")


def _points_paths_dist(pts: np.ndarray, paths: list) -> float:
    """Min distance from any point in ``pts`` to the INTERIOR of any
    segment in ``paths`` (projection parameter strictly inside (0,1));
    endpoint-attained minima are excluded — the caller covers them with
    direct vertex-vertex differences, keeping the arithmetic a single
    subtraction per coordinate (the IEEE shape the SQL oracle mirrors
    for axis-aligned inputs)."""
    best = np.inf
    for path in paths:
        a, b = path[:-1], path[1:]
        dx, dy = b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]
        L2 = dx * dx + dy * dy
        ok = L2 > 0
        if not ok.any():
            continue
        # pts (N,1) vs segments (1,M)
        wx = pts[:, 0:1] - a[None, :, 0]
        wy = pts[:, 1:2] - a[None, :, 1]
        t = (wx * dx[None, :] + wy * dy[None, :]) / np.where(ok, L2, 1.0)[None, :]
        interior = ok[None, :] & (t > 0.0) & (t < 1.0)
        if not interior.any():
            continue
        ex = wx - t * dx[None, :]
        ey = wy - t * dy[None, :]
        d2 = np.where(interior, ex * ex + ey * ey, np.inf)
        best = min(best, float(np.sqrt(d2.min())))
    return best


def min_distance(ga: Geometry | None, gb: Geometry | None) -> float:
    """Exact min planar distance between two geometries (degrees) —
    the refinement kernel of joins.dwithin_join (ST_DWithin semantics;
    the reference leaves this predicate to PostGIS). 0.0 when the
    shapes intersect. Otherwise the minimum over (a) all vertex-vertex
    pairs, computed as one subtraction per coordinate then
    dx*dx + dy*dy -> sqrt (exactly the IEEE sequence the SQL oracle
    writes for axis-aligned envelopes), and (b) vertex-to-segment-
    interior projections on both sides: for non-intersecting shapes
    the minimum is always attained at a vertex of one side, so (a)+(b)
    is complete."""
    if ga is None or gb is None:
        return float("inf")
    if geoms_intersect(ga, gb):
        return 0.0
    va, vb = _vertices(ga), _vertices(gb)
    dx = va[:, None, 0] - vb[None, :, 0]
    dy = va[:, None, 1] - vb[None, :, 1]
    best = float(np.sqrt((dx * dx + dy * dy).min()))
    pa, pb = _edge_paths(ga), _edge_paths(gb)
    if pb:
        best = min(best, _points_paths_dist(va, pb))
    if pa:
        best = min(best, _points_paths_dist(vb, pa))
    return best


def _dp_keep(path: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an open polyline (iterative
    stack, no recursion-depth limit). Degenerate anchor segments
    (identical endpoints — the ring case, where the path starts and
    ends on the same vertex) fall back to point distance from the
    anchor, the standard closed-ring treatment."""
    n = len(path)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = path[i + 1:j]
        a, b = path[i], path[j]
        d = b - a
        L2 = float(d @ d)
        if L2 == 0.0:
            dist = np.sqrt(((seg - a) ** 2).sum(axis=1))
        else:
            # perpendicular distance to the infinite line through a-b
            dist = np.abs((seg[:, 0] - a[0]) * d[1]
                          - (seg[:, 1] - a[1]) * d[0]) / np.sqrt(L2)
        k = int(np.argmax(dist))
        if dist[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_dp(g: Geometry | None, eps: float) -> Geometry | None:
    """Douglas-Peucker simplification (the low-zoom tile-serving
    reduction a Leaflet-style map applies before shipping geometries):
    every path/ring keeps its anchor vertices plus any vertex farther
    than ``eps`` from the current chord. Points pass through; a
    polygon ring that would collapse below 4 points (3 distinct +
    closure — no longer a valid ring) keeps its ORIGINAL vertices, so
    output geometries always stay well-formed. Deterministic: pure
    float comparisons, no tolerance-dependent tie randomness."""
    if g is None:
        return None
    if g.kind in ("POINT", "MULTIPOINT"):
        return g

    def simp_path(p: np.ndarray, min_pts: int) -> np.ndarray:
        if len(p) <= min_pts:
            return p
        out = p[_dp_keep(p, eps)]
        return p if len(out) < min_pts else out

    if g.kind in ("LINESTRING", "MULTILINESTRING"):
        return Geometry(g.kind, [simp_path(p, 2) for p in g.parts])
    if g.kind == "POLYGON":
        return Geometry(g.kind, [simp_path(r, 4) for r in g.parts])
    if g.kind == "MULTIPOLYGON":
        return Geometry(g.kind, [[simp_path(r, 4) for r in poly]
                                 for poly in g.parts])
    if g.kind == "GEOMETRYCOLLECTION":
        return Geometry(g.kind, [simplify_dp(p, eps) for p in g.parts])
    return g


def stats(wkt: str):
    """One-pass per-geometry stats used as precomputed columns:
    (kind, rank, npoints, cx, cy, xmin, ymin, xmax, ymax) or None."""
    if wkt is not None:
        m = _POINT_FAST.match(wkt)
        if m is not None:
            try:
                x, y = float(m.group(1)), float(m.group(2))
            except ValueError:
                return None
            return ("POINT", KIND_RANK["POINT"], 1, x, y, x, y, x, y)
    g = parse_wkt(wkt)
    if g is None:
        return None
    cx, cy = centroid(g)
    x0, y0, x1, y1 = bbox(g)
    return (g.kind, KIND_RANK.get(g.kind, NONE_RANK), npoints(g), cx, cy, x0, y0, x1, y1)
