"""Geocoding: web-page text -> geo-entities (the engine's ingest stage).

Re-expresses the reference's geometry discovery (Importer.java:208-216)
over Common-Crawl-style pages: instead of SPARQL scans of RDF graphs, a
single Arrow-vectorized ``mapInPandas`` pass extracts both
serializations from ``text``:

  1. W3C WGS84 lat/long pairs — ``lat <decimal> long <decimal>``
     (Constants.java:40-41 regex analog) -> synthesized ``POINT (lon lat)``
     (Importer.java:316-318);
  2. GeoSPARQL-style inline WKT snippets -> kept verbatim
     (Importer.java:216, asWKT chain).

One geometry per subject is enforced by the reference's type-precedence
table (Constants.java:85-95: MULTIPOLYGON > POLYGON > MULTILINESTRING >
LINESTRING > MULTIPOINT > POINT; dedup loops Importer.java:306-314,
367-378) — here a window ``row_number()`` (SURVEY.md §2.1 S5).

Invariant: ``text`` is never modified — the byte-identical-text-per-url
check hashes it at ingest and at output (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells, geom

# lat/long pair, reference vocabulary order (lat first)
LATLONG_RE = re.compile(
    r"\blat\w*[\s:=]+(-?\d{1,2}(?:\.\d+)?)[\s,;]+long\w*[\s:=]+(-?\d{1,3}(?:\.\d+)?)",
    re.IGNORECASE)

# balanced-paren WKT snippet, nesting depth <= 3 (MULTIPOLYGON)
_NP = r"[^()]*"
_D1 = rf"\({_NP}\)"
_D2 = rf"\((?:{_NP}|{_D1})*\)"
_D3 = rf"\((?:{_NP}|{_D2})*\)"
WKT_RE = re.compile(
    rf"\b(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)\s*({_D3})")

ENTITY_SCHEMA = ("url string, entity_idx int, source string, geom_wkt string, "
                 "geom_kind string, kind_rank int, npoints int, "
                 "lon double, lat double, xmin double, ymin double, "
                 "xmax double, ymax double")


def _latlong_matches(text: str):
    """Exact twin of ``LATLONG_RE.finditer(text)`` built on C-level
    ``str.find`` candidate location + anchored ``.match``: the regex
    starts with ``\\blat`` but the ``\\b`` assertion blocks sre's
    literal-prefix fast scan (measured 10x: 132 -> 13 ms per 2500
    2.5 KB pages), so we locate 'lat' candidates in a lowercase copy
    and run the full (``\\b``-checking, IGNORECASE) regex anchored at
    each. finditer semantics preserved: candidates inside a previous
    match's span are skipped, matches come out in position order.
    Falls back to finditer when ``str.lower`` changes the string
    length (rare unicode case folds would misalign positions)."""
    low = text.lower()
    if len(low) != len(text):
        return LATLONG_RE.finditer(text)
    out = []
    pos = 0
    while True:
        c = low.find("lat", pos)
        if c < 0:
            break
        m = LATLONG_RE.match(text, c)
        if m is not None:
            out.append(m)
            pos = m.end()
        else:
            pos = c + 1
    return out


def _wkt_matches(text: str):
    """Exact twin of ``WKT_RE.finditer(text)``: the alternation-headed
    type-name group has no literal prefix sre can skip with, so scan
    for the three substrings every WKT type name contains ('POINT',
    'LINESTRING', 'POLYGON' — case-sensitive, as in the regex), add
    the MULTI- start when prefixed, and run the anchored regex at each
    candidate in position order (measured 10x: 144 -> 14 ms per 2500
    pages). ``last_end`` skip preserves finditer's non-overlap rule
    (e.g. the 'POINT' inside an already-matched 'MULTIPOINT (...)')."""
    cands = []
    for kw in ("POINT", "LINESTRING", "POLYGON"):
        p = text.find(kw)
        while p >= 0:
            if p >= 5 and text[p - 5:p] == "MULTI":
                cands.append(p - 5)
            cands.append(p)
            p = text.find(kw, p + 1)
    if not cands:
        return ()
    cands.sort()
    out = []
    last_end = 0
    for c in cands:
        if c < last_end:
            continue
        m = WKT_RE.match(text, c)
        if m is not None:
            out.append(m)
            last_end = m.end()
    return out


def _extract_batch(pdf: pd.DataFrame, carry: tuple[str, ...] = (),
                   dedup_local: bool = False) -> pd.DataFrame:
    rows = []
    carry_vals = [pdf[c] for c in carry]
    for url, text, *extra in zip(pdf["url"], pdf["text"], *carry_vals):
        if text is None:
            continue
        page_rows = []
        idx = 0
        for m in _latlong_matches(text):
            lat, lon = float(m.group(1)), float(m.group(2))
            if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
                continue
            wkt = f"POINT ({geom._fmt(lon)} {geom._fmt(lat)})"
            page_rows.append((url, idx, "wgs84", wkt, "POINT", geom.KIND_RANK["POINT"], 1,
                              lon, lat, lon, lat, lon, lat, *extra))
            idx += 1
        # _wkt_matches subsumes the old page-level keyword prescan:
        # candidate positions come from C-level str.find, so a no-WKT
        # page costs three failed finds and no regex scan at all
        for m in _wkt_matches(text):
            s = geom.stats(m.group(0))
            if s is None:
                continue
            kind, rank, np_, cx, cy, x0, y0, x1, y1 = s
            if not (-180.0 <= cx <= 180.0 and -90.0 <= cy <= 90.0):
                continue
            page_rows.append((url, idx, "wkt", m.group(0), kind, rank, np_,
                              cx, cy, x0, y0, x1, y1, *extra))
            idx += 1
        if dedup_local and page_rows:
            # precedence dedup INSIDE the kernel: all of a url's
            # entities are emitted from this one page row, so the
            # per-url winner (min kind_rank, then extraction order) is
            # decidable here — no window, NO SHUFFLE (the window
            # variant's exchange was the pipeline's only large
            # cross-executor transfer; see geocode_pages)
            rows.append(min(page_rows, key=lambda r: (r[5], r[1])))
        else:
            rows.extend(page_rows)
    return pd.DataFrame(rows, columns=[
        "url", "entity_idx", "source", "geom_wkt", "geom_kind", "kind_rank",
        "npoints", "lon", "lat", "xmin", "ymin", "xmax", "ymax", *carry])


def _extract_wkt_batch(pdf: pd.DataFrame, carry: tuple[str, ...] = ()) -> pd.DataFrame:
    """WKT-only extraction for the hybrid engine: the page's WGS84
    matches were already counted JVM-side, so entity_idx starts at the
    supplied ``_idx0`` offset (global per-page ordering preserved:
    lat/long entities first, WKT entities after — Importer.java's scan
    order)."""
    rows = []
    carry_vals = [pdf[c] for c in carry]
    for url, text, idx0, *extra in zip(pdf["url"], pdf["text"], pdf["_idx0"],
                                       *carry_vals):
        if text is None:
            continue
        idx = int(idx0)
        for m in _wkt_matches(text):
            s = geom.stats(m.group(0))
            if s is None:
                continue
            kind, rank, np_, cx, cy, x0, y0, x1, y1 = s
            if not (-180.0 <= cx <= 180.0 and -90.0 <= cy <= 90.0):
                continue
            rows.append((url, idx, "wkt", m.group(0), kind, rank, np_,
                         cx, cy, x0, y0, x1, y1, *extra))
            idx += 1
    return pd.DataFrame(rows, columns=[
        "url", "entity_idx", "source", "geom_wkt", "geom_kind", "kind_rank",
        "npoints", "lon", "lat", "xmin", "ymin", "xmax", "ymax", *carry])


_ENTITY_PA_FIELDS = (
    ("url", "string"), ("entity_idx", "int32"), ("source", "string"),
    ("geom_wkt", "string"), ("geom_kind", "string"),
    ("kind_rank", "int32"), ("npoints", "int32"),
    ("lon", "float64"), ("lat", "float64"), ("xmin", "float64"),
    ("ymin", "float64"), ("xmax", "float64"), ("ymax", "float64"))


def _extract_arrow(batches, carry: tuple[str, ...] = (),
                   dedup_local: bool = False):
    """mapInArrow twin of ``_extract_batch``: same scans, same rows,
    but the batch boundary is pyarrow-native — no pandas DataFrame
    construction on either side of the worker (pd.DataFrame from a
    list of tuples + Spark's pandas->arrow conversion were ~25% of
    per-batch cost; typed ``pa.array`` from the column lists replaces
    both). Carry columns are gathered by row index with ``take``, so
    their arrow types pass through untouched (timestamps included)."""
    import pyarrow as pa

    types = [getattr(pa, t)() for _, t in _ENTITY_PA_FIELDS]
    names = [n for n, _ in _ENTITY_PA_FIELDS]
    ncols = len(names)
    for batch in batches:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        cols = [[] for _ in range(ncols)]
        src_idx = []
        for row_i, (url, text) in enumerate(zip(urls, texts)):
            if text is None:
                continue
            if dedup_local:
                # precedence winner picked inline: idx strictly
                # increases, so a later entity wins only on strictly
                # smaller kind_rank — equivalent to the pandas
                # kernel's min((kind_rank, entity_idx)) over the page
                best = None
                idx = 0
                for m in _latlong_matches(text):
                    la, lo = float(m.group(1)), float(m.group(2))
                    if not (-90.0 <= la <= 90.0 and -180.0 <= lo <= 180.0):
                        continue
                    if best is None:
                        wkt = f"POINT ({geom._fmt(lo)} {geom._fmt(la)})"
                        best = (url, idx, "wgs84", wkt, "POINT",
                                geom.KIND_RANK["POINT"], 1,
                                lo, la, lo, la, lo, la)
                    idx += 1
                for m in _wkt_matches(text):
                    s = geom.stats(m.group(0))
                    if s is None:
                        continue
                    kind, rank, np_, cx, cy, x0, y0, x1, y1 = s
                    if not (-180.0 <= cx <= 180.0 and -90.0 <= cy <= 90.0):
                        continue
                    if best is None or rank < best[5]:
                        best = (url, idx, "wkt", m.group(0), kind, rank,
                                np_, cx, cy, x0, y0, x1, y1)
                    idx += 1
                if best is not None:
                    for i in range(ncols):
                        cols[i].append(best[i])
                    src_idx.append(row_i)
            else:
                idx = 0
                for m in _latlong_matches(text):
                    la, lo = float(m.group(1)), float(m.group(2))
                    if not (-90.0 <= la <= 90.0 and -180.0 <= lo <= 180.0):
                        continue
                    wkt = f"POINT ({geom._fmt(lo)} {geom._fmt(la)})"
                    row = (url, idx, "wgs84", wkt, "POINT",
                           geom.KIND_RANK["POINT"], 1, lo, la, lo, la, lo, la)
                    for i in range(ncols):
                        cols[i].append(row[i])
                    src_idx.append(row_i)
                    idx += 1
                for m in _wkt_matches(text):
                    s = geom.stats(m.group(0))
                    if s is None:
                        continue
                    kind, rank, np_, cx, cy, x0, y0, x1, y1 = s
                    if not (-180.0 <= cx <= 180.0 and -90.0 <= cy <= 90.0):
                        continue
                    row = (url, idx, "wkt", m.group(0), kind, rank, np_,
                           cx, cy, x0, y0, x1, y1)
                    for i in range(ncols):
                        cols[i].append(row[i])
                    src_idx.append(row_i)
                    idx += 1
        arrays = [pa.array(c, t) for c, t in zip(cols, types)]
        out_names = list(names)
        if carry:
            take = pa.array(src_idx, pa.int64())
            for c in carry:
                arrays.append(batch.column(c).take(take))
                out_names.append(c)
        yield pa.RecordBatch.from_arrays(arrays, names=out_names)


def _fmt_col(v):
    """Column twin of geom._fmt for coordinate doubles: integral values
    print as integers, the rest as shortest decimal. Exact vs the
    Python repr for non-integral inputs with <= 10 fractional digits
    and magnitude >= 1e-4 (repr switches to e-notation below that);
    pages possibly violating the bound are routed to the arrow kernel
    by ``_hard_page_cond``, so the hybrid ENGINE has no bound."""
    dec = F.regexp_replace(F.format_string("%.10f", v), "0+$", "")
    dec = F.regexp_replace(dec, "\\.$", "")  # 42.0000000000 -> "42."
    return F.when(v == F.floor(v), v.cast("long").cast("string")).otherwise(dec)


def _hard_page_cond():
    """Cheap textual detector for pages the JVM formatter might not
    print repr-identically, CONSERVATIVE by design (over-detection just
    routes a page to the always-correct Arrow kernel): any 11+ digit
    fractional run, or the '0.0000' prefix every sub-1e-4 decimal
    coordinate carries (repr e-notation territory). One literal
    `contains` + one simple rlike — never a pairs re-evaluation."""
    t = F.col("text")
    return t.contains("0.0000") | t.rlike(r"\.[0-9]{11}")


# Java regex twin of LATLONG_RE ((?i) embedded flag; ASCII \w/\d/\s over
# the ASCII page corpus — documented unicode-class divergence vs Python)
_LATLONG_JVM = (r"(?i)\blat\w*[\s:=]+(-?\d{1,2}(?:\.\d+)?)"
                r"[\s,;]+long\w*[\s:=]+(-?\d{1,3}(?:\.\d+)?)")

def _wkt_keyword_cond():
    return (F.col("text").isNotNull() &
            (F.col("text").contains("POINT")
             | F.col("text").contains("POLYGON")
             | F.col("text").contains("LINESTRING")))


def _latlong_pairs_col():
    """array<struct<la,lo>> of BOUNDS-KEPT WGS84 matches, in match
    order — filtering inside the array keeps posexplode's pos equal to
    the kernel's entity_idx (which increments only for kept matches).

    ONE full-text regex scan (group 0), then the two coordinate groups
    are re-extracted from each ~30-char match string — matching the
    Python kernel's single-finditer cost; ``regexp_extract_all`` per
    group would scan the whole page once per group."""
    ms = F.regexp_extract_all(F.col("text"), F.lit(_LATLONG_JVM), 0)
    z = F.transform(ms, lambda m: F.struct(
        F.regexp_extract(m, _LATLONG_JVM, 1).alias("la"),
        F.regexp_extract(m, _LATLONG_JVM, 2).alias("lo")))
    return F.filter(z, lambda p: (
        (p["la"].cast("double") >= -90.0) & (p["la"].cast("double") <= 90.0)
        & (p["lo"].cast("double") >= -180.0) & (p["lo"].cast("double") <= 180.0)))


def extract_entities(pages: DataFrame, resolutions=cells.RESOLUTIONS,
                     carry: tuple[str, ...] = (),
                     engine: str = "arrow",
                     dedup_local: bool = False) -> DataFrame:
    """pages(url, text, ...) -> one row per extracted geo-entity with
    precomputed geometry stats and multi-resolution cell ids. ``carry``
    names extra page columns replicated onto each entity row (e.g.
    ``warc_ts`` for the streaming path) — the schema extends itself
    from the input types.

    ``engine``:

    - ``"arrow"`` (default): the single-pass ``mapInArrow`` kernel —
      find-candidate C scans (``_latlong_matches``/``_wkt_matches``)
      plus pyarrow-native batch construction on both sides of the
      worker pipe; no pandas anywhere. Measured 3x the r4 pandas
      kernel per batch (323 -> 108 ms per 2500 2.5 KB pages).
    - ``"pandas"``: the same scans through the original
      ``mapInPandas`` kernel — kept as the parity witness and for
      callers that want pandas batch semantics.
    - ``"hybrid"``: WGS84 lat/long pairs extracted entirely JVM-side
      (``regexp_extract_all`` + array filter + posexplode) with only
      WKT-keyword pages entering the Arrow kernel (entity_idx offset by
      the page's lat/long count; repr-formatting edge pages routed to
      the full kernel). Row-identical to "arrow" (parity-tested) but
      MEASURED SLOWER and kept as a documented negative result: the
      hypothesis was that moving the dominant regex JVM-side would fix
      the local-mode python-worker oversubscription knee
      (BENCH/BASELINE.md), but Catalyst's per-entity expression tree
      (posexplode + per-match group extraction + decimal formatting)
      costs ~2x the whole vectorized kernel (324 vs 165 core-seconds
      on 1.5M pages at local[8]) — java.util.regex plus per-row
      codegen expressions lose to one Arrow batch pipe + C sre here.
    """
    schema = ENTITY_SCHEMA
    if carry:
        schema += "".join(f", {f.name} {f.dataType.simpleString()}"
                          for f in pages.select(*carry).schema.fields)

    if engine == "arrow":
        def run_pa(batches):
            yield from _extract_arrow(batches, carry, dedup_local)

        ents = pages.select("url", "text", *carry).mapInArrow(run_pa, schema)
    elif engine == "pandas":
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _extract_batch(pdf, carry, dedup_local)

        ents = pages.select("url", "text", *carry).mapInPandas(run, schema)
    elif engine == "hybrid":
        allp = pages.select("url", "text", *carry)
        # pages that might contain a coordinate the JVM formatter can't
        # print repr-identically (<1e-4 or >10 fractional digits —
        # vanishingly rare in web text) take the full Arrow kernel;
        # everything else takes the JVM fast path. The detector is a
        # cheap textual over-approximation, so no pairs re-evaluation.
        hard_cond = _hard_page_cond()
        hard = allp.filter(F.col("text").isNotNull() & hard_cond)

        def run_full(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _extract_batch(pdf, carry)

        hard_ents = hard.mapInPandas(run_full, schema)

        base = allp.filter(F.col("text").isNotNull() & ~hard_cond)
        pairs = base.select("url", *carry,
                            F.posexplode(_latlong_pairs_col())
                            .alias("entity_idx", "_p"))
        lon = F.col("_p")["lo"].cast("double")
        lat = F.col("_p")["la"].cast("double")
        latlong = pairs.select(
            "url", F.col("entity_idx").cast("int").alias("entity_idx"),
            F.lit("wgs84").alias("source"),
            F.concat(F.lit("POINT ("), _fmt_col(lon), F.lit(" "),
                     _fmt_col(lat), F.lit(")")).alias("geom_wkt"),
            F.lit("POINT").alias("geom_kind"),
            F.lit(geom.KIND_RANK["POINT"]).cast("int").alias("kind_rank"),
            F.lit(1).cast("int").alias("npoints"),
            lon.alias("lon"), lat.alias("lat"),
            lon.alias("xmin"), lat.alias("ymin"),
            lon.alias("xmax"), lat.alias("ymax"), *carry)

        wkt_pages = (base.filter(_wkt_keyword_cond())
                     .withColumn("_idx0", F.size(_latlong_pairs_col())))

        def run_wkt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _extract_wkt_batch(pdf, carry)

        wkt = (wkt_pages.select("url", "text", "_idx0", *carry)
               .mapInPandas(run_wkt, schema))
        ents = latlong.unionByName(wkt).unionByName(hard_ents)
    else:
        raise ValueError(f"unknown extraction engine {engine!r}")
    for r in resolutions:
        ents = ents.withColumn(f"cell_r{r}", cells.cell_col(F.col("lon"), F.col("lat"), r))
    return ents


def dedup_by_precedence(entities: DataFrame, subject: str = "url") -> DataFrame:
    """S5: keep one geometry per subject — most complex type wins, ties
    broken by extraction order (Importer.java:306-314 keeps the first
    seen at the winning rank)."""
    w = Window.partitionBy(subject).orderBy(F.col("kind_rank").asc(), F.col("entity_idx").asc())
    return (entities.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def geocode_pages(pages: DataFrame, resolutions=cells.RESOLUTIONS,
                  dedup: bool = True, dedup_mode: str = "window") -> DataFrame:
    """Full ingest: extract + (optional) precedence dedup. Carries no
    ``text`` column — the invariant check re-joins on url against the
    untouched pages table.

    ``dedup_mode``:

    - ``"window"`` (default): the general path — row_number over a
      url window; correct even when a url appears on multiple page
      rows, at the cost of shuffling every entity row. In one local
      JVM the exchange is a cheap in-process fetch, but across REAL
      executors it serializes the whole entity frame over the wire
      (measured on the 4x8-core standalone cluster: the window made
      geocode 13.4s where extraction alone is 3.8s).
    - ``"local"``: the precedence winner is picked INSIDE the Arrow
      extraction kernel — zero shuffle, scales linearly with
      executors. Valid precondition: each url appears on exactly ONE
      page row (the corpus contract after latest-capture compaction;
      every synth/stream corpus here). Row-identical to "window"
      under that precondition (parity-tested)."""
    if dedup and dedup_mode == "local":
        return extract_entities(pages, resolutions, dedup_local=True)
    ents = extract_entities(pages, resolutions)
    return dedup_by_precedence(ents) if dedup else ents


def wkt_validity(df: DataFrame, wkt: str = "geom_wkt",
                 subject: str = "subject") -> DataFrame:
    """Scan-time WKT validity gate as a report — the F5
    degenerate-geometry guard (FindLinkServlet.java:198 drops
    oversized geometries silently) generalized to a classified
    inventory a data owner can act on: per subject, which structural
    class its WKT falls in and the vertex count. Pure JVM
    string/regex column ops (patterns restricted to classes where
    Java regex == RE2, the curation-scrub rule), map-only, no parse
    kernel — this runs BEFORE the Arrow parser and keeps malformed
    rows out of it.

    Classes: 'null', 'empty', 'ok_point', 'ok_polygon' (single ring,
    closed, >= 4 vertices), 'unclosed_ring', 'short_ring' (closed
    but < 4 vertices), 'malformed'. Structural check only: coordinate
    arity/numeric sanity for points is enforced by the regex; ring
    vertices are checked for closure and count, not numeric range
    (stated — the parser's job).

    Returns (subject, validity, n_vertices).
    """
    w = F.col(wkt)
    inner = F.regexp_extract(w, r"^POLYGON \(\((.*)\)\)$", 1)
    pts = F.split(inner, ", ")
    n = F.size(pts)
    closed = F.element_at(pts, 1) == F.element_at(pts, -1)
    is_point = w.rlike(r"^POINT \(-?[0-9]+(\.[0-9]+)? -?[0-9]+(\.[0-9]+)?\)$")
    has_ring = inner != ""
    validity = (F.when(w.isNull(), "null")
                 .when(F.trim(w) == "", "empty")
                 .when(is_point, "ok_point")
                 .when(has_ring & closed & (n >= 4), "ok_polygon")
                 .when(has_ring & ~closed, "unclosed_ring")
                 .when(has_ring & closed & (n < 4), "short_ring")
                 .otherwise("malformed"))
    n_vertices = (F.when(is_point, F.lit(1))
                   .when(has_ring, n)
                   .otherwise(F.lit(None)).cast("long"))
    return df.select(F.col(subject), validity.alias("validity"),
                     n_vertices.alias("n_vertices"))


def ring_simple_check(df: DataFrame, wkt: str = "geom_wkt",
                      subject: str = "subject") -> DataFrame:
    """Geometric simplicity check for single-ring POLYGON WKTs on the
    0.01-degree grid: does any pair of NON-ADJACENT ring edges
    intersect (a bowtie / self-crossing ring)? The geometric
    companion to wkt_validity's structural gate — a ring can be
    closed and well-formed yet self-intersecting, and every consumer
    downstream (shoelace area, PIP, rasterize) silently misbehaves
    on such rings.

    All JVM: vertices parse by string split + exact two-decimal
    -> integer-hundredths conversion (round(x*100) — exact for the
    grid convention, contract._fmt2), edges posexplode, non-adjacent
    pairs self-join per subject (j > i+1, excluding the closing
    (first, last) adjacency), and the exact BIGINT segment predicate
    of joins.segment_intersections decides. O(n_edges^2) pairs per
    polygon — bounded by ring size, not corpus size; the self-join
    keys on subject so polygons never shuffle against each other.

    Non-polygon / malformed rows are passed through with NULL
    n_crossings and is_simple (stated — gate with wkt_validity
    first).

    Returns (subject, n_edges, n_crossings, is_simple).
    """
    inner = F.regexp_extract(F.col(wkt), r"^POLYGON \(\((.*)\)\)$", 1)
    base = df.select(F.col(subject).alias("_s"), inner.alias("_in"))
    ok = base.filter(F.col("_in") != "")
    vx = ok.select(
        "_s",
        F.transform(
            F.split("_in", ", "),
            lambda p: F.struct(
                F.round(F.element_at(F.split(p, " "), 1).cast("double")
                        * 100).cast("long").alias("x"),
                F.round(F.element_at(F.split(p, " "), 2).cast("double")
                        * 100).cast("long").alias("y"))).alias("_v"))
    # degenerate 1-vertex rings would hit Spark's DESCENDING
    # sequence(1, 0) -> [1, 0] and fabricate two NULL-endpoint edges;
    # drop them here so malformed rows truly pass through as stated
    vx = vx.filter(F.size("_v") >= 2)
    # edges i = 1..n-1 (vertex i -> i+1); ring closure is the last edge
    edges = vx.select(
        "_s", (F.size("_v") - 1).alias("_ne"),
        F.posexplode(F.expr(
            "transform(sequence(1, size(_v) - 1), i -> named_struct("
            "'x1', _v[i - 1].x, 'y1', _v[i - 1].y, "
            "'x2', _v[i].x, 'y2', _v[i].y))")).alias("_i", "_e"))
    a = edges.select("_s", "_ne", F.col("_i").alias("_ia"),
                     F.col("_e.x1").alias("ax1"), F.col("_e.y1").alias("ay1"),
                     F.col("_e.x2").alias("ax2"), F.col("_e.y2").alias("ay2"))
    b = edges.select(F.col("_s").alias("_s2"), F.col("_i").alias("_ib"),
                     F.col("_e.x1").alias("bx1"), F.col("_e.y1").alias("by1"),
                     F.col("_e.x2").alias("bx2"), F.col("_e.y2").alias("by2"))
    pairs = a.join(b, (F.col("_s") == F.col("_s2"))
                   & (F.col("_ib") > F.col("_ia") + 1)
                   & ~((F.col("_ia") == 0)
                       & (F.col("_ib") == F.col("_ne") - 1)))
    rx, ry = F.col("ax2") - F.col("ax1"), F.col("ay2") - F.col("ay1")
    sx, sy = F.col("bx2") - F.col("bx1"), F.col("by2") - F.col("by1")
    d1 = rx * (F.col("by1") - F.col("ay1")) - ry * (F.col("bx1") - F.col("ax1"))
    d2 = rx * (F.col("by2") - F.col("ay1")) - ry * (F.col("bx2") - F.col("ax1"))
    d3 = sx * (F.col("ay1") - F.col("by1")) - sy * (F.col("ax1") - F.col("bx1"))
    d4 = sx * (F.col("ay2") - F.col("by1")) - sy * (F.col("ax2") - F.col("bx1"))
    collinear = (d1 == 0) & (d2 == 0)
    use_x = F.abs(rx) >= F.abs(ry)
    a_lo = F.when(use_x, F.least("ax1", "ax2")).otherwise(F.least("ay1", "ay2"))
    a_hi = F.when(use_x, F.greatest("ax1", "ax2")).otherwise(F.greatest("ay1", "ay2"))
    b_lo = F.when(use_x, F.least("bx1", "bx2")).otherwise(F.least("by1", "by2"))
    b_hi = F.when(use_x, F.greatest("bx1", "bx2")).otherwise(F.greatest("by1", "by2"))
    col_hit = F.greatest(a_lo, b_lo) <= F.least(a_hi, b_hi)
    hit = F.when(collinear, col_hit).otherwise((d1 * d2 <= 0) & (d3 * d4 <= 0))
    crossings = (pairs.filter(hit).groupBy("_s")
                 .agg(F.count(F.lit(1)).cast("long").alias("n_crossings")))
    per_poly = (edges.groupBy("_s").agg(F.first("_ne").alias("_ne"))
                .join(crossings, "_s", "left")
                .select("_s", F.col("_ne").cast("long").alias("n_edges"),
                        F.coalesce("n_crossings", F.lit(0)).alias("n_crossings"),
                        (F.coalesce("n_crossings", F.lit(0)) == 0)
                        .alias("is_simple")))
    return (base.select("_s").join(per_poly, "_s", "left")
            .select(F.col("_s").alias(subject), "n_edges", "n_crossings",
                    "is_simple"))
