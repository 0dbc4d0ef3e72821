"""Deterministic synthetic inputs (seeded, partition-independent).

Synthesizes the BASELINE.json input table — Common-Crawl-style web pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``
— plus FAGI-shaped gazetteer relations ``dataset_{a,b}_geometries``,
``metadata_{a,b}`` EAV triples, and golden ``links`` (shapes mirror
reference ``samples/links_sample.nt`` / ``samples/wikimapia_sample.nt``
and schema.sql:20-95; see FIXTURES.md).

Every value is derived from a splitmix64 hash of (row_id, stream_salt,
seed) — NOT a sequential RNG — so generation is identical under any
partitioning / parallelism, which the resume + determinism tests rely on.

Page text embeds geo-entities in both reference serializations
(Importer.java:208-216): ``lat <d> long <d>`` decimal pairs (W3C WGS84
vocab analog) and inline WKT snippets (GeoSPARQL asWKT analog).
Coordinates cluster around a small set of "city" hot spots with a
heavily skewed page->city assignment — dense cells are the engine's
skew stress case (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
N_CITIES = 50
LANGS = ["en", "de", "fr", "es", "it", "el"]
_WORDS = ("the quick search page maps city place street river park museum "
          "station old new main north south lake bridge church market square "
          "tower hall garden").split()

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def h64(x, salt: int = 0, seed: int = SEED) -> np.ndarray:
    """Vectorized splitmix64 over int ids."""
    stream = np.uint64(((salt * 1_000_003 + seed + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = np.asarray(x, dtype=np.uint64) + stream
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def u01(x, salt: int = 0, seed: int = SEED) -> np.ndarray:
    return h64(x, salt, seed).astype(np.float64) / 18446744073709551616.0


def city_centers(n_cities: int = N_CITIES, seed: int = SEED):
    idx = np.arange(n_cities)
    lon = np.round(u01(idx, 101, seed) * 340.0 - 170.0, 2)
    lat = np.round(u01(idx, 102, seed) * 140.0 - 70.0, 2)
    return lon, lat


def _city_of(ids: np.ndarray, n_cities: int, seed: int) -> np.ndarray:
    """Zipf-ish skew: ~ r^3 concentrates mass on low city indices —
    city 0 absorbs a large share of pages (the dense-cell hot spot)."""
    r = u01(ids, 103, seed)
    return np.minimum(n_cities - 1, (n_cities * r * r * r).astype(np.int64))


def _coords_for(ids: np.ndarray, salt: int, n_cities: int, seed: int):
    clon, clat = city_centers(n_cities, seed)
    city = _city_of(ids, n_cities, seed)
    lon = np.round(clon[city] + (u01(ids, salt) - 0.5) * 0.2, 4)
    lat = np.round(clat[city] + (u01(ids, salt + 1) - 0.5) * 0.2, 4)
    return lon, lat


def _filler_pool(n_words: int, seed: int, n_variants: int = 8) -> list[str]:
    """Deterministic filler paragraphs (no lat/long or WKT patterns) —
    pad pages to Common-Crawl-realistic sizes without per-page cost."""
    pools = []
    for v in range(n_variants):
        idx = h64(np.arange(n_words), 401 + v, seed) % np.uint64(len(_WORDS))
        pools.append(" ".join(_WORDS[int(i)] for i in idx))
    return pools


def page_batch(ids: np.ndarray, seed: int = SEED, n_cities: int = N_CITIES,
               filler_words: int = 0) -> pd.DataFrame:
    """One Arrow batch of synthetic pages for the given row ids."""
    ids = np.asarray(ids, dtype=np.int64)
    pool = _filler_pool(filler_words, seed) if filler_words else None
    n = len(ids)
    lon1, lat1 = _coords_for(ids, 11, n_cities, seed)
    lon2, lat2 = _coords_for(ids, 21, n_cities, seed)
    n_ent = 1 + (h64(ids, 31, seed) % np.uint64(3)).astype(np.int64)  # 1..3
    kind2 = h64(ids, 41, seed) % np.uint64(3)  # 0 latlong, 1 wkt point, 2 wkt polygon
    widx = h64(ids, 51, seed) % np.uint64(len(_WORDS))
    lang = [LANGS[int(v)] for v in h64(ids, 61, seed) % np.uint64(len(LANGS))]

    urls, texts, htmls, ts = [], [], [], []
    base = np.datetime64("2024-01-01T00:00:00")
    offs = (h64(ids, 71, seed) % np.uint64(365 * 24 * 3600)).astype("timedelta64[s]")
    for j in range(n):
        i = int(ids[j])
        url = f"https://site{i % 1000}.example/p/{i}"
        parts = [f"{_WORDS[int(widx[j])]} {_WORDS[(int(widx[j]) + 3) % len(_WORDS)]} page {i}."]
        # entity 1: always a WGS84 lat/long pair (Importer.java:211-214 analog)
        parts.append(f"located at lat {lat1[j]} long {lon1[j]} near the center.")
        if n_ent[j] >= 2:
            if kind2[j] == 0:
                parts.append(f"also lat {lat2[j]} long {lon2[j]} mentioned.")
            elif kind2[j] == 1:
                parts.append(f"geometry POINT ({lon2[j]} {lat2[j]}) registered.")
            else:
                d = 0.01
                x0, y0 = lon2[j], lat2[j]
                parts.append(
                    "boundary POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s)) on file."
                    % (x0, y0, round(x0 + d, 4), y0, round(x0 + d, 4), round(y0 + d, 4),
                       x0, round(y0 + d, 4), x0, y0))
        if n_ent[j] >= 3:
            parts.append(f"branch office lat {round(lat1[j] + 0.003, 4)} long {round(lon1[j] + 0.003, 4)}.")
        if pool is not None:
            parts.append(pool[i % len(pool)])
        text = " ".join(parts)
        urls.append(url)
        texts.append(text)
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
    ts = pd.Series(base + offs)
    return pd.DataFrame({"url": urls, "warc_ts": ts, "html": htmls,
                         "text": texts, "lang": lang})


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def synth_pages(spark, n: int, seed: int = SEED, n_cities: int = N_CITIES,
                partitions: int | None = None, filler_words: int = 0):
    """Distributed deterministic page table (url, warc_ts, html, text, lang).
    ``filler_words`` pads each page with deterministic prose (no geo
    patterns) toward realistic Common-Crawl page sizes."""
    rng = spark.range(0, n, 1, partitions or max(8, spark.sparkContext.defaultParallelism))

    def gen(batches):
        for pdf in batches:
            yield page_batch(pdf["id"].to_numpy(), seed, n_cities, filler_words)

    return rng.mapInPandas(gen, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Gazetteer datasets A/B + links + EAV metadata (FAGI fixture shapes)
# ---------------------------------------------------------------------------

def _square(x0: float, y0: float, d: float) -> str:
    x1, y1 = round(x0 + d, 4), round(y0 + d, 4)
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def gazetteer_pdf(n: int, side: str, seed: int = SEED, n_cities: int = N_CITIES) -> pd.DataFrame:
    """dataset_{a,b}_geometries(subject, geom_wkt). B geometries are
    jittered copies of A's (offset ~1e-3..1e-2 deg) with some kind
    flips (POINT(A)/POLYGON(B) pairs for the shift-family scores) —
    FIXTURES.md §2."""
    ids = np.arange(n, dtype=np.int64)
    lon, lat = _coords_for(ids, 211, n_cities, seed)
    kind_r = h64(ids, 221, seed) % np.uint64(10)  # 0-5 point, 6-7 polygon, 8 line, 9 multipolygon
    if side == "b":
        lon = np.round(lon + (u01(ids, 231, seed) - 0.5) * 0.02, 4)
        lat = np.round(lat + (u01(ids, 232, seed) - 0.5) * 0.02, 4)
        flip = h64(ids, 241, seed) % np.uint64(4) == 0
    else:
        flip = np.zeros(n, dtype=bool)

    subjects, wkts = [], []
    for j in range(n):
        i = int(ids[j])
        if side == "a":
            subjects.append(f"http://linkedgeodata.org/triplify/way{i}")
        else:
            subjects.append(f"http://geoknow.eu/geodata#place_{i}")
        k = int(kind_r[j])
        x0, y0 = float(lon[j]), float(lat[j])
        if flip[j]:
            k = 7 if k <= 5 else 0
        if k <= 5:
            wkts.append(f"POINT ({x0} {y0})")
        elif k <= 7:
            wkts.append(_square(x0, y0, 0.008))
        elif k == 8:
            wkts.append(f"LINESTRING ({x0} {y0}, {round(x0 + 0.005, 4)} {round(y0 + 0.002, 4)}, "
                        f"{round(x0 + 0.01, 4)} {y0})")
        else:
            p1 = f"(({x0} {y0}, {round(x0 + 0.004, 4)} {y0}, {round(x0 + 0.004, 4)} {round(y0 + 0.004, 4)}, {x0} {y0}))"
            p2 = (f"(({round(x0 + 0.006, 4)} {y0}, {round(x0 + 0.009, 4)} {y0}, "
                  f"{round(x0 + 0.009, 4)} {round(y0 + 0.003, 4)}, {round(x0 + 0.006, 4)} {y0}))")
            wkts.append(f"MULTIPOLYGON ({p1}, {p2})")
    return pd.DataFrame({"subject": subjects, "geom_wkt": wkts})


def links_pdf(n_links: int, n_entities: int, seed: int = SEED) -> pd.DataFrame:
    """Golden sameAs pairs: mostly i<->i, every 10th adds an N:1 second
    A-node (links_sample.nt lines 4 & 7 shape), every 17th points at a
    missing subject (inner join must drop it) — FIXTURES.md §4."""
    rows = []
    for i in range(n_links):
        a = f"http://linkedgeodata.org/triplify/way{i}"
        b = f"http://geoknow.eu/geodata#place_{i}"
        rows.append((a, b))
        if i % 10 == 0 and i + 1 < n_entities:
            rows.append((f"http://linkedgeodata.org/triplify/way{i + 1}", b))
        if i % 17 == 0:
            rows.append((f"http://linkedgeodata.org/triplify/way{n_entities + i}", b))
    return pd.DataFrame(rows, columns=["node_a", "node_b"])


_CATEGORIES = ["Museum", "ParkArea", "TrainStation", "CityHall", "Bridge"]


def metadata_pdf(n: int, side: str, seed: int = SEED) -> pd.DataFrame:
    """EAV metadata (subject, predicate, object, lang, dtype) with
    camelCase predicates, 2-hop chains via blank nodes, near-duplicate
    labels across A/B (JW > 0.8), decoy shared labels (TF filter bait),
    and mixed literal kinds (ints / dates / URLs / text) — FIXTURES.md §3."""
    ids = np.arange(n, dtype=np.int64)
    rows = []
    ns = "http://linkedgeodata.org/ontology/" if side == "a" else "http://geoknow.eu/ontology#"
    for j in range(n):
        i = int(ids[j])
        subj = (f"http://linkedgeodata.org/triplify/way{i}" if side == "a"
                else f"http://geoknow.eu/geodata#place_{i}")
        w1 = _WORDS[int(h64([i], 301, seed)[0] % np.uint64(len(_WORDS)))]
        w2 = _WORDS[int(h64([i], 302, seed)[0] % np.uint64(len(_WORDS)))]
        label = f"{w1.capitalize()} {w2.capitalize()} {i}"
        if side == "b":
            label = label + "a"  # near-dup: small edit, JW stays > 0.8
        rows.append((subj, ns + "label", label, "en", None))
        rows.append((subj, ns + "population", str(int(h64([i], 303, seed)[0] % np.uint64(900000)) + 100), None,
                     "http://www.w3.org/2001/XMLSchema#integer"))
        rows.append((subj, ns + "established", f"{(i % 28) + 1:02d}-{(i % 12) + 1:02d}-19{50 + i % 50}", None, None))
        rows.append((subj, ns + "homePage", f"http://example.org/{side}/{i}", None, None))
        cat = _CATEGORIES[i % len(_CATEGORIES)]
        rows.append((subj, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", ns + cat, None, None))
        # decoy: identical label shared across many subjects (TF filter must drop)
        rows.append((subj, ns + "altLabel", "Central Place", "en", None))
        # 2-hop chain: subject -hasAddress-> bnode -streetName-> literal
        bn = f"{side}_bn{i}"
        rows.append((subj, ns + "hasAddress", bn, None, None))
        rows.append((bn, ns + "streetName", f"{w2.capitalize()} Street", "en", None))
    return pd.DataFrame(rows, columns=["subject", "predicate", "object", "lang", "dtype"])


def synth_fixture(spark, n_entities: int = 100, n_links: int = 60, seed: int = SEED):
    """Small FAGI fixture bundle as Spark DataFrames (unit-test scale)."""
    geo_a = spark.createDataFrame(gazetteer_pdf(n_entities, "a", seed))
    geo_b = spark.createDataFrame(gazetteer_pdf(n_entities, "b", seed))
    links = spark.createDataFrame(links_pdf(n_links, n_entities, seed))
    meta_a = spark.createDataFrame(metadata_pdf(n_entities, "a", seed))
    meta_b = spark.createDataFrame(metadata_pdf(n_entities, "b", seed))
    return geo_a, geo_b, links, meta_a, meta_b
