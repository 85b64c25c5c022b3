"""Deterministic synthetic fixtures: registries, labeled pairs, web pages.

The reference ships no data (``/root/reference/.MISSING_LARGE_BLOBS``); FIXTURES.md
defines the shapes generated here. Everything is a pure function of ``(n, seed)`` —
same inputs, byte-identical tables — so tests, the DuckDB driver checks and the
N-vs-4N scaling bench all run on reproducible inputs with no external data.

Tables produced (pyarrow, see FIXTURES.md F1-F3):

- ``registry_spr`` / ``registry_cad``: ``(ADDRESS_ID, STREET_NAME, HOUSE, BUILDING)``
  with the reference's noise classes: raw casing/punctuation/suffix variants that
  normalize identically (exact matches), Soviet-era old street names resolved by the
  rename map, single-edit street typos (fuzzy matches), out-of-threshold corruptions
  and null fields (unmatched), duplicate FULL_ADDRESS rows on the CAD side
  (exercises the last-wins build dict, ``/root/reference/address.py:358``) and hot
  ``(HOUSE_NORM, BUILDING_NORM)`` blocks (the skew path).
- ``labeled_pairs``: ground truth ``(spr_id, cad_id, label, block_key)`` for every
  candidate pair sharing the canonical reference blocking key
  ``SEARCH_KEY = STREET_NORM + "_" + HOUSE_NORM`` (``address.py:267-269``).
- ``pages``: Common-Crawl-style ``(url, warc_ts, html, text, lang)`` wrapping each SPR
  record in deterministic HTML such that ``extract.extract_text(html) == text``
  byte-identically, with embedded machine-parsable address lines
  (``ADDR|<id>|<street>|<house>|<building>``, ``\\N`` marks SQL-style nulls).
"""

from __future__ import annotations

import html as _html
import random
import re as _re
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..functions.normalize import OLD_TO_NEW_MAP, _OLD_NEW_PAIRS, normalize

__all__ = ["synth_registries", "synth_pages", "ADDR_LINE_PREFIX", "format_addr_line",
           "parse_addr_line"]

ADDR_LINE_PREFIX = "ADDR|"
_NULL_MARK = "\\N"

_SYLLABLES = [
    "ԱԲ", "ՈՎ", "ՅԱՆ", "ՄԱՇ", "ՏՈՑ", "ՎԱՐ", "ԴԱՆ", "ՆԱԼ", "ԲԱՆԴ", "ՅԱՆՑ",
    "ԳՐԻԳ", "ՈՐ", "ՍԱՀ", "ՅԱԼ", "ԹԱՂ", "ՄԱՍ", "ՇԻՐ", "ԱԿ", "ՎԱՆ", "ՁՈՐ",
]
_SUFFIX_NOISE = ["", " Փ.", " ՊՈՂ.", " ՓՈՂՈՑ"]
_BUILDINGS = ["", "", "", "", "1", "2", "Ա", "Բ"]  # mostly empty -> hot blocks


def _street_universe(n_streets: int, rng: random.Random) -> List[str]:
    """Distinct canonical street names whose normalized forms are distinct."""
    streets: List[str] = []
    seen = set()
    # Seed with rename-map pairs usable end-to-end: normalize(old) == normalize(new)
    renames = [(o, n) for o, n in _OLD_NEW_PAIRS if normalize(o) == normalize(n)]
    for _, new in renames[: max(2, n_streets // 20)]:
        k = normalize(new)
        if k and k not in seen:
            seen.add(k)
            streets.append(new)
    while len(streets) < n_streets:
        nsyl = rng.randint(4, 7)
        name = "".join(rng.choice(_SYLLABLES) for _ in range(nsyl)).upper()
        if rng.random() < 0.2:
            name = name + " " + "".join(rng.choice(_SYLLABLES) for _ in range(3)).upper()
        k = normalize(name)
        if len(k.replace(" ", "")) >= 8 and k not in seen:
            seen.add(k)
            streets.append(name)
    return streets


def _usable_old_names() -> Dict[str, str]:
    """old_raw -> new_raw for rename-map pairs that survive full normalization."""
    return {o: n for o, n in _OLD_NEW_PAIRS if normalize(o) == normalize(n)}


def _typo(s: str, rng: random.Random) -> str:
    """One deletion or adjacent transposition — stays >= ~88 on ratio for len >= 8."""
    chars = [c for c in s]
    positions = [i for i, c in enumerate(chars) if c not in " ."]
    if not positions:
        return s
    i = rng.choice(positions)
    if rng.random() < 0.5 or i + 1 >= len(chars) or chars[i + 1] in " .":
        del chars[i]
    else:
        chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def _noisy_same(street: str, rng: random.Random) -> str:
    """Raw variant that normalizes identically to ``street``."""
    s = street
    r = rng.random()
    if r < 0.3:
        s = s.lower()
    elif r < 0.5:
        s = "  " + s + " "
    if rng.random() < 0.4:
        s = s + rng.choice(_SUFFIX_NOISE)
    if rng.random() < 0.2:
        s = s.replace(" ", " , ") if " " in s else s + ","
    return s


def synth_registries(
    n_addresses: int = 1000, seed: int = 42
) -> Dict[str, pa.Table]:
    """Generate ``registry_spr``, ``registry_cad`` and ``labeled_pairs``.

    Deterministic in (n_addresses, seed). Every SPR row derives from a canonical
    address (or is unmatched noise); CAD holds exactly one row per canonical address
    plus a ~1.5% tail of duplicate-FULL_ADDRESS rows for exact-class addresses.
    """
    rng = random.Random((seed, n_addresses, "registries").__repr__())
    n_streets = max(12, n_addresses // 40)
    streets = _street_universe(n_streets, rng)
    old_names = _usable_old_names()
    new_to_old = {normalize(n): o for o, n in old_names.items()}

    # canonical addresses; ~12% share (street, house) with the previous address but
    # differ in building -> same SEARCH_KEY block, label=false pairs (precision test)
    canon: List[Tuple[str, str, str]] = []  # (street_raw, house, building)
    used_buildings: Dict[Tuple[str, str], set] = {}
    for k in range(n_addresses):
        if k > 0 and rng.random() < 0.12:
            street, house, _prev = canon[k - 1]
            taken = used_buildings[(street, house)]
            others = [b for b in ("1", "2", "Ա", "Բ", "Գ") if b not in taken]
            if not others:
                street = streets[k % len(streets)]
                house = str(1 + k // len(streets))
                others = ["", "1"]
            building = rng.choice(others)
        else:
            street = streets[k % len(streets)]
            house = str(1 + k // len(streets))
            building = _BUILDINGS[rng.randrange(len(_BUILDINGS))]
        used_buildings.setdefault((street, house), set()).add(building)
        canon.append((street, house, building))

    cad_rows: List[Tuple[str, Optional[str], Optional[str], Optional[str]]] = []
    spr_rows: List[Tuple[str, Optional[str], Optional[str], Optional[str]]] = []
    # spr_idx -> canonical index it truly refers to (or None for noise)
    spr_truth: List[Optional[int]] = []
    cad_truth: List[int] = []
    spr_class: List[str] = []

    for k, (street, house, building) in enumerate(canon):
        cad_id = f"CAD-{k:06d}"
        cad_rows.append((cad_id, _noisy_same(street, rng), house, building))
        cad_truth.append(k)

        r = rng.random()
        spr_id = f"SPR-{k:06d}"
        if r < 0.45:  # exact: identical after normalization
            spr_rows.append((spr_id, _noisy_same(street, rng), house, building))
            spr_truth.append(k)
            spr_class.append("exact")
        elif r < 0.55:  # old->new rename path when available, else exact
            key = normalize(street)
            if key in new_to_old:
                spr_rows.append((spr_id, new_to_old[key], house, building))
            else:
                spr_rows.append((spr_id, street, house, building))
            spr_truth.append(k)
            spr_class.append("exact")
        elif r < 0.80:  # fuzzy: single-edit street typo, house+building intact
            spr_rows.append((spr_id, _typo(street, rng), house, building))
            spr_truth.append(k)
            spr_class.append("fuzzy")
        elif r < 0.90:  # unmatched: street corrupted beyond threshold
            junk = "".join(rng.choice("ՔՖՁՋՉ") for _ in range(10))
            spr_rows.append((spr_id, junk, house, building))
            spr_truth.append(None)
            spr_class.append("unmatched")
        else:  # unmatched: null fields (no candidates / empty street)
            if rng.random() < 0.5:
                spr_rows.append((spr_id, street, None, building))
            else:
                spr_rows.append((spr_id, None, house, building))
            spr_truth.append(None)
            spr_class.append("unmatched")

    # CAD duplicate FULL_ADDRESS tail, only for exact-class addresses (last-wins path)
    n_dup = max(1, n_addresses // 64)
    exact_ks = [k for i, k in enumerate(spr_truth) if k is not None and spr_class[i] == "exact"]
    for j in range(min(n_dup, len(exact_ks))):
        k = exact_ks[j * max(1, len(exact_ks) // max(1, n_dup))]
        street, house, building = canon[k]
        cad_rows.append((f"CAD-D{j:05d}", _noisy_same(street, rng), house, building))
        cad_truth.append(k)

    # labeled pairs at the canonical blocking key
    canon_key = [f"{normalize(s)}_{normalize(h)}" for s, h, _ in canon]
    cad_by_key: Dict[str, List[int]] = {}
    for ci, k in enumerate(cad_truth):
        cad_by_key.setdefault(canon_key[k], []).append(ci)
    pairs: List[Tuple[str, str, bool, str]] = []
    for si, k in enumerate(spr_truth):
        if k is None:
            continue
        key = canon_key[k]
        for ci in cad_by_key.get(key, []):
            pairs.append((spr_rows[si][0], cad_rows[ci][0], cad_truth[ci] == k, key))

    def _tbl(rows):
        cols = list(zip(*rows)) if rows else [[], [], [], []]
        return pa.table(
            {
                "ADDRESS_ID": pa.array(cols[0], pa.string()),
                "STREET_NAME": pa.array(cols[1], pa.string()),
                "HOUSE": pa.array(cols[2], pa.string()),
                "BUILDING": pa.array(cols[3], pa.string()),
            }
        )

    pair_cols = list(zip(*pairs)) if pairs else [[], [], [], []]
    labeled = pa.table(
        {
            "spr_id": pa.array(pair_cols[0], pa.string()),
            "cad_id": pa.array(pair_cols[1], pa.string()),
            "label": pa.array(pair_cols[2], pa.bool_()),
            "block_key": pa.array(pair_cols[3], pa.string()),
        }
    )
    return {
        "registry_spr": _tbl(spr_rows),
        "registry_cad": _tbl(cad_rows),
        "labeled_pairs": labeled,
    }


def format_addr_line(addr_id, street, house, building) -> str:
    f = lambda v: _NULL_MARK if v is None else str(v)
    return f"{ADDR_LINE_PREFIX}{f(addr_id)}|{f(street)}|{f(house)}|{f(building)}"


def parse_addr_line(line: str) -> Optional[Tuple[str, Optional[str], Optional[str], Optional[str]]]:
    """Inverse of :func:`format_addr_line`; None if the line is not an address line."""
    if not line.startswith(ADDR_LINE_PREFIX):
        return None
    parts = line.split("|")
    if len(parts) != 5:
        return None
    vals = [None if p == _NULL_MARK else p for p in parts[1:]]
    return (vals[0] or "", vals[1], vals[2], vals[3])


_FILLER_WORDS = [
    "municipal", "registry", "parcel", "record", "update", "notice", "district",
    "survey", "armenia", "gyumri", "census", "cadastre", "population", "street",
]


def _page_text(addr_row, rng: random.Random) -> str:
    lines = [f"Registry notice {rng.randrange(10**6)}"]
    for _ in range(rng.randint(1, 4)):
        lines.append(" ".join(rng.choice(_FILLER_WORDS) for _ in range(rng.randint(4, 10))))
    if addr_row is not None:
        lines.insert(rng.randint(1, len(lines)), format_addr_line(*addr_row))
    # canonical text form == extractor output form: per-line hspace collapsed + stripped
    lines = [_re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in lines]
    return "\n".join(ln for ln in lines if ln)


def _page_html(text: str) -> bytes:
    body = "\n".join(f"<p>{_html.escape(line)}</p>" for line in text.split("\n"))
    doc = (
        "<html><head><title>registry</title>"
        "<script>var x = 1 < 2;</script><style>p { color: #000; }</style></head>"
        f"<body>\n{body}\n<!-- crawl artifact --></body></html>"
    )
    return doc.encode("utf-8")


def synth_pages(spr: pa.Table, seed: int = 42, noise_fraction: float = 0.1) -> pa.Table:
    """Common-Crawl-style pages embedding each SPR record, plus address-free noise.

    ``extract.extract_text(html) == text`` holds byte-identically for every row (the
    per-url invariant); tested in tests/test_extract.py.
    """
    rng = random.Random((seed, spr.num_rows, "pages").__repr__())
    t0 = datetime(2024, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []

    def _emit(url_key: str, addr_row):
        text = _page_text(addr_row, rng)
        urls.append(f"https://pages.example.am/{url_key}")
        tss.append(t0 + timedelta(seconds=rng.randrange(365 * 24 * 3600)))
        htmls.append(_page_html(text))
        texts.append(text)
        langs.append("hy" if rng.random() < 0.7 else "en")

    rows = spr.to_pylist()
    for row in rows:
        _emit(row["ADDRESS_ID"].lower(),
              (row["ADDRESS_ID"], row["STREET_NAME"], row["HOUSE"], row["BUILDING"]))
    for j in range(int(len(rows) * noise_fraction)):
        _emit(f"noise-{j:06d}", None)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def synth_crawl_urls(n: int, seed: int = 42, dup_fraction: float = 0.35) -> pa.Table:
    """Crawl-log URL fixture: ``(page_id, url, warc_ts)`` with re-crawl dups.

    ~``dup_fraction`` of rows are RE-CRAWLS of an earlier row's canonical URL
    under a different surface form (case, ``www.``, default port, tracking
    params, fragment, trailing slash) — every decoration inverts exactly under
    ``functions.urls.canonicalize_url``, so canonical-URL dedup finds real
    groups with known ground truth. Pure function of ``(n, seed)``.
    """
    from ..functions import urls as _urls

    rng = random.Random((seed, n, "crawl_urls").__repr__())
    t0 = datetime(2024, 3, 1)
    hosts = [f"site{h:03d}.example.{tld}"
             for h in range(max(4, n // 40)) for tld in ("com",)]
    real_params = ["q", "page", "id", "ref", "lang"]
    track_params = ["utm_source", "utm_medium", "utm_campaign", "fbclid",
                    "gclid", "msclkid"]

    def _canonical() -> str:
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        segs = rng.randrange(0, 4)
        path = "".join(f"/{rng.choice(['a','b','dir','item','p'])}{rng.randrange(100)}"
                       for _ in range(segs))
        q = ""
        if rng.random() < 0.4:
            parts = [f"{rng.choice(real_params)}={rng.randrange(1000)}"
                     for _ in range(rng.randrange(1, 3))]
            q = "?" + "&".join(parts)
        return f"{scheme}://{host}{path}{q}"

    def _decorate(canon: str) -> str:
        scheme, rest = canon.split("://", 1)
        slash = rest.find("/")
        qmark = rest.find("?")
        cut = min(x for x in (slash, qmark, len(rest)) if x >= 0)
        host, tail = rest[:cut], rest[cut:]
        if rng.random() < 0.5:
            scheme = scheme.upper()
        if rng.random() < 0.5:
            host = "www." + host
        if rng.random() < 0.4:
            host = host.upper()
        if rng.random() < 0.4:
            host += rng.choice([":80", ":443"])
        path, _, query = tail.partition("?")
        if path and not path.endswith("/") and rng.random() < 0.5:
            path += "/"
        track = [f"{rng.choice(track_params)}={rng.randrange(1000)}"
                 for _ in range(rng.randrange(0, 3))]
        if track and query:
            mix = track + [query]
            rng.shuffle(mix)
            query = "&".join(mix) if mix[0] != query else query + "&" + "&".join(track)
        elif track:
            query = "&".join(track)
        frag = f"#sec{rng.randrange(10)}" if rng.random() < 0.3 else ""
        q = f"?{query}" if query else ""
        return f"{scheme}://{host}{path}{q}{frag}"

    canon_pool: List[str] = []
    urls, tss = [], []
    for i in range(n):
        if canon_pool and rng.random() < dup_fraction:
            canon = rng.choice(canon_pool)
        else:
            canon = _canonical()
            canon_pool.append(canon)
        u = _decorate(canon) if rng.random() < 0.7 else canon
        # the decoration contract: every surface form canonicalizes back
        assert _urls.canonicalize_url(u) == canon, (u, canon)
        urls.append(u)
        tss.append(t0 + timedelta(seconds=rng.randrange(90 * 24 * 3600)))

    return pa.table({
        "page_id": pa.array(range(n), pa.int64()),
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
    })


def synth_web_graph(n_nodes: int, seed: int = 42, mean_degree: int = 4) -> pa.Table:
    """Deterministic directed web graph ``(src, dst)`` for link analysis.

    Power-law-flavored: preferential attachment toward low node ids (hubs),
    EVERY node has >=1 outlink (no dangling mass — keeps PageRank semantics
    identical between the engine and its unrolled-SQL oracle), self-loops
    excluded, duplicate edges collapsed. Pure function of ``(n_nodes, seed)``.
    """
    rng = random.Random((seed, n_nodes, "web_graph").__repr__())
    edges = set()
    for src in range(n_nodes):
        k = 1 + min(rng.randrange(mean_degree), rng.randrange(mean_degree))
        for _ in range(k):
            # quadratic skew toward low ids approximates a hub distribution
            dst = min(rng.randrange(n_nodes), rng.randrange(n_nodes))
            if dst == src:
                dst = (dst + 1) % n_nodes
            edges.add((src, dst))
    srcs, dsts = zip(*sorted(edges))
    return pa.table({"src": pa.array(srcs, pa.int64()),
                     "dst": pa.array(dsts, pa.int64())})


def synth_linked_pages(n_pages: int, seed: int = 42) -> pa.Table:
    """Deterministic crawl pages ``(url, warc_ts, html)`` whose HTML carries
    ``<a href>`` anchors — the input for the link-graph family
    (``functions/links.py``, ``stages/webgraph.py``).

    Link forms are mixed on purpose to exercise every resolution rule:
    lowercase-absolute, absolute with ``www.`` + tracking params (collapses
    to the plain target under canonicalization), protocol-relative,
    root-relative (same-host), ``&amp;``-escaped query, single-quoted hrefs,
    and out-of-scope junk (``mailto:``, ``javascript:``, bare fragments,
    dot-relative paths) that the extractor must drop. Pure function of
    ``(n_pages, seed)``.
    """
    rng = random.Random((seed, n_pages, "linked_pages").__repr__())
    n_hosts = max(5, n_pages // 50)
    t0 = datetime(2024, 1, 1)

    def _url(i: int) -> str:
        return f"https://w{i % n_hosts}.example.org/p{i:06d}"

    urls, tss, htmls = [], [], []
    for i in range(n_pages):
        anchors = []
        for _ in range(rng.randrange(6)):
            j = rng.randrange(n_pages)
            form = rng.randrange(8)
            if form == 0:
                href = _url(j)
            elif form == 1:  # www. + tracking param -> canonicalizes to _url(j)
                href = (f"https://www.w{j % n_hosts}.example.org/p{j:06d}"
                        f"?utm_source=syn")
            elif form == 2:  # protocol-relative
                href = f"//w{j % n_hosts}.example.org/p{j:06d}"
            elif form == 3:  # root-relative: same host as page i
                href = f"/p{j:06d}"
            elif form == 4:  # &amp;-escaped query (kept distinct from _url(j))
                href = _url(j) + "?a=1&amp;b=2"
            elif form == 5:  # trailing slash -> canonicalizes to _url(j)
                href = _url(j) + "/"
            else:  # out of scope: must be dropped by the extractor
                href = rng.choice(
                    ["mailto:x@example.org", "javascript:void(0)", "#top",
                     "rel/path.html", ""])
            quote = "'" if rng.random() < 0.25 else '"'
            # anchor text: index-derived (no extra rng draws, so the edge
            # set is byte-stable vs earlier generator versions); multi-word
            # and empty texts exercise the anchor_texts trim/drop contract
            txt = ("" if j % 11 == 3
                   else f"link to page {j}" if j % 3 == 0
                   else f" l{j} ")
            anchors.append(f"<a href={quote}{href}{quote}>{txt}</a>")

        # corpus-realistic body content (index-derived, NO extra rng draws —
        # the edge set stays byte-stable): paragraphs that survive C4
        # cleaning, a per-host boilerplate footer (df >= 2), a "Menu" stub
        # (C4 word floor), periodic lorem-ipsum page kills, and periodic
        # verbatim-duplicate bodies (the exact-dedup class)
        def _paras(j: int) -> list:
            return [f"Sentence {k} of page {j} talks about "
                    f"topic {j % 7} in detail today."
                    for k in range(1 + j % 3)]

        paras = _paras(i - 1) if (i % 19 == 3 and i > 0) else _paras(i)
        extra = [f"<p>{p}</p>" for p in paras]
        extra.append("<p>Menu</p>")
        extra.append(f"<p>All rights reserved by host w{i % n_hosts} "
                     f"example network operators.</p>")
        if i % 23 == 11:
            # page-unique lorem text: an identical lorem line across pages
            # would be removed by the BOILERPLATE stage (df >= 2) before the
            # C4 kill rule ever saw it
            extra.append(f"<p>Lorem ipsum dolor sit amet consectetur "
                         f"adipiscing elit page {i} do.</p>")
        body = (f"<p>page {i}</p>\n" + "\n".join(anchors)
                + "\n" + "\n".join(extra))
        urls.append(_url(i))
        tss.append(t0 + timedelta(seconds=rng.randrange(365 * 24 * 3600)))
        # ~8% of pages opt out of indexing (index-derived, not rng): the
        # noindex_filter op must drop exactly these
        robots = ('<meta name="robots" content="noindex,nofollow">'
                  if i % 13 == 7 else "")
        htmls.append(
            f"<html><head><title>p{i}</title>{robots}</head>"
            f"<body>\n{body}\n</body></html>".encode())
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })
