"""M0 — deterministic synthetic crawl corpus (seed 42, no external data).

Generates the canonical input table ``pages`` exactly per
BASELINE.json ``input_hint`` — (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string) — plus the dimension tables seeds/hosts/
excluded_hosts/robots/prompts (FIXTURES.md §A).

Design points:
- Host sizes are Zipf(s=1.2)-distributed so the biggest host is heavily
  skewed — this deliberately stresses host salting in the scheduler.
- ``html`` embeds product fields, a probability meta tag and ``<a href>``
  out-links (the crawl graph); hrefs use four syntactic variants
  (https://, http://, www.-prefixed schemeless, bare schemeless) to
  exercise URL canonicalization (reference serp.py:50-74 quirks).
- ``text`` is produced by the same ``html_to_text`` kernel the engine's
  extract stage uses, so the byte-identical-text invariant is checked
  end-to-end (BASELINE.json input_hint).
- ~10% of pages carry no product fields (null extracts, reference
  zyte.py:119-156) and ~5% omit the probability tag (reference quirk:
  fields still extracted, probability stays null, row NOT flagged —
  orchestrator.py:208-235 assigns fields before extract_probability
  raises on float(None)).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

SEED = 42
# bump whenever any generator's OUTPUT changes — cached corpus dirs
# (registry._crawl_corpus, bench._bench_corpus) compare their written
# `_datagen_rev` marker against this and regenerate on mismatch, so a
# datagen edit can never silently poison results through a stale cache
DATAGEN_REV = 3
BASE_TS = datetime(2025, 5, 23, 0, 0, 0, tzinfo=timezone.utc)

TERMS = ["sildenafil", "kuehlschrank", "vitamin", "aspirin"]
TLDS = ["ch", "com", "it", "de", "fr"]
LANGS = ["de", "fr", "it", "en"]
_WORDS = [
    "premium", "organic", "certified", "generic", "express", "discount",
    "wholesale", "imported", "refurbished", "limited", "seasonal", "classic",
]

_TAG_RE = re.compile(r"<[^>]+>")
_HREF_RE = re.compile(r'<a\s+href="([^"]+)"')
_TITLE_RE = re.compile(r"<title>([^<]*)</title>")
_PRICE_RE = re.compile(r'<span class="price">([^<]*)</span>')
_DESC_RE = re.compile(r'<p class="description">([^<]*)</p>')
_IMG_MAIN_RE = re.compile(r'<img class="main" src="([^"]*)"')
_IMG_RE = re.compile(r'<img(?! class="main") src="([^"]*)"')
_PROB_RE = re.compile(r'<meta name="product:probability" content="([^"]*)"')


def html_to_text(html: str) -> str:
    """Canonical HTML→text kernel: strip tags, trim, drop empty lines.

    This single definition is shared by the corpus generator (writes the
    golden ``text`` column) and the extract stage, enforcing the
    byte-identical-text-per-url invariant by construction and verified by
    tests comparing kernel(html) == stored text.
    """
    raw = _TAG_RE.sub("\n", html)
    lines = [ln.strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_fields(html: str) -> dict:
    """Pure-python single-doc extraction (used by kernels + trace oracle).

    Mirrors the reference's Zyte field extraction semantics
    (zyte.py:119-194): null-safe scalar gets, main image first then extra
    images, probability as float-or-None.
    """
    m = _TITLE_RE.search(html)
    name = m.group(1) if m and m.group(1) else None
    m = _PRICE_RE.search(html)
    price = m.group(1) if m and m.group(1) else None
    m = _DESC_RE.search(html)
    desc = m.group(1) if m and m.group(1) else None
    images = [u for u in _IMG_MAIN_RE.findall(html) if u]
    images += [u for u in _IMG_RE.findall(html) if u]
    m = _PROB_RE.search(html)
    prob = float(m.group(1)) if m else None
    return {
        "product_name": name,
        "product_price": price,
        "product_description": desc,
        "product_images": images,
        "probability": prob,
    }


def extract_links(html: str) -> list[str]:
    """All <a href> values in document order (raw, un-canonicalized)."""
    return _HREF_RE.findall(html)


def _host_of(i: int, n_hosts: int) -> str:
    return f"shop{i % n_hosts}.{TLDS[i % len(TLDS)]}"


def generate_pages(n_pages: int, n_hosts: int | None = None) -> pd.DataFrame:
    """Deterministic page corpus with Zipf host skew and an embedded link graph."""
    n_hosts = n_hosts or max(8, n_pages // 50)
    rng = np.random.RandomState(SEED)
    # Zipf host assignment: rank r gets mass ~ r^-1.2
    zipf_draw = rng.zipf(1.2, size=n_pages)
    host_idx = (zipf_draw - 1) % n_hosts

    rows = []
    for pid in range(n_pages):
        hi = int(host_idx[pid])
        host = _host_of(hi, n_hosts)
        private = pid % 33 == 0  # ~3% robots-disallowed paths
        path = f"/private/p{pid:06d}" if private else f"/p{pid:06d}"
        url = f"https://{host}{path}"
        lang = LANGS[hi % len(LANGS)]
        ts = BASE_TS + timedelta(minutes=pid % 10080)

        has_product = pid % 10 != 3  # ~10% no product fields
        has_prob = pid % 20 != 7  # ~5% omit probability meta
        term = TERMS[pid % len(TERMS)]
        # ~20% of pages carry DERIVED terms ("{term}-forte" / "{term}-plus")
        # — the corpus-side stand-in for DataForSEO keyword suggestions
        # (reference enrich.py:259-303): enrichment discovers these titles
        if pid % 5 == 4:
            term = f"{term}-forte"
        elif pid % 7 == 6:
            term = f"{term}-plus"

        # out-links: 7 distinct targets + 1 duplicate of the first (~12% dup)
        targets = [(pid * 31 + k * 101 + 7) % n_pages for k in range(7)]
        targets.append(targets[0])
        hrefs = []
        for k, t in enumerate(targets):
            th = _host_of(int(host_idx[t]), n_hosts)
            tprivate = t % 33 == 0
            tpath = f"/private/p{t:06d}" if tprivate else f"/p{t:06d}"
            # four syntactic variants, all canonicalizing to https://{th}{tpath}
            v = k % 4
            if v == 0:
                hrefs.append(f"https://{th}{tpath}")
            elif v == 1:
                hrefs.append(f"www.{th}{tpath}")
            elif v == 2:
                hrefs.append(f"http://{th}{tpath}")
            else:
                hrefs.append(f"{th}{tpath}")

        parts = ["<html><head><meta charset=\"utf-8\">"]
        if has_product:
            name = f"{term} product {pid}"
            parts.append(f"<title>{name}</title>")
        else:
            parts.append("<title></title>")
        if has_prob:
            prob = ((pid * 37) % 100) / 100.0
            parts.append(
                f'<meta name="product:probability" content="{prob:.2f}">'
            )
        parts.append("</head><body>")
        if has_product:
            price = f"{(pid % 9000) / 100 + 5:.2f} CHF"
            desc = (
                f"Buy {term} now at {host}. Item {pid} ships from warehouse "
                f"{pid % 17} with quality grade {pid % 5}."
            )
            parts.append(f"<h1>{term} product {pid}</h1>")
            parts.append(f'<span class="price">{price}</span>')
            parts.append(f'<img class="main" src="https://{host}/img/{pid}_main.jpg">')
            for j in range(pid % 3):
                parts.append(f'<img src="https://{host}/img/{pid}_{j}.jpg">')
            parts.append(f'<p class="description">{desc}</p>')
        # body content: Common-Crawl pages are KBs of prose, not 1-line
        # stubs — extraction cost must be realistic for the bench
        parts.append('<div class="content">')
        for j in range(12):
            w = _WORDS[(pid * 7 + j * 3) % len(_WORDS)]
            w2 = _WORDS[(pid + j * 11 + 5) % len(_WORDS)]
            parts.append(
                f"<p>Section {j}: {w} {w2} review for item {pid} on {host}; "
                f"rating {(pid + j) % 5} of 5, stock {(pid * j) % 97}, "
                f"delivered in {(pid + j * 13) % 14} days by carrier {w2}{j}.</p>"
            )
        parts.append("</div>")
        parts.append('<ul class="links">')
        for k, href in enumerate(hrefs):
            parts.append(f'<li><a href="{href}">link {k}</a></li>')
        parts.append("</ul></body></html>")
        html = "\n".join(parts)

        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html.encode("utf-8"),
                "text": html_to_text(html),
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def generate_seeds() -> pd.DataFrame:
    """Seed/search requests (reference orchestrator.py:389-399 analog)."""
    rows = []
    for i, term in enumerate(TERMS):
        rows.append(
            {
                "search_term": term,
                "search_term_type": "initial",
                "num_results": 20,
                "language_code": "de",
                "location_code": "ch",
                "priority": i,
            }
        )
    return pd.DataFrame(rows)


def generate_hosts(n_hosts: int) -> pd.DataFrame:
    """Marketplace dim (reference base/base.py:42-52). host_idx preserves
    first-match-in-list-order priority (serp.py:184-189); shop0 domain
    appears in two marketplaces to exercise that rule."""
    rows = [
        {"name": "AlphaMarket", "domains": [_host_of(0, n_hosts), _host_of(1, n_hosts)], "host_idx": 0},
        {"name": "BetaBazaar", "domains": [_host_of(0, n_hosts), _host_of(2, n_hosts)], "host_idx": 1},
        {"name": "GammaGoods", "domains": [_host_of(3, n_hosts), _host_of(4, n_hosts)], "host_idx": 2},
    ]
    return pd.DataFrame(rows)


def generate_excluded_hosts(n_hosts: int) -> pd.DataFrame:
    """Exclusion dim (reference serp.py:244-246) — hard-drop anti-join."""
    return pd.DataFrame(
        [{"name": "BlockedShop", "domains": [_host_of(5, n_hosts)]}]
    )


def generate_robots(n_hosts: int) -> pd.DataFrame:
    """Per-host crawl rules: every 7th host disallows /private/ (FIXTURES A5)."""
    rows = []
    for i in range(n_hosts):
        host = _host_of(i, n_hosts)
        rows.append(
            {
                "host": host,
                "disallow_prefixes": ["/private/"] if i % 7 == 0 else [],
                "crawl_delay_ms": int(100 + (i % 5) * 50),
            }
        )
    return pd.DataFrame(rows)


def generate_robots_txt(n_hosts: int) -> pd.DataFrame:
    """RAW robots.txt text per host — the bytes a real crawler fetches
    before the politeness stage parses them. Renders EXACTLY the rules
    of :func:`generate_robots` (the structured dim) for this engine's
    user-agent, wrapped in the noise a correct RFC 9309 parser must
    survive: comments, blank lines, mixed-case field names, decoy
    groups for other agents, stacked user-agent lines, empty
    (allow-all) Disallow lines, and Crawl-delay given in fractional
    SECONDS. Hosts with i % 13 == 3 carry the real rules in a
    ``User-agent: fraudcrawler``-specific group and DECOY rules in the
    ``*`` group — the parser must prefer the named group.
    """
    rows = []
    for i in range(n_hosts):
        host = _host_of(i, n_hosts)
        disallow = ["/private/"] if i % 7 == 0 else []
        delay_s = (100 + (i % 5) * 50) / 1000.0
        named = i % 13 == 3

        def group(agents: list[str], prefixes: list[str],
                  delay: float | None, mixed: bool) -> list[str]:
            ua = "USER-AGENT" if mixed else "User-agent"
            dis = "DisAllow" if mixed else "Disallow"
            out = [f"{ua}: {a}" for a in agents]
            if not prefixes:
                out.append(f"{dis}:")  # empty = allow all
            out += [f"{dis}: {p}" for p in prefixes]
            if delay is not None:
                out.append(f"Crawl-delay: {delay:g}")
            return out

        lines = [f"# robots for {host}", ""]
        if i % 3 == 0:
            # decoy group BEFORE the relevant one — must be ignored
            lines += group(["BadBot"], ["/"], 9.9, mixed=False) + [""]
        if named:
            # the '*' group carries DECOYS; the named group is the truth
            lines += group(["*"], ["/decoy/"], 8.8, mixed=False) + [""]
            lines += group(
                ["fraudcrawler", "otherbot"], disallow, delay_s,
                mixed=i % 2 == 0,
            )
        else:
            lines += group(["*"], disallow, delay_s, mixed=i % 4 == 1)
        if i % 5 == 2:
            lines += ["", "Sitemap: https://" + host + "/sitemap.xml",
                      "# trailing comment"]
        rows.append({"host": host, "robots_txt": "\n".join(lines) + "\n"})
    return pd.DataFrame(rows)


def generate_sitemaps(n_hosts: int, n_pages: int) -> pd.DataFrame:
    """RAW sitemap.xml text per host — the other half of the discovery
    surface a real crawler consumes next to robots.txt. Every 2nd host
    publishes a sitemap listing up to 5 of ITS OWN archived pages (the
    same Zipf host assignment generate_pages uses, recomputed here, so
    the locs genuinely resolve in the archive) plus one url the crawl
    has NOT archived (`/fresh/…`) — so sitemap-driven discovery
    genuinely adds frontier candidates and recrawl_schedule sees all
    three action classes (odd pids carry post-snapshot lastmods →
    recrawl; even pids 2024 → fresh; /fresh/ → discover). Entries carry
    lastmod dates and priorities; whitespace/indentation varies by host
    parity and one decoy comment block must be ignored."""
    # the SAME deterministic Zipf host draw as generate_pages — keep in
    # lockstep or sitemap locs stop matching archived urls
    rng = np.random.RandomState(SEED)
    host_idx = (rng.zipf(1.2, size=n_pages) - 1) % n_hosts
    by_host: dict[int, list[int]] = {}
    for p, hi in enumerate(host_idx):
        by_host.setdefault(int(hi), []).append(p)
    rows = []
    for i in range(0, n_hosts, 2):
        host = _host_of(i, n_hosts)
        ents = []
        pids = by_host.get(i, [])[:5]
        for p in pids:
            private = p % 33 == 0
            path = f"/private/p{p:06d}" if private else f"/p{p:06d}"
            # odd pids advertise a lastmod AFTER the archived snapshot
            # window (warc_ts = BASE_TS 2025-05-23 + ≤7 days) so the
            # recrawl_schedule op sees genuinely stale archived pages;
            # even pids stay 2024 (archived copy still fresh)
            if p % 2 == 1:
                lastmod = f"2025-{(p % 3) + 6:02d}-{(p % 28) + 1:02d}"
            else:
                lastmod = f"2024-{(p % 12) + 1:02d}-{(p % 28) + 1:02d}"
            prio = ((p % 10) + 1) / 10.0
            pad = "  " if i % 4 == 0 else "    "
            ents.append(
                f"{pad}<url>\n{pad}{pad}<loc>https://{host}{path}</loc>\n"
                f"{pad}{pad}<lastmod>{lastmod}</lastmod>\n"
                f"{pad}{pad}<priority>{prio:.1f}</priority>\n{pad}</url>"
            )
        # one never-archived url per sitemap host — real discovery signal
        ents.append(
            f"  <url>\n    <loc>https://{host}/fresh/f{i:04d}</loc>\n"
            f"    <lastmod>2024-06-{(i % 28) + 1:02d}</lastmod>\n"
            f"    <priority>0.9</priority>\n  </url>"
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            "<!-- generated sitemap -->\n"
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(ents)
            + "\n</urlset>\n"
        )
        rows.append({"host": host, "sitemap_xml": xml})
    return pd.DataFrame(rows)


def generate_prompts() -> pd.DataFrame:
    """Classification prompt dim (reference base/base.py:107-114)."""
    return pd.DataFrame(
        [
            {
                "name": "relevance",
                "context": "Is this product relevant to pharmaceutical fraud monitoring?",
                "system_prompt": "Answer with a single digit.",
                "allowed_classes": [0, 1],
                "default_if_missing": -1,
            },
            {
                "name": "seriousness",
                "context": "How serious is the offer?",
                "system_prompt": "Answer with a single digit.",
                "allowed_classes": [0, 1, 2],
                "default_if_missing": -1,
            },
        ]
    )


def generate_images(n_images: int = 64) -> pd.DataFrame:
    """REAL 24-bit BMP images (functions/bmp.py encoder — genuine files any
    viewer opens), fully arithmetic so the decode kernels carry an ANALYTIC
    oracle: pixel (x, y) of image k is
      r = (7x + 13y + k)  % 256
      g = (3x + 5y + 2k)  % 256
      b = (11x + y + 3k)  % 256
    with w = 8 + 5k % 25 (≤32), h = 6 + 3k % 19 (≤24). The DuckDB twin
    regenerates the same grid from the (width, height) metadata columns and
    must agree with what Spark recovers FROM THE BYTES ALONE — the metadata
    is never read by the Spark kernels. Independent of the page RNG streams,
    so adding this table changes no other table's bytes."""
    from fraudcrawler_spark.functions.bmp import bmp_encode

    rows = []
    for k in range(n_images):
        w = 8 + (k * 5) % 25
        h = 6 + (k * 3) % 19
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [
                (7 * xx + 13 * yy + k) % 256,
                (3 * xx + 5 * yy + 2 * k) % 256,
                (11 * xx + yy + 3 * k) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        rows.append(
            {
                "img_id": k,
                "url": f"https://img-host-{k % 7}.ch/img/{k:04d}.bmp",
                "width": w,
                "height": h,
                "img": bmp_encode(px),
            }
        )
    return pd.DataFrame(rows)


def generate_audio(n_clips: int = 64) -> pd.DataFrame:
    """REAL mono PCM16 WAV clips (functions/wav.py encoder — genuine files
    any player opens), fully arithmetic so the decode kernels carry an
    ANALYTIC oracle: sample i of clip k is
      v = ((31*i + 17*k) * 73) % 4001 - 2000
    with sample_rate 8000 and n = 800 + (523*k) % 3201 samples (0.1-0.5 s).
    The DuckDB twin regenerates the same sample stream from the
    (n_samples) metadata column and must agree with what Spark recovers
    FROM THE BYTES ALONE — the metadata is never read by the Spark
    kernels. Independent of the page RNG streams, so adding this table
    changes no other table's bytes."""
    from fraudcrawler_spark.functions.wav import wav_encode

    rows = []
    for k in range(n_clips):
        n = 800 + (523 * k) % 3201
        i = np.arange(n, dtype=np.int64)
        v = ((31 * i + 17 * k) * 73) % 4001 - 2000
        rows.append(
            {
                "clip_id": k,
                "url": f"https://media-host-{k % 5}.ch/audio/{k:04d}.wav",
                "sample_rate": 8000,
                "n_samples": n,
                "wav": wav_encode(v.astype(np.int16), 8000),
            }
        )
    return pd.DataFrame(rows)


def generate_videos(n_videos: int = 24) -> pd.DataFrame:
    """REAL uncompressed 24-bit DIB AVI clips (functions/avi.py encoder —
    genuine files any player opens), fully arithmetic so the decode
    kernels carry an ANALYTIC oracle: channels of pixel (x, y) in frame t
    of video k are
      r = (7x + 13y + 5t + k)   % 256
      g = (3x + 5y + 11t + 2k)  % 256
      b = (11x + y + 7t + 3k)   % 256
    at 16×12, 10 fps, with n_frames = 3 + (5k) % 6. The DuckDB twin
    regenerates the same pixel grid from the (width, height, n_frames)
    metadata columns and must agree with what Spark recovers FROM THE
    BYTES ALONE — the metadata is never read by the Spark kernels.
    Independent of the page RNG streams, so adding this table changes no
    other table's bytes."""
    from fraudcrawler_spark.functions.avi import avi_encode

    w, h = 16, 12
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    rows = []
    for k in range(n_videos):
        frames = []
        for t in range(3 + (5 * k) % 6):
            px = np.concatenate(
                [
                    (7 * x + 13 * y + 5 * t + k) % 256,
                    (3 * x + 5 * y + 11 * t + 2 * k) % 256,
                    (11 * x + y + 7 * t + 3 * k) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            frames.append(px)
        rows.append(
            {
                "video_id": k,
                "url": f"https://media-host-{k % 5}.ch/video/{k:04d}.avi",
                "width": w,
                "height": h,
                "n_frames": len(frames),
                "fps": 10,
                "avi": avi_encode(frames, 10),
            }
        )
    return pd.DataFrame(rows)


def generate_raw_pages(n_docs: int = 600) -> pd.DataFrame:
    """Byte payloads in the web's real encoding mix for the charset
    kernel (functions/charset.py): doc k is stored as
      k % 3 == 0 → clean UTF-8
      k % 3 == 1 → windows-1252 (undecodable as UTF-8: ü/é/– bytes)
      k % 3 == 2 → mojibake (UTF-8 mis-decoded as cp1252, re-encoded —
                   the classic ``Ã¼`` corruption)
    ``enc``/``text_src`` are ground-truth metadata the Spark kernel never
    reads (it sniffs the bytes); the DuckDB twin reads ONLY the metadata.
    Every doc carries non-ASCII (ü é ä ß à è – €, all cp1252-safe and
    with cp1252-defined UTF-8 continuation bytes) so detection is
    unambiguous at every row."""
    rows = []
    accents = ["Zürich", "Genève", "Käse", "Crème", "Straße", "à-la-carte"]
    for k in range(n_docs):
        text = (
            f"{accents[k % len(accents)]} Bericht {k}: Qualität geprüft – "
            f"Preis {((k * 37) % 9000) / 100 + 5:.2f} € für Artikel {k % 97}."
        )
        enc = ("utf8", "cp1252", "mojibake")[k % 3]
        if enc == "utf8":
            data = text.encode("utf-8")
        elif enc == "cp1252":
            data = text.encode("cp1252")
        else:
            data = text.encode("utf-8").decode("cp1252").encode("utf-8")
        rows.append({"doc_id": k, "enc": enc, "text_src": text, "data": data})
    return pd.DataFrame(rows)


def generate_redirects(n_pages: int, n_hosts: int | None = None) -> pd.DataFrame:
    """HTTP redirect edges (src_url, location, status) — the 3xx graph a
    crawler must resolve before frontier insertion. Deterministic shape:

    * every 8th pid (pid % 8 == 5) roots a CHAIN of ``1 + pid % 5`` hops
      ``/r{pid}h0 → /r{pid}h1 → … → /p{pid}`` ending at that pid's real
      page url, status alternating 301/302 by pid parity;
    * hops where ``(pid + j) % 4 == 0`` emit a RELATIVE location
      (path-only) that must be resolved against the source's host;
    * every 199th pid (pid % 199 == 7) adds a 3-node CYCLE
      ``/loopA → /loopB → /loopC → /loopA`` — the pathological case the
      resolver must bound instead of following forever.

    The map is functional (one location per src), matching real crawl
    frontiers where the latest observed redirect wins."""
    n_hosts = n_hosts or max(8, n_pages // 50)
    rows = []
    for pid in range(n_pages):
        host = _host_of(pid % n_hosts, n_hosts)
        if pid % 8 == 5:
            hops = 1 + pid % 5
            final_private = pid % 33 == 0
            final = (
                f"https://{host}/private/p{pid:06d}"
                if final_private
                else f"https://{host}/p{pid:06d}"
            )
            for j in range(hops):
                src = f"https://{host}/r{pid:06d}h{j}"
                if j + 1 < hops:
                    nxt_path = f"/r{pid:06d}h{j + 1}"
                    nxt = f"https://{host}{nxt_path}"
                else:
                    nxt_path = final.split(host, 1)[1]
                    nxt = final
                loc = nxt_path if (pid + j) % 4 == 0 else nxt
                rows.append(
                    {
                        "src_url": src,
                        "location": loc,
                        "status": 301 if pid % 2 == 0 else 302,
                    }
                )
        if pid % 199 == 7:
            for a, b in (("A", "B"), ("B", "C"), ("C", "A")):
                rows.append(
                    {
                        "src_url": f"https://{host}/loop{pid:06d}{a}",
                        "location": f"https://{host}/loop{pid:06d}{b}",
                        "status": 302,
                    }
                )
    return pd.DataFrame(rows)


def generate_frontier_candidates(n_pages: int, n_hosts: int | None = None) -> pd.DataFrame:
    """Discovered-but-unfetched candidate urls (url, src_host) — the raw
    outlink stream trap detection runs over. Mix:

    * one normal candidate per pid (that pid's page url) — dense enough
      that the /pN template CLEARS the trap volume threshold on every
      host and is exempted purely by its single variable segment;
    * hosts ``i % 11 == 2``: a CALENDAR trap — 60 urls
      ``/cal/{yyyy}/{mm}/{dd}`` (infinite-date spider trap);
    * hosts ``i % 13 == 4``: a SESSION-ID trap — 50 urls
      ``/item?sid={hex}&p={n}`` (per-visit token explosion);
    * hosts ``i % 17 == 6``: a FACETED trap — 40 urls
      ``/list?page={n}&sort={asc|desc}`` (pagination × sort product).

    Deterministic; trap hosts and sizes are arithmetic in (i, j)."""
    n_hosts = n_hosts or max(8, n_pages // 50)
    rows = []
    for pid in range(n_pages):
        host = _host_of(pid % n_hosts, n_hosts)
        private = pid % 33 == 0
        path = f"/private/p{pid:06d}" if private else f"/p{pid:06d}"
        rows.append({"url": f"https://{host}{path}", "src_host": host})
    for i in range(n_hosts):
        host = _host_of(i, n_hosts)
        if i % 11 == 2:
            for j in range(60):
                y, m, d = 2000 + j % 30, 1 + j % 12, 1 + j % 28
                rows.append(
                    {
                        "url": f"https://{host}/cal/{y}/{m:02d}/{d:02d}",
                        "src_host": host,
                    }
                )
        if i % 13 == 4:
            for j in range(50):
                sid = f"{(j * 2654435761 + i) % (1 << 32):08x}"
                rows.append(
                    {
                        "url": f"https://{host}/item?sid={sid}&p={j % 7}",
                        "src_host": host,
                    }
                )
        if i % 17 == 6:
            for j in range(40):
                rows.append(
                    {
                        "url": (
                            f"https://{host}/list?page={j}"
                            f"&sort={'asc' if j % 2 == 0 else 'desc'}"
                        ),
                        "src_host": host,
                    }
                )
    return pd.DataFrame(rows)


def generate_media_headers(n_items: int = 90) -> pd.DataFrame:
    """Binary payloads with a server-DECLARED content type that lies for
    every 6th item (k % 6 == 3) — the magic-byte sniffing fixture. Payload
    cycle (k % 5): real BMP / real WAV / real AVI / html text / plain
    text, built by the same arithmetic encoders as the images/audio/
    videos tables so the bytes are genuine container files. ``true_type``
    is ground-truth metadata the Spark kernel never reads."""
    from fraudcrawler_spark.functions.avi import avi_encode
    from fraudcrawler_spark.functions.bmp import bmp_encode
    from fraudcrawler_spark.functions.wav import wav_encode

    types = [
        "image/bmp",
        "audio/x-wav",
        "video/x-msvideo",
        "text/html",
        "text/plain",
    ]
    rows = []
    for k in range(n_items):
        kind = k % 5
        if kind == 0:
            w, h = 4 + k % 5, 3 + k % 4
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(7 * xx + 13 * yy + k) % 256] * 3, axis=-1)
            payload = bmp_encode(px.astype(np.uint8))
        elif kind == 1:
            i = np.arange(64)
            payload = wav_encode(
                (((31 * i + 17 * k) * 73) % 4001 - 2000).astype(np.int16),
                8000,
            )
        elif kind == 2:
            yy, xx = np.mgrid[0:6, 0:8]
            frames = [
                np.stack([(7 * xx + 13 * yy + 5 * t + k) % 256] * 3, axis=-1)
                .astype(np.uint8)
                for t in range(2)
            ]
            payload = avi_encode(frames, 10)
        elif kind == 3:
            payload = (
                f"<!DOCTYPE html><html><body>item {k}</body></html>"
            ).encode("utf-8")
        else:
            payload = f"plain text item {k}\n".encode("utf-8")
        declared = types[(kind + 1) % 5] if k % 6 == 3 else types[kind]
        rows.append(
            {
                "media_id": k,
                "declared_type": declared,
                "true_type": types[kind],
                "payload": payload,
            }
        )
    return pd.DataFrame(rows)


def generate_fetch_log(n_hosts: int) -> pd.DataFrame:
    """Per-fetch latency/status observations (host, url, status,
    latency_ms) the adaptive-politeness and host_health ops aggregate.
    Host ``i`` gets ``20 + i % 30`` observations with base latency
    ``60 + (i % 7) * 120`` ms plus deterministic jitter
    ``(j*37 + i*11) % 200``. Injected truth classes (host_health must
    see every status bucket, not an all-healthy wall): hosts
    ``i % 13 == 12`` are absent entirely (→ `unobserved`), hosts
    ``i % 10 == 1`` melt with a 503 every 9th fetch (>5% → `erroring`,
    the backoff trigger), hosts ``i % 8 == 3`` 404 every 6th fetch
    (ok_rate < 0.9 → `degraded`); the legacy light-error rules (503
    every 19th on ``i % 5 == 1``, 404 every 29th) stay below both
    thresholds (→ `healthy`)."""
    rows = []
    for i in range(n_hosts):
        if i % 13 == 12:
            continue  # unobserved host: no fetch-log rows at all
        host = _host_of(i, n_hosts)
        base = 60 + (i % 7) * 120
        for j in range(20 + i % 30):
            status = 200
            if i % 10 == 1 and j % 9 == 8:
                status = 503
            elif i % 5 == 1 and j % 19 == 18:
                status = 503
            elif i % 8 == 3 and j % 6 == 5:
                status = 404
            elif j % 29 == 28:
                status = 404
            rows.append(
                {
                    "host": host,
                    "url": f"https://{host}/p{(i * 131 + j) % 997:06d}",
                    "status": status,
                    "latency_ms": base + (j * 37 + i * 11) % 200,
                }
            )
    return pd.DataFrame(rows)


def write_corpus(out_dir: str, n_pages: int = 5000, n_hosts: int | None = None) -> dict:
    """Write the full corpus as parquet files under out_dir; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    n_hosts = n_hosts or max(8, n_pages // 50)
    tables = {
        "pages": generate_pages(n_pages, n_hosts),
        "seeds": generate_seeds(),
        "hosts": generate_hosts(n_hosts),
        "excluded_hosts": generate_excluded_hosts(n_hosts),
        "robots": generate_robots(n_hosts),
        "robots_txt": generate_robots_txt(n_hosts),
        "sitemaps": generate_sitemaps(n_hosts, n_pages),
        "prompts": generate_prompts(),
        "images": generate_images(),
        "audio": generate_audio(),
        "videos": generate_videos(),
        "raw_pages": generate_raw_pages(),
        "redirects": generate_redirects(n_pages, n_hosts),
        "frontier_candidates": generate_frontier_candidates(n_pages, n_hosts),
        "media_headers": generate_media_headers(),
        "fetch_log": generate_fetch_log(n_hosts),
    }
    paths = {}
    for name, df in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        # microsecond timestamps — Spark rejects parquet TIMESTAMP(NANOS);
        # small row groups — Spark parallelizes scans at row-group
        # granularity, one giant group would serialize every pages scan
        df.to_parquet(p, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True, row_group_size=4096)
        paths[name] = p
    # the same pages, archived as genuine WARC (sources/warc.py) — the
    # batch-ingest twin of the reference's live HTTP fetch. File count
    # scales with the corpus (≈2000 records/file) so the file-per-task
    # reader keeps its parallelism at any n_pages.
    from fraudcrawler_spark.sources.warc import write_warc

    write_warc(os.path.join(out_dir, "warc"), tables["pages"],
               n_files=max(4, n_pages // 2000))
    paths["warc"] = os.path.join(out_dir, "warc")
    with open(os.path.join(out_dir, "_datagen_rev"), "w") as f:
        f.write(str(DATAGEN_REV))
    return paths


def corpus_is_current(out_dir: str) -> bool:
    """True iff ``out_dir`` was written by THIS datagen revision."""
    try:
        with open(os.path.join(out_dir, "_datagen_rev")) as f:
            return f.read().strip() == str(DATAGEN_REV)
    except OSError:
        return False


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/crawl_sf_small"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    print(write_corpus(out, n))
