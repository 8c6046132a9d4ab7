"""Deterministic synthetic data generator: Common-Crawl-style pages + WAL change stream.

Everything is seeded (no wall clock, no unseeded randomness) — replay
equivalence requires bit-stable inputs (FIXTURES.md §2; reference precursor:
timestamped immutable raw landings, /root/reference/src/how_long_to_beat.py:130-147).

Shapes follow FIXTURES.md:
- ``pages``:   url, warc_ts, html, text, lang
- ``changes``: op (I/U/D), lsn, url, warc_ts, html, lang, batch_id
  written as ordered segment directories (one per micro-batch "page",
  mirroring the reference's 500-row pagination,
  /root/reference/src/internet_games_database.py:133-147).

Generator features (FIXTURES.md §2 required list):
(a) multiple changes per url within one batch  -> exercises LWW dedup
(b) Zipfian hot domains                        -> exercises salting/skew
(c) late events beyond watermark               -> counted + dropped
(d) schema evolution markers: add ``title`` from segment k1, rename
    ``lang`` -> ``language`` from k2, widen ``lsn`` int32 -> int64 from k3.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_BASE = 1_700_000_000  # fixed base event time (s); no wall clock anywhere

LANGS = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru"]
LANG_WEIGHTS = np.array([0.42, 0.12, 0.10, 0.10, 0.09, 0.07, 0.06, 0.04])

_WORDS = (
    "data stream merge table page crawl web index shard batch commit snapshot "
    "upsert delete insert schema column lineage metric offset watermark salt "
    "bucket partition replay resume anchor vector token corpus"
).split()


def _h64(s: str) -> int:
    """Stable 64-bit hash of a string (md5-based; independent of PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    """Probabilities proportional to 1/rank^s — hot-domain skew (FIXTURES.md §1)."""
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def make_urls(n_urls: int, n_domains: int, seed: int) -> np.ndarray:
    """Deterministic url universe; domain drawn Zipfian so a few domains are hot."""
    rng = np.random.default_rng(seed)
    dom_idx = rng.choice(n_domains, size=n_urls, p=zipf_weights(n_domains))
    return np.array(
        [f"https://site{d:04d}.example.com/p/{i:08d}" for i, d in enumerate(dom_idx)],
        dtype=object,
    )


def html_for(url: str, version: int) -> bytes:
    """Pure deterministic HTML payload for (url, version).

    Includes title, body paragraphs, a script and a style block (so the
    extractor has something to strip), and HTML entities.
    """
    h = _h64(f"{url}#{version}")
    rng = np.random.default_rng(h % (2**32))
    title = " ".join(rng.choice(_WORDS, size=4))
    paras = []
    for p in range(2 + int(h % 3)):
        words = rng.choice(_WORDS, size=12 + (h >> (p + 3)) % 20)
        paras.append("<p>" + " ".join(words) + " &amp; v" + str(version) + "</p>")
    lang = LANGS[h % len(LANGS)]
    doc = (
        f'<html lang="{lang}"><head><title>{title}</title>'
        f"<style>body{{margin:0}}</style></head><body>"
        f"<script>var x={h % 97};</script>" + "\n".join(paras) + "</body></html>"
    )
    return doc.encode("utf-8")


def lang_for(url: str, version: int) -> str:
    return LANGS[_h64(f"{url}#{version}") % len(LANGS)]


def title_for(url: str, version: int) -> str:
    h = _h64(f"{url}#{version}")
    rng = np.random.default_rng(h % (2**32))
    return " ".join(rng.choice(_WORDS, size=4))


@dataclass(frozen=True)
class EvolutionSpec:
    """Segment indices at which each schema change first appears (FIXTURES.md §2d)."""

    add_title_from: int  # segments >= this carry a `title:string` column
    rename_lang_from: int  # segments >= this name the lang column `language`
    widen_lsn_from: int  # segments >= this write lsn as int64 (earlier: int32)


def gen_change_events(
    n_events: int,
    n_urls: int,
    seed: int,
    n_domains: int = 50,
    delete_frac: float = 0.05,
    late_frac: float = 0.02,
    late_by_s: int = 100_000,
    jitter_s: int = 30,
    start_lsn: int = 0,
) -> pd.DataFrame:
    """Deterministic change stream as one ordered pandas frame.

    - ``lsn`` is the global total order (0..n-1).
    - ``warc_ts`` mostly tracks lsn with small jitter (out-of-order within
      a window) plus a `late_frac` tail of very-late events (past watermark).
    - First touch of a url is 'I'; later touches are 'U' except a
      `delete_frac` share of 'D'. Hot urls (Zipfian domains) repeat often —
      multiple changes per url per batch.
    """
    rng = np.random.default_rng(seed)
    urls = make_urls(n_urls, n_domains, seed + 1)
    # Zipfian url popularity -> repeated updates concentrated on hot urls
    pick = rng.choice(n_urls, size=n_events, p=zipf_weights(n_urls, s=1.05))
    lsn = start_lsn + np.arange(n_events, dtype=np.int64)
    ts = EPOCH_BASE + lsn + rng.integers(-jitter_s, jitter_s + 1, size=n_events)
    late_mask = rng.random(n_events) < late_frac
    ts = np.where(late_mask, ts - late_by_s, ts)

    seen: set[int] = set()
    ops = np.empty(n_events, dtype=object)
    is_del = rng.random(n_events) < delete_frac
    for i, u in enumerate(pick):
        if u not in seen:
            ops[i] = "I"
            seen.add(u)
        elif is_del[i]:
            ops[i] = "D"
            seen.discard(u)
        else:
            ops[i] = "U"

    version = lsn  # payload version == lsn (unique per event, deterministic)
    url_arr = urls[pick]
    html = [None if o == "D" else html_for(u, int(v)) for o, u, v in zip(ops, url_arr, version)]
    lang = [None if o == "D" else lang_for(u, int(v)) for o, u, v in zip(ops, url_arr, version)]
    title = [None if o == "D" else title_for(u, int(v)) for o, u, v in zip(ops, url_arr, version)]
    return pd.DataFrame(
        {
            "op": ops,
            "lsn": lsn,
            "url": url_arr,
            "warc_ts": pd.to_datetime(ts, unit="s", utc=True).tz_localize(None),
            "html": html,
            "lang": lang,
            "title": title,  # only materialized to parquet from evolution.add_title_from
        }
    )


def write_change_segments(
    out_dir: str,
    events: pd.DataFrame,
    n_segments: int,
    evolution: EvolutionSpec | None = None,
    first_batch_id: int = 0,
) -> list[str]:
    """Split the ordered event frame into ``n_segments`` parquet segment files.

    Segment k gets the contiguous lsn slice k — a WAL tail where each file is
    one micro-batch. Schema per segment follows ``evolution`` (or the base
    schema when None: no title, `lang`, int64 lsn).

    Returns the ordered list of segment file paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(events)
    bounds = np.linspace(0, n, n_segments + 1).astype(int)
    paths = []
    for k in range(n_segments):
        seg = events.iloc[bounds[k] : bounds[k + 1]].copy()
        seg["batch_id"] = np.int64(first_batch_id + k)

        has_title = evolution is not None and k >= evolution.add_title_from
        lang_name = (
            "language" if (evolution is not None and k >= evolution.rename_lang_from) else "lang"
        )
        lsn_type = (
            pa.int64()
            if (evolution is None or k >= evolution.widen_lsn_from)
            else pa.int32()
        )

        cols: dict[str, pa.Array] = {
            "op": pa.array(seg["op"], pa.string()),
            "lsn": pa.array(seg["lsn"], lsn_type),
            "url": pa.array(seg["url"], pa.string()),
            # tz-aware so Spark reads TimestampType (instant), not NTZ
            "warc_ts": pa.array(seg["warc_ts"], pa.timestamp("us", tz="UTC")),
            "html": pa.array(seg["html"], pa.binary()),
            lang_name: pa.array(seg["lang"], pa.string()),
        }
        if has_title:
            cols["title"] = pa.array(seg["title"], pa.string())
        cols["batch_id"] = pa.array(seg["batch_id"], pa.int64())

        path = os.path.join(out_dir, f"seg-{first_batch_id + k:05d}.parquet")
        pq.write_table(pa.table(cols), path)
        paths.append(path)
    return paths


def gen_stream(
    out_dir: str,
    n_events: int = 20_000,
    n_urls: int = 2_000,
    n_segments: int = 10,
    seed: int = 42,
    evolution: EvolutionSpec | None = None,
    **kw,
) -> list[str]:
    """Convenience: generate events and write segments in one call."""
    ev = gen_change_events(n_events, n_urls, seed, **kw)
    return write_change_segments(out_dir, ev, n_segments, evolution)
