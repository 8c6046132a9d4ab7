"""Single-pass Python model of the engine's replay semantics.

Final state per url = the event with max (warc_ts, lsn); final op 'D'
means the row is absent; `text` is the pure extractor applied to the
winning html. Used as the replay-equivalence oracle (SURVEY.md §5.2).
"""

from __future__ import annotations

import pandas as pd

from game_library_enrichment_etl_spark.functions.extract import extract_text_one


def model_final_state(events: pd.DataFrame, payload_cols=("html", "lang")) -> pd.DataFrame:
    best: dict[str, tuple] = {}
    for row in events.itertuples(index=False):
        v = (row.warc_ts, row.lsn)
        cur = best.get(row.url)
        if cur is None or v > cur[0]:
            best[row.url] = (v, row)
    out = []
    for url, (v, row) in best.items():
        if row.op == "D":
            continue
        rec = {"url": url, "warc_ts": row.warc_ts, "lsn": row.lsn}
        for c in payload_cols:
            rec[c] = getattr(row, c)
        rec["text"] = extract_text_one(rec.get("html"))
        out.append(rec)
    df = pd.DataFrame(out)
    return df.sort_values("url").reset_index(drop=True) if len(df) else df


def model_coalesce_state(events: pd.DataFrame, payload_cols=("html", "lang")) -> dict:
    """Sequential fold in (warc_ts, lsn) order with partial-update (M2)
    semantics: I replaces the row, U coalesces non-null cells, D deletes.
    Returns {url: {col: val}} for live rows."""
    state: dict[str, dict] = {}
    for row in sorted(
        events.itertuples(index=False), key=lambda r: (r.warc_ts, r.lsn)
    ):
        if row.op == "D":
            state.pop(row.url, None)
            continue
        rec = {c: getattr(row, c) for c in payload_cols}
        rec["warc_ts"], rec["lsn"] = row.warc_ts, row.lsn
        if row.op == "I" or row.url not in state:
            state[row.url] = rec
        else:  # U: per-cell overwrite only where source is non-null
            old = state[row.url]
            for c in payload_cols:
                if rec[c] is None:
                    rec[c] = old.get(c)
            state[row.url] = rec
    return state
