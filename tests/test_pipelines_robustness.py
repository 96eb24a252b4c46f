"""Robustness: malformed pages (missing/truncated geo meta, empty html)."""

import numpy as np
import pyarrow as pa

from s2ray.functions.extract import drop_html, extract_geotag, extract_text
from s2ray.stages.assign import assign_cells


def _page(html: str, pid: int) -> dict:
    return {"page_id": pid, "url": f"https://x.example.com/doc/{pid}",
            "html": html.encode(), "lang": "en"}


def test_malformed_pages_flow_through():
    rows = [
        _page('<html><head><meta name="geo.position" content="5000;6000"/>'
              '</head><body><article>ok text</article></body></html>', 0),
        _page("<html><body><article>no geo tag here</article></body></html>", 1),
        _page("<html><body>no article tag at all</body></html>", 2),
        _page("", 3),
        _page('<html><meta name="geo.position" content="garbage;data"/>'
              "<article>bad coords</article>", 4),
    ]
    batch = pa.Table.from_pylist(rows)
    out = extract_text(batch)
    texts = out["text"].to_pylist()
    assert texts[0] == "ok text"
    assert texts[1] == "no geo tag here"
    assert texts[2] is None and texts[3] is None
    out = extract_geotag(out)
    has_geo = out["has_geo"].to_pylist()
    assert has_geo == [True, False, False, False, False]
    out = drop_html(out)
    out = assign_cells(out, token_level=8)
    ids = out["cell_id"].to_numpy(zero_copy_only=False)
    assert ids[0] != 0          # valid geo -> real cell
    assert all(i == 0 for i in ids[1:])  # no geo -> sentinel 0, no crash
