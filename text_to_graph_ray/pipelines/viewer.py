"""HTML graph-viewer sink (reference S6, /root/reference/graph_extractor/src/
create_graph_viewer.py:12-44): the final (small) node/edge tables are embedded
into a standalone HTML file — zlib-compressed + base64, decompressed client
side, mirroring the reference's payload packing. Driver-side only; never part
of the distributed path (the tables are the pipeline's output, already
aggregated)."""

from __future__ import annotations

import base64
import html
import json
import zlib


def _pack(obj) -> str:
    # default=list: parquet list columns surface as numpy arrays in pandas
    payload = json.dumps(obj, default=lambda o: list(o))
    return base64.b64encode(zlib.compress(payload.encode("utf-8"))).decode("ascii")


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 1.5rem; }}
 table {{ border-collapse: collapse; margin: 1rem 0; }}
 td, th {{ border: 1px solid #999; padding: 2px 8px; font-size: 13px; }}
 h2 {{ margin-bottom: 0; }}
</style></head>
<body>
<h1>{title}</h1>
<p id="summary"></p>
<h2>Nodes</h2><table id="nodes"></table>
<h2>Edges</h2><table id="edges"></table>
<script src="https://cdn.jsdelivr.net/npm/pako@2/dist/pako.min.js"></script>
<script>
const NODES_B64 = "{nodes_b64}";
const EDGES_B64 = "{edges_b64}";
function unpack(b64) {{
  const bin = atob(b64);
  const arr = Uint8Array.from(bin, c => c.charCodeAt(0));
  return JSON.parse(new TextDecoder().decode(pako.inflate(arr)));
}}
function fill(id, rows) {{
  const t = document.getElementById(id);
  if (!rows.length) return;
  const cols = Object.keys(rows[0]);
  // cell values come from arbitrary corpus content: build cells with
  // textContent (never innerHTML) so a crafted label can't inject script
  const hr = document.createElement("tr");
  for (const c of cols) {{ const th = document.createElement("th"); th.textContent = c; hr.appendChild(th); }}
  t.appendChild(hr);
  for (const r of rows.slice(0, 2000)) {{
    const tr = document.createElement("tr");
    for (const c of cols) {{ const td = document.createElement("td"); td.textContent = String(r[c]); tr.appendChild(td); }}
    t.appendChild(tr);
  }}
}}
const nodes = unpack(NODES_B64), edges = unpack(EDGES_B64);
document.getElementById("summary").textContent = nodes.length + " nodes, " + edges.length + " edges (first 2000 shown)";
fill("nodes", nodes); fill("edges", edges);
</script>
</body></html>
"""


def write_graph_html(nodes_df, edges_df, out_path: str, title: str = "graph") -> str:
    """nodes_df/edges_df: small pandas DataFrames (the aggregated output)."""
    doc = _TEMPLATE.format(
        title=html.escape(title),
        nodes_b64=_pack(nodes_df.to_dict(orient="records")),
        edges_b64=_pack(edges_df.to_dict(orient="records")),
    )
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(doc)
    return out_path
