"""Conformance harness: reference parser + merge semantics, reimplemented.

The engine proper never round-trips graphs through CSV text — extraction emits
Arrow rows directly. But the reference's observable behavior on LLM-shaped text
replies is part of its query surface, so this module reimplements those
semantics (from behavioral analysis of /root/reference/graph_extractor/src/
response_parser.py and graph_utils.py — no code copied) for:

* replaying the reference's adversarial parser corpus in tests
  (response_parser.py:210-745 cases, SURVEY §5),
* an in-process oracle for merge math (graph_utils.py:13-88,144-251),
* the conformance emitter that string-packs multi-values with ``'|'`` the way
  the reference does (graph_utils.py:68,220-223).

Semantics preserved (SURVEY §7.4 "reject-whole-chunk" rules):
* section start on literal headers ``id,entity,category`` /
  ``source,target,relationship`` (response_parser.py:26-33)
* ``#``/fence lines skipped (:34); per-row column-count check via csv reader
  (:119-144); duplicate node ids reject the whole chunk (:59-61)
* edges deduped keep-first on (source, target, label) (:102)
* orphan nodes dropped + dense reindex 0..N-1 (:178-207); an edge referencing
  a missing node id rejects the whole chunk (:198-205 -> outer except -> None)
* merge: entity identity = sanitize(label).lower(), first-seen casing wins,
  type-set union joined with '|', edge key (src, tgt, lower(label)),
  dangling edges silently dropped (graph_utils.py:13-88)
"""

from __future__ import annotations

import csv
import io

from text_to_graph_ray.keys import sanitize

NODE_HEADER = "id,entity,category"
EDGE_HEADER = "source,target,relationship"


def split_sections(text: str) -> tuple[list[str], list[str]]:
    nodes_lines: list[str] = []
    edges_lines: list[str] = []
    section = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith(NODE_HEADER):
            section = "nodes"
            nodes_lines.append(line)
        elif line.startswith(EDGE_HEADER):
            section = "edges"
            edges_lines.append(line)
        elif line.startswith("#") or line.startswith("```"):
            continue
        elif section == "nodes":
            nodes_lines.append(line)
        elif section == "edges":
            edges_lines.append(line)
    return nodes_lines, edges_lines


def valid_rows(lines: list[str], n_cols: int) -> list[list[str]]:
    """Data rows with exactly n_cols fields (csv-quoted aware); header excluded."""
    rows = []
    for line in lines[1:]:
        if not line.strip():
            continue
        fields = next(csv.reader([line.strip()], skipinitialspace=True))
        if len(fields) == n_cols:
            rows.append(fields)
    return rows


def parse_entity_list(response) -> list[str] | None:
    """Reference parse_nodes semantics (response_parser.py:147-175): first csv
    record -> trimmed non-empty entity names; None on anything unusable."""
    if not isinstance(response, str):
        return None
    response = response.strip()
    if not response:
        return None
    try:
        rec = next(csv.reader(io.StringIO(response), skipinitialspace=True), None)
    except csv.Error:
        return None
    if rec is None:
        return None
    ents = [e.strip() for e in rec if e.strip()]
    return ents or None


def parse_subgraph(text: str):
    """Reference parse_text_to_dataframes semantics over plain python
    structures. Returns (nodes, edges) where nodes = [(id, label, type)],
    edges = [(source, target, label)] — or (None, None) when the chunk is
    rejected."""
    if not isinstance(text, str):
        return None, None
    nodes_lines, edges_lines = split_sections(text)
    if not nodes_lines:
        return [], []  # no node section: empty graph (reference returns empty frames)

    node_rows = valid_rows(nodes_lines, 3)
    if not node_rows:
        return None, None
    ids = [r[0] for r in node_rows]
    if len(set(ids)) != len(ids):  # duplicate ids reject the whole chunk
        return None, None
    nodes = [(r[0], r[1], r[2]) for r in node_rows]

    if not edges_lines:
        return _prune_orphans(nodes, [])
    edge_rows = valid_rows(edges_lines, 3)
    if not edge_rows:
        return nodes, None

    seen = set()
    edges = []
    for s, t, l in edge_rows:
        k = (s, t, l)
        if k not in seen:  # keep-first dedup
            seen.add(k)
            edges.append((s, t, l))

    return _prune_orphans(nodes, edges)


def _prune_orphans(nodes, edges):
    """Orphan removal + dense reindex; edge endpoint not in the node table
    rejects the chunk (mirrors NaN -> astype(int) raise -> outer except)."""
    referenced = {e[0] for e in edges} | {e[1] for e in edges}
    node_ids = {n[0] for n in nodes}
    for s, t, _ in edges:
        if s not in node_ids or t not in node_ids:
            return None, None
    kept = [n for n in nodes if n[0] in referenced]
    remap = {n[0]: i for i, n in enumerate(kept)}
    new_nodes = [(remap[n[0]], n[1], n[2]) for n in kept]
    new_edges = [(remap[s], remap[t], l) for s, t, l in edges]
    return new_nodes, new_edges


def merge_chunk_graphs(graphs):
    """Reference merge_graphs_unique semantics (graph_utils.py:13-88):
    graphs = [(nodes, edges)] with nodes [(id,label,type)], edges
    [(src,tgt,label)]. Returns (nodes [(id,label,types_packed)],
    edges [(src,tgt,label_lower)])."""
    entities: dict[str, dict] = {}
    order: list[str] = []
    edge_keys: set = set()
    edge_order: list[tuple] = []

    for nodes, edges in graphs:
        local: dict = {}
        for nid, label, typ in nodes:
            lab = sanitize(str(label))
            key = lab.lower()
            typ = sanitize(str(typ))
            ent = entities.get(key)
            if ent is None:
                entities[key] = {"id": len(order), "label": lab, "types": {typ}}
                order.append(key)
                ent = entities[key]
            else:
                ent["types"].add(typ)
            local[nid] = ent["id"]
        for s, t, label in edges:
            if s not in local or t not in local:  # dangling -> silently dropped
                continue
            k = (local[s], local[t], sanitize(str(label)).lower())
            if k not in edge_keys:
                edge_keys.add(k)
                edge_order.append(k)

    out_nodes = [
        (info["id"], info["label"], "|".join(sorted(t for t in info["types"] if t)))
        for key in order
        for info in (entities[key],)
    ]
    out_edges = list(edge_order)
    return out_nodes, out_edges


def merge_documents(doc_graphs):
    """Reference merge_all_document_graphs semantics (graph_utils.py:144-251):
    doc_graphs = [(doc_name, nodes, edges)]; provenance is '|'-packed into
    labels ("base|d1|d2"). Returns (nodes [(id,label,types)], edges
    [(src,tgt,label)])."""
    entities: dict[str, dict] = {}
    order: list[str] = []
    edge_map: dict[tuple, dict] = {}
    edge_order: list[tuple] = []

    for doc_index, (_name, nodes, edges) in enumerate(doc_graphs):
        id_to_label: dict = {}
        for nid, label, typ in nodes:
            lab = sanitize(str(label))
            key = lab.lower()
            id_to_label[int(nid)] = lab
            if not lab:
                continue
            ent = entities.get(key)
            if ent is None:
                entities[key] = {"id": len(order), "label": lab, "types": {str(typ)}, "docs": {doc_index}}
                order.append(key)
            else:
                ent["types"].add(str(typ))
                ent["docs"].add(doc_index)
        for s, t, label in edges:
            if s not in id_to_label or t not in id_to_label:
                continue
            lab = sanitize(str(label))
            sk = entities[id_to_label[s].lower()]["id"]
            tk = entities[id_to_label[t].lower()]["id"]
            ek = (sk, tk, lab.lower())
            if ek not in edge_map:
                edge_map[ek] = {"label": lab, "docs": {doc_index}}
                edge_order.append(ek)
            else:
                edge_map[ek]["docs"].add(doc_index)

    out_nodes = []
    for key in order:
        info = entities[key]
        docs = "|".join(str(d) for d in sorted(info["docs"]))
        out_nodes.append((info["id"], f"{info['label']}|{docs}", "|".join(sorted(t for t in info["types"] if t))))
    out_edges = []
    for ek in edge_order:
        info = edge_map[ek]
        docs = "|".join(str(d) for d in sorted(info["docs"]))
        out_edges.append((ek[0], ek[1], f"{info['label']}|{docs}"))
    return out_nodes, out_edges


def parse_replies(batch):
    """Dataset surface for the reply parser: ``map_batches(parse_replies)``
    over a (reply_id, reply) table -> one summary row per reply
    (status ok|partial|rejected, counts, ';'-packed node/edge lists). Makes
    the reference's CSV-reply semantics reachable from the driver contract,
    not just from unit tests."""
    import pyarrow as pa

    ids = batch.column("reply_id").to_pylist()
    texts = batch.column("reply").to_pylist()
    rows = {"reply_id": [], "status": [], "n_nodes": [], "n_edges": [], "nodes_packed": [], "edges_packed": []}
    for rid, text in zip(ids, texts):
        nodes, edges = parse_subgraph(text)
        if nodes is None:
            status, nodes, edges = "rejected", [], []
        elif edges is None:
            status, edges = "partial", []
        else:
            status = "ok"
        rows["reply_id"].append(rid)
        rows["status"].append(status)
        rows["n_nodes"].append(len(nodes))
        rows["n_edges"].append(len(edges))
        rows["nodes_packed"].append(";".join(f"{i}:{l}:{t}" for i, l, t in nodes))
        rows["edges_packed"].append(";".join(f"{s}:{t}:{l}" for s, t, l in edges))
    return pa.table(
        {
            "reply_id": pa.array(rows["reply_id"], type=pa.int64()),
            "status": pa.array(rows["status"], type=pa.string()),
            "n_nodes": pa.array(rows["n_nodes"], type=pa.int64()),
            "n_edges": pa.array(rows["n_edges"], type=pa.int64()),
            "nodes_packed": pa.array(rows["nodes_packed"], type=pa.string()),
            "edges_packed": pa.array(rows["edges_packed"], type=pa.string()),
        }
    )


def apply_edge_mappings(edges, mapping: dict):
    """Edge-relabel taxonomy cleanup (edge_utils.py:29-41): old label -> new
    label; unmapped labels pass through."""
    return [(s, t, mapping.get(l, l)) for s, t, l in edges]


def distinct_edge_labels(edges) -> list[str]:
    """Sorted distinct edge labels (edge_utils.py:6-26)."""
    return sorted({l for _, _, l in edges})
