"""Per-language extraction rules + chunk-local cleanup semantics."""

import pyarrow as pa

from text_to_graph_ray.stages.extract import extract_records


def _run(lang, text, chunk_index=0, repo="acme/web", path=None):
    if path is None:
        path = {"python": "src/m.py", "javascript": "lib/a.js", "java": "src/A.java", "text": "docs/n.md"}[lang]
    batch = pa.table(
        {
            "repo": [repo],
            "path": [path],
            "content_sha256": ["h"],
            "chunk_index": [chunk_index],
            "lang": [lang],
            "text": [text],
        }
    )
    rows = extract_records(batch).to_pylist()
    edges = [(r["a"], r["b"], r["c"]) for r in rows if r["kind"] == "edge"]
    nodes = [(r["a"], r["b"]) for r in rows if r["kind"] == "node"]
    return nodes, edges


def test_python_imports_defs_calls():
    src = "import os\nfrom pkg.mod import f1, f2\n\ndef g(x):\n    y = f1(x)\n    return y\n"
    nodes, edges = _run("python", src)
    f = "acme/web/src/m.py"
    assert (f, "imports", "os") in edges
    assert (f, "imports", "pkg.mod") in edges
    assert (f, "imports", "pkg.mod.f1") in edges
    assert (f, "imports", "pkg.mod.f2") in edges
    assert (f, "defines", "g") in edges
    assert ("g", "calls", "f1") in edges


def test_python_class_methods():
    src = "class C:\n    def m(self):\n        helper(self)\n        return self\n"
    nodes, edges = _run("python", src)
    assert ("acme/web/src/m.py", "defines", "C") in edges
    assert ("C", "defines", "m") in edges
    assert ("m", "calls", "helper") in edges
    assert ("C", "Class") in nodes and ("m", "Function") in nodes


def test_python_keywords_not_calls():
    src = "def g(x):\n    if x:\n        return len(x)\n    for i in range(3):\n        pass\n"
    _, edges = _run("python", src)
    calls = [e for e in edges if e[1] == "calls"]
    assert calls == []  # if/len/range are keyword-filtered


def test_python_unicode_identifiers():
    src = "def función_ñ(x):\n    y = log(x)\n    return y\n"
    _, edges = _run("python", src)
    assert ("acme/web/src/m.py", "defines", "función_ñ") in edges
    assert ("función_ñ", "calls", "log") in edges


def test_containment_only_on_chunk_zero():
    _, e0 = _run("python", "", chunk_index=0)
    _, e1 = _run("python", "", chunk_index=1)
    assert ("acme/web", "contains", "acme/web/src") in e0
    assert all(p != "contains" for _, p, _ in e1)


def test_chunk_local_edge_dedup_keep_first():
    # same call twice in one chunk -> one edge (response_parser.py:102 semantics)
    src = "def g(x):\n    a = f(x)\n    b = f(x)\n    return b\n"
    _, edges = _run("python", src)
    assert edges.count(("g", "calls", "f")) == 1


def test_orphan_free_by_construction():
    nodes, edges = _run("python", "import os\n")
    labels_in_edges = {x for s, _, d in edges for x in (s, d)}
    assert {n for n, _ in nodes} <= labels_in_edges


def test_javascript_rules():
    src = (
        "const helper = require('libmod');\n\n"
        "function f(x) {\n  const y = helper(x);\n  return y;\n}\n\n"
        "class C {\n  render(x) {\n    return f(x);\n  }\n}\n"
    )
    _, edges = _run("javascript", src)
    fe = "acme/web/lib/a.js"
    assert (fe, "imports", "libmod") in edges
    assert (fe, "defines", "f") in edges
    assert ("f", "calls", "helper") in edges
    assert (fe, "defines", "C") in edges
    assert ("C", "defines", "render") in edges
    assert ("render", "calls", "f") in edges


def test_java_rules():
    src = "import java.util.List;\n\npublic class Svc {\n    void run() {\n        dispatch();\n    }\n}\n"
    _, edges = _run("java", src)
    fe = "acme/web/src/A.java"
    assert (fe, "imports", "java.util.List") in edges
    assert (fe, "defines", "Svc") in edges
    assert ("Svc", "defines", "run") in edges
    assert ("run", "calls", "dispatch") in edges


def test_text_relations():
    src = "Alpha uses Beta.\nBeta relates to Gamma.\nnot a relation line\n"
    nodes, edges = _run("text", src)
    assert ("Alpha", "uses", "Beta") in edges
    assert ("Beta", "relates to", "Gamma") in edges
    assert ("Alpha", "Concept") in nodes


def test_unknown_lang_falls_back_to_text():
    _, edges = _run("text", "Aaa contains Bbb.", path="docs/n.md")
    batch_edges = [e for e in edges if e[1] == "contains" and e[0] == "Aaa"]
    assert batch_edges == [("Aaa", "contains", "Bbb")]
