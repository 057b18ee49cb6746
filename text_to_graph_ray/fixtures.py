"""Hand-written KG micro-fixture with HAND-COMPUTED expected outputs.

The synth-corpus oracles (synth.py) share ``keys.py`` with the engine, so a
bug there would cancel out on both sides. This fixture closes that loop: the
four input files AND the expected linked triples/nodes below are literal
values written by hand from the documented extraction semantics
(stages/extract.py per-language rules, keys.py containment/alias rules,
reference anchors graph_utils.py:13-88 + response_parser.py:178-207) — no
generator code, no imports from the engine. If the engine and this file
disagree, one of them is wrong.

Covered semantics: python (import / from-import / def / calls), the dotted
alias link (``util.clean`` -> ``clean``, ``app.util.parse`` -> ``parse``
via the unique-defining-module rule), type-set union across linked mentions
(``parse`` ends up Function|Module), javascript (require / function / call),
prose concept triples, repo-path containment, cross-file canonicalization,
go (import / func / method-on-type / struct / call), and deterministic dense
ids over sorted entity keys.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = "/tmp/graft_fixture/v3"

_REPO = "fx/demo"
_COMMIT = "f" * 40

FIXTURE_FILES = [
    {
        "repo": _REPO,
        "path": "src/app/util.py",
        "commit": _COMMIT,
        "lang": "python",
        "content": '"""util."""\nimport os\n\ndef parse(x):\n    y = clean(x)\n    return y\n\ndef clean(s):\n    return s\n',
    },
    {
        "repo": _REPO,
        "path": "src/app/main.py",
        "commit": _COMMIT,
        "lang": "python",
        "content": '"""main."""\nfrom app.util import parse\n\ndef run(x):\n    y = parse(x)\n    z = util.clean(y)\n    return z\n',
    },
    {
        "repo": _REPO,
        "path": "docs/note.md",
        "commit": _COMMIT,
        "lang": "text",
        "content": "Alpha uses Beta.\nBeta contains Gamma.\n",
    },
    {
        "repo": _REPO,
        "path": "lib/a.js",
        "commit": _COMMIT,
        "lang": "javascript",
        "content": "// x\nconst helper = require('mylib');\n\nfunction go(x) {\n  return helper(x);\n}\n",
    },
    {
        "repo": _REPO,
        "path": "go/svc.go",
        "commit": _COMMIT,
        "lang": "go",
        "content": (
            '// synthetic\npackage app\n\nimport "fmt"\n\n'
            "func Fetch(x int) int {\n\ty := fmt.Println(x)\n\treturn y\n}\n\n"
            "func main() {\n\tz := Fetch(3)\n\tprint(z)\n}\n\n"
            "type Store struct {\n}\n\n"
            "func (s *Store) Load(x int) int {\n\treturn Fetch(x)\n}\n"
        ),
    },
    {
        "repo": _REPO,
        "path": "go/multi.go",
        "commit": _COMMIT,
        "lang": "go",
        "content": (
            '// synthetic\npackage app\n\nimport (\n\t"os"\n\t"strings"\n)\n\n'
            'func Walk(x int) int {\n\treturn strings.Count("a", "a")\n}\n'
        ),
    },
]

# hand-derived: (src_key, pred, dst_key); repos_packed is "fx/demo" throughout
EXPECTED_TRIPLES_LINKED = [
    ("fx/demo", "contains", "fx/demo/docs"),
    ("fx/demo", "contains", "fx/demo/go"),
    ("fx/demo", "contains", "fx/demo/lib"),
    ("fx/demo", "contains", "fx/demo/src"),
    ("fx/demo/go", "contains", "fx/demo/go/multi.go"),
    ("fx/demo/go", "contains", "fx/demo/go/svc.go"),
    ("fx/demo/go/multi.go", "defines", "walk"),
    ("fx/demo/go/multi.go", "imports", "os"),
    ("fx/demo/go/multi.go", "imports", "strings"),
    ("walk", "calls", "strings.count"),
    ("fx/demo/go/svc.go", "defines", "fetch"),
    ("fx/demo/go/svc.go", "defines", "main"),
    ("fx/demo/go/svc.go", "defines", "store"),
    ("fx/demo/go/svc.go", "imports", "fmt"),
    ("fetch", "calls", "fmt.println"),
    ("load", "calls", "fetch"),
    ("main", "calls", "fetch"),
    ("store", "defines", "load"),
    ("fx/demo/docs", "contains", "fx/demo/docs/note.md"),
    ("fx/demo/lib", "contains", "fx/demo/lib/a.js"),
    ("fx/demo/lib/a.js", "defines", "go"),
    ("fx/demo/lib/a.js", "imports", "mylib"),
    ("fx/demo/src", "contains", "fx/demo/src/app"),
    ("fx/demo/src/app", "contains", "fx/demo/src/app/main.py"),
    ("fx/demo/src/app", "contains", "fx/demo/src/app/util.py"),
    ("fx/demo/src/app/main.py", "defines", "run"),
    ("fx/demo/src/app/main.py", "imports", "app.util"),
    ("fx/demo/src/app/main.py", "imports", "parse"),  # app.util.parse -> parse (alias link)
    ("fx/demo/src/app/util.py", "defines", "clean"),
    ("fx/demo/src/app/util.py", "defines", "parse"),
    ("fx/demo/src/app/util.py", "imports", "os"),
    ("alpha", "uses", "beta"),
    ("beta", "contains", "gamma"),
    ("go", "calls", "helper"),
    ("parse", "calls", "clean"),
    ("run", "calls", "clean"),  # util.clean -> clean (alias link)
    ("run", "calls", "parse"),
]

# hand-derived: (entity_key, label, types_packed); entity_id = rank in
# sorted(entity_key) (assigned below), repos_packed = "fx/demo" throughout
EXPECTED_NODES_LINKED = [
    ("alpha", "Alpha", "Concept"),
    ("app.util", "app.util", "Module"),
    ("beta", "Beta", "Concept"),
    ("clean", "clean", "Function"),
    ("fetch", "Fetch", "Function"),
    ("fmt", "fmt", "Module"),
    ("fmt.println", "fmt.Println", "Function"),
    ("load", "Load", "Function"),
    ("main", "main", "Function"),
    ("store", "Store", "Class"),
    ("fx/demo/go", "fx/demo/go", "Directory"),
    ("fx/demo/go/multi.go", "fx/demo/go/multi.go", "File"),
    ("fx/demo/go/svc.go", "fx/demo/go/svc.go", "File"),
    ("strings", "strings", "Module"),
    ("strings.count", "strings.Count", "Function"),
    ("walk", "Walk", "Function"),
    ("fx/demo", "fx/demo", "Repository"),
    ("fx/demo/docs", "fx/demo/docs", "Directory"),
    ("fx/demo/docs/note.md", "fx/demo/docs/note.md", "File"),
    ("fx/demo/lib", "fx/demo/lib", "Directory"),
    ("fx/demo/lib/a.js", "fx/demo/lib/a.js", "File"),
    ("fx/demo/src", "fx/demo/src", "Directory"),
    ("fx/demo/src/app", "fx/demo/src/app", "Directory"),
    ("fx/demo/src/app/main.py", "fx/demo/src/app/main.py", "File"),
    ("fx/demo/src/app/util.py", "fx/demo/src/app/util.py", "File"),
    ("gamma", "Gamma", "Concept"),
    ("go", "go", "Function"),
    ("helper", "helper", "Function"),
    ("mylib", "mylib", "Module"),
    ("os", "os", "Module"),
    ("parse", "parse", "Function|Module"),  # linked app.util.parse mention adds Module
    ("run", "run", "Function"),
]


def ensure_fixture() -> str:
    """Idempotently materialize repo_files + hand-written expected tables."""
    from text_to_graph_ray.util import ensure_dir_once

    return ensure_dir_once(FIXTURE_ROOT, _build_fixture)


def _build_fixture(tmp: str) -> None:
    cols = ["repo", "path", "commit", "lang", "content"]
    pq.write_table(
        pa.table({c: [f[c] for f in FIXTURE_FILES] for c in cols}),
        os.path.join(tmp, "repo_files.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "src_key": pa.array([t[0] for t in EXPECTED_TRIPLES_LINKED], type=pa.string()),
                "pred": pa.array([t[1] for t in EXPECTED_TRIPLES_LINKED], type=pa.string()),
                "dst_key": pa.array([t[2] for t in EXPECTED_TRIPLES_LINKED], type=pa.string()),
                "repos_packed": pa.array([_REPO] * len(EXPECTED_TRIPLES_LINKED), type=pa.string()),
            }
        ),
        os.path.join(tmp, "expected_triples.parquet"),
    )
    keys_sorted = sorted(n[0] for n in EXPECTED_NODES_LINKED)
    id_of = {k: i for i, k in enumerate(keys_sorted)}
    pq.write_table(
        pa.table(
            {
                "entity_id": pa.array([id_of[n[0]] for n in EXPECTED_NODES_LINKED], type=pa.int64()),
                "entity_key": pa.array([n[0] for n in EXPECTED_NODES_LINKED], type=pa.string()),
                "label": pa.array([n[1] for n in EXPECTED_NODES_LINKED], type=pa.string()),
                "types_packed": pa.array([n[2] for n in EXPECTED_NODES_LINKED], type=pa.string()),
                "repos_packed": pa.array([_REPO] * len(EXPECTED_NODES_LINKED), type=pa.string()),
            }
        ),
        os.path.join(tmp, "expected_nodes.parquet"),
    )
