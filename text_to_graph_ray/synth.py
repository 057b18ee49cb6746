"""Deterministic synthetic source-code repo table + ground-truth triples.

The pipeline's external input is a Parquet table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). No such table ships with the sandbox, so
this module synthesises one deterministically (seeded, order-independent) at a
scale chosen per sf, together with the exact triple/node sets a correct
extraction + canonicalization + alias-linking run must produce. The expected
tables are the conformance oracle: DuckDB reads them in ``oracle_sql()`` while
Ray runs the real pipeline, and the driver hash-compares the two.

Generated constructs are deliberately restricted to shapes the deterministic
extractors (stages/extract.py) parse exactly; adversarial/malformed inputs are
exercised separately in tests (tests/test_conformance.py) where only behavioral
properties — not equality with a generator — are asserted.

Fixture edge cases (FIXTURES.md F1): an empty file, a duplicate-content pair
(same sha256, different paths), an oversized multi-chunk file, unicode
identifiers, a 10x "giant repo" (skew), prose ``lang="text"`` files, plus a
hot entity key (``log``) called from every python file.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from text_to_graph_ray.keys import (
    T_CLS,
    T_CONCEPT,
    T_DIR,
    T_FILE,
    T_FN,
    T_MOD,
    containment_triples,
    entity_key,
    module_path,
    resolve_alias,
    sanitize,
)


# ---------------------------------------------------------------------------
# per-file spec → (content, triples)
# triples are 5-tuples (src_label, src_type, pred, dst_label, dst_type)
# ---------------------------------------------------------------------------


def _python_file(repo, path, gid, rng, n_funcs=4, giant=False):
    file_ent = f"{repo}/{path}"
    lines = ['"""synthetic module."""', "import os"]
    triples = containment_triples(repo, path)
    triples.append((file_ent, T_FILE, "imports", "os", T_MOD))
    nf = n_funcs if not giant else 400  # oversized file: forces multi-chunk at the 1000-token default

    body = []
    for k in range(nf):
        fn = f"fn_{gid}_{k}"
        tgt = f"log" if k == 0 else f"fn_{gid}_{k - 1}"
        body.append("")
        body.append(f"def {fn}(x):")
        body.append(f"    y = {tgt}(x)")
        body.append("    return y")
        triples.append((file_ent, T_FILE, "defines", fn, T_FN))
        triples.append((fn, T_FN, "calls", tgt, T_FN))

    cls = f"Cls_{gid}"
    meth = f"meth_{gid}"
    body += ["", f"class {cls}:", f"    def {meth}(self):", f"        fn_{gid}_0(self)", "        return self"]
    triples.append((file_ent, T_FILE, "defines", cls, T_CLS))
    triples.append((cls, T_CLS, "defines", meth, T_FN))
    triples.append((meth, T_FN, "calls", f"fn_{gid}_0", T_FN))

    body += ["", "def main_entry(argv):", f"    fn_{gid}_0(argv)", "    return 0"]
    triples.append((file_ent, T_FILE, "defines", "main_entry", T_FN))
    triples.append(("main_entry", T_FN, "calls", f"fn_{gid}_0", T_FN))

    return "\n".join(lines + body) + "\n", triples


def _python_importer(repo, path, gid, target_mod_suffix, target_fns):
    """A file that from-imports + dotted-calls another module — alias-link fixture."""
    file_ent = f"{repo}/{path}"
    names = ", ".join(target_fns)
    lines = [
        '"""synthetic module."""',
        f"from {target_mod_suffix} import {names}",
    ]
    triples = containment_triples(repo, path)
    triples.append((file_ent, T_FILE, "imports", target_mod_suffix, T_MOD))
    for n in target_fns:
        triples.append((file_ent, T_FILE, "imports", f"{target_mod_suffix}.{n}", T_MOD))
    fn = f"fn_{gid}_0"
    lines += [
        "",
        f"def {fn}(x):",
        f"    y = {target_fns[0]}(x)",
        f"    z = {target_mod_suffix}.{target_fns[-1]}(y)",
        "    return z",
    ]
    triples.append((file_ent, T_FILE, "defines", fn, T_FN))
    triples.append((fn, T_FN, "calls", target_fns[0], T_FN))
    triples.append((fn, T_FN, "calls", f"{target_mod_suffix}.{target_fns[-1]}", T_FN))
    return "\n".join(lines) + "\n", triples


def _js_file(repo, path, gid, rng):
    file_ent = f"{repo}/{path}"
    mod = f"libmod_{gid}"
    fn, cls, meth = f"jsfn_{gid}", f"JsCls_{gid}", f"render_{gid}"
    lines = [
        "// synthetic",
        f"const helper = require('{mod}');",
        "",
        f"function {fn}(x) {{",
        "  const y = helper(x);",
        "  return y;",
        "}",
        "",
        f"class {cls} {{",
        f"  {meth}(x) {{",
        f"    return {fn}(x);",
        "  }",
        "}",
    ]
    triples = containment_triples(repo, path)
    triples += [
        (file_ent, T_FILE, "imports", mod, T_MOD),
        (file_ent, T_FILE, "defines", fn, T_FN),
        (fn, T_FN, "calls", "helper", T_FN),
        (file_ent, T_FILE, "defines", cls, T_CLS),
        (cls, T_CLS, "defines", meth, T_FN),
        (meth, T_FN, "calls", fn, T_FN),
    ]
    return "\n".join(lines) + "\n", triples


def _java_file(repo, path, gid, rng):
    file_ent = f"{repo}/{path}"
    imp = f"java.util.List"
    cls, meth = f"Svc{gid}", f"run{gid}"
    call = f"dispatch{gid}"
    lines = [
        "// synthetic",
        f"import {imp};",
        "",
        f"public class {cls} {{",
        f"    void {meth}() {{",
        f"        {call}();",
        "    }",
        "}",
    ]
    triples = containment_triples(repo, path)
    triples += [
        (file_ent, T_FILE, "imports", imp, T_MOD),
        (file_ent, T_FILE, "defines", cls, T_CLS),
        (cls, T_CLS, "defines", meth, T_FN),
        (meth, T_FN, "calls", call, T_FN),
    ]
    return "\n".join(lines) + "\n", triples


_TEXT_VERBS = ["uses", "contains", "relates to"]


def _text_file(repo, path, gid, rng):
    file_ent = f"{repo}/{path}"
    triples = containment_triples(repo, path)
    lines = []
    n = rng.randint(3, 6)
    for k in range(n):
        a = f"Concept{gid}x{k}"
        b = f"Concept{gid}x{k + 1}"
        verb = _TEXT_VERBS[rng.randint(0, 2)]
        lines.append(f"{a} {verb} {b}.")
        triples.append((a, T_CONCEPT, verb, b, T_CONCEPT))
    return "\n".join(lines) + "\n", triples


def _commit_for(repo: str) -> str:
    return hashlib.sha256(repo.encode()).hexdigest()[:40]


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------


def build_corpus(n_files: int, seed: int = 42):
    """Returns (file_rows, raw_triples) where file_rows is a list of dicts and
    raw_triples maps (repo, path) -> list of 5-tuples. Deterministic in (n_files, seed)."""
    files = []
    triples_by_file = {}
    # repo layout: repo 0 is the giant (skew fixture); others ~8 files each
    giant_files = max(12, n_files // 4)
    rest = n_files - giant_files
    n_small_repos = max(1, rest // 8)

    plan = [("org0/giant", giant_files)]
    base = rest // n_small_repos
    extra = rest - base * n_small_repos
    for r in range(n_small_repos):
        plan.append((f"org{1 + r // 10}/repo{r}", base + (1 if r < extra else 0)))

    gid = 0
    for repo, nf in plan:
        commit = _commit_for(repo)
        giant = repo.endswith("giant")
        py_paths = []  # (path, [fn names]) for alias-link targets
        for fi in range(nf):
            rng = random.Random(f"{seed}:{repo}:{fi}")
            pkg = f"pkg{fi % 3}"
            kind = fi % 7
            if kind in (0, 1, 2, 3):
                path = f"src/{pkg}/mod_{gid}.py"
                big = giant and fi == 0
                content, tr = _python_file(repo, path, gid, rng, n_funcs=rng.randint(3, 6), giant=big)
                py_paths.append((path, [f"fn_{gid}_{k}" for k in range(2)]))
            elif kind == 4 and py_paths:
                path = f"src/{pkg}/use_{gid}.py"
                tgt_path, tgt_fns = py_paths[rng.randint(0, len(py_paths) - 1)]
                suffix = ".".join(module_path(tgt_path).split(".")[-2:])
                content, tr = _python_importer(repo, path, gid, suffix, tgt_fns)
            elif kind == 5:
                path = f"lib/js/app_{gid}.js"
                content, tr = _js_file(repo, path, gid, rng)
            elif kind == 6 and fi % 14 == 6:
                path = f"src/java/Svc{gid}.java"
                content, tr = _java_file(repo, path, gid, rng)
            else:
                path = f"docs/notes_{gid}.md"
                content, tr = _text_file(repo, path, gid, rng)
            lang = {"py": "python", "js": "javascript", "java": "java", "md": "text"}[path.rsplit(".", 1)[1]]
            files.append({"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content})
            triples_by_file[(repo, path)] = tr
            gid += 1

    # fixture edge cases appended to the first small repo
    fx_repo = plan[min(1, len(plan) - 1)][0]
    fx_commit = _commit_for(fx_repo)

    def add_file(path, content, tr):
        files.append({"repo": fx_repo, "path": path, "commit": fx_commit, "lang": "python" if path.endswith(".py") else "text", "content": content})
        triples_by_file[(fx_repo, path)] = tr

    # empty file: containment only
    add_file("src/empty.py", "", containment_triples(fx_repo, "src/empty.py"))
    # duplicate-content pair (identical bytes, two paths -> same sha)
    dup_rng = random.Random(f"{seed}:dup")
    c1, t1 = _python_file(fx_repo, "src/dup_a.py", 900001, dup_rng, n_funcs=2)
    c2 = c1
    t2 = [x for x in containment_triples(fx_repo, "src/dup_b.py")]
    # same body triples but attributed to dup_b's file entity
    fa, fb = f"{fx_repo}/src/dup_a.py", f"{fx_repo}/src/dup_b.py"
    for (s, st, p, d, dt) in t1:
        if (p, d) == ("contains", fa) or st == T_DIR or s == fx_repo:
            continue
        t2.append((fb if s == fa else s, st, p, fb if d == fa else d, dt))
    add_file("src/dup_a.py", c1, t1)
    add_file("src/dup_b.py", c2, t2)
    # unicode identifiers
    upath = "src/unicode_mod.py"
    ufile = f"{fx_repo}/{upath}"
    ucontent = '"""synthetic module."""\n\ndef función_ñ(x):\n    y = log(x)\n    return y\n'
    utr = containment_triples(fx_repo, upath) + [
        (ufile, T_FILE, "defines", "función_ñ", T_FN),
        ("función_ñ", T_FN, "calls", "log", T_FN),
    ]
    add_file(upath, ucontent, utr)

    return files, triples_by_file


# ---------------------------------------------------------------------------
# ground-truth tables (raw, linked, nodes)
# ---------------------------------------------------------------------------


def _defs_index(triples_by_file):
    """name -> set of defining module paths (python-style), for alias resolution."""
    idx = {}
    for (repo, path), trs in triples_by_file.items():
        mp = module_path(path)
        for (s, st, p, d, dt) in trs:
            if p == "defines":
                idx.setdefault(entity_key(d), set()).add(mp)
    return idx


def expected_tables(triples_by_file, link: bool):
    """Compute the canonical expected (triples, nodes) after canonicalization
    (+ optional alias linking). Returns (triples_rows, nodes_rows) sorted."""
    defs_idx = _defs_index(triples_by_file) if link else {}

    def canon(label):
        k = entity_key(label)
        if link:
            tgt = resolve_alias(k, defs_idx)
            if tgt is not None:
                return tgt
        return k

    node_types: dict[str, set] = {}
    node_labels: dict[str, set] = {}
    node_repos: dict[str, set] = {}
    triple_repos: dict[tuple, set] = {}

    for (repo, path), trs in triples_by_file.items():
        for (s, st, p, d, dt) in trs:
            sk, dk = canon(s), canon(d)
            node_types.setdefault(sk, set()).add(st)
            node_types.setdefault(dk, set()).add(dt)
            node_labels.setdefault(sk, set()).add(sanitize(s) if entity_key(s) == sk else sk)
            node_labels.setdefault(dk, set()).add(sanitize(d) if entity_key(d) == dk else dk)
            node_repos.setdefault(sk, set()).add(repo)
            node_repos.setdefault(dk, set()).add(repo)
            triple_repos.setdefault((sk, p.lower(), dk), set()).add(repo)

    triples_rows = [
        {"src_key": s, "pred": p, "dst_key": d, "repos_packed": "|".join(sorted(rs))}
        for (s, p, d), rs in sorted(triple_repos.items())
    ]
    nodes_rows = []
    for i, k in enumerate(sorted(node_types)):
        # label: generator guarantees a unique casing per key outside tests;
        # pick the lexicographically-first candidate for full determinism
        label = sorted(node_labels[k])[0]
        nodes_rows.append(
            {
                "entity_id": i,
                "entity_key": k,
                "label": label,
                "types_packed": "|".join(sorted(node_types[k])),
                "repos_packed": "|".join(sorted(node_repos[k])),
            }
        )
    return triples_rows, nodes_rows


# ---------------------------------------------------------------------------
# parquet materialization (cached under /tmp/graft_synth/<tag>)
# ---------------------------------------------------------------------------

# version-tagged cache dir: bump when the generator changes so stale corpora
# are never reused across code versions
SYNTH_ROOT = "/tmp/graft_synth/v6"  # v6: +expected_pagerank

_SF_FILES = {"sf0.001": 60, "sf0.01": 600, "sf0.1": 6000}


def n_files_for(tag: str) -> int:
    return _SF_FILES.get(tag, 600)


def synth_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SYNTH_ROOT, tag)


def ensure_synth(sf_dir: str, seed: int = 42) -> str:
    """Idempotently materialize the synthetic corpus + oracles for an sf dir.

    Writes atomically (tmp dir + rename) so concurrent callers are safe:
      repo_files.parquet, expected_triples_raw.parquet,
      expected_triples_linked.parquet, expected_nodes.parquet
    Returns the directory path.
    """
    from text_to_graph_ray.util import ensure_dir_once

    tag = os.path.basename(os.path.normpath(sf_dir))
    return ensure_dir_once(synth_dir_for(sf_dir), lambda tmp: _build_synth(tag, seed, tmp))


def _build_synth(tag: str, seed: int, tmp: str) -> None:
    files, tbf = build_corpus(n_files_for(tag), seed=seed)

    cols = ["repo", "path", "commit", "lang", "content"]
    tbl = pa.table({c: [f[c] for f in files] for c in cols})
    # small row groups so ray.data.read_parquet can split one file into many
    # read tasks — a single fat row group serializes the whole extract chain
    pq.write_table(tbl, os.path.join(tmp, "repo_files.parquet"), row_group_size=128)

    n_nodes_linked = n_edges_linked = 0
    linked_triples = []
    for link, name in [(False, "expected_triples_raw"), (True, "expected_triples_linked")]:
        trs, nds = expected_tables(tbf, link=link)
        pq.write_table(pa.Table.from_pylist(trs), os.path.join(tmp, f"{name}.parquet"))
        if link:
            pq.write_table(pa.Table.from_pylist(nds), os.path.join(tmp, "expected_nodes.parquet"))
            n_nodes_linked, n_edges_linked = len(nds), len(trs)
            linked_triples = trs
        else:
            pq.write_table(pa.Table.from_pylist(nds), os.path.join(tmp, "expected_nodes_raw.parquet"))

    # weakly-connected components of the linked graph: union-find over the
    # expected triples, top-20 component sizes (the kg_components oracle)
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for t in linked_triples:
        a, b = t["src_key"], t["dst_key"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    from collections import Counter

    sizes = Counter(find(x) for x in parent)
    top = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    pq.write_table(
        pa.table(
            {
                "component": pa.array([c for c, _ in top], type=pa.string()),
                "size": pa.array([n for _, n in top], type=pa.int64()),
            }
        ),
        os.path.join(tmp, "expected_components.parquet"),
    )

    # PageRank oracle over the linked graph: naive power iteration with the
    # engine's documented semantics (DISTINCT edges, uniform init, no dangling
    # redistribution, np.round at every iteration boundary), ranked on the
    # expected dense entity ids, top 20 — the kg_pagerank_topk oracle
    import numpy as np

    id_of = {n["entity_key"]: n["entity_id"] for n in nds}
    dedges = sorted({(t["src_key"], t["dst_key"]) for t in linked_triples})
    pnodes = sorted({k for e in dedges for k in e})
    if pnodes:
        N = len(pnodes)
        outdeg: dict = {}
        for a, _ in dedges:
            outdeg[a] = outdeg.get(a, 0) + 1
        r = {k: float(np.round(1.0 / N, 9)) for k in pnodes}
        d = 0.85
        for _ in range(5):
            sacc = {k: 0.0 for k in pnodes}
            for a, b in dedges:
                sacc[b] += r[a] / outdeg[a]
            arr = np.round((1.0 - d) / N + d * np.array([sacc[k] for k in pnodes]), 9)
            r = dict(zip(pnodes, arr.tolist()))
        top = sorted(pnodes, key=lambda k: (-r[k], id_of[k]))[:20]
        pq.write_table(
            pa.table(
                {
                    "entity_key": pa.array(top, type=pa.string()),
                    "rank": pa.array([r[k] for k in top], type=pa.float64()),
                }
            ),
            os.path.join(tmp, "expected_pagerank.parquet"),
        )

    # chunk-count oracle: the chunker is deterministic, so its per-file chunk
    # counts ARE reproducible at generation time (single-threaded, no Ray) —
    # the distributed read/sha/chunk/groupby plumbing is what the driver's
    # hash compare then verifies
    from text_to_graph_ray.config import DEFAULT_CONFIG
    from text_to_graph_ray.stages.chunker import chunk_one_file

    ch_rows = []
    for f in files:
        chunks = chunk_one_file(f["content"] or "", f["lang"], DEFAULT_CONFIG)
        ch_rows.append(
            {
                "repo": f["repo"],
                "path": f["path"],
                "n_chunks": len(chunks),
                "n_tokens": sum(c["chunk_size"] for c in chunks),
            }
        )
    ch_rows.sort(key=lambda r: (r["repo"], r["path"]))
    pq.write_table(
        pa.table(
            {
                "repo": pa.array([r["repo"] for r in ch_rows], type=pa.string()),
                "path": pa.array([r["path"] for r in ch_rows], type=pa.string()),
                "n_chunks": pa.array([r["n_chunks"] for r in ch_rows], type=pa.int64()),
                "n_tokens": pa.array([r["n_tokens"] for r in ch_rows], type=pa.int64()),
            }
        ),
        os.path.join(tmp, "expected_chunks.parquet"),
    )

    # checkpointed-run counter oracle (the kg_run_checkpointed query runs at
    # num_partitions=16 with default linking): run 1 computes every partition,
    # run 2 must be a pure resume no-op with identical graph counts
    from text_to_graph_ray.state.checkpoint import part_of

    n_parts = len({part_of(f["repo"], f["path"], 16) for f in files})
    run_rows = [
        (1, n_parts, 0, n_parts, n_nodes_linked, n_edges_linked),
        (2, n_parts, n_parts, 0, n_nodes_linked, n_edges_linked),
    ]
    pq.write_table(
        pa.table(
            {
                "run": pa.array([r[0] for r in run_rows], type=pa.int64()),
                "parts_total": pa.array([r[1] for r in run_rows], type=pa.int64()),
                "parts_skipped": pa.array([r[2] for r in run_rows], type=pa.int64()),
                "parts_computed": pa.array([r[3] for r in run_rows], type=pa.int64()),
                "nodes": pa.array([r[4] for r in run_rows], type=pa.int64()),
                "edges": pa.array([r[5] for r in run_rows], type=pa.int64()),
            }
        ),
        os.path.join(tmp, "expected_run.parquet"),
    )


def _scaling_file(repo: str, path: str, gid: int, n_files: int, n_funcs: int = 6, body_lines: int = 30) -> str:
    """Call-heavy, definition-light python file (~4 KB): realistic shape for
    the scaling measurement — per-file extraction compute dominates, call
    targets REPEAT (like real code) so the chunk-local dedup and the combiner
    collapse the edge stream, the defs vocabulary stays broadcast-sized, and
    cross-file bare-name calls exercise the canonicalization merge."""
    lines = ['"""synthetic module."""', "import os"]
    for k in range(n_funcs):
        fn = f"fn_{gid}_{k}"
        # each function calls a small pool of targets, repeatedly
        pool = [
            "log",
            f"fn_{gid}_{(k + 1) % n_funcs}",
            f"fn_{(gid + 13) % n_files}_{k % n_funcs}",
            f"fn_{(gid * 31 + k) % n_files}_0",
            "os.path",
        ]
        lines.append("")
        lines.append(f"def {fn}(x):")
        lines.append("    y0 = log(x)")
        for i in range(1, body_lines):
            tgt = pool[i % len(pool)]
            lines.append(f"    y{i} = {tgt}(y{i - 1})")
        lines.append(f"    return y{body_lines - 1}")
    return "\n".join(lines) + "\n"


# the scaling corpus generator is frozen: keep it OUTSIDE the versioned
# synth root so correctness-oracle version bumps never force regenerating
# this (large) corpus; pre-bump copies are adopted by rename
SCALING_ROOT = "/tmp/graft_synth/scaling"


def ensure_scaling_corpus(n_files: int = 100_000, n_funcs: int = 8, body_lines: int = 250, seed: int = 42, shards: int = 128) -> str:
    """A larger content-only corpus for the two-parallelism scaling
    measurement, sharded into many parquet files so the read fans out. No
    oracle tables (the scaling run measures throughput, not correctness —
    the correctness corpus is ``ensure_synth``)."""
    from text_to_graph_ray.util import ensure_dir_once

    tag = f"scaling3-{n_files}-{n_funcs}x{body_lines}"
    out = os.path.join(SCALING_ROOT, tag)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        legacy = os.path.join("/tmp/graft_synth/v3", tag)
        if os.path.exists(os.path.join(legacy, "_SUCCESS")):
            os.makedirs(SCALING_ROOT, exist_ok=True)
            try:
                os.rename(legacy, out)
            except OSError:
                pass

    def build(tmp: str) -> None:
        per_shard = (n_files + shards - 1) // shards
        gid = 0
        for s in range(shards):
            rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
            for _ in range(per_shard):
                if gid >= n_files:
                    break
                repo = f"org{gid % 40}/repo{gid % 400}"
                path = f"src/pkg{gid % 7}/mod_{gid}.py"
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(_commit_for(repo))
                rows["lang"].append("python")
                rows["content"].append(_scaling_file(repo, path, gid, n_files, n_funcs, body_lines))
                gid += 1
            pq.write_table(pa.table(rows), os.path.join(tmp, f"shard-{s:04d}.parquet"), row_group_size=256)

    return ensure_dir_once(out, build)


def ensure_doc_scaling_corpus(n_docs: int = 400_000, tokens_per_doc: int = 400, seed: int = 7, shards: int = 128) -> str:
    """A larger synthetic DOCUMENTS corpus for the dedup scaling pair —
    (doc_id, text, source) sharded parquet, deterministic, with a 2%
    near-duplicate injection so LSH pair-generation does real work. No
    oracle (the scaling run measures throughput; correctness is covered by
    the sf-dir dedup queries)."""
    import numpy as np

    from text_to_graph_ray.util import ensure_dir_once

    tag = f"docs-{n_docs}x{tokens_per_doc}"
    out = os.path.join(SCALING_ROOT, tag)

    def build(tmp: str) -> None:
        rng = np.random.default_rng(seed)
        vocab = np.array([f"w{i}" for i in range(50_000)])
        per_shard = (n_docs + shards - 1) // shards
        gid = 0
        prev_tokens = None
        for s in range(shards):
            rows = {"doc_id": [], "text": [], "source": []}
            count = min(per_shard, n_docs - gid)
            if count <= 0:
                break
            # vectorized: one (count, tokens_per_doc) token-index draw per shard
            idx = rng.integers(0, len(vocab), size=(count, tokens_per_doc))
            for r in range(count):
                toks = vocab[idx[r]]
                if prev_tokens is not None and gid % 50 == 0:  # 2% near-dups
                    toks = prev_tokens.copy()
                    toks[:: 17] = vocab[rng.integers(0, len(vocab), size=len(toks[::17]))]
                prev_tokens = toks
                rows["doc_id"].append(gid)
                rows["text"].append(" ".join(toks))
                rows["source"].append(f"src{gid % 20}")
                gid += 1
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                        "text": pa.array(rows["text"], type=pa.string()),
                        "source": pa.array(rows["source"], type=pa.string()),
                    }
                ),
                os.path.join(tmp, f"shard-{s:04d}.parquet"),
                row_group_size=512,
            )

    return ensure_dir_once(out, build)
