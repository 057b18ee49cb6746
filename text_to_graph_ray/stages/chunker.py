"""Code-aware chunking + context padding, fused per-file.

Reimplements the reference chunker's packing semantics (/root/reference/
graph_extractor/src/chunk_utils.py:56-135): greedy packing of split units to a
target token budget with hard cap ``1.1x``, a ``0.5x`` minimum, and tail-merge
of an undersized final chunk (chunk_utils.py:117-125). Two deliberate changes
for the code payload and for Ray:

* units for code languages are **top-level blocks** (blank-line separated,
  indented continuations glued to their block) instead of sentences, so a
  def/class never splits across chunks and per-chunk extraction equals per-file
  extraction unioned;
* context padding (reference graph_generator.py:194-199,247-288) is computed
  HERE, at chunk-creation time inside the per-file UDF — every chunk of a file
  comes from one input row, so the reference's cross-row neighbor dependency
  (and any ordering/shuffle requirement) disappears.

Token counting uses the reference's fallback tokenizer semantics
(gpt.py:32-34: ``len(text.split())``) — deterministic and dependency-free.

Stateless: run as ``ds.map_batches(chunk_files, batch_format="pyarrow")``.
One input file row emits N>=1 chunk rows (empty files emit one empty chunk so
path-derived containment triples still materialize downstream).
"""

from __future__ import annotations

import pyarrow as pa

from text_to_graph_ray.config import DEFAULT_CONFIG, PipelineConfig

_CODE_LANGS = {"python", "javascript", "java", "go", "rust", "c", "cpp", "typescript"}


def count_tokens(text: str) -> int:
    return len(text.split())


_TOKENIZERS: dict = {}


def token_counter(cfg: PipelineConfig):
    """Resolve the configured token counter (reference gpt.py:27-34):
    ``tokenizer="tiktoken"`` loads ``encoding_for_model(tokenizer_model)``
    once per WORKER PROCESS (module-level cache — the reference re-resolved
    it every call) and falls back to the whitespace counter when tiktoken
    isn't importable, exactly like the reference's except-path."""
    if cfg.tokenizer != "tiktoken":
        return count_tokens
    key = (cfg.tokenizer, cfg.tokenizer_model)
    fn = _TOKENIZERS.get(key)
    if fn is None:
        try:
            import tiktoken

            enc = tiktoken.encoding_for_model(cfg.tokenizer_model)

            def fn(text: str, _enc=enc) -> int:
                return len(_enc.encode(text))

        except Exception:
            fn = count_tokens  # gpt.py:32-34 fallback
        _TOKENIZERS[key] = fn
    return fn


def _code_units(content: str) -> list[str]:
    """Top-level blocks: split on blank lines, then glue any unit that starts
    indented back onto its predecessor (a body continuation, never a new
    top-level construct)."""
    raw = [u for u in content.split("\n\n") if u.strip()]
    units: list[str] = []
    for u in raw:
        if units and (u[:1].isspace()):
            units[-1] = units[-1] + "\n\n" + u
        else:
            units.append(u)
    return units


def _text_units(content: str) -> list[str]:
    """Reference unit split (chunk_utils.py:71-86): paragraphs -> sentences -> lines."""
    import re

    units = []
    for paragraph in (p.strip() for p in content.split("\n\n")):
        if not paragraph:
            continue
        for sentence in re.split(r"(?<=[.!?])\s+", paragraph):
            for line in sentence.strip().split("\n"):
                if line.strip():
                    units.append(line.strip())
    return units


def chunk_one_file(content: str, lang: str, cfg: PipelineConfig) -> list[dict]:
    """Greedy packing per chunk_utils.py:92-125; returns list of chunk dicts
    with text + padding. Always >= 1 chunk."""
    units = _code_units(content) if lang in _CODE_LANGS else _text_units(content)

    ct = token_counter(cfg)
    max_tok, min_tok = cfg.max_tokens, cfg.min_tokens
    chunks: list[dict] = []
    cur: list[str] = []
    cur_tok = 0
    start_tok = 0

    def finalize():
        nonlocal cur, cur_tok, start_tok
        text = "\n".join(cur).strip()
        chunks.append({"text": text, "chunk_size": cur_tok, "token_start": start_tok, "token_end": start_tok + cur_tok})
        start_tok = start_tok + cur_tok + 1
        cur, cur_tok = [], 0

    i = 0
    while i < len(units):
        t = ct(units[i])
        if cur_tok + t <= max_tok:
            cur.append(units[i])
            cur_tok += t
            i += 1
        elif cur_tok >= min_tok:
            finalize()
        else:
            cur.append(units[i])
            cur_tok += t
            i += 1
            finalize()
    if cur or not chunks:
        finalize()

    # tail-merge (chunk_utils.py:117-125)
    if len(chunks) > 1 and chunks[-1]["chunk_size"] < min_tok:
        last = chunks.pop()
        prev = chunks[-1]
        prev["text"] = prev["text"] + "\n" + last["text"]
        prev["chunk_size"] = ct(prev["text"])
        prev["token_end"] = prev["token_start"] + prev["chunk_size"]

    # context padding computed in place — no cross-row dependency
    n = len(chunks)
    for idx, ch in enumerate(chunks):
        if cfg.padding_mode == "none":
            padded = ""  # not materialized: extraction reads `text`; modes "chars"/"chunks" exist for the two-pass path
        elif n == 1:
            padded = ch["text"]
        elif cfg.padding_mode == "chunks":  # L2-style ±1 full chunk (graph_generator.py:194-199)
            parts = []
            if idx > 0:
                parts.append(chunks[idx - 1]["text"])
            parts.append(ch["text"])
            if idx < n - 1:
                parts.append(chunks[idx + 1]["text"])
            padded = "\n".join(parts)
        else:  # "chars": L0-style char-window overlap (graph_generator.py:247-288)
            k = cfg.overlap_chars
            pre = chunks[idx - 1]["text"][-k:] if idx > 0 else ""
            post = chunks[idx + 1]["text"][:k] if idx < n - 1 else ""
            padded = "\n".join(p for p in (pre, ch["text"], post) if p)
        ch["text_padded"] = padded
        ch["chunk_index"] = idx
    return chunks


def chunk_files(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    langs = batch.column("lang").to_pylist()
    shas = batch.column("content_sha256").to_pylist()
    contents = batch.column("content").to_pylist()

    cols: dict[str, list] = {k: [] for k in ("repo", "path", "lang", "content_sha256", "chunk_index", "chunk_size", "token_start", "token_end", "text", "text_padded")}
    for repo, path, lang, sha, content in zip(repos, paths, langs, shas, contents):
        for ch in chunk_one_file(content or "", lang, cfg):
            cols["repo"].append(repo)
            cols["path"].append(path)
            cols["lang"].append(lang)
            cols["content_sha256"].append(sha)
            for k in ("chunk_index", "chunk_size", "token_start", "token_end", "text", "text_padded"):
                cols[k].append(ch[k])

    from text_to_graph_ray.schema import CHUNKS

    return pa.table({f.name: pa.array(cols[f.name], type=f.type) for f in CHUNKS})
