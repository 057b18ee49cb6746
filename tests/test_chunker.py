"""Chunker packing semantics — the reference fixture cases (FIXTURES.md F2,
chunk_utils.py:56-135 behavior)."""

import pyarrow as pa

from text_to_graph_ray.config import PipelineConfig
from text_to_graph_ray.stages.chunker import chunk_files, chunk_one_file, count_tokens

CFG = PipelineConfig(chunk_size=20)  # max 22, min 10


def toks(n, word="w"):
    return " ".join(f"{word}{i}" for i in range(n))


def test_short_text_single_chunk():
    chunks = chunk_one_file(toks(5), "text", CFG)
    assert len(chunks) == 1
    assert chunks[0]["chunk_size"] == 5
    assert chunks[0]["chunk_index"] == 0


def test_empty_content_emits_one_empty_chunk():
    chunks = chunk_one_file("", "python", CFG)
    assert len(chunks) == 1
    assert chunks[0]["text"] == ""
    assert chunks[0]["chunk_size"] == 0


def test_oversized_unit_emitted_alone():
    # one unit above max (22): packed alone into its own chunk (chunk_utils.py:107-112)
    text = toks(30) + "\n\n" + toks(15, "x")
    chunks = chunk_one_file(text, "text", CFG)
    assert chunks[0]["chunk_size"] >= 30
    assert len(chunks) == 2


def test_tail_merge_into_predecessor():
    # trailing chunk below min merges back (chunk_utils.py:117-125)
    text = toks(20) + ".\n\n" + toks(20, "y") + ".\n\n" + toks(3, "z")
    chunks = chunk_one_file(text, "text", CFG)
    assert chunks[-1]["chunk_size"] >= CFG.min_tokens or len(chunks) == 1
    total = sum(count_tokens(c["text"]) for c in chunks)
    assert total == 43  # no tokens lost by the merge


def test_greedy_packing_respects_max():
    text = "\n\n".join(toks(8, f"u{i}x") for i in range(10))  # 10 units of 8 tokens
    chunks = chunk_one_file(text, "text", CFG)
    for c in chunks[:-1]:
        assert c["chunk_size"] <= CFG.max_tokens


def test_code_units_keep_defs_whole():
    content = "def a(x):\n    return x\n\ndef b(y):\n    return y\n"
    big = "\n\n".join([content] * 20)
    chunks = chunk_one_file(big, "python", CFG)
    for c in chunks:
        # every chunk starts at a top-level def, never inside a body
        assert not c["text"].startswith(" ")
        for line in c["text"].split("\n"):
            if line.startswith("def "):
                break
        else:
            raise AssertionError("chunk without a top-level def")


def test_indented_continuation_glued_to_block():
    content = "def a(x):\n    y = 1\n\n    return y\n"
    chunks = chunk_one_file(content, "python", CFG)
    assert len(chunks) == 1
    assert "return y" in chunks[0]["text"]


def test_padding_chars_mode():
    cfg = PipelineConfig(chunk_size=20, padding_mode="chars", overlap_chars=10)
    text = "\n\n".join(toks(18, f"u{i}x") for i in range(4))
    chunks = chunk_one_file(text, "text", cfg)
    assert len(chunks) >= 2
    assert chunks[0]["text_padded"].startswith(chunks[0]["text"])
    # middle chunks carry a tail of prev and head of next
    mid = chunks[1]
    assert chunks[0]["text"][-10:] in mid["text_padded"]
    assert mid["text"] in mid["text_padded"]


def test_padding_chunks_mode_full_neighbors():
    cfg = PipelineConfig(chunk_size=20, padding_mode="chunks")
    text = "\n\n".join(toks(18, f"u{i}x") for i in range(4))
    chunks = chunk_one_file(text, "text", cfg)
    mid = chunks[1]
    assert chunks[0]["text"] in mid["text_padded"] and chunks[2]["text"] in mid["text_padded"]


def test_chunk_files_batch_schema():
    batch = pa.table(
        {
            "repo": ["r1", "r2"],
            "path": ["a.py", "b.md"],
            "lang": ["python", "text"],
            "content_sha256": ["h1", "h2"],
            "content": ["def f(x):\n    return x\n", "Hello world."],
        }
    )
    out = chunk_files(batch, CFG)
    from text_to_graph_ray.schema import CHUNKS

    assert out.schema.equals(CHUNKS)
    assert out.num_rows == 2
    assert out.column("token_start").to_pylist() == [0, 0]
