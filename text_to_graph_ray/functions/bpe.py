"""Byte-pair-encoding tokenizer training over a documents table.

The reference engine consumes an externally-trained tokenizer
(/root/reference/graph_extractor/src/chunk_utils.py counts tokens with a
fixed tiktoken encoding); a 100-TB training-data pipeline also needs to
TRAIN one. ``bpe_train`` learns the first ``n_merges`` BPE merge rules
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") with a Ray-Data-first shape:

* The ONLY corpus-sized operation is a distinct-word-count exchange
  (per-batch combiner partials -> one ``groupby("word").Sum``). Everything
  after runs over the distinct-word table, which is vocabulary-sized
  (Heaps' law: ~1e6-1e8 rows for a 100-TB corpus, not 1e12).
* Small-vocab path (<= ``word_collect_max`` distinct words): collect the
  (word, freq) table to the driver and run the classic incremental merge
  loop — pair counts built once, only words containing the winning pair
  are touched per iteration.
* Large-vocab path: the word table stays a Dataset of (syms, freq) rows;
  each iteration is one vocabulary-sized pair-count exchange (per-batch
  pandas combine -> groupby Sum -> sort desc-count / asc-pair -> limit(1))
  plus a broadcast of the single winning pair applied in ``map_batches``.
  n_merges iterations = n_merges cheap exchanges, never a corpus pass.
  Both paths are value-identical (equivalence-tested at
  ``word_collect_max=0``).

Spec (shared with the naive oracle in expected.py):
  words   = text.split() (unicode whitespace, empties dropped)
  symbols = list of characters + a trailing "</w>" end-of-word marker
  merge i = the adjacent symbol pair with the highest total frequency
            (sum of freq over distinct words, counting multiplicity within
            a word); ties broken by (left ASC, right ASC); merged symbol
            is the string concatenation left+right
  stop    = after n_merges merges or when no adjacent pair remains

Returns a Dataset (rank int64 1-based, left string, right string,
pair_count int64) ordered by rank.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_SCHEMA = pa.schema([("word", pa.string()), ("freq", pa.int64())])
_OUT_SCHEMA = pa.schema(
    [("rank", pa.int64()), ("left", pa.string()), ("right", pa.string()), ("pair_count", pa.int64())]
)


def word_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (word, freq) combiner partials — the corpus-sized stage.

    ASCII rows take the vectorized Arrow path (utf8_split_whitespace
    collapses internal runs; empties only at row edges — same contract as
    the bigram kernel in text.py); non-ASCII rows fall back to str.split
    per row so the unicode-whitespace spec holds everywhere.
    """
    if batch.num_rows == 0:
        return _WORD_SCHEMA.empty_table()
    txt = pc.fill_null(batch.column(text_col), "").combine_chunks()
    ascii_mask = pc.string_is_ascii(txt)
    toks_parts = []
    if pc.any(ascii_mask).as_py():
        flat = pc.list_flatten(pc.utf8_split_whitespace(txt.filter(ascii_mask)))
        toks_parts.append(flat.filter(pc.not_equal(flat, "")))
    if not pc.all(ascii_mask).as_py():
        py = []
        for t in txt.filter(pc.invert(ascii_mask)).to_pylist():
            py.extend(t.split())
        toks_parts.append(pa.array(py, type=pa.string()))
    toks = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in toks_parts])
    if len(toks) == 0:
        return _WORD_SCHEMA.empty_table()
    vc = toks.value_counts()
    return pa.table(
        {"word": vc.field("values"), "freq": pc.cast(vc.field("counts"), pa.int64())},
        schema=_WORD_SCHEMA,
    )


def _syms(word: str) -> tuple:
    return tuple(word) + ("</w>",)


def _driver_bpe(words: list[str], freqs: list[int], n_merges: int) -> list[tuple]:
    """Classic incremental BPE over a (word, freq) vocabulary: pair counts
    built once; each merge touches only words containing the winning pair
    (pair -> word-id index maintained alongside)."""
    from collections import Counter, defaultdict

    seqs = [_syms(w) for w in words]
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for i, (s, f) in enumerate(zip(seqs, freqs)):
        for a, b in zip(s, s[1:]):
            counts[(a, b)] += f
            where[(a, b)].add(i)

    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), cnt = best
        if cnt <= 0:
            break
        merges.append((rank, la, rb, cnt))
        new_sym = la + rb
        touched = list(where[(la, rb)])
        for i in touched:
            s, f = seqs[i], freqs[i]
            # retract this word's pair contributions
            for a, b in zip(s, s[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] == 0:
                    del counts[(a, b)]
                where[(a, b)].discard(i)
            # apply the merge left-to-right
            out = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == la and s[j + 1] == rb:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s2 = tuple(out)
            seqs[i] = s2
            for a, b in zip(s2, s2[1:]):
                counts[(a, b)] += f
                where[(a, b)].add(i)
    return merges


def _apply_merge_rows(sym_lists: list, la: str, rb: str) -> list:
    out_rows = []
    for s in sym_lists:
        out = []
        j = 0
        n = len(s)
        while j < n:
            if j + 1 < n and s[j] == la and s[j + 1] == rb:
                out.append(la + rb)
                j += 2
            else:
                out.append(s[j])
                j += 1
        out_rows.append(out)
    return out_rows


def bpe_train(
    ds,
    n_merges: int = 40,
    text_col: str = "text",
    word_collect_max: int = 2_000_000,
):
    """Learn the first ``n_merges`` BPE merge rules from a documents
    Dataset. See module docstring for the spec and the two plans."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    vocab = (
        ds.map_batches(lambda b: word_count_partials(b, text_col), batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
        .materialize()
    )
    n_words = vocab.count()

    if n_words <= word_collect_max:
        rows = vocab.take_all()
        words = [r["word"] for r in rows]
        freqs = [int(r["freq"]) for r in rows]
        merges = _driver_bpe(words, freqs, n_merges)
    else:
        merges = _distributed_bpe(vocab, n_merges)

    out = pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.string()),
            "right": pa.array([m[2] for m in merges], type=pa.string()),
            "pair_count": pa.array([m[3] for m in merges], type=pa.int64()),
        },
        schema=_OUT_SCHEMA,
    )
    return rd.from_arrow(out)


_PAIR_SCHEMA = pa.schema([("left", pa.string()), ("right", pa.string()), ("pair_count", pa.int64())])


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (left, right, freq-weighted count) partials over (syms,
    freq) rows — vectorized via one flatten + offset-derived shifts."""
    import pandas as pd

    if batch.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    syms = batch.column("syms").combine_chunks()
    freq = batch.column("freq").to_numpy(zero_copy_only=False)
    flat = syms.flatten()
    lens = np.diff(syms.offsets.to_numpy(zero_copy_only=False))
    n_pairs_per_row = np.maximum(lens - 1, 0)
    if int(n_pairs_per_row.sum()) == 0:
        return _PAIR_SCHEMA.empty_table()
    # indices of pair starts: for each row, positions [start, start+len-2]
    starts = np.repeat(np.cumsum(np.concatenate([[0], lens[:-1]])), n_pairs_per_row)
    within = np.concatenate([np.arange(k) for k in n_pairs_per_row if k > 0])
    idx = (starts + within).astype(np.int64)
    left = flat.take(pa.array(idx))
    right = flat.take(pa.array(idx + 1))
    w = np.repeat(freq, n_pairs_per_row)
    df = pd.DataFrame({"left": left.to_pandas(), "right": right.to_pandas(), "pair_count": w})
    g = df.groupby(["left", "right"], as_index=False, sort=False)["pair_count"].sum()
    return pa.table(
        {
            "left": pa.array(g["left"], type=pa.string()),
            "right": pa.array(g["right"], type=pa.string()),
            "pair_count": pa.array(g["pair_count"], type=pa.int64()),
        },
        schema=_PAIR_SCHEMA,
    )


def _distributed_bpe(vocab, n_merges: int) -> list[tuple]:
    """Large-vocab plan: the word table never leaves the cluster. Each
    iteration = one vocabulary-sized pair-count exchange + a 1-row winner
    take + a broadcast merge applied per batch. The words Dataset is
    re-materialized per round (it is vocab-sized, not corpus-sized)."""

    def to_syms(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("syms", pa.list_(pa.string())), ("freq", pa.int64())]).empty_table()
        rows = [list(_syms(w)) for w in b.column("word").to_pylist()]
        return pa.table(
            {
                "syms": pa.array(rows, type=pa.list_(pa.string())),
                "freq": pc.cast(b.column("freq"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    words = vocab.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            words.map_batches(_pair_partials, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("pair_count", alias_name="pair_count"))
            .sort(["pair_count", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top:
            break
        la, rb, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, la, rb, cnt))

        def apply(b: pa.Table, la=la, rb=rb) -> pa.Table:
            if b.num_rows == 0:
                return b
            rows = _apply_merge_rows(b.column("syms").to_pylist(), la, rb)
            return pa.table(
                {"syms": pa.array(rows, type=pa.list_(pa.string())), "freq": b.column("freq")}
            )

        words = words.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def _encode_len(word: str, merges: list[tuple]) -> int:
    """Subword count after applying ``merges`` sequentially in rank order,
    left-to-right within the word — the spec shared with the naive oracle."""
    s = list(word) + ["</w>"]
    for la, rb in merges:
        if la not in s:  # cheap skip: the left symbol must be present
            continue
        out = []
        j = 0
        n = len(s)
        while j < n:
            if j + 1 < n and s[j] == la and s[j + 1] == rb:
                out.append(la + rb)
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return len(s)


class BpeEncoder:
    """Actor-pool encode stage: the merge table is held once per actor and
    distinct words are encoded once per actor (unbounded dict cache — the
    vocabulary is Heaps-law bounded, and the cache is per-process).

    Per batch: one whitespace split (vectorized for ASCII rows, str.split
    fallback otherwise), dictionary-encode the flattened tokens so each
    DISTINCT word is encoded once, then per-doc subword sums via one
    bincount over the doc index. Output (id_col, n_words, n_subwords)."""

    def __init__(self, merges: list[tuple], text_col: str = "text", id_col: str = "doc_id"):
        self.merges = [tuple(m) for m in merges]
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict = {}
        self.out_schema = pa.schema(
            [(id_col, pa.int64()), ("n_words", pa.int64()), ("n_subwords", pa.int64())]
        )

    def _enc(self, w: str) -> int:
        got = self.cache.get(w)
        if got is None:
            got = self.cache[w] = _encode_len(w, self.merges)
        return got

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return self.out_schema.empty_table()
        txt = pc.fill_null(b.column(self.text_col), "").combine_chunks()
        n = len(txt)
        ascii_mask = pc.string_is_ascii(txt).to_numpy(zero_copy_only=False)
        doc_idx_parts, tok_parts = [], []
        if ascii_mask.any():
            rows = np.where(ascii_mask)[0]
            sub = pc.utf8_split_whitespace(txt.take(pa.array(rows)))
            if isinstance(sub, pa.ChunkedArray):
                sub = sub.combine_chunks()
            flat = pc.list_flatten(sub)
            keep = pc.not_equal(flat, "")
            lens = np.diff(sub.offsets.to_numpy(zero_copy_only=False))
            docrep = np.repeat(rows, lens)[keep.to_numpy(zero_copy_only=False)]
            doc_idx_parts.append(docrep)
            tok_parts.append(flat.filter(keep))
        if not ascii_mask.all():
            for r in np.where(~ascii_mask)[0]:
                ws = txt[int(r)].as_py().split()
                doc_idx_parts.append(np.full(len(ws), r, dtype=np.int64))
                tok_parts.append(pa.array(ws, type=pa.string()))
        n_words = np.zeros(n, dtype=np.int64)
        n_sub = np.zeros(n, dtype=np.int64)
        if tok_parts:
            doc_idx = np.concatenate(doc_idx_parts).astype(np.int64)
            toks = pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in tok_parts]
            )
            dic = pc.dictionary_encode(toks)
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            words = dic.dictionary.to_pylist()
            enc = np.fromiter((self._enc(w) for w in words), dtype=np.int64, count=len(words))
            n_words += np.bincount(doc_idx, minlength=n).astype(np.int64)
            n_sub += np.bincount(doc_idx, weights=enc[codes], minlength=n).astype(np.int64)
        return pa.table(
            {
                self.id_col: b.column(self.id_col),
                "n_words": pa.array(n_words),
                "n_subwords": pa.array(n_sub),
            },
            schema=self.out_schema,
        )


def bpe_encode_counts(ds, merges: list[tuple], text_col: str = "text", id_col: str = "doc_id"):
    """Apply a learned BPE merge table to a documents Dataset and return
    per-document (n_words, n_subwords) — the train->apply half of the
    tokenizer story (``bpe_train`` learns the table). Embarrassingly
    parallel: the merge table broadcasts in the actor constructor and every
    distinct word is encoded once per actor."""
    from text_to_graph_ray.util import sort_coalesced

    out = ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return sort_coalesced(out, id_col)
