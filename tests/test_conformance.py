"""Adversarial parser corpus + merge-math conformance (SURVEY §5; the
reference's response_parser.py:210-745 case classes and
module_tests/graph_utils_test.py semantics, re-authored as fixtures)."""

from text_to_graph_ray.stages.conformance import (
    apply_edge_mappings,
    distinct_edge_labels,
    merge_chunk_graphs,
    merge_documents,
    parse_entity_list,
    parse_subgraph,
)

WELL_FORMED = """id,entity,category
0,Alice,Person
1,Acme,Company
source,target,relationship
0,1,works_at
"""


def test_parse_well_formed():
    nodes, edges = parse_subgraph(WELL_FORMED)
    assert nodes == [(0, "Alice", "Person"), (1, "Acme", "Company")]
    assert edges == [(0, 1, "works_at")]


def test_parse_code_fences_and_comments_skipped():
    text = "```csv\n# header comment\n" + WELL_FORMED + "```\n"
    nodes, edges = parse_subgraph(text)
    assert len(nodes) == 2 and len(edges) == 1


def test_parse_duplicate_node_ids_rejects_chunk():
    text = "id,entity,category\n0,A,T\n0,B,T\nsource,target,relationship\n0,0,x\n"
    assert parse_subgraph(text) == (None, None)


def test_parse_dangling_edge_rejects_chunk():
    text = "id,entity,category\n0,A,T\n1,B,T\nsource,target,relationship\n0,9,x\n"
    assert parse_subgraph(text) == (None, None)


def test_parse_bad_column_count_rows_skipped():
    text = "id,entity,category\n0,A,T\n1,B\n2,C,T,extra\n3,D,T\nsource,target,relationship\n0,3,x\n"
    nodes, edges = parse_subgraph(text)
    # rows with wrong arity dropped; orphan node ids reindexed densely
    assert [n[1] for n in nodes] == ["A", "D"]
    assert edges == [(0, 1, "x")]


def test_parse_orphans_dropped_and_reindexed():
    text = "id,entity,category\n0,A,T\n1,B,T\n2,Orphan,T\nsource,target,relationship\n0,1,x\n"
    nodes, edges = parse_subgraph(text)
    assert [n[1] for n in nodes] == ["A", "B"]
    assert [n[0] for n in nodes] == [0, 1]
    assert edges == [(0, 1, "x")]


def test_parse_repeated_edges_keep_first():
    text = "id,entity,category\n0,A,T\n1,B,T\nsource,target,relationship\n0,1,x\n0,1,x\n0,1,y\n"
    _, edges = parse_subgraph(text)
    assert edges == [(0, 1, "x"), (0, 1, "y")]


def test_parse_empty_and_garbage():
    assert parse_subgraph("") == ([], [])
    assert parse_subgraph("complete garbage\nno headers") == ([], [])
    assert parse_subgraph(None) == (None, None)


def test_parse_quoted_fields():
    text = 'id,entity,category\n0,"Smith, John",Person\n1,Acme,Company\nsource,target,relationship\n0,1,"works, at"\n'
    nodes, edges = parse_subgraph(text)
    assert nodes[0][1] == "Smith, John"
    assert edges == [(0, 1, "works, at")]


def test_parse_entity_list():
    assert parse_entity_list("Alice, Bob, Carol") == ["Alice", "Bob", "Carol"]
    assert parse_entity_list('"Smith, John", Bob') == ["Smith, John", "Bob"]
    assert parse_entity_list("") is None
    assert parse_entity_list("   ") is None
    assert parse_entity_list(42) is None
    assert parse_entity_list(",,,") is None


# --- merge math (graph_utils_test.py semantics) ---


def g(nodes, edges):
    return (nodes, edges)


def test_merge_case_insensitive_identity():
    # "AAAA" vs "aaaa" -> one entity, first-seen casing wins
    merged_nodes, merged_edges = merge_chunk_graphs(
        [
            g([(0, "AAAA", "t1")], []),
            g([(0, "aaaa", "t2")], []),
        ]
    )
    assert len(merged_nodes) == 1
    assert merged_nodes[0][1] == "AAAA"
    assert merged_nodes[0][2] == "t1|t2"  # type-set union, sorted, '|'-joined


def test_merge_idempotence():
    graphs = [g([(0, "A", "x"), (1, "B", "y")], [(0, 1, "rel")])]
    n1, e1 = merge_chunk_graphs(graphs)
    n2, e2 = merge_chunk_graphs([ (n1, [(s, t, l) for s, t, l in e1]) ])
    assert n1 == n2 and e1 == e2


def test_merge_conflicting_local_ids():
    # same local id means different entities in different chunks
    n, e = merge_chunk_graphs(
        [
            g([(0, "A", "t")], []),
            g([(0, "B", "t")], []),
        ]
    )
    assert {x[1] for x in n} == {"A", "B"}
    assert [x[0] for x in n] == [0, 1]


def test_merge_dangling_edges_dropped_silently():
    n, e = merge_chunk_graphs([g([(0, "A", "t")], [(0, 99, "rel")])])
    assert e == []


def test_merge_edge_dedup_lowercased():
    n, e = merge_chunk_graphs(
        [
            g([(0, "A", "t"), (1, "B", "t")], [(0, 1, "REL")]),
            g([(0, "a", "t"), (1, "b", "t")], [(0, 1, "rel")]),
        ]
    )
    assert e == [(0, 1, "rel")]


def test_merge_self_loops_and_cycles():
    n, e = merge_chunk_graphs([g([(0, "A", "t"), (1, "B", "t")], [(0, 0, "self"), (0, 1, "f"), (1, 0, "b")])])
    assert (0, 0, "self") in e and (0, 1, "f") in e and (1, 0, "b") in e


def test_merge_empty():
    assert merge_chunk_graphs([]) == ([], [])


def test_merge_documents_provenance_packing():
    # provenance '|'-packed into labels (graph_utils.py:215-245)
    docs = [
        ("d0", [(0, "A", "t"), (1, "B", "t")], [(0, 1, "rel")]),
        ("d1", [(0, "a", "t2"), (1, "C", "t")], [(0, 1, "rel2")]),
    ]
    nodes, edges = merge_documents(docs)
    by_label = {n[1]: n for n in nodes}
    assert "A|0|1" in by_label            # A seen in docs 0 and 1
    assert by_label["A|0|1"][2] == "t|t2"
    assert "B|0" in by_label and "C|1" in by_label
    labels = {e[2] for e in edges}
    assert labels == {"rel|0", "rel2|1"}


def test_edge_relabel_mapping():
    edges = [(0, 1, "old"), (1, 2, "keep")]
    out = apply_edge_mappings(edges, {"old": "new", "unused": "x"})
    assert out == [(0, 1, "new"), (1, 2, "keep")]
    assert apply_edge_mappings(edges, {}) == edges


def test_distinct_edge_labels_sorted():
    assert distinct_edge_labels([(0, 1, "b"), (1, 2, "a"), (2, 3, "b")]) == ["a", "b"]
