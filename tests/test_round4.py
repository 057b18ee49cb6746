"""Round-4 tests: guarded scored-link vocabulary broadcast + distributed
shard fallback, salted aggregation, viewer composite, tokenizer option."""

import pytest


def _rows(ds):
    return sorted((r["mention"], r["matched"], r["score"]) for r in ds.take_all())


@pytest.fixture(scope="module")
def linked_graph(ray_session, small_corpus):
    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.pipelines import kg

    nodes, edges = kg.graph_tables(small_corpus["path"], PipelineConfig(num_partitions=8))
    return nodes.materialize(), edges.materialize()


class TestScoredLinksGuard:
    def test_distributed_matches_broadcast_threshold0(self, ray_session, linked_graph):
        """vocab_broadcast_max=0 forces the sharded plan; at threshold 0 every
        mention emits its global best, so the equivalence covers sub-threshold
        candidates too (mirrors test_distributed_linking_matches_broadcast)."""
        from text_to_graph_ray.pipelines.kg import scored_fallback_links

        nodes, edges = linked_graph
        bc = scored_fallback_links(edges, nodes, threshold=0.0)
        di = scored_fallback_links(edges, nodes, threshold=0.0, vocab_broadcast_max=0, shard_rows=7)
        a, b = _rows(bc), _rows(di)
        assert len(a) > 0
        assert a == b

    def test_distributed_matches_broadcast_default_threshold(self, ray_session, linked_graph):
        from text_to_graph_ray.pipelines.kg import scored_fallback_links

        nodes, edges = linked_graph
        bc = scored_fallback_links(edges, nodes, threshold=0.35)
        di = scored_fallback_links(
            edges, nodes, threshold=0.35, vocab_broadcast_max=0, shard_rows=5, mention_chunk_rows=3
        )
        assert _rows(bc) == _rows(di)
