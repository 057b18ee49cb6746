import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """A 48-file synthetic corpus parquet + its ground-truth tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_to_graph_ray.synth import build_corpus, expected_tables

    files, tbf = build_corpus(48, seed=7)
    d = tmp_path_factory.mktemp("corpus")
    cols = ["repo", "path", "commit", "lang", "content"]
    pq.write_table(pa.table({c: [f[c] for f in files] for c in cols}), str(d / "repo_files.parquet"))
    return {
        "path": str(d / "repo_files.parquet"),
        "files": files,
        "triples_by_file": tbf,
        "expected_raw": expected_tables(tbf, link=False),
        "expected_linked": expected_tables(tbf, link=True),
    }
