import os
import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def emb_ds(ray_session, sf_dir):
    import ray.data

    return ray.data.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="session")
def built_index(ray_session, tmp_path_factory):
    """One shared index over sf0.001 documents (with positions)."""
    from lucene_ray.index.build import build_index

    idx = str(tmp_path_factory.mktemp("idx") / "index")
    manifest = build_index(
        os.path.join(SF_DIR, "documents.parquet"),
        idx,
        num_segments=4,
        with_positions=True,
    )
    yield idx, manifest
    shutil.rmtree(idx, ignore_errors=True)


@pytest.fixture(scope="session")
def brute_force(ray_session):
    """Reference scoring data: tokenized corpus + stats, for CheckHits-style
    assertions (test-framework/.../search/CheckHits.java:181-333 pattern)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import StandardAnalyzer
    from lucene_ray.util.smallfloat import int_to_byte4

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    texts = t["text"].to_pylist()
    ids = np.array(t["doc_id"].to_pylist())
    toks = [StandardAnalyzer.tokens(x) for x in texts]
    norms = np.array([int_to_byte4(len(x)) for x in toks], dtype=np.uint8)
    n = len(texts)
    sum_ttf = sum(len(x) for x in toks)
    return {
        "ids": ids,
        "tokens": toks,
        "norms": norms,
        "doc_count": n,
        "sum_ttf": sum_ttf,
    }
