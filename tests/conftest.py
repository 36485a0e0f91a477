"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_path():
    from nexlt_ray.corpus import corpus_path

    return corpus_path(1000)


@pytest.fixture(scope="session")
def built_index(ray_session, small_corpus_path, tmp_path_factory):
    """Index over the 1000-doc synthetic corpus, built once per session."""
    from nexlt_ray.build import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = BuildConfig(num_doc_buckets=16, num_term_buckets=8)
    manifest = build_index(small_corpus_path, idx, cfg)
    return idx, manifest


@pytest.fixture(scope="session")
def oracle_index(built_index):
    """Pure-Python oracle over the same docs/doc_ids as the built index."""
    from nexlt_ray.oracle import OracleIndex

    idx, manifest = built_index
    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(manifest["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    docs = list(zip(doc_id.tolist(), meta["content"].to_pylist()))
    return OracleIndex(docs, profile="code")
