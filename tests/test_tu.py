"""Golden end-to-end test for the translation-unit pipeline — the analog of
the reference's only automated test (tools/test.sh golden CSV diff,
SURVEY.md §5)."""

import pyarrow as pa

from nexlt_ray.tu_pipeline import golden_digest, synthetic_tu_table, translation_units

# pinned golden digest of the full pipeline output over the seeded fixture
# (the checked-in-fixture-diff analog; update ONLY on intentional semantics
# changes)
GOLDEN_DIGEST = "3d023fcf481767b12c1995ed25831b98c3fb6ef3cdc5fb1a90d5230b046f4628"
GOLDEN_ROWS = 144


def test_tu_pipeline_golden(ray_session):
    out = translation_units()
    t = pa.Table.from_pandas(out.to_pandas())
    assert t.num_rows == GOLDEN_ROWS
    assert golden_digest(t) == GOLDEN_DIGEST


def test_tu_pipeline_semantics(ray_session):
    t = pa.Table.from_pandas(translation_units().to_pandas())
    rows = t.to_pylist()
    for r in rows:
        assert r["enu"] and r["trn"] and r["id"].endswith("Software")
        assert "\x02" not in r["enu"] and "&amp;" not in r["enu"]
        assert len(r["enu"]) <= 5000
        assert r["srclc"] == r["enu"].lower()
        assert r["restype"] in {"Menu", "Dialog", "String Table",
                                "Accelerator Table", "Version"}
        assert "\\" not in r["resource"]
        assert r["lang"] in {"deu", "fra", "jpn"}
    # sorted by (lang, srclc, id) like the reference's per-language CSVs
    keys = [(r["lang"], r["srclc"], r["id"]) for r in rows]
    assert keys == sorted(keys)
    # accelerator & removed from sources that had it
    assert not any(r["enu"].startswith("&") for r in rows)


def test_tu_fixture_deterministic():
    assert synthetic_tu_table().equals(synthetic_tu_table())


def test_bitext_and_csv_writers(ray_session, tmp_path):
    import bz2
    import csv

    from nexlt_ray.tu_pipeline import write_bitext, write_golden_csv

    out = translation_units()
    paths = write_bitext(out, str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == [
        "corpus.deu.bz2", "corpus.fra.bz2", "corpus.jpn.bz2",
    ]
    total = 0
    for p in paths:
        lines = bz2.decompress(open(p, "rb").read()).decode().splitlines()
        assert all(l.count("◊") == 2 for l in lines)
        total += len(lines)
    assert total == 144  # all surviving TU rows, partitioned by language

    out2 = translation_units()
    csvs = write_golden_csv(out2, str(tmp_path))
    assert [p.split("/")[-1] for p in csvs] == [
        "corpus.sw.deu.csv", "corpus.sw.fra.csv", "corpus.sw.jpn.csv",
    ]
    rows = list(csv.reader(open(csvs[2])))
    assert rows[0] == ["resource", "restype", "enu", "jpn", "id", "product",
                      "release", "srclc"]
    n_csv = sum(len(list(csv.reader(open(p)))) - 1 for p in csvs)
    assert n_csv == 144


def test_record_hook(ray_session, small_corpus_path, tmp_path):
    """§2.11 extension surface: per-batch UDF before indexing (the
    update-script.js processAdd analog)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from nexlt_ray.build import BuildConfig, build_index

    def drop_markdown(batch):
        return batch.filter(pc.invert(pc.equal(batch["lang"], "markdown")))

    idx = str(tmp_path / "idx_hook")
    m = build_index(
        small_corpus_path, idx,
        BuildConfig(num_doc_buckets=4, num_term_buckets=2,
                    record_hook=drop_markdown),
    )
    meta = pq.read_table(f"{idx}/docstore", columns=["lang"])
    assert "markdown" not in set(meta["lang"].to_pylist())
    assert m["config"]["record_hook"] == "drop_markdown"
    assert m["input_shards"]  # lineage records the input shard list
