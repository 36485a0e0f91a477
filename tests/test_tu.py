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
