"""multiValued field accumulation (the reference's atomic `{"add": ...}`
update on the multiValued productname field, parseJSON.pl:154-181 /
AthenaExportMt.java:559 / schema.xml:1006): duplicate content arriving from
several repos keeps ONE doc whose `{field}_all` list holds the sorted
distinct values across every contributing row; extend_index accumulates the
list incrementally and stays byte-identical to a full rebuild."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mk(rows, path):
    """rows: list of (repo, path, content)."""
    t = pa.table(
        {
            "repo": pa.array([r for r, _, _ in rows]),
            "path": pa.array([p for _, p, _ in rows]),
            "commit": pa.array(["c" * 40] * len(rows)),
            "lang": pa.array(["python"] * len(rows)),
            "content": pa.array([c for _, _, c in rows]),
        }
    )
    pq.write_table(t, path)
    return str(path)


def _tree_bytes(root, sub):
    out = {}
    d = os.path.join(root, sub)
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            with open(os.path.join(d, name), "rb") as f:
                out[name] = f.read()
    return out


def test_multivalue_full_build(ray_session, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index

    rows = [
        ("repoB", "x.py", "shared content alpha"),
        ("repoA", "y.py", "shared content alpha"),
        ("repoC", "z.py", "shared content alpha"),
        ("repoA", "solo.py", "unique content beta"),
        ("repoB", "z2.py", "other shared gamma"),
        ("repoB", "z3.py", "other shared gamma"),  # same repo twice -> once
        ("repoD", "z4.py", "other shared gamma"),
    ]
    src = _mk(rows, tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        num_doc_buckets=4, num_term_buckets=2, multivalue_fields=("repo",)
    )
    build_index(src, idx, cfg)
    store = pq.read_table(os.path.join(idx, "docstore"))
    by_content = {
        c: (r, ra)
        for c, r, ra in zip(
            store["content"].to_pylist(),
            store["repo"].to_pylist(),
            store["repo_all"].to_pylist(),
        )
    }
    assert by_content["shared content alpha"] == (
        "repoA",  # winner: lexicographically smallest (repo, path, commit)
        ["repoA", "repoB", "repoC"],
    )
    assert by_content["unique content beta"] == ("repoA", ["repoA"])
    assert by_content["other shared gamma"] == ("repoB", ["repoB", "repoD"])


def test_multivalue_extend_equals_rebuild(ray_session, tmp_path):
    """The VERDICT item-9 contract: extending with overlapping ids
    accumulates the name list == full rebuild (byte-identical)."""
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    base = [
        ("repoA", "a.py", "doc one body"),
        ("repoA", "b.py", "doc two body"),
        ("repoB", "c.py", "doc three body"),
    ]
    new = [
        ("repoC", "d.py", "doc one body"),      # same content, new repo
        ("repoB", "e.py", "doc two body"),      # same content, other repo
        ("repoC", "f.py", "doc four body"),     # brand-new doc
    ]
    cfg = BuildConfig(
        id_mode="strided",
        num_doc_buckets=4,
        num_term_buckets=2,
        multivalue_fields=("repo",),
    )
    a = _mk(base, tmp_path / "a.parquet")
    b = _mk(new, tmp_path / "b.parquet")
    ab_dir = tmp_path / "ab"
    os.makedirs(ab_dir)
    _mk(base, ab_dir / "a.parquet")
    _mk(new, ab_dir / "b.parquet")

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_index(a, inc, cfg)
    extend_index(b, inc)
    build_index(str(ab_dir), full, cfg)
    for sub in ("docstore", "segments"):
        ta, tb = _tree_bytes(inc, sub), _tree_bytes(full, sub)
        assert ta.keys() == tb.keys(), sub
        for name in ta:
            assert ta[name] == tb[name], f"{sub}/{name}"

    store = pq.read_table(os.path.join(inc, "docstore"))
    by_content = dict(
        zip(store["content"].to_pylist(), store["repo_all"].to_pylist())
    )
    assert by_content["doc one body"] == ["repoA", "repoC"]
    assert by_content["doc two body"] == ["repoA", "repoB"]
    assert by_content["doc three body"] == ["repoB"]
    assert by_content["doc four body"] == ["repoC"]


def test_multivalue_filter_facets_docfields(ray_session, tmp_path):
    """fq on a multiValued column matches list membership (OR within the
    field); facets count one per doc per value; doc_fields returns lists."""
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.query import IndexReader

    rows = [
        ("repoA", "a.py", "needle token one"),
        ("repoB", "b.py", "needle token one"),   # dup -> one doc, 2 repos
        ("repoB", "c.py", "needle token two"),
        ("repoC", "d.py", "haystack token three"),
    ]
    src = _mk(rows, tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            num_doc_buckets=4, num_term_buckets=2, multivalue_fields=("repo",)
        ),
    )
    r = IndexReader(idx)

    # 3 docs survive dedup; 2 contain "needle"
    assert r.match_count("needle") == 2
    # repoB appears in the dup doc's list AND in the "two" doc's list
    assert r.match_count("needle", filters={"repo_all": "repoB"}) == 2
    # repoA only via the dup doc's accumulated list
    assert r.match_count("needle", filters={"repo_all": "repoA"}) == 1
    # value-OR within the field
    assert (
        r.match_count("token", filters={"repo_all": ["repoA", "repoC"]}) == 2
    )
    # search returns the same docs as match_count's set
    hits = r.search("needle", k=10, filters={"repo_all": "repoA"})
    assert len(hits) == 1
    fields = r.doc_fields([h[0] for h in hits], columns=["content", "repo_all"])
    assert fields["repo_all"].to_pylist() == [["repoA", "repoB"]]
    assert fields["content"].to_pylist() == ["needle token one"]

    # facet on the multiValued field over all docs: each doc contributes
    # each of its values once
    fac = dict(r.facets("*:*", ["repo_all"])["repo_all"])
    assert fac == {"repoA": 1, "repoB": 2, "repoC": 1}
