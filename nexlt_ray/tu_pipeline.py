"""Translation-unit pipeline — the Ray-Data re-expression of the reference's
Passolo indexer record path end-to-end (parseJSON.pl:297-343), including the
reference's ONLY automated test shape: golden CSV output with schema
`resource, restype, enu, <lang>, id, product, release, srclc`
(header written at parseJSON.pl:130; fixture tools/test/{deu,fra,jpn}-passolo-data.csv).

Stages (all vectorized batch fns from nexlt_ray.normalize):
  1. state filter (M3)         — drop blank/review/readonly/untranslated rows
  2. tag strip (M2)            — \\x02...\\x03 inline tag spans
  3. entity/accelerator (M4)   — &amp; -> &, &x -> x, whitespace collapse
  4. length cap (M5)           — drop segments > 5000 chars
  5. lang normalize (M7)       — esn->esp, enu->eng, ...
  6. restype decode (M9)       — numeric Passolo restype -> label
  7. resource basename (M8)
  8. id compose (M11)          — md5(uri_escape(...)) + "Software"
  9. srclc sort key (M12)      — output sorted by (lang, srclc, id) like the
                                 reference's per-language CSV ordering
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import normalize as N


def synthetic_tu_table(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic Passolo-like input (FIXTURES.md F3): ~n rows across
    deu/fra/jpn with tags, entities, blanks, review states, and an
    over-length segment to exercise every filter."""
    rng = np.random.default_rng(seed)
    langs = ["deu", "fra", "jpn"]
    words = ["Open", "Close", "&File", "Save&amp;Exit", "Print preview",
             "Page <b>setup</b>", "Zoom \x02b\x03level", "Cancel", "OK",
             "Select all", "Paste special"]
    trn_words = {
        "deu": ["Öffnen", "Schließen", "&Datei", "Speichern", "Druckvorschau",
                "Seite einrichten", "Zoomstufe", "Abbrechen", "OK",
                "Alles auswählen", "Inhalte einfügen"],
        "fra": ["Ouvrir", "Fermer", "&Fichier", "Enregistrer", "Aperçu",
                "Mise en page", "Niveau de zoom", "Annuler", "OK",
                "Tout sélectionner", "Collage spécial"],
        "jpn": ["開く", "閉じる", "ファイル", "保存", "印刷プレビュー",
                "ページ設定", "ズームレベル", "キャンセル", "OK",
                "すべて選択", "形式を選択して貼り付け"],
    }
    restypes = ["4", "5", "6", "9", "11"]
    resources = [r"C:\res\app.dll", r"C:\res\ui\menu.dll", "dialogs.rc"]
    rows = {k: [] for k in
            ("string_id", "src", "trn", "lang", "restype", "resource",
             "product", "release", "state_review", "state_readonly",
             "state_translated", "state_pretranslated")}
    for i in range(n):
        lang = langs[i % 3]
        w = int(rng.integers(0, len(words)))
        rows["string_id"].append(f"IDS_{i:04d}" if i % 17 else "")
        rows["src"].append(words[w] + (" x" * 3000 if i % 41 == 0 else ""))
        rows["trn"].append(trn_words[lang][w] if i % 13 else "")
        rows["lang"].append(lang)
        rows["restype"].append(restypes[i % len(restypes)])
        rows["resource"].append(resources[i % len(resources)])
        rows["product"].append("INFMDR" if i % 2 else "ACD")
        rows["release"].append("2015")
        rows["state_review"].append(i % 23 == 0)
        rows["state_readonly"].append(i % 29 == 0)
        rows["state_translated"].append(i % 3 != 2)
        rows["state_pretranslated"].append(i % 3 == 2 and i % 5 != 0)
    return pa.table(rows)


def _process_batch(batch: pa.Table) -> pa.Table:
    mask = N.state_filter_mask(batch)
    batch = batch.filter(mask)
    if batch.num_rows == 0:
        return _empty_out()

    def col(name):
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    src = N.normalize_entities(N.strip_inline_tags(col("src")))
    trn = N.normalize_entities(N.strip_inline_tags(col("trn")))
    keep = pc.and_(N.length_ok_mask(src), N.length_ok_mask(trn))
    batch = batch.filter(keep)
    src = src.filter(keep)
    trn = trn.filter(keep)
    if batch.num_rows == 0:
        return _empty_out()

    lang = N.dict_replace(
        batch["lang"].combine_chunks()
        if isinstance(batch["lang"], pa.ChunkedArray) else batch["lang"],
        N.LANG_FIXES,
    )
    restype = N.dict_replace(
        batch["restype"].combine_chunks()
        if isinstance(batch["restype"], pa.ChunkedArray) else batch["restype"],
        N.RESTYPE_DECODE,
    )
    resource = N.resource_basename(
        batch["resource"].combine_chunks()
        if isinstance(batch["resource"], pa.ChunkedArray) else batch["resource"]
    )
    ids = N.compose_ids(
        batch["string_id"].to_pylist(),
        src.to_pylist(),
        resource.to_pylist(),
        restype.to_pylist(),
        batch["product"].to_pylist(),
    )
    return pa.table(
        {
            "resource": resource,
            "restype": restype,
            "enu": src,
            "trn": trn,
            "lang": lang,
            "id": pa.array(ids, pa.string()),
            "product": batch["product"],
            "release": batch["release"],
            "srclc": N.lowercase_sort_key(src),
        }
    )


def _empty_out() -> pa.Table:
    return pa.table(
        {c: pa.array([], pa.string())
         for c in ("resource", "restype", "enu", "trn", "lang", "id",
                   "product", "release", "srclc")}
    )


def translation_units(input_table: pa.Table | None = None):
    """Full pipeline over a Passolo-like table -> golden-CSV-shaped Dataset,
    sorted by (lang, srclc, id) (the reference emits one sorted CSV per
    language; we keep lang as a column)."""
    import ray.data

    t = input_table if input_table is not None else synthetic_tu_table()
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(_process_batch, batch_format="pyarrow")
    return out.sort(["lang", "srclc", "id"])


def write_bitext(ds, out_dir: str) -> list[str]:
    """K2: Moses bitext writer — `src◊trn◊product` lines, bzip2-compressed,
    one file per language (reference parseJSON.pl:117-124,323-324). Returns
    written paths."""
    import bz2
    import os

    from .lineage import atomic_write_bytes

    def write_lang(g) -> "pa.Table":
        lang = g["lang"][0].as_py()
        lines = [
            f"{s}◊{t}◊{p}"
            for s, t, p in zip(
                g["enu"].to_pylist(), g["trn"].to_pylist(), g["product"].to_pylist()
            )
        ]
        payload = bz2.compress(("\n".join(lines) + "\n").encode("utf-8"))
        path = os.path.join(out_dir, f"corpus.{lang}.bz2")
        atomic_write_bytes(path, payload)
        return pa.table({"lang": pa.array([lang]), "path": pa.array([path])})

    acks = ds.groupby("lang").map_groups(write_lang, batch_format="pyarrow")
    return sorted(acks.to_pandas()["path"].tolist())


def write_golden_csv(ds, out_dir: str) -> list[str]:
    """K3: golden CSV writer — the reference's fixture format, header
    `resource,restype,enu,<lang>,id,product,release,srclc`
    (parseJSON.pl:130), one file per language."""
    import csv
    import io
    import os

    from .lineage import atomic_write_bytes

    def write_lang(g) -> "pa.Table":
        lang = g["lang"][0].as_py()
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["resource", "restype", "enu", lang, "id", "product",
                    "release", "srclc"])
        for row in g.to_pylist():
            w.writerow([row["resource"], row["restype"], row["enu"], row["trn"],
                        row["id"], row["product"], row["release"], row["srclc"]])
        path = os.path.join(out_dir, f"corpus.sw.{lang}.csv")
        atomic_write_bytes(path, buf.getvalue().encode("utf-8"))
        return pa.table({"lang": pa.array([lang]), "path": pa.array([path])})

    acks = ds.groupby("lang").map_groups(write_lang, batch_format="pyarrow")
    return sorted(acks.to_pandas()["path"].tolist())


def golden_digest(table: pa.Table) -> str:
    """Stable digest of the golden output (the diff-against-fixture analog of
    tools/test.sh:5-8)."""
    rows = table.to_pylist()
    payload = "\n".join(
        "\x01".join(str(r[c]) for c in ("resource", "restype", "enu", "trn",
                                        "lang", "id", "product", "release",
                                        "srclc"))
        for r in rows
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()
