"""NeXLT record normalization operators (SURVEY.md §2.3 M2-M14) as
vectorized Arrow batch functions, plus the translation-unit pipeline that
re-expresses the reference's Passolo indexer record path
(/root/reference/indexers/translationrepository2nexlt/parseJSON.pl:297-343).

Every function is `pa.Table -> pa.Table` (or a column fn) suitable for
`ds.map_batches(fn, batch_format="pyarrow")` — no Python row loops.
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# M7: language-code normalizer (parseJSON.pl:282-286; Java LANG_MAPPING
# AthenaExportMt.java:122-160 collapses locale ids to 3-letter codes)
LANG_FIXES = {"esn": "esp", "enu": "eng", "trk": "tur", "vit": "vie"}

# M9: Passolo restype decode table (parseJSON.pl:101)
RESTYPE_DECODE = {
    "4": "Menu",
    "5": "Dialog",
    "6": "String Table",
    "9": "Accelerator Table",
    "11": "Version",
}

# M10: product-code fixes (AthenaExportMt.java:394-406)
PRODUCT_FIXES = {"PlDS": "PLDS", "PrDS": "PRDS"}

MAX_SEGMENT_CHARS = 5000  # M5 length cap (parseJSON.pl:313,321)


def strip_inline_tags(col: pa.Array) -> pa.Array:
    """M2: remove Passolo inline tag spans \\x02...\\x03 (jString.pm:93-102)."""
    return pc.replace_substring_regex(col, pattern="\x02[^\x03]*\x03", replacement="")


def normalize_entities(col: pa.Array) -> pa.Array:
    """M4: `&amp;`->`&`, accelerator `&x`->`x`, collapse [h/v] whitespace to a
    single space, trim (parseJSON.pl:308-320)."""
    out = pc.replace_substring_regex(col, pattern="&amp;", replacement="&")
    out = pc.replace_substring_regex(out, pattern="&([^& \t\n\r])", replacement=r"\1")
    out = pc.replace_substring_regex(out, pattern="[ \t\n\r\f\v]+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


def scrub_newlines(col: pa.Array) -> pa.Array:
    """M6: newline/carriage-return -> space (AthenaExportMt.java:456-458)."""
    return pc.replace_substring_regex(col, pattern="[\n\r]", replacement=" ")


def dict_replace(col: pa.Array, mapping: dict[str, str]) -> pa.Array:
    """M7/M9/M10 helper: dictionary replace, identity for unmapped values."""
    if len(col) == 0 or not mapping:
        return col
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array(list(mapping.values()), pa.string())
    idx = pc.index_in(col, value_set=keys)
    replaced = pc.take(vals, idx)
    return pc.if_else(pc.is_valid(idx), replaced, col)


def resource_basename(col: pa.Array) -> pa.Array:
    """M8: strip backslash path, keep basename (parseJSON.pl:288-289)."""
    return pc.replace_substring_regex(col, pattern=r".*\\", replacement="")


def lowercase_sort_key(col: pa.Array) -> pa.Array:
    """M12: `srclc = lc(src)` (parseJSON.pl:337; sorted on at
    solrTestLib_v2.js:85-94)."""
    return pc.utf8_lower(col)


def length_ok_mask(col: pa.Array, cap: int = MAX_SEGMENT_CHARS) -> pa.Array:
    """M5: segments longer than `cap` chars are dropped (parseJSON.pl:313,321)."""
    return pc.less_equal(pc.utf8_length(col), cap)


def compose_ids(
    string_ids: list[str],
    srcs: list[str],
    resources: list[str],
    restypes: list[str],
    products: list[str],
    suffix: str = "Software",
) -> list[str]:
    """M11: md5(uri_escape(stringId+src+resource+restype+product)) + class
    suffix (parseJSON.pl:330; Java analog AthenaExportMt.java:454)."""
    out = []
    for sid, src, res, rt, prod in zip(string_ids, srcs, resources, restypes, products):
        raw = quote(f"{sid}{src}{res}{rt}{prod}", safe="")
        out.append(hashlib.md5(raw.encode("utf-8")).hexdigest() + suffix)
    return out


def state_filter_mask(batch: pa.Table) -> pa.Array:
    """M3: drop rows with blank src/trn/id, review/readonly state, or neither
    translated nor pretranslated (parseJSON.pl:300-305). Expects boolean
    columns state_review/state_readonly/state_translated/state_pretranslated
    and string columns src/trn/string_id."""
    nonblank = pc.and_(
        pc.and_(
            pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(batch["src"])), 0),
            pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(batch["trn"])), 0),
        ),
        pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(batch["string_id"])), 0),
    )
    not_blocked = pc.and_(
        pc.invert(batch["state_review"].combine_chunks()
                  if isinstance(batch["state_review"], pa.ChunkedArray)
                  else batch["state_review"]),
        pc.invert(batch["state_readonly"].combine_chunks()
                  if isinstance(batch["state_readonly"], pa.ChunkedArray)
                  else batch["state_readonly"]),
    )
    translated = pc.or_(batch["state_translated"], batch["state_pretranslated"])
    return pc.and_(pc.and_(nonblank, not_blocked), translated)


def normalize_segment_batch(batch: pa.Table) -> pa.Table:
    """The full per-record chain of the reference's Passolo indexer
    (M2 -> M4 -> M5 filter -> M12 key), applied to `src`/`trn` columns.
    Returns the normalized surviving rows plus a `srclc` sort key."""
    src = strip_inline_tags(batch["src"].combine_chunks()
                            if isinstance(batch["src"], pa.ChunkedArray)
                            else batch["src"])
    trn = strip_inline_tags(batch["trn"].combine_chunks()
                            if isinstance(batch["trn"], pa.ChunkedArray)
                            else batch["trn"])
    src = normalize_entities(src)
    trn = normalize_entities(trn)
    mask = pc.and_(length_ok_mask(src), length_ok_mask(trn))
    batch = (
        batch.set_column(batch.schema.get_field_index("src"), "src", src)
        .set_column(batch.schema.get_field_index("trn"), "trn", trn)
        .append_column("srclc", lowercase_sort_key(src))
    )
    return batch.filter(mask)


def normalize_documents_batch(batch: pa.Table) -> pa.Table:
    """Generic text normalization over a (doc_id, text) table: tag strip,
    entity unescape, newline scrub, whitespace collapse, trim. SQL-parity
    chain (same RE2 patterns expressible in DuckDB regexp_replace) used by
    the `normalize_text` oracle query."""
    text = batch["text"].combine_chunks() if isinstance(
        batch["text"], pa.ChunkedArray
    ) else batch["text"]
    out = pc.replace_substring_regex(text, pattern="<[^>]*>", replacement=" ")
    out = pc.replace_substring_regex(out, pattern="&amp;", replacement="&")
    out = pc.replace_substring_regex(out, pattern="&([^& \t\n\r])", replacement=r"\1")
    out = pc.replace_substring_regex(out, pattern="[ \t\n\r]+", replacement=" ")
    out = pc.utf8_trim_whitespace(out)
    return pa.table({"doc_id": batch["doc_id"], "norm_text": out})


# ---------------------------------------------------------------------------
# PII redaction — the standard training-data scrubbing pass (emails, phone
# numbers, IPv4 addresses -> typed placeholders). Patterns are the common
# public forms (e.g. the C4/Dolma-style regex scrubbers); both pyarrow and
# DuckDB execute RE2, so the oracle SQL replays the identical patterns.
# ---------------------------------------------------------------------------
PII_PATTERNS = (
    # (name, RE2 pattern, placeholder) — applied in order; counts are
    # measured on the pre-redaction text (the patterns are disjoint by
    # construction: an email has no 3-3-4 dash group, a dotted quad has
    # no '@', a phone has no '.')
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized PII scrub over a (doc_id, text) table: one
    count_substring_regex + one replace_substring_regex pass per pattern
    (no Python row loop). Emits the redacted text plus a per-type match
    count so downstream accounting (how much PII did this shard contain?)
    needs no second pass."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
    counts = {
        name: pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())
        for name, pat, _ in PII_PATTERNS
    }
    out = text
    for _, pat, placeholder in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=placeholder)
    cols["redacted_text"] = out
    for name, _, _ in PII_PATTERNS:
        cols[f"n_{name}"] = counts[name]
    return pa.table(cols)
