"""nexlt_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch engine with the query and data-processing capabilities of the
NeXLT reference (Solr 4.9 translation-corpus search; see SURVEY.md), rebuilt
Ray-Data-first: `ray.data.Dataset` pipelines of `map_batches` over zero-copy
Arrow batches, actor pools for stateful stages, explicit skew-aware shuffles
for the postings merge.

Public entry points:
  - nexlt_ray.build.build_index     — the index build pipeline
  - nexlt_ray.query.IndexReader     — top-k BM25 search over a built index
  - nexlt_ray.corpus                — deterministic synthetic source-code corpus
  - nexlt_ray.dedup / similarity / textstats — training-data-pipeline operators
"""

__version__ = "0.1.0"
