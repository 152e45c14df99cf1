"""news_information_retrieval_system_ray — a Ray-Data-native rebuild of the
query/data-processing capabilities of Justin21523/news-information-retrieval-system
("CNIRS", surveyed in SURVEY.md).

Architecture (Ray-Data-first, NOT a port):

- every corpus-scale stage is a ``ray.data.Dataset`` transform over zero-copy
  Arrow batches (``map_batches(batch_format="pyarrow")``);
- stateful stages (tokenizer, dedup hashers, ANN index) are callable classes run
  as actor pools (setup once per actor in ``__init__``);
- the wide step (posting-list construction) is a two-level
  ``groupby`` shuffle keyed on ``(term, doc-chunk)`` then ``term`` — the chunked
  first level bounds per-task memory for stopword-class terms (skew splitting);
- postings are docID-delta + VByte compressed per fixed-size block with
  block-max metadata (block-max WAND pruning at query time);
- output segments are partitioned Parquet + per-partition JSON manifests
  (atomic tmp+rename) so a re-run skips completed partitions (resume).

Package layout:
  functions/  pure kernels (no Ray): codecs, text norm, tokenizers, hashing, BM25
  sources/    deterministic synthetic pages corpus + doc-id-assigning readers
  stages/     map_batches stage bodies (extract, tokenize, dedup, text stats, ANN)
  pipelines/  end-to-end pipelines (index build, query engine, dedup, analytics)
  state/      segment manifests / resumable-output helpers
  oracle/     vendored single-process reference implementation for parity tests
"""

__version__ = "0.1.0"
