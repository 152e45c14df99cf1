"""NER stage: gazetteer entity extraction as an actor-pool map_batches.

Reference parity: `src/ir/text/ner_extractor.py` — extract/extract_batch
(185-298) become the per-batch flat-map here; the model is replaced by
the dictionary fallback in ``functions/ner.py`` (container has no CKIP
model; see that module's docstring).  At scale this is the canonical
stateful-stage shape: the gazetteer (in a real deployment: the model)
loads once per actor in ``__init__``, batches stream through
``__call__`` — so a 100-TB corpus pays the model load O(actors) times,
not O(batches).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ner import DEFAULT_GAZETTEER, extract_entities


class NERStage:
    """(doc_id, text) -> one row per extracted entity:
    (doc_id, pos, start_char, ent_text, ent_type)."""

    def __init__(self, text_col: str = "text",
                 gazetteer: dict[str, str] | None = None):
        self.text_col = text_col
        # per-actor state: in a model deployment this is the model load
        self.gazetteer = dict(DEFAULT_GAZETTEER if gazetteer is None
                              else gazetteer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, poss, starts, texts, types = [], [], [], [], []
        ids = batch.column("doc_id").to_pylist()
        for doc_id, text in zip(ids, batch.column(self.text_col).to_pylist()):
            for pos, start, ent_text, ent_type in extract_entities(
                    text, self.gazetteer):
                doc_ids.append(doc_id)
                poss.append(pos)
                starts.append(start)
                texts.append(ent_text)
                types.append(ent_type)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "start_char": pa.array(starts, pa.int64()),
            "ent_text": pa.array(texts, pa.string()),
            "ent_type": pa.array(types, pa.string()),
        })
