"""Named-entity extraction: dictionary (gazetteer) matching fallback.

The reference's NER (`src/ir/text/ner_extractor.py:89-183`) wraps the
CKIP transformers model and exposes an 18-type tag set
(`ALL_ENTITY_TYPES`, ner_extractor.py:119-124) plus pure aggregation
utilities (entity_statistics ner_extractor.py:456-529,
most_common_entities ner_extractor.py:520-563).  The CKIP model is not
available in this container, so the EXTRACTOR here is the classic
dictionary-matching fallback: a gazetteer of surface forms -> entity
type, matched per whitespace token over the normalized text.  That
keeps extraction deterministic and SQL-expressible, so the downstream
statistics — which are the reference's actual aggregation semantics —
can be oracle-checked end-to-end.  Swapping in a real model is a
one-line change: replace ``extract_entities`` inside ``NERStage`` with
a model call; every aggregate downstream is extractor-agnostic.

Entity spans: ``pos`` is the 1-based token ordinal within the filtered
token stream; ``start_char`` is the character offset of the token in
the single-space-joined normalized token stream (tokens are joined by
exactly one space after normalization, so offsets are recoverable from
token lengths alone — the same convention the SQL oracle replays with
a window sum).
"""

from __future__ import annotations

from .textnorm import normalize_text
from .tokenize import get_tokenizer

# Demo gazetteer over the corpus domain.  Types come from the
# reference's ALL_ENTITY_TYPES (ner_extractor.py:119-124); the mapping
# itself is configuration, exactly as a dictionary-NER deployment would
# vendor a domain lexicon.
DEFAULT_GAZETTEER: dict[str, str] = {
    "spark": "PRODUCT",
    "customer": "PERSON",
    "group": "ORG",
    "part": "ORG",
    "window": "EVENT",
    "stream": "EVENT",
    "batch": "QUANTITY",
    "row": "QUANTITY",
    "table": "WORK_OF_ART",
}


def extract_entities(text: str,
                     gazetteer: dict[str, str] | None = None,
                     ) -> list[tuple[int, int, str, str]]:
    """-> [(pos, start_char, ent_text, ent_type)] for every token hit.

    ``pos`` 1-based ordinal in the filtered token stream; ``start_char``
    offset in the space-joined stream.  Mirrors the reference's
    Entity(text, type, start, end) record (ner_extractor.py:63-86) with
    end implied by ``start_char + len(ent_text)``.
    """
    gaz = DEFAULT_GAZETTEER if gazetteer is None else gazetteer
    toks = get_tokenizer("whitespace")(normalize_text(text or ""))
    out: list[tuple[int, int, str, str]] = []
    off = 0
    for i, tok in enumerate(toks, 1):
        ety = gaz.get(tok)
        if ety is not None:
            out.append((i, off, tok, ety))
        off += len(tok) + 1
    return out
