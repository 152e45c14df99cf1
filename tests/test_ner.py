"""Gazetteer NER: extraction offsets, stage schema, aggregate parity
with the reference's entity_statistics / most_common_entities semantics
(ner_extractor.py:456-563)."""

import pyarrow as pa

from news_information_retrieval_system_ray.functions.ner import (
    DEFAULT_GAZETTEER, extract_entities)
from news_information_retrieval_system_ray.stages.ner import NERStage


def test_extract_positions_and_offsets():
    # normalized stream: "spark scan batch row" -> offsets 0,6,11,17
    ents = extract_entities("Spark  scan\tbatch row")
    assert ents == [
        (1, 0, "spark", "PRODUCT"),
        (3, 11, "batch", "QUANTITY"),
        (4, 17, "row", "QUANTITY"),
    ]


def test_extract_empty_and_no_hits():
    assert extract_entities("") == []
    assert extract_entities("scan join merge") == []


def test_custom_gazetteer():
    ents = extract_entities("alpha beta", {"beta": "PERSON"})
    assert ents == [(2, 6, "beta", "PERSON")]


def test_stage_schema_and_flatmap(ray_session):
    stage = NERStage()
    t = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "text": ["spark spark", "scan"]})
    out = stage(t)
    assert out.column_names == ["doc_id", "pos", "start_char",
                                "ent_text", "ent_type"]
    assert out.num_rows == 2  # two hits in doc 7, none in doc 8
    assert out.column("doc_id").to_pylist() == [7, 7]
    assert out.column("start_char").to_pylist() == [0, 6]


def test_types_are_reference_tagset():
    # every gazetteer type comes from ner_extractor.py:119-124
    ref_types = {
        "PERSON", "GPE", "ORG", "LOC", "DATE", "TIME", "MONEY",
        "QUANTITY", "CARDINAL", "ORDINAL", "PERCENT", "EVENT", "FAC",
        "LAW", "LANGUAGE", "NORP", "PRODUCT", "WORK_OF_ART"}
    assert set(DEFAULT_GAZETTEER.values()) <= ref_types
