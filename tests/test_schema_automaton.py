"""Schema-constrained decoding tests (models/schema_automaton.py).

Reference analogue: llama.cpp ``json_schema_to_gbnf`` grammar enforcement
(_chatml_function_calling.py:483-501).
"""

import json

import pytest

from raglite_tpu.models.schema_automaton import SchemaAutomaton

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "score": {"type": "number"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "active": {"type": "boolean"},
        "kind": {"enum": ["cat", "dog"]},
        "nested": {"type": "object", "properties": {"x": {"type": "number"}}},
    },
}


def _feed(automaton: SchemaAutomaton, doc: str) -> SchemaAutomaton:
    for byte in doc.encode():
        assert byte in automaton.allowed_bytes(), (doc, chr(byte))
        automaton.feed(byte)
    return automaton


def test_schema_accepts_conforming_document() -> None:
    doc = (
        '{"name": "bo\\"b", "age": 42, "score": -1.5e3, "tags": ["a","b"], '
        '"active": true, "kind": "dog", "nested": {"x": 0.5}}'
    )
    automaton = _feed(SchemaAutomaton(SCHEMA), doc)
    assert automaton.done()


@pytest.mark.parametrize(
    ("prefix", "bad_byte"),
    [
        ('{"name": ', ord("1")),  # string required
        ('{"name": "x", "age": ', ord('"')),  # integer required
        ('{"name": "x", "age": 4', ord(".")),  # integer forbids fraction
        ("", ord("[")),  # must open the object
        ('{"name": "x", "age": 1, "score": 2, "tags": ', ord("{")),  # array required
        ("{", ord("}")),  # all declared properties are generated
    ],
)
def test_schema_rejects_nonconforming_bytes(prefix: str, bad_byte: int) -> None:
    automaton = _feed(SchemaAutomaton(SCHEMA), prefix)
    assert bad_byte not in automaton.allowed_bytes()


def test_schema_enum_restriction() -> None:
    prefix = '{"name": "x", "age": 1, "score": 2, "tags": [], "active": false, "kind": "'
    automaton = _feed(SchemaAutomaton(SCHEMA), prefix)
    assert {chr(b) for b in automaton.allowed_bytes()} == {"c", "d"}


@pytest.mark.parametrize(
    "prefix",
    [
        "",
        '{"name',
        '{"name": "ab',
        '{"name": "x", "age": 4',
        '{"name": "x", "age": 1, "score": 2, "tags": ["q"',
        '{"name": "x", "age": 1, "score": 2, "tags": [], "active": tr',
    ],
)
def test_schema_completion_always_conforms(prefix: str) -> None:
    automaton = _feed(SchemaAutomaton(SCHEMA), prefix)
    completed = prefix + automaton.completion_bytes().decode()
    parsed = json.loads(completed)
    assert set(parsed) == set(SCHEMA["properties"])


def test_schema_anyof_and_refs() -> None:
    from pydantic import BaseModel

    class Inner(BaseModel):
        x: int

    class Outer(BaseModel):
        inner: Inner
        label: str | None

    schema = Outer.model_json_schema()  # uses $defs/$ref + anyOf
    for doc in ['{"inner": {"x": 3}, "label": "hi"}', '{"inner": {"x": 3}, "label": null}']:
        automaton = _feed(SchemaAutomaton(schema), doc)
        assert automaton.done(), doc


def test_jax_llm_schema_constrained_output_conforms() -> None:
    from pydantic import BaseModel

    from raglite_tpu.models.decoder import JaxChatLLM

    class Person(BaseModel):
        name: str
        age: int
        hobbies: list[str]

    llm = JaxChatLLM("tiny")
    response = llm.complete(
        [{"role": "user", "content": "make a person"}],
        response_format={
            "type": "json_schema",
            "json_schema": {"name": "Person", "schema": Person.model_json_schema()},
        },
        max_tokens=64,
    )
    parsed = json.loads(response.content)
    assert set(parsed) == {"name", "age", "hobbies"}
    assert isinstance(parsed["age"], int)
    assert isinstance(parsed["hobbies"], list)


def test_enum_prefix_options_both_reachable() -> None:
    """Enum options that are byte-prefixes of other options (1 vs 12) must
    BOTH be generable (regression: the automaton advanced as soon as the
    prefix matched, making 12 unreachable)."""
    schema = {"type": "object", "properties": {"x": {"enum": [1, 12]}}, "required": ["x"]}
    for want in ('{"x": 1}', '{"x": 12}'):
        automaton = SchemaAutomaton(schema)
        for byte in want.encode():
            assert byte in automaton.allowed_bytes(), (want, chr(byte))
            automaton.feed(byte)
        assert automaton.done(), want


def test_json_object_mode_rejects_top_level_array_after_whitespace() -> None:
    """Leading whitespace must not lift the top-level-object restriction
    (regression: a sampled space re-enabled '[' / scalars)."""
    from raglite_tpu.models.json_automaton import JsonAutomaton

    automaton = JsonAutomaton()
    automaton.feed(0x20)  # space
    assert 0x5B not in automaton.allowed_bytes()  # [
    assert 0x22 not in automaton.allowed_bytes()  # "
    assert 0x7B in automaton.allowed_bytes()  # {
