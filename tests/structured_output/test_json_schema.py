

def test_ref_defs_resolution():
    from vllm_trianglemix_tpu.structured_output.json_schema import (
        schema_to_regex,
    )
    import re

    schema = {
        "$defs": {"name": {"type": "string"},
                  "age": {"type": "integer"}},
        "type": "object",
        "properties": {"name": {"$ref": "#/$defs/name"},
                       "age": {"$ref": "#/$defs/age"}},
        "required": ["name", "age"],
    }
    rx = re.compile(schema_to_regex(schema))
    assert rx.fullmatch('{"name": "bo", "age": 3}')
    assert not rx.fullmatch('{"name": 3, "age": 3}')


def test_recursive_ref_terminates_with_base_case():
    from vllm_trianglemix_tpu.structured_output.json_schema import (
        schema_to_regex,
    )
    import re

    # linked list: node = {"v": int, "next": node | null}
    schema = {
        "$defs": {"node": {
            "type": "object",
            "properties": {
                "v": {"type": "integer"},
                "next": {"anyOf": [{"$ref": "#/$defs/node"},
                                   {"type": "null"}]},
            },
            "required": ["v", "next"],
        }},
        "$ref": "#/$defs/node",
    }
    rx = re.compile(schema_to_regex(schema))
    assert rx.fullmatch('{"v": 1, "next": null}')
    assert rx.fullmatch('{"v": 1, "next": {"v": 2, "next": null}}')
    assert not rx.fullmatch('{"v": 1}')


def test_recursive_optional_property_pruned():
    from vllm_trianglemix_tpu.structured_output.json_schema import (
        schema_to_regex,
    )
    import re

    schema = {
        "definitions": {"t": {
            "type": "object",
            "properties": {"leaf": {"type": "boolean"},
                           "child": {"$ref": "#/definitions/t"}},
            "required": ["leaf"],
        }},
        "$ref": "#/definitions/t",
    }
    rx = re.compile(schema_to_regex(schema))
    assert rx.fullmatch('{"leaf": true}')
    assert rx.fullmatch('{"leaf": true, "child": {"leaf": false}}')
