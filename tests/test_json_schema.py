"""JSON Schema → StructType compiler tests (X1 reference parity).

Pure driver-side — no SparkSession needed. Covers the reference
semantics (type table, nested/array/enum/const, required-driven
nullability, $ref local/external/circular, metadata provenance) plus
the documented extensions (format refinement, map_open_objects,
type unions)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampType,
)

from dask_felleskomponenter_spark.functions.json_schema import (
    JsonSchemaConverter,
)
from dask_felleskomponenter_spark.functions.json_schema import (
    convert_json_schema_to_spark as convert,
)


def test_primitive_type_table():
    schema = {
        "type": "object",
        "properties": {
            "s": {"type": "string"},
            "dec": {"type": "decimal"},
            "num": {"type": "number"},
            "f": {"type": "float"},
            "i": {"type": "integer"},
            "b": {"type": "boolean"},
            "ts": {"type": "timestamp"},
            "d": {"type": "date"},
        },
    }
    st = convert(schema)
    expect = {
        "s": StringType(),
        "dec": DecimalType(),
        "num": DoubleType(),
        "f": FloatType(),
        "i": LongType(),
        "b": BooleanType(),
        "ts": TimestampType(),
        "d": DateType(),
    }
    assert {f.name: f.dataType for f in st.fields} == expect


def test_required_drives_nullability():
    schema = {
        "type": "object",
        "required": ["a"],
        "properties": {"a": {"type": "string"}, "b": {"type": "string"}},
    }
    st = convert(schema)
    assert st["a"].nullable is False and st["b"].nullable is True
    # enforcement off => everything nullable
    st2 = convert(schema, enforce_required_field=False)
    assert st2["a"].nullable is True


def test_nested_object_array_enum_const():
    schema = {
        "type": "object",
        "properties": {
            "nested": {
                "type": "object",
                "required": ["x"],
                "properties": {"x": {"type": "integer"}, "y": {"type": "number"}},
            },
            "arr": {"type": "array", "items": {"type": "integer"}},
            "arr_of_struct": {
                "type": "array",
                "items": [{"type": "object", "properties": {"k": {"type": "string"}}}],
            },
            "e": {"enum": ["red", "green"]},
            "c": {"const": "fixed-value"},
        },
    }
    st = convert(schema)
    assert isinstance(st["nested"].dataType, StructType)
    assert st["nested"].dataType["x"].dataType == LongType()
    assert st["nested"].dataType["x"].nullable is False
    assert st["arr"].dataType == ArrayType(LongType())
    inner = st["arr_of_struct"].dataType
    assert isinstance(inner, ArrayType) and isinstance(inner.elementType, StructType)
    assert st["e"].dataType == StringType()  # enum degrades to string
    assert "c" not in st.fieldNames()  # const dropped entirely


def test_unknown_type_falls_back_to_default():
    schema = {"type": "object", "properties": {"u": {"type": "uuid"}}}
    assert convert(schema)["u"].dataType == StringType()
    assert convert(schema, default_type="integer")["u"].dataType == LongType()


def test_field_metadata_provenance():
    schema = {
        "type": "object",
        "properties": {
            "outer": {
                "type": "object",
                "properties": {"inner": {"type": "string", "description": "doc"}},
            }
        },
    }
    st = convert(schema)
    inner = st["outer"].dataType["inner"]
    assert inner.metadata == {"path": "$.outer.inner", "description": "doc"}


def test_local_ref_resolution():
    schema = {
        "type": "object",
        "properties": {"addr": {"$ref": "#/$defs/address"}},
        "$defs": {
            "address": {
                "type": "object",
                "properties": {"street": {"type": "string"}},
            }
        },
    }
    st = convert(schema)
    assert isinstance(st["addr"].dataType, StructType)
    assert st["addr"].dataType["street"].dataType == StringType()


def test_external_ref_with_injectable_fetcher_and_memoization():
    calls = []

    def fetcher(url):
        calls.append(url)
        return {
            "$defs": {"geo": {"type": "object", "properties": {"lat": {"type": "number"}}}}
        }

    schema = {
        "type": "object",
        "properties": {
            "a": {"$ref": "https://ex.test/s.json#/$defs/geo"},
            "b": {"$ref": "https://ex.test/s.json#/$defs/geo"},
        },
    }
    st = convert(schema, ref_fetcher=fetcher)
    assert st["a"].dataType["lat"].dataType == DoubleType()
    assert calls == ["https://ex.test/s.json"]  # memoized: fetched once

    with pytest.raises(ValueError, match="ref_fetcher"):
        convert(schema)  # offline compiler refuses to fetch silently


def test_local_ref_inside_external_document_resolves_against_it():
    """A '#/...' ref nested in a fetched document belongs to THAT
    document. Resolving it against the root schema either KeyErrors or
    — the dangerous case planted here — silently binds a same-named
    root definition of a different type."""

    def fetcher(url):
        return {
            "$defs": {
                "point": {
                    "type": "object",
                    "properties": {
                        "lat": {"type": "number"},
                        # local to the EXTERNAL document
                        "tag": {"$ref": "#/$defs/tag"},
                    },
                },
                "tag": {"type": "integer"},
            }
        }

    schema = {
        "type": "object",
        "properties": {"p": {"$ref": "https://ex.test/geo.json#/$defs/point"}},
        # decoy: same fragment path exists in the ROOT with another type
        "$defs": {"tag": {"type": "string"}},
    }
    st = convert(schema, ref_fetcher=fetcher)
    assert st["p"].dataType["lat"].dataType == DoubleType()
    assert st["p"].dataType["tag"].dataType == LongType()


def test_circular_ref_cut_to_string():
    schema = {
        "type": "object",
        "properties": {"node": {"$ref": "#/$defs/node"}},
        "$defs": {
            "node": {
                "type": "object",
                "properties": {"child": {"$ref": "#/$defs/node"}},
            }
        },
    }
    st = convert(schema, circular_references=["#/$defs/node"])
    assert st["node"].dataType == StringType()


def test_type_union_and_format_refinement():
    schema = {
        "type": "object",
        "properties": {
            "maybe": {"type": ["string", "null"]},
            "when": {"type": "string", "format": "date-time"},
            "day": {"type": "string", "format": "date"},
        },
    }
    st = convert(schema)
    assert st["maybe"].dataType == StringType()
    assert st["when"].dataType == TimestampType()
    assert st["day"].dataType == DateType()


def test_map_open_objects_extension():
    schema = {"type": "object", "properties": {"bag": {"type": "object"}}}
    # reference behavior: open object degrades to default scalar
    assert convert(schema)["bag"].dataType == StringType()
    # extension: MapType for open-keyed objects
    assert convert(schema, map_open_objects=True)["bag"].dataType == MapType(
        StringType(), StringType()
    )


def test_nullable_union_overrides_required():
    """A required field whose type union declares "null" must compile
    nullable: required-ness constrains key presence, the union admits
    null VALUES."""
    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    st = convert_json_schema_to_spark(
        {
            "type": "object",
            "properties": {
                "a": {"type": ["string", "null"]},
                "b": {"type": "string"},
            },
            "required": ["a", "b"],
        }
    )
    assert st["a"].nullable is True
    assert st["b"].nullable is False


def test_json_pointer_array_index_and_escapes():
    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    schema = {
        "type": "object",
        "properties": {
            "x": {"$ref": "#/defs/items/0"},
            "y": {"$ref": "#/defs/a~1b"},
        },
        "defs": {
            "items": [{"type": "integer", "description": "first"}],
            "a/b": {"type": "number"},
        },
    }
    st = convert_json_schema_to_spark(schema)
    assert st["x"].dataType.typeName() == "long" or "int" in st["x"].dataType.typeName()
    assert st["x"].metadata["description"] == "first"
    assert "double" in st["y"].dataType.typeName() or "float" in st["y"].dataType.typeName()


def test_root_level_ref_resolves_to_properties():
    """{'$ref': '#/$defs/Root', '$defs': ...} is a common schema shape —
    the root ref must resolve rather than compile to zero columns."""
    schema = {
        "$ref": "#/$defs/Root",
        "$defs": {
            "Root": {
                "type": "object",
                "properties": {"a": {"type": "string"}},
                "required": ["a"],
            }
        },
    }
    st = convert(schema)
    assert [f.name for f in st.fields] == ["a"]
    assert st["a"].nullable is False


def test_no_properties_raises_like_reference():
    """A property-less root raised loudly in the reference
    (schema.py:54); an empty StructType would silently parse every
    record to zero columns."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="No properties"):
        convert({"type": "object"})


def test_const_behind_ref_is_dropped():
    """const-ness may live on the $ref TARGET: the reference resolves
    before dropping, so must we."""
    schema = {
        "type": "object",
        "properties": {
            "keep": {"type": "integer"},
            "drop": {"$ref": "#/$defs/c"},
        },
        "$defs": {"c": {"const": "fixed", "type": "string"}},
    }
    st = convert(schema)
    assert [f.name for f in st.fields] == ["keep"]


def test_boolean_subschemas_compile():
    """Boolean subschemas are valid JSON Schema (draft 6+): `true`
    admits anything → permissive default dtype; `false` admits nothing
    → the property can never be present, dropped like a const field.
    The old code raised TypeError('argument of type bool is not
    iterable') on both (round-7 review finding)."""
    schema = {
        "type": "object",
        "properties": {
            "anything": True,
            "never": False,
            "arr": {"type": "array", "items": True},
            "keep": {"type": "integer"},
        },
    }
    st = convert(schema)
    assert [f.name for f in st.fields] == ["anything", "arr", "keep"]
    assert isinstance(st["anything"].dataType, StringType)
    assert isinstance(st["arr"].dataType, ArrayType)
    assert isinstance(st["arr"].dataType.elementType, StringType)


def test_root_ref_chain_resolves():
    """A $ref chain at the ROOT ({'$ref': A} → A = {'$ref': B}) must
    follow like _type_of's recursion does everywhere else; the old
    single-hop resolve raised 'No properties found' on a valid schema
    (round-7 review finding)."""
    schema = {
        "$ref": "#/$defs/A",
        "$defs": {
            "A": {"$ref": "#/$defs/B"},
            "B": {
                "type": "object",
                "properties": {"x": {"type": "string"}},
            },
        },
    }
    st = convert(schema)
    assert [f.name for f in st.fields] == ["x"]


def test_root_external_ref_sibling_props_resolve_in_root_doc():
    """Sibling keys merged over an EXTERNAL root $ref keep their own
    document scope: a root-document sibling property whose local
    '#/$defs/...' ref exists only in the ROOT document must compile
    (the old code walked it in the external document → KeyError).
    The converter must also be reusable — a second to_struct() call
    resolves the root ref against the ROOT document again."""
    external = {
        "Base": {
            "type": "object",
            "properties": {"y": {"type": "integer"}},
        }
    }
    root = {
        "$ref": "https://ext.example/s.json#/Base",
        "properties": {"x": {"$ref": "#/$defs/X"}},
        "$defs": {"X": {"type": "integer"}},
    }
    conv = JsonSchemaConverter(
        root, ref_fetcher=lambda url: external, enforce_required_field=False
    )
    st = conv.to_struct()
    # dict-merge semantics: sibling 'properties' replaces wholesale
    assert [f.name for f in st.fields] == ["x"]
    assert isinstance(st["x"].dataType, LongType)
    # reusability: same result, not a KeyError from leftover doc scope
    assert conv.to_struct() == st


def test_boolean_ref_targets():
    """Round-8 finding: a $ref to a boolean schema crashed the shallow
    merge ({**True, ...} → TypeError) although inline boolean
    subschemas are supported. A ref to `true` compiles to the
    permissive default; a ref to `false` drops the field like the
    inline form."""
    from pyspark.sql.types import StringType

    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    schema = {
        "properties": {
            "anything": {"$ref": "#/$defs/T"},
            "never": {"$ref": "#/$defs/F"},
            "keep": {"type": "integer"},
        },
        "$defs": {"T": True, "F": False},
    }
    st = convert_json_schema_to_spark(schema)
    names = [f.name for f in st.fields]
    assert "never" not in names           # ref'd false == inline false
    assert "anything" in names and "keep" in names
    assert st["anything"].dataType == StringType()  # permissive default


def test_nonroot_circular_ref_raises_actionable_error():
    """Round-8 finding: a non-root $ref cycle not listed in
    circular_references died with a raw RecursionError; it now gets the
    same actionable 64-hop error as the root chain."""
    import pytest

    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    schema = {
        "properties": {"x": {"$ref": "#/$defs/A"}},
        "$defs": {"A": {"$ref": "#/$defs/B"}, "B": {"$ref": "#/$defs/A"}},
    }
    with pytest.raises(ValueError, match="circular_references"):
        convert_json_schema_to_spark(schema)
    # the converter stays reusable after the raise: listing the ref
    # resolves the cycle to the documented StringType cutoff
    st = convert_json_schema_to_spark(
        schema, circular_references=["#/$defs/A"]
    )
    assert st["x"].dataType.typeName() == "string"


def test_ref_sibling_subtree_resolves_in_declaring_document():
    """Round-8 finding: sibling keys of a $ref node were typed under
    the ref TARGET's document, so a root-document sibling's local
    '#/...' refs resolved against the external doc (KeyError, or a
    silently wrong same-named type)."""
    from pyspark.sql.types import ArrayType, LongType

    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    external = {
        "$defs": {
            "Box": {"type": "array"},
            # same-named def with a DIFFERENT type: wrong-document
            # resolution would silently bind string, not integer
            "LocalItem": {"type": "string"},
        }
    }
    root = {
        "properties": {
            "x": {
                "$ref": "https://ext/s.json#/$defs/Box",
                "items": {"$ref": "#/$defs/LocalItem"},
            }
        },
        "$defs": {"LocalItem": {"type": "integer"}},
    }
    st = convert_json_schema_to_spark(
        root, ref_fetcher=lambda url: external
    )
    assert st["x"].dataType == ArrayType(LongType(), True)


def test_failed_ref_resolution_does_not_leak_hop_budget():
    """Round-9 finding (ADVICE): _ref_hops was incremented before the
    try/finally, so each FAILED resolution (unresolvable ref, fetcher
    error) leaked one hop and a long-lived converter eventually raised
    a spurious 64-hop error on valid schemas."""
    import pytest

    from dask_felleskomponenter_spark.functions.json_schema import (
        JsonSchemaConverter,
    )

    schema = {
        "properties": {
            "bad": {"$ref": "#/$defs/missing"},
            "good": {"$ref": "#/$defs/Num"},
        },
        "$defs": {"Num": {"type": "number"}},
    }
    conv = JsonSchemaConverter({"properties": schema["properties"],
                                "$defs": schema["$defs"]})
    for _ in range(70):  # > the 64-hop budget if any hop leaks
        with pytest.raises(KeyError):
            conv.to_struct()
    assert conv._ref_hops == 0
    # a valid schema still compiles on the same (reused) converter class
    ok = JsonSchemaConverter(
        {"properties": {"good": {"$ref": "#/$defs/Num"}},
         "$defs": {"Num": {"type": "number"}}}
    )
    # reuse the SAME instance 70 times: no hop leak, no spurious raise
    for _ in range(70):
        st = ok.to_struct()
    assert st["good"].dataType.typeName() == "double"


def test_mixed_ownership_merged_ref_subtrees():
    """Round-9 finding (ADVICE): use_doc was all-or-nothing — when a
    sibling contributed 'properties', a TARGET-contributed 'items' in
    the same merged node was also typed under the current document,
    resolving its local refs against the wrong doc. Ownership is now
    per key."""
    from pyspark.sql.types import ArrayType, LongType, StringType

    from dask_felleskomponenter_spark.functions.json_schema import (
        convert_json_schema_to_spark,
    )

    external = {
        "$defs": {
            # target contributes ONLY "items", whose local ref must
            # resolve against THIS document
            "Box": {"type": "array", "items": {"$ref": "#/$defs/Elem"}},
            "Elem": {"type": "integer"},
        }
    }
    root = {
        "properties": {
            "x": {
                "$ref": "https://ext/s.json#/$defs/Box",
                # sibling contributes an unrelated subtree key — under
                # the old all-or-nothing rule its presence flipped the
                # WHOLE merged node to the root doc, where #/$defs/Elem
                # binds the decoy (string) or KeyErrors
                "description": "sibling-refined box",
            },
            # sibling-contributed properties beside a target items:
            # both must type under their own documents
            "y": {
                "$ref": "https://ext/s.json#/$defs/Box",
                "type": "object",
                "properties": {"n": {"$ref": "#/$defs/LocalN"}},
            },
        },
        "$defs": {"Elem": {"type": "string"}, "LocalN": {"type": "integer"}},
    }
    st = convert_json_schema_to_spark(root, ref_fetcher=lambda url: external)
    # x: items from the target doc → integer elements, NOT the root decoy
    assert st["x"].dataType == ArrayType(LongType(), True)
    # y: sibling properties resolve in the ROOT doc
    assert st["y"].dataType["n"].dataType == LongType()
    assert st["y"].dataType["n"].dataType != StringType()
