"""JSON Schema → Spark ``StructType`` compiler.

Fresh implementation of the capability surface of the reference's
``Json2Spark`` (``/root/reference/src/dask_felleskomponenter/felleskomponenter/schema.py:1-198``),
with the same observable semantics:

- type mapping string/decimal/number/float/integer/boolean/timestamp/date
  (``schema.py:6-15``); unknown types fall back to a configurable default
  (``schema.py:117-124``).
- ``object`` → ``StructType`` recursively (``schema.py:101-116``);
  ``array`` → ``ArrayType`` of the first ``items`` type (``schema.py:80-100``);
  ``enum`` → ``StringType`` (``schema.py:61-69``); ``const`` → field
  dropped (``schema.py:57-58``).
- nullability: a field is non-nullable iff listed in the enclosing
  ``required`` array and ``enforce_required_field`` is on
  (``schema.py:34-37``).
- per-field metadata ``{"path": ..., "description": ...}`` recording the
  JSON-path provenance (``schema.py:143-144``).
- local ``#/...`` ``$ref`` resolution by cursor walk
  (``schema.py:133-138,158-165``); external refs via an injectable
  ``ref_fetcher`` (the reference fetches over HTTP with memoization,
  ``schema.py:146-155,166-182`` — here the transport is caller-supplied so
  the compiler works offline); circular refs cut to ``StringType`` via the
  ``circular_references`` path list (``schema.py:61-69,129-131``).

Extension over the reference: ``map_open_objects=True`` compiles an
``object`` with no ``properties`` to ``MapType(string, default)`` instead
of the default scalar (the reference never produces ``MapType``).

Driver-side pure function; no executor work.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRIMITIVES: dict[str, Callable[[], DataType]] = {
    "string": StringType,
    "decimal": DecimalType,
    "number": DoubleType,
    "float": FloatType,
    "integer": LongType,
    "boolean": BooleanType,
    "timestamp": TimestampType,
    "date": DateType,
}


class JsonSchemaConverter:
    """Compile a JSON-Schema document into a Spark ``StructType``."""

    def __init__(
        self,
        schema: dict[str, Any],
        enforce_required_field: bool = True,
        default_type: str = "string",
        circular_references: list[str] | None = None,
        ref_fetcher: Callable[[str], dict[str, Any]] | None = None,
        map_open_objects: bool = False,
    ) -> None:
        self.schema = schema
        self.enforce_required = enforce_required_field
        self.default_type = default_type
        self.circular = set(circular_references or [])
        self.ref_fetcher = ref_fetcher
        self.map_open_objects = map_open_objects
        self._external_cache: dict[str, dict[str, Any]] = {}
        # Base document for LOCAL ("#/...") ref resolution. A local ref
        # inside an externally fetched document must resolve against
        # THAT document, not the root schema — resolving against the
        # root either KeyErrors or, worse, silently binds a same-named
        # definition from the wrong document. _type_of pushes the
        # owning document around each external subtree's recursion.
        self._current_doc: dict[str, Any] = schema

    # -- public -----------------------------------------------------------
    def to_struct(self) -> StructType:
        node = self.schema
        # A root-level $ref ({"$ref": "#/$defs/Root", "$defs": {...}}) is
        # a common schema shape — resolve it so its properties are found.
        if "$ref" in node and node["$ref"] not in self.circular:
            merged = {k: v for k, v in node.items() if k != "$ref"}
            resolved, doc = self._resolve_ref_with_doc(node["$ref"])
            node = {**resolved, **merged}
            # an external root's local refs resolve against ITS document
            self._current_doc = doc
        props = node.get("properties", {})
        if not props:
            # Same loud failure as the reference (schema.py:54): a
            # property-less root would otherwise compile to an empty
            # StructType and parse every record to zero columns with no
            # error — silent empty output from a misconfigured schema.
            raise ValueError("No properties found in JSON schema")
        required = set(node.get("required", []))
        return StructType(
            [
                f
                for name, sub in props.items()
                if (f := self._field(name, sub, required, f"$.{name}")) is not None
            ]
        )

    # -- internals --------------------------------------------------------
    def _nullable(self, name: str, required: set[str]) -> bool:
        if not self.enforce_required:
            return True
        return name not in required

    def _field(
        self, name: str, node: dict[str, Any], required: set[str], path: str
    ) -> StructField | None:
        # Resolve a $ref BEFORE the const check: the reference drops a
        # const field whether the const sits on the ref site or on the
        # ref target (property2struct resolves first). An unresolvable
        # ref raises here exactly as _type_of would — same error, one
        # resolution instead of two.
        # This shallow resolve (const/description only) deliberately
        # does NOT feed _type_of: the typing pass must go through
        # _type_of's own $ref branch, which scopes _current_doc around
        # the subtree so the target's nested local refs resolve against
        # their owning document. The repeat walk is dict traversal only
        # — external fetches are cached.
        resolved = node
        if (
            "$ref" in node
            and node["$ref"] not in self.circular
            and path not in self.circular
        ):
            resolved = {**self._resolve_ref(node["$ref"]), **node}
        if "const" in resolved:
            return None  # const fields carry no data; dropped
        dtype = self._type_of(node, path)
        meta = {
            "path": path,
            # description may live on the $ref target, not the ref site
            "description": resolved.get("description", ""),
        }
        # a type union declaring "null" is nullable even when required:
        # required-ness constrains key PRESENCE, the union constrains
        # the VALUE — {"type": ["string", "null"]} admits null values
        t = resolved.get("type")
        declares_null = isinstance(t, list) and "null" in t
        nullable = self._nullable(name, required) or declares_null
        return StructField(name, dtype, nullable, metadata=meta)

    def _type_of(self, node: dict[str, Any], path: str) -> DataType | None:
        if "$ref" in node:
            ref = node["$ref"]
            if ref in self.circular or path in self.circular:
                return StringType()
            resolved, doc = self._resolve_ref_with_doc(ref)
            merged = {k: v for k, v in node.items() if k != "$ref"}
            merged = {**resolved, **merged}
            # the resolved subtree's local refs belong to ITS document
            prev, self._current_doc = self._current_doc, doc
            try:
                return self._type_of(merged, path)
            finally:
                self._current_doc = prev
        if "enum" in node:
            return StringType()
        t = node.get("type")
        if isinstance(t, list):  # ["string", "null"] style unions
            non_null = [x for x in t if x != "null"]
            t = non_null[0] if non_null else None
        if t == "object":
            props = node.get("properties")
            if not props:
                if self.map_open_objects:
                    return MapType(StringType(), self._default_dtype())
                return self._default_dtype()
            required = set(node.get("required", []))
            fields = [
                f
                for name, sub in props.items()
                if (f := self._field(name, sub, required, f"{path}.{name}"))
                is not None
            ]
            return StructType(fields)
        if t == "array":
            items = node.get("items")
            if isinstance(items, list):
                items = items[0] if items else None
            if not items:
                return ArrayType(self._default_dtype())
            elem = self._type_of(items, f"{path}[]")
            return ArrayType(elem if elem is not None else self._default_dtype())
        if t in _PRIMITIVES:
            # format-aware refinement: JSON Schema idiom "type": "string"
            # with "format": "date-time"/"date"
            fmt = node.get("format")
            if t == "string" and fmt == "date-time":
                return TimestampType()
            if t == "string" and fmt == "date":
                return DateType()
            return _PRIMITIVES[t]()
        return self._default_dtype()

    def _default_dtype(self) -> DataType:
        return _PRIMITIVES.get(self.default_type, StringType)()

    def _resolve_ref(self, ref: str) -> dict[str, Any]:
        node, _doc = self._resolve_ref_with_doc(ref)
        return node

    def _resolve_ref_with_doc(
        self, ref: str
    ) -> tuple[dict[str, Any], dict[str, Any]]:
        """Resolve ``ref`` and return ``(node, owning_document)`` — the
        document the node's own nested local refs must resolve against."""
        if ref.startswith("#"):
            return (
                self._walk_fragment(self._current_doc, ref),
                self._current_doc,
            )
        base, _, fragment = ref.partition("#")
        if self.ref_fetcher is None:
            raise ValueError(
                f"external $ref {ref!r} requires a ref_fetcher (offline compiler)"
            )
        if base not in self._external_cache:
            self._external_cache[base] = self.ref_fetcher(base)
        doc = self._external_cache[base]
        return (
            self._walk_fragment(doc, "#" + fragment if fragment else "#"),
            doc,
        )

    @staticmethod
    def _walk_fragment(doc: dict[str, Any], fragment: str) -> dict[str, Any]:
        cursor: Any = doc
        for part in fragment.lstrip("#/").split("/"):
            if not part:
                continue
            # RFC 6901 JSON Pointer: ~1 decodes to '/', ~0 to '~' (in
            # that order), and numeric tokens index arrays
            part = part.replace("~1", "/").replace("~0", "~")
            if isinstance(cursor, list):
                cursor = cursor[int(part)]
            else:
                cursor = cursor[part]
        return cursor


def convert_json_schema_to_spark(
    schema: dict[str, Any],
    enforce_required_field: bool = True,
    default_type: str = "string",
    circular_references: list[str] | None = None,
    ref_fetcher: Callable[[str], dict[str, Any]] | None = None,
    map_open_objects: bool = False,
) -> StructType:
    """Facade matching the reference's entry point
    (``schema.py:185-198``)."""
    return JsonSchemaConverter(
        schema,
        enforce_required_field=enforce_required_field,
        default_type=default_type,
        circular_references=circular_references,
        ref_fetcher=ref_fetcher,
        map_open_objects=map_open_objects,
    ).to_struct()
