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
        # depth of the _type_of $ref recursion — bounds non-root ref
        # chains with the same actionable 64-hop error as to_struct's
        # root chain
        self._ref_hops = 0
        # Base document for LOCAL ("#/...") ref resolution. A local ref
        # inside an externally fetched document must resolve against
        # THAT document, not the root schema — resolving against the
        # root either KeyErrors or, worse, silently binds a same-named
        # definition from the wrong document. _type_of pushes the
        # owning document around each external subtree's recursion.
        self._current_doc: dict[str, Any] = schema

    # -- public -----------------------------------------------------------
    def to_struct(self) -> StructType:
        # _current_doc is scoped and RESTORED so the converter is
        # reusable: a second to_struct() on the same instance must not
        # resolve the root ref against a leftover external document.
        prev_doc = self._current_doc
        try:
            self._current_doc = self.schema
            node: Any = self.schema
            # Follow a root-level $ref CHAIN ({"$ref": "#/$defs/A"} →
            # A = {"$ref": "#/$defs/B"} → ...), the same chain _type_of
            # follows by recursion. Sibling keys override the final
            # target WHOLESALE per key (dict-merge semantics: an outer
            # "properties" replaces the target's entirely), and each
            # kept key remembers the DOCUMENT it was declared in, so a
            # root-document sibling's local "#/..." refs never resolve
            # against whichever external document the chain ended in.
            sibling: dict[str, Any] = {}
            sib_doc: dict[str, Any] = {}
            hops = 0
            while (
                isinstance(node, dict)
                and "$ref" in node
                and node["$ref"] not in self.circular
            ):
                hops += 1
                if hops > 64:
                    raise ValueError(
                        "root $ref chain exceeds 64 hops — circular "
                        "schema? List the ref in circular_references."
                    )
                for k, v in node.items():
                    if k != "$ref" and k not in sibling:
                        sibling[k] = v
                        sib_doc[k] = self._current_doc
                node, doc = self._resolve_ref_with_doc(node["$ref"])
                self._current_doc = doc
            if isinstance(node, bool):
                # boolean schemas are valid JSON Schema; neither form
                # declares properties, so both fail the loud check below
                node = {}
            if sibling.get("properties"):
                props = sibling["properties"]
                props_scope = sib_doc["properties"]
            else:
                props = node.get("properties", {})
                props_scope = self._current_doc
            if not props:
                # Same loud failure as the reference (schema.py:54): a
                # property-less root would otherwise compile to an empty
                # StructType and parse every record to zero columns with
                # no error — silent empty output from a misconfigured
                # schema.
                raise ValueError("No properties found in JSON schema")
            required = set(sibling.get("required", node.get("required", [])))
            # compile the properties in the document that DECLARED them
            self._current_doc = props_scope
            return StructType(
                [
                    f
                    for name, sub in props.items()
                    if (f := self._field(name, sub, required, f"$.{name}"))
                    is not None
                ]
            )
        finally:
            self._current_doc = prev_doc

    # -- internals --------------------------------------------------------
    def _nullable(self, name: str, required: set[str]) -> bool:
        if not self.enforce_required:
            return True
        return name not in required

    def _field(
        self, name: str, node: dict[str, Any], required: set[str], path: str
    ) -> StructField | None:
        # Boolean subschemas are valid JSON Schema (draft 6+): `false`
        # admits NO value — the property can never legally be present,
        # so it is dropped like a const field; `true` admits anything —
        # compile to the permissive default dtype. Without this guard,
        # '"$ref" in node' below raises TypeError on a bool.
        if isinstance(node, bool):
            if node is False:
                return None
            return StructField(
                name,
                self._default_dtype(),
                self._nullable(name, required),
                metadata={"path": path, "description": ""},
            )
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
            target = self._resolve_ref(node["$ref"])
            if isinstance(target, bool):
                # Boolean REF TARGETS are as legal as inline boolean
                # subschemas (draft 6+): a ref to `false` admits no
                # value — drop the field like the inline form — and a
                # ref to `true` carries no const/description to merge.
                if target is False:
                    return None
            else:
                resolved = {**target, **node}
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

    def _type_of(
        self,
        node: dict[str, Any],
        path: str,
        key_docs: dict[str, dict[str, Any]] | None = None,
    ) -> DataType | None:
        """``key_docs`` maps a subtree key ("properties"/"items") of a
        MERGED ref+sibling node to the document that declared it; absent
        keys belong to the ambient ``_current_doc``."""
        if isinstance(node, bool):
            # boolean subschema in a type position (e.g. "items": true):
            # no type information either way → permissive default
            return self._default_dtype()
        if "$ref" in node:
            ref = node["$ref"]
            if ref in self.circular or path in self.circular:
                return StringType()
            # Same 64-hop guard the root chain gets (to_struct): a
            # non-root cycle not listed in circular_references must
            # raise the ACTIONABLE error, not a ~1000-frame
            # RecursionError that never mentions circular_references.
            # The increment is unwound in the finally below even when
            # resolution itself raises (unresolvable ref / fetcher
            # failure) — otherwise a reused converter leaks one hop per
            # failed resolution and eventually mis-raises the 64-hop
            # error on valid schemas.
            self._ref_hops += 1
            try:
                if self._ref_hops > 64:
                    raise ValueError(
                        f"$ref chain exceeds 64 hops at {path} — circular "
                        f"schema? List the ref in circular_references."
                    )
                resolved, doc = self._resolve_ref_with_doc(ref)
                if isinstance(resolved, bool):
                    # boolean ref target in a type position: no type info
                    # either way (same as an inline boolean subschema) —
                    # siblings may still refine, and they belong to the
                    # CURRENT document, not the target's.
                    resolved, doc = {}, self._current_doc
                sibs = {k: v for k, v in node.items() if k != "$ref"}
                merged = {**resolved, **sibs}
                # Each subtree the recursion walks belongs to whichever
                # document DECLARED it, tracked PER KEY (mirroring
                # to_struct's sib_doc): a root-document sibling's
                # "properties" must resolve its local refs against the
                # ROOT doc while a target-contributed "items" in the
                # SAME merged node resolves against the target doc —
                # an all-or-nothing choice types one of them wrong.
                # Sibling keys inherit their outer owner when this node
                # is itself the product of a merge (ref chain).
                new_key_docs = {
                    k: (
                        (key_docs or {}).get(k, self._current_doc)
                        if k in sibs
                        else doc
                    )
                    for k in ("properties", "items")
                    if k in merged
                }
                # Ambient doc for the merged node is the TARGET's: the
                # only ref-bearing non-subtree key a merged node can
                # carry is a chained "$ref", which the target declared.
                prev, self._current_doc = self._current_doc, doc
                try:
                    return self._type_of(merged, path, new_key_docs)
                finally:
                    self._current_doc = prev
            finally:
                self._ref_hops -= 1
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
            # descend in the document that declared "properties"
            prev_doc = self._current_doc
            self._current_doc = (key_docs or {}).get(
                "properties", self._current_doc
            )
            try:
                fields = [
                    f
                    for name, sub in props.items()
                    if (
                        f := self._field(name, sub, required, f"{path}.{name}")
                    )
                    is not None
                ]
            finally:
                self._current_doc = prev_doc
            return StructType(fields)
        if t == "array":
            items = node.get("items")
            if isinstance(items, list):
                items = items[0] if items else None
            if not items:
                return ArrayType(self._default_dtype())
            # descend in the document that declared "items"
            prev_doc = self._current_doc
            self._current_doc = (key_docs or {}).get(
                "items", self._current_doc
            )
            try:
                elem = self._type_of(items, f"{path}[]")
            finally:
                self._current_doc = prev_doc
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
