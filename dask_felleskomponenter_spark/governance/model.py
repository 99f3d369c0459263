"""Governance data model.

Open rebuild of the reference's governance dataclasses
(``/root/reference/src/dask_felleskomponenter/governance/checks/common.py:18-68``)
with identical observable semantics. Norwegian field names are the public
API and are kept verbatim (SURVEY.md §7 step 3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

#: Engine-internal table-property prefixes never surfaced as governance
#: tags (the reference skips ``delta.*`` at ``main.py:27-29``; Spark
#: additionally stamps ``spark.*``/``option.*``/``transient_lastDdlTime``).
#: Defined HERE (the leaf module) and imported by the store so the two
#: filters — the store's read path and TableMetadata's absorb loop —
#: can never drift.
INTERNAL_PREFIXES = ("delta.", "spark.", "option.", "transient_lastDdlTime")

#: Medallion levels, in maturity order (``common.py:8``).
MEDALJONGNIVAA = ["bronze", "silver", "gold"]


@dataclass
class CodelistEntry:
    """One codelist value.

    Equality is asymmetric on purpose (``common.py:23-28``): comparing an
    entry against a plain string matches the string against ``id`` only —
    this is how raw tag values (URIs) match codelist entries. Two entries
    compare by ``id``.
    """

    id: str
    label: str | None = None
    codevalue: str | None = None

    def __eq__(self, other: object) -> bool:
        if isinstance(other, str):
            return other == self.id
        if not isinstance(other, CodelistEntry):
            return False
        return self.id == other.id

    def __repr__(self) -> str:  # keep error messages readable
        return f"CodelistEntry(id={self.id!r}, label={self.label!r})"


@dataclass(init=False)
class TableMetadata:
    """Governance metadata for one table (``common.py:31-56``).

    Unknown keyword arguments are absorbed into ``optional_params``,
    except engine-internal ``delta.*`` keys which are dropped
    (``common.py:49-56`` — the same skip the fetch path applies at
    ``main.py:27-29``).
    """

    catalog: str | None = field(default=None)
    schema: str | None = field(default=None)
    table: str | None = field(default=None)
    tittel: str | None = field(default=None)
    beskrivelse: str | None = field(default=None)
    tilgangsnivaa: str | None = field(default=None)
    medaljongnivaa: str | None = field(default=None)
    hovedkategori: str | None = field(default=None)
    emneord: str | None = field(default=None)
    epsg_koder: str | None = field(default=None)
    begrep: str | None = field(default=None)
    sikkerhetsnivaa: str | None = field(default=None)
    column_properties: dict[str, dict] = field(default_factory=dict)
    optional_params: dict[str, Any] = field(default_factory=dict)

    def __init__(self, **kwargs: Any) -> None:
        # An explicit optional_params kwarg seeds the bag (it used to be
        # skipped by the field loop AND excluded from the absorb loop —
        # silently dropped); absorbed unknown keys layer on top.
        seed = kwargs.get("optional_params")
        if seed is not None and not isinstance(seed, dict):
            raise TypeError(
                f"optional_params must be a dict, got {type(seed).__name__}"
            )
        self.optional_params = dict(seed or {})
        for name in self.__dataclass_fields__:
            if name == "optional_params":
                continue
            default = {} if name == "column_properties" else None
            value = kwargs.get(name, default)
            if name == "column_properties" and value is None:
                value = {}
            setattr(self, name, value)
        for key, value in kwargs.items():
            # THE store's INTERNAL_PREFIXES filter (shared constant,
            # not a re-spelled subset): absorbing spark.*/option.*/
            # transient_lastDdlTime here would make a TableMetadata
            # built straight from SHOW TBLPROPERTIES output disagree
            # with the store-built twin, and round-tripping its
            # optional_params through set_tags would write
            # engine-internal properties as governance tags. Prefix
            # match, not substring — a user tag merely CONTAINING
            # "delta." (e.g. "pre_delta.note") must survive.
            if key not in self.__dataclass_fields__ and not any(
                key.startswith(p) for p in INTERNAL_PREFIXES
            ):
                self.optional_params[key] = value


@dataclass
class MetadataError:
    """One validation finding with an executable remedy
    (``common.py:59-68``)."""

    catalog: str | None
    schema: str | None
    table: str | None
    column: str | None
    description: str
    solution: str | None
    for_field: str
    valid_values: str | list[CodelistEntry] | list[str]
