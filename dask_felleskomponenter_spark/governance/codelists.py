"""Codelist registry: offline-first membership sources for governance
checks.

The reference mixes three codelist transports
(``checks/common.py:71-185``): inlined dicts (sikkerhetsnivaa,
tilgangsnivaa, geometri_encoding), a plain list (medaljongnivaa), and
live HTTP fetches from the geonorge registry (hovedkategori, begrep).
Here all transports sit behind one ``CodelistRegistry``:

- the inlined lists ship verbatim as ``CodelistEntry`` data (ids are the
  public contract — raw tag values are URIs matched against ``id``);
- remote lists resolve through an injectable ``remote_loader`` (same
  JSON shape as the registry API: ``{"containeditems": [{"id":
  ..., "label": ...}]}``) so offline environments and tests never touch
  the network (the reference's unconditional ``requests.get`` at
  ``common.py:84-86`` is the thing we deliberately do not repeat);
- with no loader, remote-backed checks degrade to presence-only
  validation (value is valid iff non-None), keeping ``validate()``
  usable offline.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from dask_felleskomponenter_spark.governance.model import (
    MEDALJONGNIVAA,
    CodelistEntry,
)

#: Remote registry locations (``common.py:11-15``); used only when a
#: remote_loader is injected.
CODELIST_URLS = {
    "hovedkategori": (
        "https://register.geonorge.no/metadata-kodelister/tematisk-hovedkategori"
    ),
    "begrep": "https://register.geonorge.no/metadata-kodelister/nasjonal-temainndeling",
}

SIKKERHETSNIVAA = [
    CodelistEntry(
        id="https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified",
        label="Ugradert",
        codevalue="unclassified",
    ),
    CodelistEntry(
        id="https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified_sensitive",
        label="Ungradert skjermingsverdig",
        codevalue="unclassified_sensitive",
    ),
]

TILGANGSNIVAA = [
    CodelistEntry(
        id="http://publications.europa.eu/resource/authority/access-right/PUBLIC",
        label="Allmen tilgang",
        codevalue="public",
    ),
    CodelistEntry(
        id="http://publications.europa.eu/resource/authority/access-right/RESTRICTED",
        label="betinget tilgang",
        codevalue="restricted",
    ),
    CodelistEntry(
        id="http://publications.europa.eu/resource/authority/access-right/NON_PUBLIC",
        label="ikke-allmenn tilgang",
        codevalue="non_public",
    ),
]

GEOMETRI_ENCODING = [
    CodelistEntry(
        id="dataplattform/geometri_encoding/wkt",
        label="Well-Known-Text",
        codevalue="WKT",
    ),
    CodelistEntry(
        id="dataplattform/geometri_encoding/wkb",
        label="Well-Known-Binary",
        codevalue="WKB",
    ),
    CodelistEntry(
        id="dataplattform/geometri_encoding/geojson",
        label="GeoJson",
        codevalue="geojson",
    ),
    CodelistEntry(
        id="dataplattform/geometri_encoding/s2",
        label="S2-cell",
        codevalue="s2",
    ),
]

#: Valid per-column encodings, lowercased codevalues
#: (``checks/column.py:5-7``).
VALID_GEOMETRI_ENCODING = [e.codevalue.lower() for e in GEOMETRI_ENCODING]


def entries_from_registry_json(doc: dict[str, Any]) -> list[CodelistEntry]:
    """Parse the geonorge registry JSON shape into entries
    (``common.py:88-97``)."""
    return [
        CodelistEntry(
            id=item.get("id"),
            label=item.get("label"),
            codevalue=item.get("codevalue"),
        )
        for item in doc.get("containeditems", [])
        if item.get("id") is not None
    ]


class CodelistRegistry:
    """Dispatch from codelist key to its entries (``common.py:173-185``),
    with caching and injectable remote transport."""

    def __init__(
        self,
        remote_loader: Callable[[str], dict[str, Any]] | None = None,
        overrides: dict[str, list[CodelistEntry]] | None = None,
    ) -> None:
        self.remote_loader = remote_loader
        self._cache: dict[str, list[CodelistEntry]] = {
            "sikkerhetsnivaa": SIKKERHETSNIVAA,
            "tilgangsnivaa": TILGANGSNIVAA,
            "geometri_encoding": GEOMETRI_ENCODING,
            **(overrides or {}),
        }

    def get(self, key: str) -> list[CodelistEntry] | list[str] | None:
        """Entries for ``key``; None when the list is remote-backed and no
        loader is configured (presence-only validation applies)."""
        # Consult overrides/cache FIRST: a constructor override for
        # 'medaljongnivaa' must win over the built-in list (the old
        # special-case short-circuit silently ignored it).
        # Always hand out a COPY: the cache stores the module-level
        # codelist constants themselves, so returning them unwrapped
        # let a caller's sort()/append() mutate TILGANGSNIVAA in place
        # — silently changing validation results for every registry
        # instance in the process (the medaljongnivaa branch always
        # copied; now all branches do).
        if key in self._cache:
            return list(self._cache[key])
        if key == "medaljongnivaa":
            return list(MEDALJONGNIVAA)
        if key in CODELIST_URLS and self.remote_loader is not None:
            doc = self.remote_loader(CODELIST_URLS[key])
            self._cache[key] = entries_from_registry_json(doc)
            return list(self._cache[key])
        return None

    def is_valid(self, key: str, value: str | None) -> bool:
        """Membership check with the reference's null/degradation
        semantics (``common.py:130-170``): None is never valid; a
        resolvable list checks membership (string-vs-id equality); an
        unresolvable remote list accepts any non-None value."""
        if value is None:
            return False
        entries = self.get(key)
        if entries is None:
            return True
        return value in entries


#: Default registry instance (offline).
DEFAULT_REGISTRY = CodelistRegistry()
