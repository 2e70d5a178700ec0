"""Metadata multimap + header-name spell-checking — parity with
``metadata/Metadata.java`` and ``metadata/SpellCheckedMetadata.java``.

The reference wraps every protocol response's header map in a
``SpellCheckedMetadata`` (``protocol/Content.java:66``): header *names*
are normalized (Unicode letters only, lowercased) and fuzzy-matched
against the ``HttpHeaders`` vocabulary with a Levenshtein threshold of
``min(3, len(normalized) // 3)`` (strict ``<``,
``SpellCheckedMetadata.java:110-125``), so ``contentype`` /
``CoNtEntType`` / ``contntype`` all land on ``Content-Type``.

Two surfaces here:

- driver-side ``Metadata`` / ``SpellCheckedMetadata`` classes mirroring
  the reference API (``names/get/getValues/add/set/setAll/remove/size/
  isMultiValued``) — used by parity tests and small driver-side header
  handling; NOT a row-at-a-time path (never call these inside a UDF).
- JVM column twins for at-scale ingestion of external header maps
  (e.g. archive imports): ``spell_checked_header`` rewrites one
  header-name column, ``spell_check_metadata_keys`` rewrites the keys
  of a ``map<string,string>`` column, entirely in whole-stage codegen
  (``F.levenshtein`` against the 13-literal vocabulary — no shuffle,
  no Python).

Documented deviation: when several vocabulary entries fall inside the
threshold, the reference takes the first hit in ``HashMap`` key order
(JVM-hash dependent, ``SpellCheckedMetadata.java:118-122``); both
implementations here take the minimum distance with lexicographic
tie-break — deterministic, and indistinguishable in practice (no two
vocabulary entries are within a common query's threshold of each
other: the closest normalized pair is > distance 4 apart).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# HttpHeaders.java:29-55 — the full spell-checked vocabulary.
HTTP_HEADERS = (
    "Transfer-Encoding",
    "Client-Transfer-Encoding",
    "Content-Encoding",
    "Content-Language",
    "Content-Length",
    "Content-Location",
    "Content-Disposition",
    "Content-MD5",
    "Content-Type",
    "Last-Modified",
    "Location",
    "If-Modified-Since",
    "User-Agent",
)

CONTENT_TYPE = "Content-Type"  # Metadata.java re-exports (via HttpHeaders)

_THRESHOLD_DIVIDER = 3  # SpellCheckedMetadata.TRESHOLD_DIVIDER


def normalize_name(name: str) -> str:
    """``SpellCheckedMetadata.normalize`` (:82-93): keep Unicode
    letters only, lowercased."""
    return "".join(c.lower() for c in name if c.isalpha())


_NAMES_IDX = {normalize_name(v): v for v in HTTP_HEADERS}


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def get_normalized_name(name: str) -> str:
    """``SpellCheckedMetadata.getNormalizedName`` (:104-126): exact
    lookup on the normalized form, else best fuzzy hit under the
    strict threshold, else the original name unchanged."""
    searched = normalize_name(name)
    value = _NAMES_IDX.get(searched)
    if value is None:
        threshold = min(3, len(searched) // _THRESHOLD_DIVIDER)
        best = min(
            ((_levenshtein(searched, nv), nv) for nv in sorted(_NAMES_IDX)),
            default=None,
        )
        if best is not None and best[0] < threshold:
            value = _NAMES_IDX[best[1]]
    return value if value is not None else name


class Metadata:
    """``metadata/Metadata.java`` — a string multimap over insertion-
    ordered keys (the reference's backing HashMap has arbitrary
    ``names()`` order; insertion order here is a deterministic
    superset of every assertion in TestMetadata/TestSpellCheckedMetadata)."""

    CONTENT_TYPE = CONTENT_TYPE

    def __init__(self) -> None:
        self._meta: dict[str, list[str]] = {}

    def names(self) -> list[str]:
        return list(self._meta)

    def get(self, name: str) -> str | None:
        vals = self._meta.get(name)
        return vals[0] if vals else None

    def get_values(self, name: str) -> list[str]:
        return list(self._meta.get(name, ()))

    def add(self, name: str, value: str) -> None:
        self._meta.setdefault(name, []).append(value)

    def set(self, name: str, value: str) -> None:
        self.remove(name)
        self.add(name, value)

    def set_all(self, properties: dict[str, str]) -> None:
        for k, v in properties.items():
            self.set(k, v)

    def remove(self, name: str) -> None:
        self._meta.pop(name, None)

    def size(self) -> int:
        return len(self._meta)

    def is_empty(self) -> bool:
        return not self._meta

    def is_multi_valued(self, name: str) -> bool:
        return len(self._meta.get(name, ())) > 1

    def clear(self) -> None:
        self._meta.clear()

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Metadata):
            return NotImplemented
        return self._meta == other._meta

    def __repr__(self) -> str:  # Metadata.toString shape
        return " ".join(
            f"{k}={v}" for k, vals in self._meta.items() for v in vals
        )


class SpellCheckedMetadata(Metadata):
    """``metadata/SpellCheckedMetadata.java`` — every name passed
    through :func:`get_normalized_name` before delegation."""

    def get(self, name: str) -> str | None:
        return super().get(get_normalized_name(name))

    def get_values(self, name: str) -> list[str]:
        return super().get_values(get_normalized_name(name))

    def add(self, name: str, value: str) -> None:
        super().add(get_normalized_name(name), value)

    def set(self, name: str, value: str) -> None:
        super().set(get_normalized_name(name), value)

    def remove(self, name: str) -> None:
        super().remove(get_normalized_name(name))

    def is_multi_valued(self, name: str) -> bool:
        return super().is_multi_valued(get_normalized_name(name))


# ---------------------------------------------------------------------------
# JVM column twins
# ---------------------------------------------------------------------------

def _norm_col(name: Column) -> Column:
    return F.lower(F.regexp_replace(name, r"[^\p{L}]", ""))


def spell_checked_header(name: Column) -> Column:
    """Column twin of :func:`get_normalized_name`: canonicalize a
    header-name column against the HttpHeaders vocabulary.

    Pure column expression — an exact hit via a 13-entry map literal,
    else ``array_min`` over ``struct(levenshtein, canonical)`` (struct
    ordering = min distance, lexicographic tie-break) gated by the
    reference's strict threshold. Stays inside whole-stage codegen;
    cost is 13 Levenshtein calls on an already-letters-only short
    string per row, no shuffle."""
    norm = _norm_col(name)
    exact = F.element_at(
        F.create_map(
            *[F.lit(x) for nv, canon in sorted(_NAMES_IDX.items()) for x in (nv, canon)]
        ),
        norm,
    )
    threshold = F.least(
        F.lit(3), (F.length(norm) / _THRESHOLD_DIVIDER).cast("int")
    )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    F.levenshtein(norm, F.lit(nv)).alias("d"),
                    F.lit(canon).alias("name"),
                )
                for nv, canon in sorted(_NAMES_IDX.items())
            ]
        )
    )
    fuzzy = F.when(best["d"] < threshold, best["name"])
    return F.coalesce(exact, fuzzy, name)


def spell_check_metadata_keys(meta: Column) -> Column:
    """Rewrite the keys of a ``map<string,string>`` metadata column
    through :func:`spell_checked_header`.

    Two raw keys may canonicalize to the same name (``contenttype`` +
    ``Content-Type``); a map can hold each key once, so the FIRST
    occurrence wins (map_entries preserves entry order) — the
    single-valued-map projection of the reference's multimap ``add``,
    matching ``Metadata.get``'s first-value read (:96-104)."""
    checked = F.transform(
        F.map_entries(meta),
        lambda e: F.struct(
            spell_checked_header(e["key"]).alias("key"), e["value"].alias("value")
        ),
    )
    first_only = F.filter(
        checked,
        lambda e, i: ~F.exists(
            F.slice(checked, 1, i), lambda p: p["key"] == e["key"]
        ),
    )
    return F.map_from_entries(first_only)
