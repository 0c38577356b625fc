"""Context schema: named index fields with tokenizer/normalizer/type config.

Mirrors Hunt's ``Schema = Map Context ContextSchema`` with ``ContextType``
bundles (``hunt-searchengine/src/Hunt/Index/Schema.hs:71-117,127-179``):

- ``text``       — positions-carrying inverted index, tokenizer ``\\w*``
- ``text-small`` — doc-set index (no positions → no phrase queries)
- ``int``        — doc-set index keyed by zero-filled order-preserving text
                   (via a key proxy, like Hunt's ``PrefixTreeIndexInt``)
- ``date``       — doc-set index keyed by "YYYYMMDDHHMMSS" digit strings

The key proxy (``key_normalizer``) applies at ingest, query and range-bound
time alike, mirroring Hunt's Bijection proxies
(``Hunt/Index/PrefixTreeIndex.hs:215-330``). ``search_score`` selects the
similarity used when scoring found words (InvertedIndex.hs:92-97 uses
``similar``; PrefixTreeIndexInt:257-262 uses ``similarInt``; the date index
falls back to the default 1.0 score, Index.hs:107-119).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ContextType:
    name: str
    token_pattern: str          # RE2-style pattern for token runs
    validator: str              # key into normalize.VALIDATORS
    value_kind: str             # "positions" | "docset"
    key_normalizer: str | None  # applied after the user chain (proxy)
    search_score: str           # "similar" | "similar_int" | "default"
    range_score: str            # "default" | "similar_range_int"
    range_filter: str = "none"  # "none" | "position2d" (Dim2Search semantics)
    # rectangle-range backing structure: "sorted" scans the dictionary's
    # Z-order key range (+ per-dimension filter); "rtree" descends an
    # STR-packed R-tree (index/rtree.py) — same results, pruned by both
    # dimensions like the reference's SimpleRTreeIndex
    range_structure: str = "sorted"


CONTEXT_TYPES: dict[str, ContextType] = {
    "text": ContextType(
        name="text",
        token_pattern=r"\w+",                       # Schema.hs:129 "\\w*"
        validator="text",
        value_kind="positions",
        key_normalizer=None,
        search_score="similar",
        range_score="default",
    ),
    "text-small": ContextType(
        name="text-small",
        token_pattern=r"\w+",
        validator="text-small",
        value_kind="docset",                        # Schema.hs:139-145
        key_normalizer=None,
        search_score="similar",
        range_score="default",
    ),
    "int": ContextType(
        name="int",
        token_pattern=r"-?[0-9]+",                  # Schema.hs:149 "([-]?[0-9]*)"
        validator="int",
        value_kind="docset",
        key_normalizer="ZeroFill",
        search_score="similar_int",
        range_score="similar_range_int",
    ),
    "date": ContextType(
        name="date",
        # Schema.hs:158: full ISO-date token regex
        token_pattern=r"[0-9]{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01])",
        validator="date",
        value_kind="docset",
        key_normalizer="Date",
        search_score="default",
        range_score="default",
    ),
    # position-rtree shares the position type's observable semantics
    # (Schema.hs:173-179: same regex/validator, rectangle lookupRange) but,
    # like the reference's SimpleRTreeIndex (RTreeIndex.hs:120-180), backs
    # rectangle queries with a real R-tree: an STR-packed tree per
    # (partition, context), built lazily from the dictionary keys
    # (index/rtree.py) instead of scanning the Z-order key range
    "position-rtree": ContextType(
        name="position-rtree",
        token_pattern=(r"-?(?:90(?:\.0*)?|[1-8]?[0-9](?:\.[0-9]*)?)-"
                       r"-?(?:(?:180(?:\.0*)?)|(?:1[0-7][0-9])|(?:[1-9]?[0-9]))"
                       r"(?:\.[0-9]*)?"),
        validator="position",
        value_kind="docset",
        key_normalizer="Position",
        search_score="default",
        range_score="default",
        range_filter="position2d",
        range_structure="rtree",
    ),
    "position": ContextType(
        name="position",
        # Schema.hs:168: the reference's lat-long token regex
        token_pattern=(r"-?(?:90(?:\.0*)?|[1-8]?[0-9](?:\.[0-9]*)?)-"
                       r"-?(?:(?:180(?:\.0*)?)|(?:1[0-7][0-9])|(?:[1-9]?[0-9]))"
                       r"(?:\.[0-9]*)?"),
        validator="position",
        value_kind="docset",                 # PrefixTreeIndexPosition: DocIdSet
        key_normalizer="Position",
        search_score="default",
        range_score="default",
        range_filter="position2d",           # Dim2Search.lookupRange semantics
    ),
}


@dataclass(frozen=True)
class ValueKind:
    """A pluggable index VALUE kind — the analog of Hunt's existential
    ``IndexImpl`` (``Hunt/Index/IndexImpl.hs:36-51``), which lets a new
    index value type plug into the engine without touching the segment
    codec. Payloads ride the postings ``positions`` column (one ``uint32``
    per occurrence, non-decreasing within a doc — the delta+varbyte framing
    of ``index/codec.py`` requires it), so ``codec.py`` needs no edits.

    - ``build_payload(pdf)``: build-time hook. Receives the per-batch
      posting frame (polars: term, doc_id, tf?, positions list[u32]) with
      raw token positions and returns the payload list column to store.
      ``None`` keeps the built-in behavior for the named kind.
    - ``to_occ(post)``: query-time hook. Receives decoded ``Postings``
      (doc_ids, tfs, payload flat+offsets) and returns the ``OccSet`` the
      combinator algebra aggregates (``score = similarity × tf`` per doc,
      positional ops over whatever "positions" it exposes). ``None`` keeps
      built-in behavior ("positions" passthrough / "docset" singleton
      upcast, SearchResult.hs:66-69).

    Registries are per-process: ship a ``register_value_kind`` call in
    ``BuildConfig.worker_setup`` so analyzer workers see custom kinds.
    """

    name: str
    positional: bool                  # participates in phrase/follow/near
    build_payload: "object | None" = None  # Callable[[pl.DataFrame], pl.Series]
    to_occ: "object | None" = None         # Callable[[Postings], OccSet]


VALUE_KINDS: dict[str, ValueKind] = {
    "positions": ValueKind(name="positions", positional=True),
    "docset": ValueKind(name="docset", positional=False),
}


def register_value_kind(vk: ValueKind) -> ValueKind:
    """Register a custom index value kind; any ``ContextType`` whose
    ``value_kind`` names it will store ``build_payload``'s output and score
    through ``to_occ`` — no codec edits needed."""
    VALUE_KINDS[vk.name] = vk
    return vk


def register_context_type(ctype: ContextType, *, normalizer=None,
                          validator=None) -> ContextType:
    """User-extension hook (Hunt's ``initHuntEnv`` ContextTypes/CNormalizer
    registries, Interpreter.hs:183-200; custom-type demo
    hunt-demos/extended-hunt/src/Main.hs:65): register a new context kind
    plus its optional key normalizer / validator callables, after which any
    ``ContextSchema(type=ctype.name)`` uses it — build, query-key
    normalization and range scoring all dispatch through the registries."""
    from .normalize import NORMALIZERS, VALIDATORS

    if normalizer is not None and ctype.key_normalizer:
        NORMALIZERS[ctype.key_normalizer] = normalizer
    if validator is not None:
        VALIDATORS[ctype.validator] = validator
    if ctype.validator not in VALIDATORS:
        raise ValueError(f"validator {ctype.validator!r} is not registered")
    if ctype.value_kind not in VALUE_KINDS:
        raise ValueError(f"value kind {ctype.value_kind!r} is not registered "
                         "(register_value_kind first)")
    if ctype.key_normalizer and ctype.key_normalizer not in NORMALIZERS:
        raise ValueError(f"normalizer {ctype.key_normalizer!r} is not registered")
    CONTEXT_TYPES[ctype.name] = ctype
    return ctype


@dataclass(frozen=True)
class ContextSchema:
    """One context's config (Schema.hs:80-92)."""

    type: str = "text"
    regexp: str | None = None           # tokenizer override
    normalizers: tuple[str, ...] = ()   # user normalizer chain (left-to-right)
    weight: float = 1.0                 # context weight used at aggregation
    default: bool = True                # searched when no QContext given
    source: str = "text"                # input column/extractor: text|title|headlines

    @property
    def ctype(self) -> ContextType:
        return CONTEXT_TYPES[self.type]

    @property
    def token_pattern(self) -> str:
        return self.regexp if self.regexp is not None else self.ctype.token_pattern


Schema = dict[str, ContextSchema]


def default_schema() -> Schema:
    """The fixture schema (FIXTURES.md §2, modeled on html-hunter's contexts
    ``HtmlHunter.hs:330-335`` and the reference test schema
    ``test/Hunt/TestHelper.hs:296-306``)."""
    return {
        "body": ContextSchema(type="text", weight=1.0, default=True, source="text"),
        "title": ContextSchema(type="text", weight=2.0, default=True, source="title"),
        "headlines": ContextSchema(
            type="text", normalizers=("LowerCase",), weight=1.5, default=True,
            source="headlines",
        ),
        "datecontext": ContextSchema(type="date", default=False, source="text"),
        "intcontext": ContextSchema(type="int", default=False, source="text"),
        "geocontext": ContextSchema(type="position", default=False, source="text"),
    }


def fixture_schema() -> Schema:
    """default_schema + a ``geortree`` context (STR R-tree structure) over
    the same text — used by the rank-identity suite so every geo rectangle
    is answered through BOTH structures and compared against the oracle.
    Kept out of :func:`default_schema` so the bench/build job definition
    (6 contexts, BASELINE.md) stays comparable across rounds."""
    s = default_schema()
    s["geortree"] = ContextSchema(type="position-rtree", default=False,
                                  source="text")
    return s


def schema_to_json(schema: Schema) -> str:
    return json.dumps(
        {
            cx: {
                "type": cs.type,
                "regexp": cs.regexp,
                "normalizers": list(cs.normalizers),
                "weight": cs.weight,
                "default": cs.default,
                "source": cs.source,
            }
            for cx, cs in schema.items()
        },
        sort_keys=True,
    )


def schema_from_json(s: str) -> Schema:
    raw = json.loads(s)
    return {
        cx: ContextSchema(
            type=d["type"],
            regexp=d.get("regexp"),
            normalizers=tuple(d.get("normalizers", ())),
            weight=float(d.get("weight", 1.0)),
            default=bool(d.get("default", True)),
            source=d.get("source", "text"),
        )
        for cx, d in raw.items()
    }
