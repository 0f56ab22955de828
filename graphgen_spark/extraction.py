"""Mention/triple extraction: the GraphGen record grammar, emitted and
parsed deterministically.

The reference drives an LLM with KG_EXTRACTION_PROMPT and parses the
response (``graphgen/models/kg_builder/light_rag_kg_builder.py:66-98``,
``graphgen/utils/format.py:38-80``).  Grammar (``templates/kg/
kg_extraction.py:201-207``): records separated by ``##`` and terminated
by ``<|COMPLETE|>``; each record is ``("entity"<|>NAME<|>TYPE<|>SUMMARY)``
or ``("relationship"<|>SRC<|>TGT<|>SUMMARY)`` or
``("content_keywords"<|>KWS)``.

Two halves, both pure Python (called from Arrow-batched pandas UDFs):

- ``mock_llm_response(content)`` — the deterministic no-network stand-in
  for the LLM: pattern-matches relation sentences of the synthetic
  corpus grammar and emits a response string in the EXACT record
  grammar above (so the parse path is exercised end to end).
- ``parse_extraction_response(response, chunk_id)`` — reference-parity
  parser producing entity and relation dicts.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from graphgen_spark.synth import ENTITY_TYPES, VERBS_EN, VERBS_ZH, _choice
from graphgen_spark.textkit import clean_str, split_multi_markers

TUPLE_DELIM = "<|>"
RECORD_DELIM = "##"
COMPLETION_DELIM = "<|COMPLETE|>"

_ALIAS_PAT = r"(?:The )?[A-Z][\w-]*(?: [A-Z0-9][\w-]*)*"
_VERBS_EN_ALT = "|".join(
    re.escape(v) for v in sorted(VERBS_EN, key=len, reverse=True)
)
_VERBS_ZH_ALT = "|".join(
    re.escape(v) for v in sorted(VERBS_ZH, key=len, reverse=True)
)
_REL_EN_RE = re.compile(
    rf"({_ALIAS_PAT}) ({_VERBS_EN_ALT}) ({_ALIAS_PAT})\."
)
_REL_ZH_RE = re.compile(
    rf"({_ALIAS_PAT})({_VERBS_ZH_ALT})({_ALIAS_PAT})。"
)
# hot-loop split/search patterns precompiled once (the generic
# split_multi_markers re-derived its pattern per call — ~75k calls per
# 3k pages in the fused kernel profile)
_RECORD_SPLIT_RE = re.compile(
    re.escape(RECORD_DELIM) + "|" + re.escape(COMPLETION_DELIM)
)
_TUPLE_SPLIT_RE = re.compile(re.escape(TUPLE_DELIM))
_PAREN_RE = re.compile(r"\((.*)\)")


def find_relation_sentences(content: str) -> List[Tuple[str, str, str, str]]:
    """(src_alias, verb, tgt_alias, sentence) for every relation-grammar
    sentence in the chunk, in document order."""
    out = []
    for regex, sentinel in ((_REL_EN_RE, "."), (_REL_ZH_RE, "。")):
        # every match of either grammar ends in its terminator — a
        # C-speed substring check skips the (expensive) full regex
        # scan on chunks that cannot match, which for the ZH grammar
        # is every pure-English chunk (r7; same matches, same order)
        if sentinel not in content:
            continue
        for m in regex.finditer(content):
            src, verb, tgt = m.group(1), m.group(2), m.group(3)
            out.append((src, verb, tgt, m.group(0)))
    return out


_ETYPE_CACHE: Dict[str, str] = {}


def mock_entity_type(alias: str) -> str:
    # pure function of the alias — memoized per worker process (the
    # same alias recurs across chunks; md5-based _choice dominated the
    # mock responder's profile).  Bounded: the synthetic alias
    # vocabulary is small; cleared at 1M entries as a safety valve.
    t = _ETYPE_CACHE.get(alias)
    if t is None:
        if len(_ETYPE_CACHE) > 1_000_000:
            _ETYPE_CACHE.clear()
        t = _choice(ENTITY_TYPES, "atype", alias)
        _ETYPE_CACHE[alias] = t
    return t


def mock_llm_response(content: str) -> str:
    """Deterministic LLM stand-in: emits the GraphGen record grammar for
    every relation sentence found in the chunk.  Empty string when the
    chunk holds no extractable relations (the parser yields nothing)."""
    matches = find_relation_sentences(content)
    if not matches:
        return ""
    records: List[str] = []
    seen_entities = set()
    keywords = set()
    for src, verb, tgt, sent in matches:
        for alias in (src, tgt):
            if alias not in seen_entities:
                seen_entities.add(alias)
                etype = mock_entity_type(alias)
                records.append(
                    f'("entity"{TUPLE_DELIM}"{alias}"{TUPLE_DELIM}'
                    f'"{etype}"{TUPLE_DELIM}"{alias} is mentioned in: {sent}")'
                )
        records.append(
            f'("relationship"{TUPLE_DELIM}"{src}"{TUPLE_DELIM}'
            f'"{tgt}"{TUPLE_DELIM}"{src} {verb} {tgt}")'
        )
        keywords.add(verb)
    records.append(
        f'("content_keywords"{TUPLE_DELIM}"{", ".join(sorted(keywords))}")'
    )
    return f"{RECORD_DELIM}\n".join(records) + COMPLETION_DELIM


MM_CHUNK_TYPES = ("image", "table")
_MM_PREDICATE = {"image": "depicts", "table": "tabulates"}


def mock_mm_llm_response(
    chunk_id: str, chunk_type: str, caption: str
) -> str:
    """Deterministic stand-in for the reference's multimodal extraction
    (``models/kg_builder/mm_kg_builder.py:20-98``): an image/table chunk
    yields a mini graph — one central multimodal entity (entity_type
    IMAGE/TABLE) plus the text entities found in its caption, each
    linked to the central entity — in the same record grammar, so the
    shared parser and merge operators handle MM records unchanged."""
    if chunk_type not in MM_CHUNK_TYPES:
        return ""
    central = f"{chunk_type.upper()} {chunk_id[:8]}"
    snippet = " ".join(caption.split())[:100]
    records: List[str] = [
        f'("entity"{TUPLE_DELIM}"{central}"{TUPLE_DELIM}'
        f'"{chunk_type.upper()}"{TUPLE_DELIM}'
        f'"{chunk_type} chunk captioned: {snippet}")'
    ]
    pred = _MM_PREDICATE[chunk_type]
    seen_entities = set()
    for src, verb, tgt, sent in find_relation_sentences(caption):
        for alias in (src, tgt):
            if alias not in seen_entities:
                seen_entities.add(alias)
                etype = mock_entity_type(alias)
                records.append(
                    f'("entity"{TUPLE_DELIM}"{alias}"{TUPLE_DELIM}'
                    f'"{etype}"{TUPLE_DELIM}'
                    f'"{alias} appears in {chunk_type} caption: {sent}")'
                )
                records.append(
                    f'("relationship"{TUPLE_DELIM}"{central}"'
                    f'{TUPLE_DELIM}"{alias}"{TUPLE_DELIM}'
                    f'"{central} {pred} {alias}")'
                )
        records.append(
            f'("relationship"{TUPLE_DELIM}"{src}"{TUPLE_DELIM}'
            f'"{tgt}"{TUPLE_DELIM}"{src} {verb} {tgt}")'
        )
    records.append(
        f'("content_keywords"{TUPLE_DELIM}"{pred}")'
    )
    return f"{RECORD_DELIM}\n".join(records) + COMPLETION_DELIM


class GleaningResponder:
    """Multi-round extraction protocol (reference
    ``light_rag_kg_builder.py:43-66``): an initial extraction pass,
    then up to ``max_loop`` IF_LOOP("yes"/"no") + CONTINUE rounds whose
    responses are CONCATENATED onto the running result before the
    single final parse — records accumulate across rounds.
    """

    max_loop = 3

    def initial(self, content: str) -> str:
        raise NotImplementedError

    def if_loop(self, content: str, round_idx: int, so_far: str) -> str:
        """'yes' to keep gleaning (reference strips quotes/case)."""
        return "no"

    def continue_(self, content: str, round_idx: int, so_far: str) -> str:
        return ""


def run_gleaning(responder: GleaningResponder, content: str) -> str:
    """The reference's glean loop shape (initial -> [IF_LOOP? CONTINUE]*
    -> concatenated final result)."""
    final = responder.initial(content)
    for i in range(responder.max_loop):
        ans = (
            responder.if_loop(content, i, final)
            .strip().strip('"').strip("'").lower()
        )
        if ans != "yes":
            break
        final += responder.continue_(content, i, final)
    return final


class MockGleaningLLM(GleaningResponder):
    """Deterministic gleaning stand-in: withholds records past the
    first ``per_round`` on the initial pass and drips the rest through
    CONTINUE rounds — exercises IF_LOOP/CONTINUE and cross-round record
    accumulation end to end.  The concatenated result parses to exactly
    the single-shot record set (asserted in tests)."""

    def __init__(self, per_round: int = 2, max_loop: int = 3):
        self.per_round = per_round
        self.max_loop = max_loop

    def _records(self, content: str) -> List[str]:
        full = mock_llm_response(content)
        if not full:
            return []
        body = full.replace(COMPLETION_DELIM, "")
        return [
            r for r in body.split(f"{RECORD_DELIM}\n") if r.strip()
        ]

    def _chunk(self, records: List[str], start: int) -> str:
        part = records[start : start + self.per_round]
        if not part:
            return COMPLETION_DELIM
        tail = (
            f"{RECORD_DELIM}\n"
            if start + self.per_round < len(records)
            else COMPLETION_DELIM
        )
        return f"{RECORD_DELIM}\n".join(part) + tail

    def initial(self, content: str) -> str:
        records = self._records(content)
        if not records:
            return ""
        return self._chunk(records, 0)

    def if_loop(self, content: str, round_idx: int, so_far: str) -> str:
        remaining = len(self._records(content)) - (
            (round_idx + 1) * self.per_round
        )
        return '"Yes"' if remaining > 0 else "no"

    def continue_(self, content: str, round_idx: int, so_far: str) -> str:
        return self._chunk(
            self._records(content), (round_idx + 1) * self.per_round
        )


def parse_extraction_response(
    response: str, chunk_id: str
) -> Tuple[List[Dict], List[Dict]]:
    """Reference-parity parse of an extraction response.

    Mirrors ``light_rag_kg_builder.py:66-98``: split records on
    ``##``/``<|COMPLETE|>``, take the parenthesized body, split fields
    on ``<|>``; entities require the literal quoted tag ``"entity"``
    and >=4 fields; names/types are clean_str(UPPER), descriptions
    clean_str (``format.py:38-80``).
    """
    entities: List[Dict] = []
    relations: List[Dict] = []
    for record in split_multi_markers(
        response, [RECORD_DELIM, COMPLETION_DELIM],
        _split_re=_RECORD_SPLIT_RE,
    ):
        m = _PAREN_RE.search(record)
        if not m:
            continue
        attrs = split_multi_markers(
            m.group(1), [TUPLE_DELIM], _split_re=_TUPLE_SPLIT_RE
        )
        if len(attrs) >= 4 and attrs[0] == '"entity"':
            name = clean_str(attrs[1].upper())
            if not name.strip():
                continue
            entities.append(
                {
                    "entity_name": name,
                    "entity_type": clean_str(attrs[2].upper()),
                    "description": clean_str(attrs[3]),
                    "source_id": chunk_id,
                }
            )
        elif len(attrs) >= 4 and attrs[0] == '"relationship"':
            relations.append(
                {
                    "src_id": clean_str(attrs[1].upper()),
                    "tgt_id": clean_str(attrs[2].upper()),
                    "description": clean_str(attrs[3]),
                    "source_id": chunk_id,
                }
            )
    return entities, relations
