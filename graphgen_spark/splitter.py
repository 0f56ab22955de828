"""Recursive text chunking with reference-parity semantics.

Functional re-expression of the reference's splitter stack
(``graphgen/models/splitter/recursive_character_splitter.py:7-149`` and
``graphgen/bases/base_splitter.py:68-142``): recursively pick the first
separator present in the text, split (keeping separators), then greedily
merge pieces up to ``chunk_size`` with ``chunk_overlap`` carry-over.
Pure Python — runs inside ``mapInPandas`` batches, one call per doc.
"""

from __future__ import annotations

import re
from typing import Callable, List

EN_SEPARATORS = ["\n\n", "\n", " ", ""]
ZH_SEPARATORS = [
    "\n\n",
    "\n",
    "。|！|？",
    r"\.\s|\!\s|\?\s",
    r"；|;\s",
    r"，|,\s",
]


def _regex_split_keep_leading(text: str, sep_pattern: str) -> List[str]:
    """Split; each separator is glued onto the piece that FOLLOWS it
    (reference ``_split_text_with_regex`` with keep_separator=True)."""
    if not sep_pattern:
        return [c for c in text]
    raw = re.split(f"({sep_pattern})", text)
    glued = [raw[i] + raw[i + 1] for i in range(1, len(raw) - 1, 2)]
    if len(raw) % 2 == 0:
        glued.append(raw[-1])
    out = [raw[0]] + glued
    return [s for s in out if s != ""]


def _regex_split_keep_trailing(text: str, sep_pattern: str) -> List[str]:
    """Split; each separator is glued onto the piece BEFORE it
    (reference ``_split_text_with_regex_from_end``)."""
    if not sep_pattern:
        return [c for c in text]
    raw = re.split(f"({sep_pattern})", text)
    glued = ["".join(pair) for pair in zip(raw[0::2], raw[1::2])]
    if len(raw) % 2 == 1:
        glued.append(raw[-1])
    return [s for s in glued if s != ""]


def _merge_pieces(
    pieces: List[str],
    chunk_size: int,
    chunk_overlap: int,
    length_fn: Callable[[str], int],
    joiner: str = "",
) -> List[str]:
    """Greedy accumulation into <=chunk_size chunks with overlap
    carry-over (reference ``base_splitter._merge_splits``)."""
    joiner_len = length_fn(joiner)
    chunks: List[str] = []
    window: List[str] = []
    total = 0
    for piece in pieces:
        plen = length_fn(piece)
        if total + plen + (joiner_len if window else 0) > chunk_size:
            if window:
                joined = joiner.join(window).strip()
                if joined:
                    chunks.append(joined)
                # pop from the left until within overlap AND the new
                # piece fits
                while total > chunk_overlap or (
                    total + plen + (joiner_len if window else 0) > chunk_size
                    and total > 0
                ):
                    total -= length_fn(window[0]) + (
                        joiner_len if len(window) > 1 else 0
                    )
                    window = window[1:]
        window.append(piece)
        total += plen + (joiner_len if len(window) > 1 else 0)
    joined = joiner.join(window).strip()
    if joined:
        chunks.append(joined)
    return chunks


def _split_recursive(
    text: str,
    separators: List[str],
    chunk_size: int,
    chunk_overlap: int,
    length_fn: Callable[[str], int],
    is_regex: bool,
    from_end: bool,
) -> List[str]:
    # pick the first separator that occurs in the text
    active = separators[-1]
    rest: List[str] = []
    for i, sep in enumerate(separators):
        pat = sep if is_regex else re.escape(sep)
        if sep == "":
            active = sep
            break
        if re.search(pat, text):
            active = sep
            rest = separators[i + 1 :]
            break

    pat = active if is_regex else re.escape(active)
    if from_end:
        pieces = _regex_split_keep_trailing(text, pat)
    else:
        pieces = _regex_split_keep_leading(text, pat)

    final: List[str] = []
    small: List[str] = []
    for piece in pieces:
        if length_fn(piece) < chunk_size:
            small.append(piece)
        else:
            if small:
                final.extend(
                    _merge_pieces(small, chunk_size, chunk_overlap, length_fn)
                )
                small = []
            if not rest:
                final.append(piece)
            else:
                final.extend(
                    _split_recursive(
                        piece, rest, chunk_size, chunk_overlap, length_fn,
                        is_regex, from_end,
                    )
                )
    if small:
        final.extend(_merge_pieces(small, chunk_size, chunk_overlap, length_fn))
    return final


# MarkdownTextRefSplitter's separator ladder (reference
# ``models/splitter/markdown_splitter.py:9-33``): headings first, then
# code fences, horizontal rules, blank lines, words, characters.
MD_SEPARATORS = [
    r"\n#{1,6} ",
    "```\n",
    r"\n\*\*\*+\n",
    r"\n---+\n",
    r"\n___+\n",
    "\n\n",
    "\n",
    " ",
    "",
]


def character_split(
    text: str,
    separator: str = "\n\n",
    is_separator_regex: bool = False,
    chunk_size: int = 1024,
    chunk_overlap: int = 100,
    length_fn: Callable[[str], int] = len,
    keep_separator: bool = False,
) -> List[str]:
    """Single-separator splitter (reference ``CharacterSplitter``,
    ``models/splitter/character_splitter.py:7-26``): one naive split,
    then the shared greedy merge; with keep_separator=False the
    separator is dropped from pieces and re-inserted as the merge
    joiner (reference ``_merge_splits(splits, self._separator)``)."""
    pat = separator if is_separator_regex else re.escape(separator)
    if keep_separator:
        pieces = _regex_split_keep_leading(text, pat)
        joiner = ""
    else:
        pieces = (
            [s for s in re.split(pat, text) if s != ""]
            if pat else list(text)
        )
        joiner = separator
    return _merge_pieces(
        pieces, chunk_size, chunk_overlap, length_fn, joiner
    )


def markdown_split(
    text: str,
    chunk_size: int = 1024,
    chunk_overlap: int = 100,
    length_fn: Callable[[str], int] = len,
) -> List[str]:
    """Markdown-aware recursive splitter (reference
    ``MarkdownTextRefSplitter``): the recursive ladder with regex
    separators chunking along headings before falling back to
    paragraphs/words/characters."""
    return _split_recursive(
        text, MD_SEPARATORS, chunk_size, chunk_overlap, length_fn,
        is_regex=True, from_end=False,
    )


def split_text(
    text: str,
    language: str = "en",
    chunk_size: int = 1024,
    chunk_overlap: int = 100,
    length_fn: Callable[[str], int] = len,
) -> List[str]:
    """Chunk ``text``; 'en' uses literal separators split-keep-leading,
    'zh' uses regex sentence-enders split-keep-trailing + newline
    squeeze (reference ``ChineseRecursiveTextSplitter``)."""
    if language == "zh":
        chunks = _split_recursive(
            text, ZH_SEPARATORS, chunk_size, chunk_overlap, length_fn,
            is_regex=True, from_end=True,
        )
        return [
            re.sub(r"\n{2,}", "\n", c.strip())
            for c in chunks
            if c.strip() != ""
        ]
    chunks = _split_recursive(
        text, EN_SEPARATORS, chunk_size, chunk_overlap, length_fn,
        is_regex=False, from_end=False,
    )
    return chunks
