"""Parity tests for the pure-python text kernels against reference
semantics (graphgen/utils/format.py, detect_lang.py) — cases hand-ported
from reading the reference, not by importing it."""

from graphgen_spark.splitter import split_text
from graphgen_spark.textkit import (
    clean_str,
    count_tokens,
    detect_main_language,
    split_multi_markers,
    truncate_tokens,
)


class TestCleanStr:
    def test_html_unescape(self):
        assert clean_str("Tom &amp; Jerry") == "Tom & Jerry"
        assert clean_str("&lt;tag&gt;") == "<tag>"

    def test_control_chars_removed(self):
        assert clean_str("a\x00b\x1fc\x7fd\x9fe") == "abcde"

    def test_outer_quotes_stripped(self):
        assert clean_str('"QUOTED"') == "QUOTED"
        assert clean_str("'QUOTED'") == "QUOTED"
        # strip('"').strip("'") semantics: only outer layer each
        assert clean_str("\"'X'\"") == "X"

    def test_strip_then_unescape(self):
        assert clean_str("  spaced  ") == "spaced"

    def test_non_string_passthrough(self):
        assert clean_str(5) == 5


class TestSplitMultiMarkers:
    def test_basic(self):
        assert split_multi_markers("a##b<|COMPLETE|>c", ["##", "<|COMPLETE|>"]) == [
            "a", "b", "c",
        ]

    def test_strips_and_drops_empty(self):
        assert split_multi_markers(" a ## ## b ", ["##"]) == ["a", "b"]

    def test_no_markers(self):
        assert split_multi_markers("abc", []) == ["abc"]


class TestDetectLanguage:
    def test_english(self):
        assert detect_main_language("The Roman Empire was vast.") == "en"

    def test_chinese(self):
        assert detect_main_language("鲁镇的酒店的格局和别处不同") == "zh"

    def test_mixed_majority_zh(self):
        assert detect_main_language("黄华占是rice品种中的一种优良品种") == "zh"

    def test_mixed_majority_en(self):
        assert detect_main_language("GraphGen 是 a knowledge graph tool") == "en"

    def test_empty_defaults_en(self):
        assert detect_main_language("") == "en"
        assert detect_main_language("12345 !!!") == "en"


class TestTokenizer:
    def test_count(self):
        assert count_tokens("hello world") == 2
        assert count_tokens("a,b") == 3  # 'a' ',' 'b'
        assert count_tokens("中文字") == 3  # CJK char-per-token

    def test_truncate_is_prefix(self):
        text = "one two three four five"
        t = truncate_tokens(text, 3)
        assert t == "one two three"
        assert truncate_tokens(text, 100) == text


class TestSplitter:
    def test_short_text_single_chunk(self):
        assert split_text("hello world", chunk_size=100) == ["hello world"]

    def test_chunks_respect_size_bound(self):
        text = " ".join(f"word{i}" for i in range(500))
        chunks = split_text(text, chunk_size=50, chunk_overlap=10)
        assert len(chunks) > 1
        for c in chunks:
            assert len(c) <= 50 + 10  # same invariant the reference tests assert

    def test_paragraph_preference(self):
        text = "para one content\n\npara two content\n\npara three content"
        chunks = split_text(text, chunk_size=20, chunk_overlap=0)
        # splits along paragraph boundaries, no mid-word cuts
        assert all("para" in c for c in chunks)

    def test_overlap_carries_content(self):
        text = " ".join(f"w{i}" for i in range(100))
        chunks = split_text(text, chunk_size=40, chunk_overlap=20)
        # consecutive chunks share a suffix/prefix region
        assert len(chunks) >= 2
        joined = " ".join(chunks)
        for i in range(100):
            assert f"w{i}" in joined

    def test_zh_sentence_split(self):
        text = "第一句话。第二句话！第三句话？第四句话。"
        chunks = split_text(text, language="zh", chunk_size=8, chunk_overlap=0)
        assert len(chunks) >= 2
        assert all(c for c in chunks)

    def test_zh_newline_squeeze(self):
        text = "段落一。\n\n\n段落二。"
        chunks = split_text(text, language="zh", chunk_size=100)
        assert all("\n\n" not in c for c in chunks)

    def test_deterministic(self):
        text = "\n\n".join(
            " ".join(f"tok{i}_{j}" for j in range(30)) for i in range(20)
        )
        a = split_text(text, chunk_size=64, chunk_overlap=16)
        b = split_text(text, chunk_size=64, chunk_overlap=16)
        assert a == b
