"""Parser parity vs the reference record grammar, using the literal
example outputs embedded in the reference's extraction prompt
(graphgen/templates/kg/kg_extraction.py:38-53) as fixtures, plus the
deterministic mock-LLM roundtrip."""

from graphgen_spark.extraction import (
    find_relation_sentences,
    mock_llm_response,
    parse_extraction_response,
)

TD, RD, CD = "<|>", "##", "<|COMPLETE|>"

# Literal prefix of the reference prompt's Example 1 output with the
# FORMAT delimiters substituted (kg_extraction.py:38-53, 201-207).
EXAMPLE1 = (
    f'("entity"{TD}"Roman Empire"{TD}"organization"{TD}"The dominant empire of the second century CE."){RD}\n'
    f'("entity"{TD}"Nerva"{TD}"person"{TD}"Roman emperor who contributed to the public administration."){RD}\n'
    f'("relationship"{TD}"Nerva"{TD}"Roman Empire"{TD}"Nerva was one of the emperors who contributed to the empire\'s successful administration."){RD}\n'
    f'("content_keywords"{TD}"Roman governance, imperial prosperity"){CD}'
)


class TestParserParity:
    def test_example1(self):
        ents, rels = parse_extraction_response(EXAMPLE1, "chunk-1")
        names = {e["entity_name"] for e in ents}
        # reference: clean_str(attrs[1].upper()) -> quotes stripped, uppered
        assert names == {"ROMAN EMPIRE", "NERVA"}
        types = {e["entity_name"]: e["entity_type"] for e in ents}
        assert types["ROMAN EMPIRE"] == "ORGANIZATION"
        assert len(rels) == 1
        assert rels[0]["src_id"] == "NERVA"
        assert rels[0]["tgt_id"] == "ROMAN EMPIRE"
        assert rels[0]["source_id"] == "chunk-1"
        # content_keywords records are neither entity nor relationship
        assert all(e["entity_name"] != "CONTENT_KEYWORDS" for e in ents)

    def test_unquoted_tag_rejected(self):
        # reference requires the literal quoted tag '"entity"'
        bad = f'(entity{TD}"X"{TD}"person"{TD}"desc")'
        ents, rels = parse_extraction_response(bad, "c")
        assert ents == [] and rels == []

    def test_short_record_rejected(self):
        bad = f'("entity"{TD}"X"{TD}"person")'
        ents, _ = parse_extraction_response(bad, "c")
        assert ents == []

    def test_empty_name_skipped(self):
        bad = f'("entity"{TD}""{TD}"person"{TD}"desc")'
        ents, _ = parse_extraction_response(bad, "c")
        assert ents == []

    def test_html_escape_in_name(self):
        rec = f'("entity"{TD}"Tom &amp; Jerry"{TD}"work"{TD}"duo")'
        ents, _ = parse_extraction_response(rec, "c")
        assert ents[0]["entity_name"] == "TOM & JERRY"

    def test_no_parens_ignored(self):
        ents, rels = parse_extraction_response("no record here", "c")
        assert ents == [] and rels == []


class TestMockLLM:
    def test_en_relation_found(self):
        text = "Zorvex Dynamics acquired Calyra Labs. Filler text here."
        found = find_relation_sentences(text)
        assert found == [
            (
                "Zorvex Dynamics",
                "acquired",
                "Calyra Labs",
                "Zorvex Dynamics acquired Calyra Labs.",
            )
        ]

    def test_zh_relation_found(self):
        text = "市场报告。The Nimbra Institute收购了Quorell Holdings。其他。"
        found = find_relation_sentences(text)
        assert len(found) == 1
        assert found[0][0] == "The Nimbra Institute"
        assert found[0][2] == "Quorell Holdings"

    def test_roundtrip_grammar(self):
        text = (
            "Zorvex Dynamics acquired Calyra Labs. "
            "Tessmark Systems partnered with Zorvex Dynamics."
        )
        resp = mock_llm_response(text)
        assert resp.endswith("<|COMPLETE|>")
        ents, rels = parse_extraction_response(resp, "ck")
        names = {e["entity_name"] for e in ents}
        assert names == {"ZORVEX DYNAMICS", "CALYRA LABS", "TESSMARK SYSTEMS"}
        pairs = {(r["src_id"], r["tgt_id"]) for r in rels}
        assert ("ZORVEX DYNAMICS", "CALYRA LABS") in pairs
        assert ("TESSMARK SYSTEMS", "ZORVEX DYNAMICS") in pairs

    def test_no_relations_empty_response(self):
        assert mock_llm_response("just some lowercase filler text.") == ""

    def test_deterministic(self):
        text = "Ardonis Capital invested in Bramwell Networks."
        assert mock_llm_response(text) == mock_llm_response(text)


class TestGleaningLoop:
    """Reference glean loop (light_rag_kg_builder.py:43-66): IF_LOOP
    'yes' -> CONTINUE responses are concatenated before one final
    parse; records accumulate across rounds."""

    CONTENT = (
        "Zorvex Dynamics acquired Calyra Labs. "
        "Calyra Labs sued Bramwell Institute. "
        "Bramwell Institute merged with Delphora Capital."
    )

    def test_gleaned_equals_single_shot(self, spark):
        from graphgen_spark.extraction import MockGleaningLLM
        from graphgen_spark.operators.kg_extract import extract_records

        chunks = spark.createDataFrame(
            [("c1", "u1", self.CONTENT)], ["chunk_id", "url", "content"]
        )
        single = {
            tuple(r) for r in extract_records(chunks).collect()
        }
        assert len(single) > 4  # several entities + relations
        gleaned = {
            tuple(r)
            for r in extract_records(
                chunks, responder=MockGleaningLLM(per_round=1, max_loop=20)
            ).collect()
        }
        assert gleaned == single

    def test_two_round_union(self, spark):
        """A 2-round fixture yields the UNION of both rounds' records."""
        from graphgen_spark.extraction import GleaningResponder
        from graphgen_spark.operators.kg_extract import extract_records

        TD, RD, CD = "<|>", "##", "<|COMPLETE|>"
        r1 = f'("entity"{TD}"Alpha"{TD}"org"{TD}"round one entity"){RD}\n'
        r2 = (
            f'("relationship"{TD}"Alpha"{TD}"Beta"{TD}"round two rel")'
            f"{CD}"
        )

        class TwoRound(GleaningResponder):
            max_loop = 3

            def initial(self, content):
                return r1

            def if_loop(self, content, round_idx, so_far):
                return '"Yes"' if round_idx == 0 else "no"

            def continue_(self, content, round_idx, so_far):
                return r2

        chunks = spark.createDataFrame(
            [("c1", "u1", "ignored")], ["chunk_id", "url", "content"]
        )
        rows = extract_records(chunks, responder=TwoRound()).collect()
        kinds = {(r["kind"], r["f1"]) for r in rows}
        assert kinds == {("entity", "ALPHA"), ("relationship", "ALPHA")}

    def test_if_loop_no_stops(self, spark):
        from graphgen_spark.extraction import GleaningResponder
        from graphgen_spark.operators.kg_extract import extract_records

        TD, CD = "<|>", "<|COMPLETE|>"

        class OneShot(GleaningResponder):
            calls = []

            def initial(self, content):
                return f'("entity"{TD}"Solo"{TD}"org"{TD}"only"){CD}'

            def continue_(self, content, round_idx, so_far):
                raise AssertionError("CONTINUE must not run after 'no'")

        chunks = spark.createDataFrame(
            [("c1", "u1", "x")], ["chunk_id", "url", "content"]
        )
        rows = extract_records(chunks, responder=OneShot()).collect()
        assert len(rows) == 1 and rows[0]["f1"] == "SOLO"
