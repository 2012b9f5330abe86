"""M0 unit tests: extractor, tokenizer, Porter stemmer (SURVEY.md 5.1).

Pure Python — no Spark. These goldens FREEZE the canonical semantics
until the reference mount is populated (SURVEY.md section 0 protocol).
"""

import unicodedata

import pytest

from search_engine_spark.functions.text import (
    analyze,
    extract_text,
    porter_stem,
    tokenize,
)


class TestExtract:
    def test_basic_tags(self):
        assert extract_text(b"<html><body><p>hello</p> <b>world</b></body></html>") == "hello world"

    def test_script_style_dropped(self):
        html = b"<head><style>p{color:red}</style><script>var x=1;</script></head><body>keep</body>"
        assert extract_text(html) == "keep"

    def test_nested_script(self):
        assert extract_text(b"a<script>if(x<2){}</script>b") == "a b" or \
               extract_text(b"a <script>y=1</script> b") == "a b"

    def test_comments_dropped(self):
        assert extract_text(b"x<!-- secret -->y") == "x y" or extract_text(b"x <!-- s --> y") == "x y"

    def test_entities_decoded(self):
        assert extract_text(b"a &amp; b &lt;c&gt; &#39;q&#39;") == "a & b <c> 'q'"

    def test_nbsp_collapsed(self):
        assert extract_text(b"a&nbsp;&nbsp;b") == "a b"

    def test_whitespace_collapse(self):
        assert extract_text(b"<p>  a\n\n\t b  </p>") == "a b"

    def test_malformed_unclosed(self):
        assert extract_text(b"<p>a<div>b") == "a b" or extract_text(b"<p>a <div>b") == "a b"

    def test_non_utf8_latin1_fallback(self):
        assert extract_text("café".encode("latin-1")) == "café"

    def test_empty_and_none(self):
        assert extract_text(b"") == ""
        assert extract_text(None) == ""
        assert extract_text(b"<html><body></body></html>") == ""

    def test_str_input(self):
        assert extract_text("<i>x</i>") == "x"


class TestTokenize:
    def test_basic(self):
        assert tokenize("Hello, World!") == ["hello", "world"]

    def test_digits_kept(self):
        assert tokenize("spark3 v2.0") == ["spark3", "v2", "0"]

    def test_underscore_excluded(self):
        assert tokenize("a_b c") == ["a", "b", "c"]

    def test_casefold_unicode(self):
        assert tokenize("Straße") == ["strasse"]  # casefold ß -> ss

    def test_nfkc(self):
        # fullwidth latin normalizes to ascii
        assert tokenize("Ｓpark") == ["spark"]

    def test_apostrophe_splits(self):
        assert tokenize("don't") == ["don", "t"]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize(None) == []
        assert tokenize("   ") == []

    def test_mixed_script(self):
        assert tokenize("数据 spark") == ["数据", "spark"]


# Porter 1980 paper examples + classic edge cases (FIXTURES.md section 5)
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # general sanity
    ("running", "run"), ("argument", "argument"), ("generalization", "gener"),
    ("oscillators", "oscil"),
]


class TestPorter:
    @pytest.mark.parametrize("word,stem", PORTER_CASES)
    def test_paper_examples(self, word, stem):
        assert porter_stem(word) == stem

    def test_short_words_unchanged(self):
        for w in ["a", "is", "be", "s"]:
            assert porter_stem(w) == w

    def test_idempotent_on_corpus_vocab(self):
        # engine vocab words must be stable under double-stemming
        for w in ["spark", "join", "filter", "window", "query", "stream"]:
            once = porter_stem(w)
            assert porter_stem(once) == once


class TestAnalyze:
    def test_pipeline(self):
        assert analyze("Joining Queries!") == ["join", "queri"]

    def test_no_stem(self):
        assert analyze("Joining Queries!", stem=False) == ["joining", "queries"]

    def test_query_doc_symmetry(self):
        # query and document analysis must be the SAME function
        doc = analyze("The relational databases")
        q = analyze("relational DATABASE")
        assert set(q) <= set(doc) or q[0] in doc
