"""Tokenizer golden cases -- mirrors the reference's tokenizer/fixture intent
(`Words.cpp` semantics; unicode/emoticon fixtures under
`test/system/data/html/`; SURVEY.md X1/X2, FIXTURES.md §1).
"""

from open_source_search_engine_spark.functions.tokenizer import (
    doc_length,
    term_counts,
    tokenize,
    tokenize_with_positions,
)


def test_basic_lowercase_and_split():
    assert tokenize("Hello, World!") == ["hello", "world"]


def test_positions_are_token_ordinals():
    assert tokenize_with_positions("a b a") == [("a", 0), ("b", 1), ("a", 2)]


def test_possessive_and_hyphen():
    # reference strips possessives as a synonym form (XmlDoc_Indexing.cpp:2072);
    # our spec keeps segmentation simple: apostrophe and hyphen are separators
    assert tokenize("bob's cd-rom") == ["bob", "s", "cd", "rom"]


def test_numbers():
    assert tokenize("1,000 items cost 1.8") == ["1", "000", "items", "cost", "1", "8"]


def test_unicode_mode_keeps_letters():
    assert tokenize("Café Müller 東京", mode="unicode") == ["café", "müller", "東京"]


def test_ascii_mode_drops_non_ascii():
    assert tokenize("Café 東京 x1", mode="ascii") == ["caf", "x1"]


def test_emoji_are_separators():
    assert tokenize("hello 😀 world") == ["hello", "world"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []
    assert doc_length(None) == 0


def test_stopword_heavy_turn():
    toks = tokenize("to be or not to be")
    assert toks == ["to", "be", "or", "not", "to", "be"]
    tc = term_counts("to be or not to be")
    assert tc["to"] == (2, [0, 4])
    assert tc["be"] == (2, [1, 5])
    assert tc["or"] == (1, [2])


def test_doc_length_counts_tokens():
    assert doc_length("a b c a") == 4
