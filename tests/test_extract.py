"""T1 oracle extractor unit tests — adversarial cases from SURVEY.md §7 M0."""

import unicodedata

from gaia_ref.extract import extract_text, norm_surface, split_sentences, tokenize


def test_basic_tags():
    assert extract_text(b"<p>Hello world.</p><p>Second.</p>") == "Hello world.\nSecond."


def test_inline_tags_become_space():
    assert extract_text(b"<p>a<b>b</b>c</p>") == "a b c"


def test_script_style_comment_stripped():
    html = (b"<style>p{}</style><script>var x='<p>no</p>';</script>"
            b"<!-- hidden --><p>kept</p>")
    assert extract_text(html) == "kept"


def test_unterminated_script_runs_to_eof():
    assert extract_text(b"<p>ok</p><script>var x=1;") == "ok"


def test_entities():
    assert extract_text(b"<p>a &amp; b &lt;c&gt; &#65; &#x42;</p>") == "a & b <c> A B"


def test_broken_entities_literal():
    assert extract_text(b"<p>&unknowny; &amp;x &#xZZ;</p>") == "&unknowny; &x &#xZZ;"


def test_nbsp_and_crlf():
    assert extract_text(b"<p>a&nbsp;b</p>\r\n<p>c\xc2\xa0d</p>") == "a b\nc d"


def test_nfc_normalization():
    # e + combining acute -> precomposed é
    out = extract_text("<p>café</p>".encode())
    assert out == "café" and unicodedata.is_normalized("NFC", out)


def test_whitespace_collapse_and_no_trailing():
    out = extract_text(b"<p>  a \t b  </p>\n\n\n<p> c </p>  ")
    assert out == "a b\nc"
    assert not out.endswith((" ", "\n", "\t"))


def test_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<html><body></body></html>") == ""


def test_invalid_utf8_replaced():
    assert extract_text(b"<p>a\xffb</p>") == "a�b"


def test_deterministic():
    html = b"<div><p>X &amp; Y.</p><script>no</script><p>Z?</p></div>"
    assert extract_text(html) == extract_text(html)


def test_sentence_offsets_roundtrip():
    text = extract_text(b"<p>One two. Three four! Five?</p><p>Next line.</p>")
    spans = split_sentences(text)
    assert [text[b:e] for _s, b, e in spans] == [
        "One two.", "Three four!", "Five?", "Next line."]
    assert [s for s, _b, _e in spans] == [0, 1, 2, 3]


def test_tokenize_offsets():
    toks = tokenize("ab  cd", base=10)
    assert toks == [(10, 12, "ab"), (14, 16, "cd")]


def test_norm_surface():
    assert norm_surface("  I.B.M. ") == "i.b.m"
    assert norm_surface("(Kyiv),") == "kyiv"
    assert norm_surface("International  Business Machines") == (
        "international business machines")
