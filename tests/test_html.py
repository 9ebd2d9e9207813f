"""HTML extraction (llm/html.py): tokenizer hazards, density rule,
golden messy page, Spark operator parity with the pure kernel."""

from __future__ import annotations

from trend_o_meter_spark.llm.html import (
    decode_entities,
    extract_blocks,
    extract_main_text,
    html_extract,
    synthesize_page,
)


def test_entities_named_numeric_unknown():
    assert decode_entities("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert decode_entities("&#65;&#x41;&#X41;") == "AAA"
    assert decode_entities("&bogus; &#xZZ; & loose") == "&bogus; &#xZZ; & loose"
    assert decode_entities("&nbsp;") == " "


def test_raw_text_elements_never_leak():
    html = (
        "<head><title>TITLE WORDS</title>"
        "<style>p > a { color: red }</style>"
        "<script>if (a<b) { s = '</div>'; }</script></head>"
        "<p>real body words here now</p>"
    )
    assert extract_main_text(html)[0] == "real body words here now"


def test_quoted_attr_gt_and_case_insensitive_tags():
    html = '<P DATA-X="a>b">Mixed case block with six words</P>'
    blocks = extract_blocks(html)
    assert blocks == [("Mixed case block with six words", 6, 0)]


def test_comments_including_tags_inside():
    html = "<p>kept one two three four</p><!-- <p>ghost</p> --><p>kept two x y z</p>"
    assert extract_main_text(html)[1] == 2


def test_inline_tags_do_not_split_blocks():
    html = "<p>one <b>two</b> <i>three</i> <span>four</span> five</p>"
    blocks = extract_blocks(html)
    assert blocks == [("one two three four five", 5, 0)]


def test_link_density_integer_boundary():
    # 3 link words of 9 total: 3*3 <= 9 -> kept.  4 of 9: 12 > 9 -> dropped.
    kept9_3 = "<p><a>l l l</a> a b c d e f</p>"
    kept9_4 = "<p><a>l l l l</a> a b c d e</p>"
    assert extract_main_text(kept9_3)[1] == 1
    assert extract_main_text(kept9_4)[1] == 0


def test_min_words_rule():
    assert extract_main_text("<p>four words only here</p>")[1] == 0
    assert extract_main_text("<p>five words right here now</p>")[1] == 1


def test_br_and_self_closing_flush_blocks():
    html = "<p>first block words here now<br/>second block words here now</p>"
    assert extract_main_text(html)[1] == 2


def test_malformed_never_raises():
    for bad in (
        "<", "</", "<!", "<!-- never closed", "<p", "<p foo='unclosed",
        "a < b > c", "<a>unclosed anchor words here now", "</p></p></div>",
        "<script>no close", "\x00<p>x</p>", "<p>" + "&#xFFFFFFFF;" * 3,
    ):
        extract_main_text(bad)  # must not raise


def test_unclosed_anchor_caps_at_zero_depth():
    # stray </a> must not drive link depth negative
    html = "</a><p>plain words in this block</p>"
    assert extract_blocks(html) == [("plain words in this block", 5, 0)]


def test_golden_messy_page():
    html = (
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        "<nav><ul><li><a href='/'>home page</a></li>"
        "<li><a href='/x'>about page</a></li></ul></nav>"
        "<h1>Short Heading</h1>"
        "<div><p>The first real paragraph has exactly nine words"
        " <a href='#'>inline</a></p>"
        "<p>Second &amp; final paragraph &#x77;ith seven words</p></div>"
        "<footer><a>c</a> <a>2024</a> <a>legal</a> <a>and</a> <a>privacy</a>"
        " <a>links</a></footer></body></html>"
    )
    main, kept, dropped, links = extract_main_text(html)
    assert main == (
        "The first real paragraph has exactly nine words inline\n"
        "Second & final paragraph with seven words"
    )
    assert (kept, links) == (2, 1)
    assert dropped == 4  # 2 nav items, h1, footer


def test_spark_operator_matches_kernel(spark):
    rows = [
        (i, f"s{i % 2}", "en", " ".join(f"w{j}" for j in range(10 + i * 7)))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {r["doc_id"]: r for r in html_extract(df).collect()}
    for doc_id, source, lang, text in rows:
        exp = extract_main_text(synthesize_page(doc_id, source, text))
        assert (
            got[doc_id]["main_text"],
            got[doc_id]["n_kept"],
            got[doc_id]["n_dropped"],
            got[doc_id]["link_words_kept"],
        ) == exp


def test_fuzz_tokenizer_never_raises():
    # The 100 TB scraped-markup contract: arbitrary mutations of real
    # pages and raw byte noise must never raise (codec-fuzz posture).
    import random

    rng = random.Random(42)
    base = synthesize_page(7, "src1", " ".join(f"w{i}" for i in range(40)))
    alphabet = "<>/!&;#x\"' abcdefp-="
    for trial in range(3000):
        s = list(base)
        for _ in range(rng.randrange(1, 8)):
            op = rng.randrange(3)
            pos = rng.randrange(len(s))
            if op == 0:
                s[pos] = rng.choice(alphabet)
            elif op == 1:
                s.insert(pos, rng.choice(alphabet))
            else:
                del s[pos]
        extract_main_text("".join(s))  # must not raise
    for trial in range(2000):
        n = rng.randrange(0, 200)
        extract_main_text("".join(rng.choice(alphabet) for _ in range(n)))


def test_raw_close_prefix_does_not_swallow_document():
    # "</styled>" must NOT close "<style>" (HTML5 word-boundary rule);
    # pre-fix this lost the entire remaining document.
    html = "<style>div{}</styled><p>real body words here now</p>"
    assert extract_main_text(html)[0] == ""  # style never closes: raw to EOF
    html2 = "<style>div{} /* </styles */</style><p>real body words here now</p>"
    assert extract_main_text(html2)[0] == "real body words here now"


def test_named_reference_is_load_bearing_in_synthesis():
    # The page joins each paragraph's last two words with &nbsp;; only
    # an extractor that decodes the NAMED form recovers the original
    # word split (numeric-only decoding would weld them into one word).
    text = " ".join(f"w{i}" for i in range(8))
    page = synthesize_page(3, "s0", text)
    assert "&nbsp;" in page
    main, kept, _, _ = extract_main_text(page)
    assert main.split() == text.split() and kept == 1


def test_unicode_lowercase_length_change_does_not_desync_raw_close():
    # U+0130 (LATIN CAPITAL I WITH DOT ABOVE) lowercases to TWO code
    # points, so str.lower() on the whole document would shift every
    # index after it and the raw-text close-tag search (run on the
    # lowered copy, indexed into the original) silently swallowed the
    # rest of the page.  The ASCII-only fold is length-preserving.
    html = "<p>İstanbul intro words here</p><style>x{}</style>" \
           "<p>real body words here now</p>"
    main = extract_main_text(html)[0]
    assert "real body words here now" in main
    # same hazard with the capital letter INSIDE the raw-text content
    html2 = "<style>/* İ */</style><p>real body words here now</p>"
    assert extract_main_text(html2)[0] == "real body words here now"


def test_surrogate_entities_decode_to_replacement_char():
    # Lone surrogates are not UTF-8-encodable; one &#xD800; in a page
    # would kill the whole Arrow batch.  html.unescape maps the range
    # to U+FFFD; so do we — and the result must survive UTF-8.
    out = decode_entities("a&#xD800;b&#xDFFF;c&#55296;d")
    assert out == "a�b�c�d"
    out.encode("utf-8")  # must not raise
    # boundary neighbours still decode normally
    assert decode_entities("&#xD7FF;&#xE000;") == "퟿"
