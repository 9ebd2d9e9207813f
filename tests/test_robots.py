"""robots.txt engine (llm/robots.py): RFC 9309 parsing, matching,
longest-match decisions, group selection, fuzz survival."""

from __future__ import annotations

from trend_o_meter_spark.llm.robots import (
    is_allowed,
    parse_robots,
    robots_filter,
    rule_matches,
    select_group,
    synthesize_robots,
)


def test_pattern_wildcard_and_anchor():
    assert rule_matches("/fish", "/fish/salmon")  # prefix
    assert rule_matches("/fish*", "/fishheads/yummy.html")
    assert rule_matches("/*.php", "/folder/filename.php")
    assert not rule_matches("/*.php$", "/filename.php?parameters")
    assert rule_matches("/*.php$", "/filename.php")
    assert not rule_matches("/fish", "/Fish.asp")  # case-sensitive paths
    assert rule_matches("/fish*.php", "/fishheads/catfish.php?p=1")


def test_longest_match_wins_and_tie_favors_allow():
    rules = [(True, "/p"), (False, "/page")]
    assert is_allowed(rules, "/page")[0] is False  # /page longer than /p
    rules2 = [(True, "/page"), (False, "/*.htm")]
    # "/page" (5) matches "/page.htm"; "/*.htm" (6) also matches and is
    # LONGER (specificity = pattern octet length, wildcards count) -> deny.
    assert is_allowed(rules2, "/page.htm") == (False, 6)
    tie = [(True, "/dir/"), (False, "/dir/")]
    assert is_allowed(tie, "/dir/x")[0] is True  # exact tie -> allow


def test_no_match_allows_with_len_zero():
    assert is_allowed([(False, "/private/")], "/public/x") == (True, 0)
    assert is_allowed([], "/anything") == (True, 0)


def test_group_selection_specificity_and_fallback():
    txt = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: trend\nDisallow: /t/\n"
        "User-agent: trendbot\nDisallow: /tb/\n"
    )
    groups = parse_robots(txt)
    assert select_group(groups, "TrendBot/1.0") == [(False, "/tb/")]  # longest
    assert select_group(groups, "trend/2") == [(False, "/t/")]
    assert select_group(groups, "otherbot") == [(False, "/")]  # * fallback
    assert select_group(parse_robots("Allow: /x\n"), "any") == []  # headerless


def test_stacked_user_agents_share_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    groups = parse_robots(txt)
    assert groups == [(["a", "b"], [(False, "/x/")])]


def test_parser_tolerates_noise():
    txt = (
        "﻿# top comment\r\n"
        "USER-AGENT: bot  # trailing comment\r\n"
        "Crawl-Delay: 10\r\n"
        "Sitemap: https://x/s.xml\r\n"
        "DISALLOW: /a/\r\n"
        "Disallow:\r\n"  # empty pattern: matches nothing, dropped
        "nonsense line without colon maybe\r\n"
        "Allow: /a/ok\r\n"
    )
    groups = parse_robots(txt)
    assert groups == [(["bot"], [(False, "/a/"), (True, "/a/ok")])]


def test_synthesized_policy_decisions():
    rules = select_group(parse_robots(synthesize_robots("src0")), "trendbot/1.0")
    # baseline allow
    assert is_allowed(rules, "/src0/d1/p4") == (True, 1)
    # directory disallow (len('/src0/d2/') = 9)
    assert is_allowed(rules, "/src0/d2/p6") == (False, 9)
    # carve-out overrides (len('/src0/d2/p1') = 11)
    assert is_allowed(rules, "/src0/d2/p102") == (True, 11)
    # wildcard anchor
    assert is_allowed(rules, "/src0/d3/p19") == (False, 4)
    # deny-all * group must NOT apply to trendbot
    star = select_group(parse_robots(synthesize_robots("src0")), "otherbot")
    assert is_allowed(star, "/src0/d1/p4")[0] is False


def test_fuzz_parser_and_matcher_never_raise():
    import random

    rng = random.Random(47)
    base = synthesize_robots("srcX")
    alphabet = ":*$/#\r\n aUD-"
    for _ in range(3000):
        s = list(base)
        for _ in range(rng.randrange(1, 6)):
            op = rng.randrange(3)
            pos = rng.randrange(len(s))
            if op == 0:
                s[pos] = rng.choice(alphabet)
            elif op == 1:
                s.insert(pos, rng.choice(alphabet))
            else:
                del s[pos]
        groups = parse_robots("".join(s))
        rules = select_group(groups, "trendbot/1.0")
        is_allowed(rules, "/a/b*c$d")  # regex-special chars in path too


def test_spark_operator_matches_kernel(spark):
    rows = [(i, f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["doc_id"]: r for r in robots_filter(df).collect()}
    for doc_id, source in rows:
        from trend_o_meter_spark.llm.robots import doc_path

        rules = select_group(
            parse_robots(synthesize_robots(source)), "trendbot/1.0"
        )
        allowed, mlen = is_allowed(rules, doc_path(source, doc_id))
        r = got[doc_id]
        assert (r["allowed"], r["match_len"]) == (allowed, mlen)


def test_other_records_do_not_split_stacked_groups():
    # RFC 9309 §2.2.1: Sitemap/Crawl-delay/unknown lines must not
    # interfere with grouping (pre-fix, 'a' got an empty rule set).
    txt = (
        "User-agent: a\nSitemap: https://x/s.xml\n"
        "User-agent: b\nDisallow: /x\n"
    )
    groups = parse_robots(txt)
    assert groups == [(["a", "b"], [(False, "/x")])]
    assert select_group(groups, "a") == [(False, "/x")]


def test_repeated_groups_for_same_agent_combine():
    # RFC 9309 §2.2.1 MUST: multiple groups for the same token combine.
    txt = "User-agent: a\nDisallow: /x\n\nUser-agent: a\nDisallow: /y\n"
    rules = select_group(parse_robots(txt), "a")
    assert rules == [(False, "/x"), (False, "/y")]
    assert is_allowed(rules, "/y/page")[0] is False
    # multiple '*' fallback groups combine too
    star = "User-agent: *\nDisallow: /x\n\nUser-agent: *\nDisallow: /y\n"
    assert select_group(parse_robots(star), "other") == [
        (False, "/x"), (False, "/y")
    ]
