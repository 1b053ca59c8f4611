"""TestRobotRulesParser port (lib-http test, :30-308): the full verdict
matrices — 2 robots strings x 5 single agents x 20 paths, all 25 two-agent
combinations, and the crawl-delay stanza-selection cases — against the
exact parseRules/is_allowed port in nutch_spark.functions.robots."""

import pytest

from nutch_spark.functions.robots import parse_robots_txt, robots_table_row

CR = "\r"
ROBOTS0 = (
    "User-Agent: Agent1 #foo" + CR
    + "Disallow: /a" + CR
    + "Disallow: /b/a" + CR
    + "#Disallow: /c" + CR + "" + CR + "" + CR
    + "User-Agent: Agent2 Agent3#foo" + CR
    + "User-Agent: Agent4" + CR
    + "Disallow: /d" + CR
    + "Disallow: /e/d/" + CR + "" + CR
    + "User-Agent: *" + CR
    + "Disallow: /foo/bar/" + CR
)

TEST_PATHS = [
    "/a", "/a/", "/a/bloh/foo.html", "/b", "/b/a", "/b/a/index.html",
    "/b/b/foo.html", "/c", "/c/a", "/c/a/index.html", "/c/b/foo.html",
    "/d", "/d/a", "/e/a/index.html", "/e/d", "/e/d/foo.html",
    "/e/doh.html", "/f/index.html", "/foo/bar/baz.html", "/f/",
]

T, F = True, False
ALLOWED0 = {
    "Agent1": [F, F, F, T, F, F, T, T, T, T, T, T, T, T, T, T, T, T, T, T],
    "Agent2": [T, T, T, T, T, T, T, T, T, T, T, F, F, T, T, F, T, T, T, T],
    "Agent3": [T, T, T, T, T, T, T, T, T, T, T, F, F, T, T, F, T, T, T, T],
    "Agent4": [T, T, T, T, T, T, T, T, T, T, T, F, F, T, T, F, T, T, T, T],
    "Agent5": [T, T, T, T, T, T, T, T, T, T, T, T, T, T, T, T, T, T, F, T],
}
AGENTS = list(ALLOWED0)
NOT_IN_ROBOTS = {"Agent1": F, "Agent2": F, "Agent3": F, "Agent4": F,
                 "Agent5": T}


@pytest.mark.parametrize("agent", AGENTS)
def test_robots_one_agent(agent):
    rules = parse_robots_txt(ROBOTS0, [agent])
    assert [rules.is_allowed(p) for p in TEST_PATHS] == ALLOWED0[agent]


@pytest.mark.parametrize("agent", AGENTS)
def test_robots_none_content_is_empty_rules(agent):
    rules = parse_robots_txt(None, [agent])
    assert all(rules.is_allowed(p) for p in TEST_PATHS)


@pytest.mark.parametrize("j", AGENTS)
@pytest.mark.parametrize("k", AGENTS)
def test_robots_two_agents(j, k):
    key = k if NOT_IN_ROBOTS[j] else j
    rules = parse_robots_txt(ROBOTS0, [j, k])
    assert [rules.is_allowed(p) for p in TEST_PATHS] == ALLOWED0[key]


def test_crawl_delay_stanza_selection():
    d1 = ("User-agent: nutchbot" + CR + "Crawl-delay: 10" + CR
          + "User-agent: foobot" + CR + "Crawl-delay: 20" + CR
          + "User-agent: *" + CR + "Disallow:/baz" + CR)
    d2 = ("User-agent: foobot" + CR + "Crawl-delay: 20" + CR
          + "User-agent: *" + CR + "Disallow:/baz" + CR)
    assert parse_robots_txt(d1, ["nutchbot"]).crawl_delay_ms == 10000
    assert parse_robots_txt(d2, ["nutchbot"]).crawl_delay_ms == -1


def test_first_match_order_not_longest_prefix():
    """RobotRuleSet.isAllowed:165-190 is first-match in declaration order:
    a shorter prefix declared first shadows a longer one declared later."""
    txt = ("User-agent: bot" + CR
           + "Disallow: /a" + CR
           + "Allow: /a/open" + CR)
    rules = parse_robots_txt(txt, ["bot"])
    # declaration order: /a first -> /a/open/x is DENIED (Google's
    # longest-prefix convention would allow it)
    assert not rules.is_allowed("/a/open/x.html")
    assert rules.is_allowed("/b")


def test_robots_table_row_ingest():
    """Text -> pipeline robots-table row (the ingest layer for the
    pre-parsed robots table operators/fetch.py consumes)."""
    txt = ("User-agent: nutch-spark" + CR + "Disallow: /private/" + CR
           + "Allow: /public/" + CR + "Crawl-delay: 3" + CR)
    row = robots_table_row("h.example.com", txt, ["nutch-spark"])
    assert row == {"host": "h.example.com", "agent": "*",
                   "disallow": ["/private/"], "allow": ["/public/"],
                   "crawl_delay": 3.0}


def test_forbid_all_and_url_paths():
    from nutch_spark.functions.robots import FORBID_ALL_RULES

    assert not FORBID_ALL_RULES.is_allowed("/anything")
    rules = parse_robots_txt("User-agent: *" + CR + "Disallow: /x" + CR,
                             ["bot"])
    assert not rules.is_url_allowed("http://h.com/x/1")
    assert rules.is_url_allowed("http://h.com")  # hostless path -> "/"


def test_empty_allow_clears_stanza_but_empty_disallow_skipped():
    """parseRules' two empty-path edges differ (RobotRulesParser.java):
    a bare 'Disallow:' is SKIPPED (:341-344) while a bare 'Allow:' is an
    'empty rule' that CLEARS the stanza's prefixes (:368-370) — the exact
    opposite verdicts for every previously-disallowed path."""
    cleared = ("User-agent: bot" + CR + "Disallow: /private" + CR
               + "Allow:" + CR)
    rules = parse_robots_txt(cleared, ["bot"])
    assert rules.is_allowed("/private/x.html")  # stanza cleared

    kept = ("User-agent: bot" + CR + "Disallow: /private" + CR
            + "Disallow:" + CR)
    rules = parse_robots_txt(kept, ["bot"])
    assert not rules.is_allowed("/private/x.html")  # bare Disallow: no-op


def test_allow_path_is_not_url_decoded():
    """Only the Disallow branch URL-decodes its path (:346-352); Allow adds
    the RAW string (:371-374), so '%61' stays literal in an Allow prefix
    and decodes to 'a' in a Disallow prefix."""
    txt = ("User-agent: bot" + CR + "Disallow: /%61bc" + CR
           + "Allow: /%64ef" + CR)
    rules = parse_robots_txt(txt, ["bot"])
    assert ("/abc", False) in rules.entries      # decoded
    assert ("/%64ef", True) in rules.entries     # raw, not '/def'


def test_unparseable_crawl_delay_resets_to_unset():
    """setCrawlDelay runs for every non-empty value (:379-388): an
    unparseable later line RESETS the delay to -1 rather than keeping the
    earlier parse; an EMPTY value line changes nothing."""
    reset = ("User-agent: bot" + CR + "Crawl-delay: 5" + CR
             + "Crawl-delay: soon" + CR)
    assert parse_robots_txt(reset, ["bot"]).crawl_delay_ms == -1

    empty = ("User-agent: bot" + CR + "Crawl-delay: 5" + CR
             + "Crawl-delay:" + CR)
    assert parse_robots_txt(empty, ["bot"]).crawl_delay_ms == 5000
