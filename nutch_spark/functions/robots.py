"""robots.txt parsing — exact port of the reference's grammar.

lib-http RobotRulesParser (RobotRulesParser.java:272-421): stanza-based
parse with agent precedence (the configured agent list's index order; '*'
via the caller passing it last), '#' comments, multi-name User-agent
lines, empty Disallow/Allow clearing the stanza, URL-decoded rule paths,
Crawl-Delay in seconds, and FIRST-MATCH-in-declaration-order verdicts
(RobotRuleSet.isAllowed:165-190 — NOT longest-prefix; the Google
convention differs). The fetch pipeline's pre-parsed robots TABLE keeps
two prefix arrays and applies longest-prefix (operators/fetch.py — the
fixture schema carries no declaration order); this module is the exact
text-ingest layer a real deployment uses to BUILD that table, and the
parity tests (TestRobotRulesParser's 200-verdict matrix) run against it.
"""

from __future__ import annotations

from urllib.parse import unquote


class RobotRules:
    """Parsed rule set: ordered (prefix, allowed) entries + crawl delay.

    `entries=[]` is EMPTY_RULES (everything allowed); `[("", False)]` is
    FORBID_ALL_RULES (RobotRulesParser.java:414-422)."""

    __slots__ = ("entries", "crawl_delay_ms")

    def __init__(self, entries: list[tuple[str, bool]] | None = None,
                 crawl_delay_ms: int = -1):
        self.entries = entries or []
        self.crawl_delay_ms = crawl_delay_ms

    def is_allowed(self, path: str) -> bool:
        """First matching prefix in declaration order decides; no match
        allows (RobotRuleSet.isAllowed:165-190)."""
        try:
            path = unquote(path)
        except Exception:
            pass  # reference: keep trying prefix matches on the raw path
        for prefix, allowed in self.entries:
            if path.startswith(prefix):
                return allowed
        return True

    def is_url_allowed(self, url: str) -> bool:
        i = url.find("://")
        j = url.find("/", i + 3) if i >= 0 else -1
        path = url[j:] if j >= 0 else "/"
        return self.is_allowed(path or "/")


EMPTY_RULES = RobotRules()
FORBID_ALL_RULES = RobotRules([("", False)])

_NO_PRECEDENCE = 1 << 31


def parse_robots_txt(content: str | bytes | None,
                     agent_names: list[str]) -> RobotRules:
    """parseRules (RobotRulesParser.java:272-401): pick the stanza whose
    User-agent matches `agent_names` at the lowest index; missing/None
    content -> EMPTY_RULES. agent_names are the http.robots.agents list in
    priority order; '*' is always included last (setRobotNames:245-253)."""
    if content is None:
        return EMPTY_RULES
    if isinstance(content, (bytes, bytearray)):
        content = content.decode("utf-8", errors="replace")

    # HashMap.put in list order (a duplicate name's LAST index wins), then
    # '*' is always present with lowest precedence (setRobotNames:245-253)
    robot_names = {a.strip().lower(): i for i, a in enumerate(agent_names)
                   if a.strip()}
    robot_names.setdefault("*", len(agent_names))

    best_rules: RobotRules | None = None
    best_precedence = _NO_PRECEDENCE
    current = RobotRules()
    current_precedence = _NO_PRECEDENCE
    add_rules = False    # in a stanza for one of our names
    done_agents = False  # a non-agent line ends the agent-line run

    # StringTokenizer(content, "\n\r") — every newline flavor splits
    for line in content.replace("\r", "\n").split("\n"):
        if not line:
            continue
        hash_pos = line.find("#")
        if hash_pos >= 0:
            line = line[:hash_pos]
        line = line.strip()
        low = line.lower()

        if low.startswith("user-agent:"):
            if done_agents:
                if current_precedence < best_precedence:
                    best_precedence = current_precedence
                    best_rules = current
                    current_precedence = _NO_PRECEDENCE
                    current = RobotRules()
                add_rules = False
            done_agents = False
            for agent in line[line.index(":") + 1:].split():
                precedence = robot_names.get(agent.lower())
                if precedence is not None and \
                        precedence < current_precedence and \
                        precedence < best_precedence:
                    current_precedence = precedence
            if current_precedence < best_precedence:
                add_rules = True
        elif low.startswith("disallow:"):
            done_agents = True
            path = line[line.index(":") + 1:].strip()
            if not path:
                continue  # Disallow with no path: skipped (:341-344)
            try:
                path = unquote(path)
            except Exception:
                pass
            if not path:
                if add_rules:  # decoded to empty: clears the stanza (:352)
                    current.entries.clear()
            elif add_rules:
                current.entries.append((path, False))
        elif low.startswith("allow:"):
            done_agents = True
            # the reference's Allow branch (:363-375) differs from
            # Disallow on BOTH edges: an empty path is an "empty rule"
            # (clearPrefixes) rather than skipped, and the path is added
            # RAW — no URLDecoder pass
            path = line[line.index(":") + 1:].strip()
            if not path:
                if add_rules:
                    current.entries.clear()
            elif add_rules:
                current.entries.append((path, True))
        elif low.startswith("crawl-delay:"):
            done_agents = True
            if add_rules:
                delay = line[len("crawl-delay:"):].strip()
                if delay:
                    # :379-388: setCrawlDelay runs for every non-empty
                    # value — an unparseable one RESETS the delay to -1
                    # (unset) rather than keeping an earlier parse
                    try:
                        current.crawl_delay_ms = int(delay) * 1000
                    except ValueError:
                        current.crawl_delay_ms = -1

    if current_precedence < best_precedence:
        best_precedence = current_precedence
        best_rules = current

    if best_precedence == _NO_PRECEDENCE:
        return EMPTY_RULES
    return best_rules if best_rules is not None else EMPTY_RULES


def robots_table_row(host: str, content: str | bytes | None,
                     agent_names: list[str]) -> dict:
    """Ingest helper: robots.txt text -> one pipeline robots-table row
    (host, agent='*', disallow, allow, crawl_delay). Entry order within
    each array is declaration order; the table verdict path applies
    longest-prefix over the two arrays (see module docstring)."""
    rules = parse_robots_txt(content, agent_names)
    return {
        "host": host,
        "agent": "*",
        "disallow": [p for p, a in rules.entries if not a],
        "allow": [p for p, a in rules.entries if a],
        "crawl_delay": (rules.crawl_delay_ms / 1000.0
                        if rules.crawl_delay_ms >= 0 else None),
    }
