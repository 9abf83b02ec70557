"""robots.txt parsing + allow predicate (reference: src/utils/robots-parser.ts).

At scale the rules live in a tiny per-origin dimension table that is
BROADCAST-joined to the frontier (S6/J3, SURVEY.md §2.1/§2.7) — fetching is
out of scope for a batch engine; rules arrive as data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import urlsplit


@dataclass
class RobotsRules:
    disallowed_paths: list[str] = field(default_factory=list)
    allowed_paths: list[str] = field(default_factory=list)
    crawl_delay_ms: Optional[float] = None


def parse_robots_txt(content: str, user_agent: str = "*") -> RobotsRules:
    """parseRobotsTxt — robots-parser.ts:14-58: directives for the matching
    user-agent group (exact match or '*')."""
    rules = RobotsRules()
    matches_agent = False
    for raw in content.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        colon = line.find(":")
        if colon == -1:
            continue
        directive = line[:colon].strip().lower()
        value = line[colon + 1 :].strip()
        if directive == "user-agent":
            current = value.lower()
            matches_agent = current == "*" or current == user_agent.lower()
        elif matches_agent:
            if directive == "disallow" and value:
                rules.disallowed_paths.append(value)
            elif directive == "allow" and value:
                rules.allowed_paths.append(value)
            elif directive == "crawl-delay":
                try:
                    rules.crawl_delay_ms = float(value) * 1000
                except ValueError:
                    pass
    return rules


_SPECIALS_RE = re.compile(r"[.+?^${}()|\[\]\\]")


def path_matches(path: str, pattern: str) -> bool:
    """pathMatches — robots-parser.ts:89-114: '*' wildcard + '$' end anchor.

    Faithful port including the quirk that a trailing '$' pattern is NOT
    start-anchored (the reference only prepends '^' in the non-'$' branch).
    """
    if not pattern:
        return False
    regex_pattern = _SPECIALS_RE.sub(lambda m: "\\" + m.group(0), pattern)
    regex_pattern = regex_pattern.replace("*", ".*")
    if regex_pattern.endswith("\\$"):
        regex_pattern = regex_pattern[:-2] + "$"
    else:
        regex_pattern = "^" + regex_pattern
    try:
        return re.search(regex_pattern, path) is not None
    except re.error:
        return path.startswith(pattern)


def is_path_allowed(path: str, rules: RobotsRules) -> bool:
    """isPathAllowed — robots-parser.ts:63-83: allow-first, then disallow."""
    normalized = path if path.startswith("/") else "/" + path
    for allowed in rules.allowed_paths:
        if path_matches(normalized, allowed):
            return True
    for disallowed in rules.disallowed_paths:
        if path_matches(normalized, disallowed):
            return False
    return True


def is_url_allowed(url: str, rules: Optional[RobotsRules]) -> bool:
    """isUrlAllowed — robots-parser.ts:144-155 (no rules => allowed)."""
    if rules is None:
        return True
    try:
        parts = urlsplit(url)
        path = parts.path + (f"?{parts.query}" if parts.query else "")
        return is_path_allowed(path, rules)
    except Exception:
        return True
