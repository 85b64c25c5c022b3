"""robots.txt parsing + URL allow/deny decisions (crawl politeness).

A compliant corpus pipeline must honour each host's ``robots.txt`` before a
page enters training prep — the third member of the crawl-politeness family
(URL/domain blocklist: ``functions/urls.py domain_blocklist_filter``;
meta-robots noindex: ``functions/links.py is_noindex``). The reference
engine has no crawl layer; semantics follow the de-facto standard
(RFC 9309 / original REP) restricted to the subset every major crawler
agrees on:

- only the ``User-agent: *`` group(s) are consulted (token-specific groups
  are a caller concern — pass a different ``agent`` to :func:`parse_robots`);
- ``Disallow`` / ``Allow`` values are PATH PREFIXES. ``*`` / ``$`` wildcard
  extensions are a documented non-goal: rules containing them are skipped
  (treating a wildcard rule as a literal prefix would be WRONG in both
  directions, so skipping is the conservative parse);
- decision per path: among matching rules the LONGEST prefix wins; on an
  exact length tie ``Allow`` wins (RFC 9309 §2.2.2); no matching rule, an
  empty ``Disallow:`` line, or a missing/empty robots.txt mean allowed;
- field names match case-insensitively; ``#`` starts a comment; a group is
  consecutive ``User-agent`` lines followed by its rules.

Every decision step has an exact SQL twin (longest-prefix via
``row_number() OVER (ORDER BY length(prefix) DESC, rule ASC)`` — ``'allow'
< 'disallow'`` encodes the tie-break); parsing itself is pytest-pinned and
feeds the oracle's rules table from the SAME function, as with the other
one-source-of-truth kernels.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import pyarrow as pa

__all__ = ["parse_robots", "is_allowed", "rules_table", "synth_robots",
           "PATH_SQL_RE"]

#: path component of a canonical URL ('' when the URL has no path) — shared
#: by the Python matcher and the SQL twin verbatim
PATH_SQL_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def parse_robots(text: str | None, agent: str = "*") -> List[Tuple[str, str]]:
    """robots.txt text -> ``[(rule, prefix)]`` for the ``agent`` group(s).

    ``rule`` is ``"allow"`` or ``"disallow"``; prefixes are returned as
    written (no normalization — robots paths are already path-absolute).
    Deterministic; duplicate rules are kept once.
    """
    if not text:
        return []
    rules: List[Tuple[str, str]] = []
    seen = set()
    in_group = False        # currently inside a matching-agent group
    agents_open = False     # reading consecutive User-agent lines
    group_matches = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:       # a new group starts
                agents_open = True
                group_matches = False
            if value == agent:
                group_matches = True
            continue
        agents_open = False
        in_group = group_matches
        if not in_group or field not in ("allow", "disallow"):
            continue
        if not value:                 # empty Disallow == allow-all: no rule
            continue
        if "*" in value or "$" in value:
            continue                  # wildcard subset: documented non-goal
        key = (field, value)
        if key not in seen:
            seen.add(key)
            rules.append(key)
    return rules


def is_allowed(rules: Sequence[Tuple[str, str]], path: str) -> bool:
    """Longest-prefix decision over parsed rules; '' path means '/'.

    Tie on prefix length -> allow (RFC 9309 §2.2.2); no match -> allowed.
    """
    p = path or "/"
    best_len = -1
    best_rule = "allow"
    for rule, prefix in rules:
        if p.startswith(prefix) and len(prefix) >= best_len:
            if len(prefix) > best_len or rule == "allow":
                best_rule = rule
            best_len = max(best_len, len(prefix))
    return best_rule == "allow"


def rules_table(robots: pa.Table, host_col: str = "host",
                text_col: str = "robots_txt") -> pa.Table:
    """(host, robots_txt) -> melted ``(host, rule, prefix)`` rows via
    :func:`parse_robots` — the ONE source of truth feeding both the engine's
    broadcast rule map and the oracle's SQL rules table."""
    hosts, rls, prefixes = [], [], []
    for h, t in zip(robots.column(host_col).to_pylist(),
                    robots.column(text_col).to_pylist()):
        for rule, prefix in parse_robots(t):
            hosts.append(h)
            rls.append(rule)
            prefixes.append(prefix)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "rule": pa.array(rls, pa.string()),
        "prefix": pa.array(prefixes, pa.string()),
    })


def synth_robots(hosts: Sequence[str], seed: int = 42) -> pa.Table:
    """Deterministic per-host robots.txt fixture over the crawl-url path
    vocabulary (segments ``a/b/dir/item/p`` + digits, matching
    ``sources/synth.synth_crawl_urls``): ~1/4 of hosts have no robots.txt
    (empty text), the rest mix disallow prefixes, allow overrides that
    EXTEND a disallow (longest-match exercise), same-length allow/disallow
    ties, comments, wildcard rules (must be skipped) and a foreign-agent
    group (must be ignored). Pure function of ``(hosts, seed)``."""
    rng = random.Random((seed, len(hosts), "robots").__repr__())
    segs = ["a", "b", "dir", "item", "p"]
    texts = []
    for h in hosts:
        if rng.random() < 0.25:
            texts.append("")
            continue
        lines = [f"# robots for {h}", "User-agent: *"]
        n_dis = rng.randrange(1, 4)
        for _ in range(n_dis):
            seg = rng.choice(segs)
            prefix = f"/{seg}" + (str(rng.randrange(10))
                                  if rng.random() < 0.5 else "")
            lines.append(f"Disallow: {prefix}")
            if rng.random() < 0.4:   # allow override extending the disallow
                lines.append(f"Allow: {prefix}{rng.randrange(10)}")
            if rng.random() < 0.2:   # same-length tie: allow must win
                lines.append(f"Allow: {prefix}")
        if rng.random() < 0.3:       # wildcard rule: skipped by the parser
            lines.append(f"Disallow: /{rng.choice(segs)}*")
        if rng.random() < 0.3:       # foreign agent group: ignored
            lines.append("")
            lines.append("User-agent: OtherBot")
            lines.append("Disallow: /")
        texts.append("\n".join(lines) + "\n")
    return pa.table({
        "host": pa.array(list(hosts), pa.string()),
        "robots_txt": pa.array(texts, pa.string()),
    })
