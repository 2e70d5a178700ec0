"""robots.txt parsing + rule matching (F6).

The reference delegates parsing to crawler-commons'
``SimpleRobotRulesParser`` (``protocol/RobotRulesParser.java:119-151``
prepares the lowercased agent-name list; empty set = wildcard rules).
This module re-implements the semantics our fetch gate needs:

- group lines by ``User-agent`` (consecutive UA lines share one group);
- a group applies if any configured agent name is a substring of the
  lowercased UA token (crawler-commons' contains-match), else the ``*``
  group; all groups matching the best agent are merged;
- ``Allow``/``Disallow`` prefix rules with **longest-match-wins**
  precedence, Allow winning ties (Google/crawler-commons semantics);
  empty ``Disallow:`` means allow-all for the group;
- ``Crawl-delay`` seconds (first valid value of the chosen group);
- ``Disallow: /`` with no allows → ``forbid_all``.

Output matches the engine's robots table schema
(host, disallow, allow, crawl_delay, defer_visits, forbid_all) used by
``operators/fetchsim``; parsing runs in an Arrow-batched pandas UDF
(robots files are per-host — tiny relative to the frontier).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots_txt(content: str | None, agents: list[str]) -> dict:
    """Parse one robots.txt; returns {disallow, allow, crawl_delay}."""
    groups: list[dict] = []  # {agents: [..], disallow: [], allow: [], delay}
    cur: dict | None = None
    last_was_agent = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "disallow": [], "allow": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue
        if key == "disallow":
            if val:
                cur["disallow"].append(val)
        elif key == "allow":
            if val:
                cur["allow"].append(val)
        elif key == "crawl-delay":
            try:
                if cur["delay"] is None:
                    cur["delay"] = float(val)
            except ValueError:
                pass

    agents = [a.lower() for a in agents]

    def matching(pred):
        return [g for g in groups if any(pred(ua) for ua in g["agents"])]

    chosen = matching(lambda ua: any(a in ua for a in agents)) or matching(
        lambda ua: ua == "*"
    )
    out = {"disallow": [], "allow": [], "crawl_delay": None}
    for g in chosen:
        out["disallow"] += g["disallow"]
        out["allow"] += g["allow"]
        if out["crawl_delay"] is None:
            out["crawl_delay"] = g["delay"]
    return out


def is_allowed(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Longest-match-wins; Allow wins ties; no match => allowed."""
    best_dis = max((len(p) for p in disallow if path.startswith(p)), default=-1)
    best_allow = max((len(p) for p in allow if path.startswith(p)), default=-1)
    return best_allow >= best_dis


_ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("allow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def robots_table(
    robots_txt: DataFrame, agents: list[str], *, host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """(host, content) -> the engine's robots table. 5xx deferral is a
    fetch-layer concern (defer_visits stays False here — set it from the
    robots-fetch outcome when building the table from a real crawl)."""

    @F.pandas_udf(_ROBOTS_SCHEMA)
    def _parse(contents: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_txt(c, agents) for c in contents]
        return pd.DataFrame(rows)

    parsed = robots_txt.select(
        F.col(host_col).alias("host"), _parse(F.col(content_col)).alias("r")
    )
    forbid = (
        F.array_contains(F.col("r.disallow"), "/") & (F.size("r.allow") == 0)
    )
    return parsed.select(
        "host",
        F.col("r.disallow").alias("disallow"),
        F.col("r.allow").alias("allow"),
        F.col("r.crawl_delay").alias("crawl_delay"),
        F.lit(False).alias("defer_visits"),
        forbid.alias("forbid_all"),
    )
