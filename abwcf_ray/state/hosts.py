"""Per-host robots state (the rebuild of HostManager, SURVEY.md §2 C3/C4/A3).

The reference keeps one sharded ``HostManager`` entity per host that fetches
and caches robots.txt with status-dependent TTLs (HostManager.scala:91-201).
The rebuild keeps a ``hosts`` table maintained wave-over-wave:

- host-prep per wave: hosts of eligible pages that are unknown or expired
  (``valid_until <= now``) are "fetched" through :class:`RobotsFetchSim`
  (a Ray Data stage over the robots corpus) and merged back;
- TTLs use the virtual wave clock (wave_index × wave_duration), making runs
  reproducible (SURVEY.md §2 G: the reference uses wall-clock Instant.now);
- outcome classification mirrors RobotsFetcher.scala:72-138 +
  HostManager.scala:112-177:
    2xx text/plain -> parse rules,      TTL = valid-rules-lifetime (24 h)
    redirect chain > max-redirects     -> unavailable
    4xx / unavailable -> ALLOW_ALL,     TTL = unavailable-rules-lifetime (24 h)
    5xx / unreachable -> reuse expired rules if any, else ALLOW_NONE,
                                        TTL = unreachable-rules-lifetime (1 h)
- the whole table is broadcast per wave (``ray.put``) and read once per
  actor/task inside the robots-filter stages — hosts ≪ frontier (SURVEY.md
  §4.2; at 10^8-host scale this becomes a bucketed join keyed by host, the
  same layout the fetch-sim uses for pages).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from abwcf_ray.config import CrawlConfig
from abwcf_ray.functions.robots import (
    ALLOW_ALL,
    ALLOW_NONE,
    RobotRules,
    parse_robots_txt,
)

HOSTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("rule_mode", pa.string()),
        ("robot_rules", pa.string()),
        ("crawl_delay_ms", pa.int64()),
        ("valid_until_s", pa.float64()),
    ]
)


@dataclass
class HostEntry:
    rules: RobotRules
    valid_until_s: float

    def is_expired(self, now_s: float) -> bool:
        return now_s >= self.valid_until_s


def classify_robots_fetch(
    status: int | None,
    redirect_hops: int,
    body: bytes | None,
    cfg: CrawlConfig,
    now_s: float,
    expired: HostEntry | None,
    content_type: str | None = "text/plain",
) -> HostEntry:
    """One host's robots fetch outcome -> rules + TTL (see module docstring).

    Content-type gate (RobotsFetcher.scala:72-77 accepts ONLY 2xx
    ``text/plain``; :118-126 routes every other non-redirect/non-4xx
    response to ``HostManager.Unreachable``): a 2xx robots.txt served as
    e.g. text/html classifies as UNREACHABLE — reuse expired rules if any,
    else ALLOW_NONE, with the unreachable TTL."""
    if status is not None and redirect_hops > cfg.robots_max_redirects:
        status = 404  # unreachable end of a redirect chain -> unavailable
    non_plain_2xx = (
        status is not None
        and 200 <= status < 300
        and content_type is not None
        and content_type != "text/plain"
    )
    if status is None or 500 <= status or status in (0,) or non_plain_2xx:
        # unreachable (5xx, network error, 2xx-non-text/plain; a host absent
        # from the robots corpus entirely is treated as unavailable below)
        if expired is not None:
            return HostEntry(expired.rules, now_s + cfg.unreachable_rules_lifetime_s)
        rules = RobotRules(mode=ALLOW_NONE, crawl_delay_ms=cfg.default_crawl_delay_ms)
        return HostEntry(rules, now_s + cfg.unreachable_rules_lifetime_s)
    if 200 <= status < 300 and body is not None:
        rules = parse_robots_txt(
            body,
            cfg.user_agents,
            default_delay_ms=cfg.default_crawl_delay_ms,
            min_delay_ms=cfg.min_crawl_delay_ms,
            max_delay_ms=cfg.max_crawl_delay_ms,
            max_bytes=cfg.robots_max_bytes,
        )
        return HostEntry(rules, now_s + cfg.valid_rules_lifetime_s)
    # 4xx or 2xx without a body -> unavailable -> ALLOW_ALL
    rules = RobotRules(mode=ALLOW_ALL, crawl_delay_ms=cfg.default_crawl_delay_ms)
    return HostEntry(rules, now_s + cfg.unavailable_rules_lifetime_s)


class RobotsFetchSim:
    """Ray Data actor-pool stage: batch of ``host`` rows -> parsed host rows.

    ``__init__`` loads the robots corpus once per actor (the stand-in for the
    per-node robots fetcher of the reference, gate of 5 concurrent fetches —
    RobotsFetcherManager.scala:39-65; here concurrency is the pool size).
    """

    def __init__(self, robots_path: str, cfg: CrawlConfig):
        t = pq.read_table(robots_path)
        # content_type column added in corpus v3; default text/plain for
        # older robots tables (user-provided corpora)
        if "content_type" in t.schema.names:
            ctypes = t.column("content_type").to_pylist()
        else:
            ctypes = ["text/plain"] * t.num_rows
        self._by_host = {
            h: (s, r, b, c)
            for h, s, r, b, c in zip(
                t.column("host").to_pylist(),
                t.column("status").to_pylist(),
                t.column("redirect_hops").to_pylist(),
                t.column("body").to_pylist(),
                ctypes,
            )
        }
        self._cfg = cfg

    def fetch_one(self, host: str, now_s: float, expired: HostEntry | None) -> HostEntry:
        rec = self._by_host.get(host)
        if rec is None:
            # host serves no robots.txt at all -> 404 -> unavailable/ALLOW_ALL
            return classify_robots_fetch(404, 0, None, self._cfg, now_s, expired)
        status, hops, body, ctype = rec
        return classify_robots_fetch(
            status, hops, body, self._cfg, now_s, expired, content_type=ctype
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        now_s = batch.column("now_s")[0].as_py() if batch.num_rows else 0.0
        hosts, modes, rules_s, delays, valids, outcomes = [], [], [], [], [], []
        for host in batch.column("host").to_pylist():
            rec = self._by_host.get(host)
            if rec is None:
                status, hops, body, ctype = 404, 0, None, None
            else:
                status, hops, body, ctype = rec
            entry = classify_robots_fetch(
                status, hops, body, self._cfg, now_s, None, content_type=ctype
            )
            non_plain_2xx = (
                status is not None and 200 <= status < 300
                and ctype is not None and ctype != "text/plain"
            )
            if status is not None and hops > self._cfg.robots_max_redirects:
                outcome = "unavailable"
            elif status is None or status >= 500 or non_plain_2xx:
                outcome = "unreachable"
            else:
                outcome = "ok" if 200 <= status < 300 and body is not None else "unavailable"
            hosts.append(host)
            modes.append(entry.rules.mode)
            rules_s.append(entry.rules.serialize_rules())
            delays.append(entry.rules.crawl_delay_ms)
            valids.append(entry.valid_until_s)
            outcomes.append(outcome)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "rule_mode": pa.array(modes, pa.string()),
                "robot_rules": pa.array(rules_s, pa.string()),
                "crawl_delay_ms": pa.array(delays, pa.int64()),
                "valid_until_s": pa.array(valids, pa.float64()),
                "outcome": pa.array(outcomes, pa.string()),
            }
        )


class HostsState:
    """Driver-side hosts table: dict host -> HostEntry + parquet checkpoint."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.entries: dict[str, HostEntry] = {}

    def missing_or_expired(self, hosts, now_s: float) -> list[str]:
        out = []
        for h in hosts:
            e = self.entries.get(h)
            if e is None or e.is_expired(now_s):
                out.append(h)
        return out

    def merge_fetched(self, table: pa.Table) -> None:
        for row in table.to_pylist():
            old = self.entries.get(row["host"])
            if row.get("outcome") == "unreachable" and old is not None:
                # HostManager.scala:154-160: robots unreachable on re-fetch ->
                # reuse the expired rules for the unreachable-rules lifetime.
                self.entries[row["host"]] = HostEntry(old.rules, row["valid_until_s"])
                continue
            rules = RobotRules.deserialize(
                row["rule_mode"], row["robot_rules"], row["crawl_delay_ms"]
            )
            self.entries[row["host"]] = HostEntry(rules, row["valid_until_s"])

    def merge_unreachable_reuse(self, host: str, entry: HostEntry) -> None:
        self.entries[host] = entry

    # -- broadcast payload for the filter stages --------------------------
    def broadcast_payload(self, now_s: float) -> dict[str, tuple[str, str, int]]:
        """host -> (mode, serialized rules, delay_ms); small, pickle-cheap.
        Expired entries are excluded — an expired host is "unknown" to the
        filters, exactly like a TTL-evicted cache entry in the reference
        (LenientRobotsFilter fail-open / StrictRobotsFilter fail-close)."""
        return {
            h: (e.rules.mode, e.rules.serialize_rules(), e.rules.crawl_delay_ms)
            for h, e in self.entries.items()
            if not e.is_expired(now_s)
        }

    def delay_payload(self, now_s: float) -> dict[str, int]:
        return {
            h: e.rules.crawl_delay_ms
            for h, e in self.entries.items()
            if not e.is_expired(now_s)
        }

    # -- checkpoint / resume ---------------------------------------------
    def checkpoint(self, path: str | Path) -> None:
        hosts = sorted(self.entries)
        pq.write_table(
            pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "rule_mode": pa.array([self.entries[h].rules.mode for h in hosts]),
                    "robot_rules": pa.array(
                        [self.entries[h].rules.serialize_rules() for h in hosts]
                    ),
                    "crawl_delay_ms": pa.array(
                        [self.entries[h].rules.crawl_delay_ms for h in hosts], pa.int64()
                    ),
                    "valid_until_s": pa.array(
                        [self.entries[h].valid_until_s for h in hosts], pa.float64()
                    ),
                }
            ),
            str(path),
        )

    def restore(self, path: str | Path) -> None:
        self.entries = {}
        self.merge_fetched(pq.read_table(str(path)))
