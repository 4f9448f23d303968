"""HostsState / robots fetch-sim classification and TTL tests
(HostManager.scala:112-177, RobotsFetcher.scala:72-138)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from abwcf_ray.config import CrawlConfig
from abwcf_ray.functions.robots import ALLOW_ALL, ALLOW_NONE, ALLOW_SOME
from abwcf_ray.state.hosts import (
    HostEntry,
    HostsState,
    RobotsFetchSim,
    classify_robots_fetch,
)

CFG = CrawlConfig()


def test_classification_matrix():
    ok = classify_robots_fetch(200, 0, b"User-agent: *\nDisallow: /x\n", CFG, 0.0, None)
    assert ok.rules.mode == ALLOW_SOME
    assert ok.valid_until_s == CFG.valid_rules_lifetime_s

    unavailable = classify_robots_fetch(404, 0, None, CFG, 0.0, None)
    assert unavailable.rules.mode == ALLOW_ALL
    assert unavailable.valid_until_s == CFG.unavailable_rules_lifetime_s

    unreachable = classify_robots_fetch(503, 0, None, CFG, 0.0, None)
    assert unreachable.rules.mode == ALLOW_NONE
    assert unreachable.valid_until_s == CFG.unreachable_rules_lifetime_s

    # redirect chain longer than max-redirects -> unavailable (ALLOW_ALL)
    too_many = classify_robots_fetch(200, 7, b"User-agent: *\nDisallow: /\n", CFG, 0.0, None)
    assert too_many.rules.mode == ALLOW_ALL
    # within the cap -> body parsed
    ok_redir = classify_robots_fetch(200, 5, b"User-agent: *\nDisallow: /x\n", CFG, 0.0, None)
    assert ok_redir.rules.mode == ALLOW_SOME

    # 2xx with a NON-text/plain content type -> Unreachable (RFC 9309 gate,
    # RobotsFetcher.scala:72-77 + :118-126): ALLOW_NONE + unreachable TTL,
    # or reuse of expired rules
    html_robots = classify_robots_fetch(
        200, 0, b"<html>robots</html>", CFG, 0.0, None, content_type="text/html"
    )
    assert html_robots.rules.mode == ALLOW_NONE
    assert html_robots.valid_until_s == CFG.unreachable_rules_lifetime_s
    old = classify_robots_fetch(200, 0, b"User-agent: *\nDisallow: /k\n", CFG, 0.0, None)
    reused = classify_robots_fetch(
        200, 0, b"<html></html>", CFG, 50.0, old, content_type="text/html"
    )
    assert reused.rules == old.rules


def test_unreachable_reuses_expired_rules():
    old = classify_robots_fetch(200, 0, b"User-agent: *\nDisallow: /keep\n", CFG, 0.0, None)
    reused = classify_robots_fetch(503, 0, None, CFG, 100.0, old)
    assert reused.rules == old.rules  # HostManager.scala:154-160
    assert reused.valid_until_s == 100.0 + CFG.unreachable_rules_lifetime_s


def test_fetchsim_and_state_merge(tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "host": pa.array(["https://a", "https://b", "https://c", "https://h"]),
                "status": pa.array([200, 503, 200, 200], pa.int32()),
                "redirect_hops": pa.array([0, 0, 9, 0], pa.int32()),
                "body": pa.array(
                    [
                        b"User-agent: *\nDisallow: /x\nCrawl-delay: 2\n",
                        None,
                        b"x",
                        b"<html>robots as html</html>",
                    ],
                    pa.binary(),
                ),
                "content_type": pa.array(
                    ["text/plain", None, "text/plain", "text/html"], pa.string()
                ),
            }
        ),
        tmp_path / "robots.parquet",
    )
    sim = RobotsFetchSim(str(tmp_path / "robots.parquet"), CFG)
    batch = pa.table(
        {
            "host": pa.array(
                ["https://a", "https://b", "https://c", "https://h", "https://missing"]
            ),
            "now_s": pa.array([10.0] * 5, pa.float64()),
        }
    )
    out = sim(batch)
    by_host = {r["host"]: r for r in out.to_pylist()}
    assert by_host["https://a"]["rule_mode"] == ALLOW_SOME
    assert by_host["https://a"]["crawl_delay_ms"] == 2000
    assert by_host["https://a"]["outcome"] == "ok"
    assert by_host["https://b"]["rule_mode"] == ALLOW_NONE
    assert by_host["https://b"]["outcome"] == "unreachable"
    assert by_host["https://c"]["rule_mode"] == ALLOW_ALL  # redirect cap
    # 2xx text/html robots -> unreachable (content-type gate)
    assert by_host["https://h"]["rule_mode"] == ALLOW_NONE
    assert by_host["https://h"]["outcome"] == "unreachable"
    assert by_host["https://missing"]["rule_mode"] == ALLOW_ALL  # no robots -> 404

    state = HostsState(CFG)
    # pre-existing expired entry for b -> unreachable outcome reuses it
    old_rules = classify_robots_fetch(200, 0, b"User-agent: *\nDisallow: /old\n", CFG, 0.0, None)
    state.entries["https://b"] = HostEntry(old_rules.rules, 5.0)
    state.merge_fetched(out)
    assert state.entries["https://b"].rules == old_rules.rules
    assert state.entries["https://a"].rules.crawl_delay_ms == 2000

    # expiry: broadcast payload drops expired entries (fail-open downstream)
    state.entries["https://a"] = HostEntry(state.entries["https://a"].rules, 20.0)
    payload_live = state.broadcast_payload(now_s=10.0)
    payload_expired = state.broadcast_payload(now_s=25.0)
    assert "https://a" in payload_live and "https://a" not in payload_expired

    # checkpoint roundtrip
    state.checkpoint(tmp_path / "hosts.parquet")
    state2 = HostsState(CFG)
    state2.restore(tmp_path / "hosts.parquet")
    assert {h: e.rules for h, e in state2.entries.items()} == {
        h: e.rules for h, e in state.entries.items()
    }


def test_missing_or_expired():
    state = HostsState(CFG)
    state.entries["https://a"] = HostEntry(
        classify_robots_fetch(404, 0, None, CFG, 0.0, None).rules, 100.0
    )
    assert state.missing_or_expired(["https://a", "https://b"], 50.0) == ["https://b"]
    assert state.missing_or_expired(["https://a"], 100.0) == ["https://a"]
