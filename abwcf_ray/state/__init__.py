"""Cross-wave mutable crawl state: the sharded URL-seen set (actor pool) and
the per-host robots-rules table."""
