"""Crawl wave driver, resume logic, and the single-process golden oracle."""
