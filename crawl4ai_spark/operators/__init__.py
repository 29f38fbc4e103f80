"""Crawl operators: frontier engine, URL-seen store, politeness, robots."""
