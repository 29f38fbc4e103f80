"""Sources: the synthetic crawl corpus (fetch = join) and URL seeding."""
