"""The crawl engine: world model, politeness scheduler, frontier loop."""
