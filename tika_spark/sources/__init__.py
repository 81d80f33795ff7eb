"""Ingest sources that build the pages table from crawl-native formats."""
