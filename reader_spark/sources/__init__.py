"""Source formats beyond plain tables: web-archive (WARC-style) record
streams, the shape a 100 TB crawl corpus actually arrives in."""
