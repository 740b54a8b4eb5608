"""Source-format readers: bulk interchange formats a batch crawl/corpus
engine ingests instead of live HTTP (the reference fetches live via Zyte,
zyte.py:43-97; at batch scale the same payloads arrive as WARC archives)."""
