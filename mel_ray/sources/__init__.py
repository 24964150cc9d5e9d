"""Source readers beyond Parquet (JSONL with codecs, CSV/TSV)."""
